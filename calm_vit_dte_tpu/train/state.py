"""Train state pytree: params + spectral-norm power-iteration state +
optimizer state + step counter + base PRNG key.

Replaces the reference's implicit state scattered across the torch module
(spectral-norm buffers), the optimizer object, and the CUDA RNG. The whole
state is one pytree, so it shards, checkpoints (Orbax), and donates cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    sn_state: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


def create_train_state(params, sn_state, tx, rng) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        params=params,
        sn_state=sn_state,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )
