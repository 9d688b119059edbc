"""Torch-distribution-compatible initializers.

The reference relies on PyTorch default inits (kaiming_uniform with a=sqrt(5)
for Linear/Conv2d weights, U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for biases;
see torch.nn.Linear.reset_parameters). We reproduce the *distributions* so a
self-trained model behaves like the reference; bit-level parity with torch is
established separately by importing reference weights (compat/torch_import.py).

Sampling runs host-side in numpy, deterministically derived from the JAX key:
initializing ~700 parameter leaves as jitted/eager XLA programs costs minutes
of compile time (measured 4m40s for the tiny model on this CPU backend) and
buys nothing — init happens once, off the hot path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _np_rng(key: jax.Array) -> np.random.Generator:
    data = np.asarray(jax.random.key_data(key)).astype(np.uint32).ravel()
    return np.random.default_rng(int.from_bytes(data.tobytes(), "little"))


def kaiming_uniform(key: jax.Array, shape: tuple[int, ...], fan_in: int,
                    dtype=jnp.float32) -> jax.Array:
    """torch.nn.init.kaiming_uniform_(w, a=sqrt(5)): U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    arr = _np_rng(key).uniform(-bound, bound, shape)
    return jnp.asarray(arr, dtype)


def bias_uniform(key: jax.Array, shape: tuple[int, ...], fan_in: int,
                 dtype=jnp.float32) -> jax.Array:
    """torch Linear/Conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    arr = _np_rng(key).uniform(-bound, bound, shape)
    return jnp.asarray(arr, dtype)


def normalized_normal(key: jax.Array, shape: tuple[int, ...],
                      eps: float = 1e-12, dtype=jnp.float32) -> jax.Array:
    """Unit-norm Gaussian vector (torch spectral_norm u/v init)."""
    v = _np_rng(key).standard_normal(shape)
    return jnp.asarray(v / (np.linalg.norm(v) + eps), dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
