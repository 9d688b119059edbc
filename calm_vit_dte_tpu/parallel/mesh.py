"""Device mesh and sharding layout.

Replaces the reference's entire distributed stack — Spark standalone cluster
+ TorchDistributor process launch + NCCL DDP gradient all-reduce (reference:
distributed_trainer_cls.py:46,55,120-121,159) — with a jax.sharding.Mesh and
GSPMD: the train step is jit-compiled over the mesh, XLA inserts the gradient
all-reduce (riding ICI within a slice, DCN across slices), and no user-level
communication code exists at all.

Axes:
  data   — batch sharding (the reference's only strategy: 4-rank DDP);
  model  — tensor-parallel sharding of the wide linears' output axis
           (a natural extension the reference lacks; size 1 by default).

Multi-host: call jax.distributed.initialize() (one process per host) before
make_mesh; jax.devices() then spans the full slice and the same code runs
unchanged — this is the 'retire the Spark cluster' equivalence (SURVEY.md
s2e).
"""

from __future__ import annotations

import jax

from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = mesh_utils.create_device_mesh((data, model),
                                              devices=devices)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: tuple, leaf, min_shard_dim: int = 512):
    """Tensor-parallel rule: shard the output axis of large matrices over
    'model'; everything else (biases, norms, power-iteration vectors, small
    weights) replicates. With model=1 this degenerates to full replication."""
    name = path[-1] if path else ""
    if name == "w" and leaf.ndim >= 2 and leaf.shape[0] >= min_shard_dim:
        return P("model", *([None] * (leaf.ndim - 1)))
    return P()


def param_shardings(mesh: Mesh, params, min_shard_dim: int = 512):
    """NamedSharding pytree for a param tree under the TP rule."""

    def spec(path, leaf):
        keys = tuple(getattr(p, "key", getattr(p, "idx", None))
                     for p in path)
        return NamedSharding(mesh, _spec_for_param(keys, leaf,
                                                   min_shard_dim))

    return jax.tree_util.tree_map_with_path(spec, params)


def state_shardings(mesh: Mesh, state, p_sh, tx):
    """Sharding pytree for a full TrainState: params under `p_sh`, optimizer
    moments sharded IDENTICALLY to their params (so GSPMD never re-shards
    them per step), everything else replicated.

    The reference has no analog — DDP replicates the whole optimizer on
    every rank (distributed_trainer_cls.py:55,158); here the AdamW mu/nu
    follow the tensor-parallel layout of their weights.
    """
    import optax

    from calm_vit_dte_tpu.train.optim import FusedAdamWState

    repl = replicated_sharding(mesh)
    if isinstance(state.opt_state, FusedAdamWState):
        # The fused flat optimizer holds flat moment vectors that cannot
        # carry per-param shardings; replicate them (correct on a
        # data-parallel-only mesh — use flatten=False for TP).
        opt_sh = jax.tree.map(lambda _x: repl, state.opt_state)
    else:
        try:
            opt_sh = optax.tree_map_params(
                tx, lambda _p, sh: sh, state.opt_state, p_sh,
                transform_non_params=lambda _x: repl)
        except ValueError:
            opt_sh = jax.tree.map(lambda _x: repl, state.opt_state)
    return state.__class__(
        params=p_sh,
        sn_state=jax.tree.map(lambda _x: repl, state.sn_state),
        opt_state=opt_sh,
        step=repl,
        rng=repl,
    )


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def host_local_batch_size(global_batch_size: int) -> int:
    """Per-host slice of the global batch in multi-host runs."""
    return global_batch_size // jax.process_count()
