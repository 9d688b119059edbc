"""The distributed training driver.

Replaces the reference's L2-L4 stack (Spark driver + TorchDistributor +
per-rank DDP train() + Kubernetes file-on-NFS coordination; SURVEY.md s1,
s3.1) with one function: jax.distributed.initialize for multi-host, a
(data, model) mesh, a single jitted train step with donated state, and
Orbax checkpoints. The same code is the solo-job AND the master+slaves
workflow — multi-host is just more processes running it.

Workload parity:
  * per-epoch sampler reshuffle with seed 2006 (DistributedSampler equiv);
  * bf16 compute, AdamW(3.1e-3, wd 0.02, betas .9/.98), clip 1.0,
    per-epoch cosine to 1e-6;
  * chief-only logging every 100 steps, per-epoch checkpoints;
  * reg task dumps sigmoid'd sample PNGs each epoch;
  * optional warm start from a reference .pth.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp


from calm_vit_dte_tpu.data.loader import (
    BatchLoader,
    ImageFolderDataset,
    SyntheticDataset,
)
from calm_vit_dte_tpu.data.pipeline import (
    make_cls_preprocess,
    make_reg_preprocess,
)
from calm_vit_dte_tpu.data.sampler import ShardedSampler
from calm_vit_dte_tpu.models.vit import vit_init
from calm_vit_dte_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated_sharding,
    state_shardings,
)
from calm_vit_dte_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    warm_start_params,
)
from calm_vit_dte_tpu.train.optim import make_optimizer
from calm_vit_dte_tpu.train.samples import save_samples
from calm_vit_dte_tpu.train.state import TrainState, create_train_state
from calm_vit_dte_tpu.train.step import make_train_step
from calm_vit_dte_tpu.utils.configs import TrainConfig
from calm_vit_dte_tpu.utils.logging import MetricLogger, is_chief


def _multihost_env_detected() -> bool:
    """True when the process is part of a multi-host launch that needs
    jax.distributed.initialize(): an explicit coordinator, a Cloud TPU pod
    slice (the TPU runtime sets worker-topology vars), GKE JobSet, or a
    multislice (MEGASCALE) deployment."""
    env = os.environ
    if env.get("COORDINATOR_ADDRESS") or env.get("JAX_COORDINATOR_ADDRESS"):
        return True
    if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    # Cloud TPU pod slice: the runtime publishes the worker list; >1 entry
    # means this chip set spans hosts (reference bar: the Spark master+slaves
    # rendezvous in Deployments/master-job.yaml:99-150 ran multi-node).
    hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hostnames.split(",") if h]) > 1:
        return True
    return False


def maybe_init_distributed() -> None:
    """Multi-host init: auto-detects Cloud TPU pod slices / GKE JobSet /
    multislice environments in addition to an explicit COORDINATOR_ADDRESS
    (jax.distributed.initialize() fills in coordinator/rank from the TPU
    metadata once we know we're multi-host). Single-process otherwise."""
    if jax.process_count() > 1:
        return  # already initialized
    if _multihost_env_detected():
        try:
            jax.distributed.initialize()
        except Exception as e:
            if is_chief():
                print(f"multi-host detected but jax.distributed.initialize "
                      f"failed ({e}); continuing single-process", flush=True)


def _ensure_compilation_cache() -> None:
    """Enable the persistent compilation cache if nothing configured it.

    `jit_step.lower(...).compile()` does NOT populate the jit dispatch
    cache on this JAX, so without a disk cache each process would compile
    the step a second time after the barrier — re-introducing the compile
    skew the barrier exists to fix (and doubling startup)."""
    if jax.config.jax_compilation_cache_dir:
        return
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/calm_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older JAX without the flag: AOT reuse below still covers it


def _compile_barrier(jit_step, state, batch):
    """Multi-host: compile the train step BEFORE executing it, then hold
    every process at a coordination-service barrier. Returns the
    AOT-compiled executable (or None single-host) so the caller can run it
    directly instead of re-dispatching — and re-compiling — through jit.

    The first execution of a sharded program creates its cross-process
    collective context, whose address key-exchange has a hard ~30s
    timeout; per-process compile-time skew (cold caches, different host
    speeds) routinely exceeds that, killing the job with
    "collectives context initialization failed: GetKeyValue() timed out"
    before the first step ever runs. Compiling ahead of time and syncing
    on the long-timeout coordination-service barrier — NOT on a
    collective, which would have the same 30s problem — makes all
    processes enter the first collective together."""
    if jax.process_count() <= 1:
        return None
    compiled = jit_step.lower(state, batch).compile()
    try:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "calm_step_compile", timeout_in_ms=1_800_000)
    except Exception:  # no coordination client: fall back to a collective
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("calm_step_compile")
    return compiled


def build_dataset(cfg: TrainConfig, split: str = "train"):
    if cfg.dataset_root == "synthetic" or not os.path.isdir(cfg.dataset_root):
        if cfg.dataset_root != "synthetic" and is_chief():
            print(f"dataset root {cfg.dataset_root} not found; "
                  "falling back to synthetic data", flush=True)
        return SyntheticDataset(n=max(4 * cfg.global_batch_size, 1024),
                                num_classes=cfg.model.out_features
                                if cfg.task == "cls" else 1000,
                                size=cfg.image_size)
    return ImageFolderDataset(cfg.dataset_root, split=split,
                              size=cfg.image_size)


def train(cfg: TrainConfig, max_steps: int | None = None,
          mesh=None) -> TrainState:
    maybe_init_distributed()
    _ensure_compilation_cache()
    mesh = mesh if mesh is not None else make_mesh(model=cfg.mesh_model)
    tp = mesh.shape.get("model", 1) > 1
    repl = replicated_sharding(mesh)
    data_sh = batch_sharding(mesh)

    dataset = build_dataset(cfg)
    per_host_batch = cfg.global_batch_size // jax.process_count()
    sampler = ShardedSampler(len(dataset), jax.process_count(),
                             jax.process_index(), seed=cfg.sampler_seed)
    loader = BatchLoader(dataset, sampler, per_host_batch,
                         num_workers=cfg.num_workers)
    steps_per_epoch = max(1, loader.steps_per_epoch())

    init_key = jax.random.PRNGKey(cfg.init_seed)
    params, sn_state = vit_init(cfg.model, init_key)
    if cfg.warm_start:
        try:
            params, sn_state = warm_start_params(cfg.warm_start, params,
                                                 sn_state)
            if is_chief():
                print(f"warm-started from {cfg.warm_start}", flush=True)
        except Exception as e:  # reference try/except warm start
            if is_chief():
                print(f"no warm start ({e}); training fresh", flush=True)

    # Under tensor parallelism the flat fused optimizer cannot carry
    # per-param shardings — use the unflattened chain so AdamW moments
    # shard identically to their params (parallel/mesh.py).
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.beta1, cfg.beta2,
                        cfg.epochs, steps_per_epoch, cfg.clip_norm,
                        cfg.eta_min, flatten=not tp, schedule=cfg.schedule,
                        lr_step_size=cfg.lr_step_size,
                        lr_gamma=cfg.lr_gamma,
                        decoupled_wd=cfg.decoupled_wd)
    state = create_train_state(params, sn_state, tx,
                               jax.random.PRNGKey(cfg.init_seed + 1))
    if tp:
        p_sh = param_shardings(mesh, state.params,
                               min_shard_dim=cfg.tp_min_shard_dim)
        state_sh = state_shardings(mesh, state, p_sh, tx)
    else:
        state_sh = repl
    state = jax.device_put(state, state_sh)

    restored = restore_checkpoint(cfg.checkpoint_dir, state)
    if restored is not None:
        state = restored
        if is_chief():
            print(f"resumed from step {int(state.step)}", flush=True)

    preprocess = (make_cls_preprocess(cfg.model.out_features, cfg.crop)
                  if cfg.task == "cls" else make_reg_preprocess(cfg.crop))
    step_fn = make_train_step(cfg.model, tx, cfg.task,
                              dtype=jnp.bfloat16, remat=cfg.remat,
                              preprocess=preprocess,
                              microbatches=cfg.microbatch)
    jit_step = jax.jit(step_fn, donate_argnums=0,
                       out_shardings=(state_sh, repl))

    # Preemption handling: checkpoint on SIGTERM, then exit cleanly — the
    # reference had restartPolicy:Never + fail-fast barrier scheduling and
    # lost optimizer/schedule state on any interruption (SURVEY.md s5).
    import signal

    stop_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        stop_requested["flag"] = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not in main thread

    logger = MetricLogger(cfg.log_every)
    start_epoch = int(state.step) // steps_per_epoch
    total = 0
    t_start = time.time()
    last_batch = None
    for epoch in range(start_epoch, cfg.epochs):
        sampler.set_epoch(epoch)
        epoch_t0 = time.time()
        epoch_tick0 = len(logger.step_times)
        # Device prefetch: the NEXT batch transfers to HBM while the current
        # step executes (jit dispatch is async), hiding host->device latency
        # behind compute.
        def to_device(host_batch):
            return {k: jax.make_array_from_process_local_data(data_sh, v)
                    for k, v in host_batch.items()}

        it = iter(loader)
        try:
            batch = to_device(next(it))
        except StopIteration:
            batch = None
        if epoch == start_epoch and batch is not None:
            compiled = _compile_barrier(jit_step, state, batch)
            if compiled is not None:
                # Run the AOT executable directly: shapes/shardings are
                # loop-invariant, and this skips the post-barrier second
                # compile entirely.
                jit_step = compiled
        i = 0
        metrics = None
        while batch is not None:
            state, metrics = jit_step(state, batch)
            last_batch = batch
            try:
                batch = to_device(next(it))  # overlaps with the async step
            except StopIteration:
                batch = None
            logger.tick()
            logger.log(epoch, i, metrics)
            i += 1
            total += 1
            if stop_requested["flag"]:
                # Orbax save is a cross-process collective (global sync
                # barriers): EVERY process must enter it — a chief-only save
                # would hang multi-host. Only the print is chief-gated.
                save_checkpoint(cfg.checkpoint_dir, state)
                if is_chief():
                    print(f"SIGTERM: checkpointed at step {int(state.step)}; "
                          "exiting", flush=True)
                return state
            if max_steps is not None and total >= max_steps:
                break
        save_checkpoint(cfg.checkpoint_dir, state)  # collective: all procs
        if is_chief():
            print(f"checkpoint saved at step {int(state.step)}", flush=True)
            if cfg.epoch_stats_path:
                _write_epoch_stats(cfg, logger, epoch, i, epoch_t0,
                                   epoch_tick0, metrics)
            if cfg.task == "reg" and cfg.save_samples_dir and \
                    last_batch is not None:
                _dump_samples(cfg, state, last_batch)
        if max_steps is not None and total >= max_steps:
            break
    if is_chief():
        p50 = logger.p50_step_time()
        print(f"Time taken: {time.time() - t_start:.1f}s, "
              f"p50 step: {p50 if p50 else float('nan'):.4f}s", flush=True)
    return state


def _write_epoch_stats(cfg: TrainConfig, logger, epoch: int, steps: int,
                       epoch_t0: float, epoch_tick0: int, metrics) -> None:
    """One JSONL line per epoch boundary: timing, throughput, RSS — the
    long-running-process evidence the endurance soak records (the reference's
    implicit equivalent: 65 epochs of rank-0 prints + a saved model;
    distributed_trainer_cls.py:103-107)."""
    import json
    import resource

    import numpy as np

    wall = time.time() - epoch_t0
    times = logger.step_times[epoch_tick0:]
    p50 = float(np.percentile(times, 50)) if times else None
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    row = {
        "epoch": epoch,
        "steps": steps,
        "wall_s": round(wall, 2),
        "p50_step_s": round(p50, 4) if p50 is not None else None,
        "steps_per_s": round(steps / wall, 4) if wall > 0 else None,
        "img_per_s": round(steps * cfg.global_batch_size / wall, 1)
        if wall > 0 else None,
        "rss_mb": round(rss_mb, 1),
        "loss": float(metrics["loss"]) if metrics else None,
        "ts": time.time(),
    }
    with open(cfg.epoch_stats_path, "a") as f:
        f.write(json.dumps(row) + "\n")


def _dump_samples(cfg: TrainConfig, state: TrainState, batch) -> None:
    from calm_vit_dte_tpu.data.pipeline import make_reg_preprocess
    from calm_vit_dte_tpu.models.vit import vit_apply
    from calm_vit_dte_tpu.nn.spectral_norm import (
        normalize_tree,
        prenormalized_scope,
    )

    pre = make_reg_preprocess(cfg.crop)
    proc = jax.jit(lambda b: pre(jax.random.PRNGKey(0), b))(batch)

    def fwd(p, s, x):
        # Same weight path as the eval step and serve.Predictor: spectral-
        # normalize first, then run with pre-normalized weights — dumped
        # samples come from exactly the function being evaluated.
        norm_params, _ = normalize_tree(p, s, training=False)
        with prenormalized_scope():
            tokens, _, _ = vit_apply(cfg.model, norm_params, s, x,
                                     training=False, dtype=jnp.bfloat16)
        return tokens

    tokens = jax.jit(fwd)(state.params, state.sn_state, proc["image"])
    save_samples(tokens, cfg.save_samples_dir)
