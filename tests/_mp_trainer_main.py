"""Subprocess entry for the 2-process jax.distributed integration test.

Each process: initialize jax.distributed (CPU, 2 virtual local devices),
then run the REAL trainer (calm_vit_dte_tpu.train.trainer.train) on the
tiny config with synthetic data for a few steps. Exercises end-to-end:
multi-host init, ShardedSampler per-process sharding, BatchLoader,
make_array_from_process_local_data global-batch assembly, the jitted
sharded step, and the every-process-collective Orbax checkpoint save.

Usage: python tests/_mp_trainer_main.py <coordinator_port> <process_id> \
           <num_processes> <ckpt_dir>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=2")
os.environ["XLA_FLAGS"] = " ".join(flags)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    port, pid, nproc, ckpt_dir = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2

    # Establish the all-devices gloo communicator NOW, while both processes
    # are in lockstep: the context-creation key exchange has a hard 30s
    # timeout, and the first train-step collective would otherwise hit it
    # whenever per-process jit-compile times diverge by more than that
    # (observed: minutes of skew with a cold compilation cache). The
    # communicator is cached per device clique, so later collectives reuse
    # this one.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("gloo-warmup")

    import numpy as np

    from calm_vit_dte_tpu.data.sampler import ShardedSampler
    from calm_vit_dte_tpu.train.trainer import train
    from calm_vit_dte_tpu.utils.configs import get_config

    # Print this process's first sampler indices so the parent can assert
    # the per-process shards are disjoint.
    sampler = ShardedSampler(64, nproc, pid, seed=2006)
    sampler.set_epoch(0)
    idxs = [int(i) for i in list(sampler)[:8]]
    print(f"SHARD {pid}: {idxs}", flush=True)

    cfg = get_config(
        "tiny-cls",
        dataset_root="synthetic",
        global_batch_size=8,
        checkpoint_dir=ckpt_dir,
        num_workers=0,
    )
    state = train(cfg, max_steps=2)
    psum = float(sum(np.abs(np.asarray(jax.device_get(x))).sum()
                     for x in jax.tree.leaves(state.params)))
    print(f"RESULT {pid}: step={int(state.step)} params_sum={psum:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
