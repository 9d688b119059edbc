"""Subprocess entry for the SIGTERM-preemption trainer test.

Runs the production trainer on the tiny config with synthetic data and
frequent logging; the parent test sends SIGTERM mid-training and expects
a clean checkpoint-and-exit (trainer.py's preemption path).

Usage: python tests/_sigterm_trainer_main.py <ckpt_dir> [resume]
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
    ckpt_dir = sys.argv[1]
    resume_only = len(sys.argv) > 2 and sys.argv[2] == "resume"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from calm_vit_dte_tpu.train.trainer import train
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = get_config(
        "tiny-cls",
        dataset_root="synthetic",
        global_batch_size=8,
        checkpoint_dir=ckpt_dir,
        num_workers=0,
        log_every=1,
        epochs=50,  # long enough that SIGTERM always lands mid-training
    )
    state = train(cfg, max_steps=3 if resume_only else None)
    print(f"TRAIN_RETURNED step={int(state.step)}", flush=True)


if __name__ == "__main__":
    main()
