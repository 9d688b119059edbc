"""hires-cls-1024 single-chip TRAINING attempt (VERDICT r4 item 4).

BASELINE.json configs[4] is the one config that had never trained on real
hardware: round 3 measured the 935.57M-param model's fp32 master + fp32
Adam moments at ~11 GB — bs=2 OOM'd a 16 GB v5e chip and bs<=1 graphs
crash the axon remote-compile helper (NOTES.md). Round 5 added the memory
mode this script exercises: the fused-flat AdamW with
moment_dtype=bfloat16 (bf16 mu/nu storage, fp32 update math —
train/optim.py), which returns ~3.7 GB of HBM.

The script prints the full byte accounting first (so an OOM still leaves
the committed impossibility arithmetic), then tries the real production
train step (bf16 compute, remat, cls preprocess) at --batch (default 2,
the smallest size the remote-compile helper accepts) with a resident
synthetic batch, and records img/s + device memory stats to
docs/evidence/hires_train.json.

Usage: python scripts/bench_hires_train.py [--batch 2] [--steps 5]
       [--microbatch 1] [--moment-dtype bf16|fp32]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EVIDENCE = REPO / "docs" / "evidence"


def accounting(n_params: int, batch: int, moment_bytes: int) -> dict:
    gb = 1 << 30
    acct = {
        "n_params": n_params,
        "master_fp32_gb": round(4 * n_params / gb, 2),
        "adam_moments_gb": round(2 * moment_bytes * n_params / gb, 2),
        "bf16_param_copy_gb": round(2 * n_params / gb, 2),
        "grads_fp32_gb": round(4 * n_params / gb, 2),
    }
    acct["states_total_gb"] = round(
        acct["master_fp32_gb"] + acct["adam_moments_gb"]
        + acct["bf16_param_copy_gb"] + acct["grads_fp32_gb"], 2)
    return acct


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--microbatch", type=int, default=1)
    ap.add_argument("--moment-dtype", default="bf16",
                    choices=["bf16", "fp32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from calm_vit_dte_tpu.data.pipeline import make_cls_preprocess
    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.train.optim import make_optimizer
    from calm_vit_dte_tpu.train.state import create_train_state
    from calm_vit_dte_tpu.train.step import make_train_step
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = get_config("hires-cls-1024")
    mdt = jnp.bfloat16 if args.moment_dtype == "bf16" else jnp.float32
    params, sn_state = vit_init(cfg.model, jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    acct = accounting(n_params, args.batch,
                      2 if mdt == jnp.bfloat16 else 4)
    print("byte accounting (16 GB v5e chip):",
          json.dumps(acct, indent=1), flush=True)

    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.beta1, cfg.beta2,
                        epochs=cfg.epochs, steps_per_epoch=100,
                        flatten=True, moment_dtype=mdt)
    state = create_train_state(params, sn_state, tx,
                               jax.random.PRNGKey(1))
    del params
    step_fn = make_train_step(
        cfg.model, tx, cfg.task, dtype=jnp.bfloat16, remat=True,
        preprocess=make_cls_preprocess(cfg.model.out_features, cfg.crop),
        microbatches=args.microbatch)
    jit_step = jax.jit(step_fn, donate_argnums=0)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.integers(
            0, 256, (args.batch, cfg.image_size, cfg.image_size, 3),
            dtype=np.uint8)),
        "label": jnp.asarray(rng.integers(
            0, cfg.model.out_features, (args.batch,), dtype=np.int32)),
    }

    summary = {"config": "hires-cls-1024", "batch": args.batch,
               "microbatch": args.microbatch,
               "moment_dtype": args.moment_dtype,
               "accounting": acct, "ts": time.time()}
    try:
        t0 = time.time()
        state, m = jit_step(state, batch)
        loss = float(m["loss"])
        compile_s = time.time() - t0
        print(f"step 1 ok: loss={loss:.4f} "
              f"(compile+step {compile_s:.1f}s)", flush=True)
        times = []
        for i in range(args.steps - 1):
            t0 = time.time()
            state, m = jit_step(state, batch)
            jax.block_until_ready(m["loss"])
            times.append(time.time() - t0)
            print(f"step {i + 2}: loss={float(m['loss']):.4f} "
                  f"{times[-1] * 1e3:.0f} ms", flush=True)
        p50 = sorted(times)[len(times) // 2] if times else None
        summary.update(
            status="trained",
            loss_last=float(m["loss"]),
            compile_plus_first_step_s=round(compile_s, 1),
            p50_step_s=round(p50, 3) if p50 else None,
            img_per_s=round(args.batch / p50, 2) if p50 else None)
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
            summary["hbm_peak_gb"] = round(
                ms.get("peak_bytes_in_use", 0) / (1 << 30), 2)
            summary["hbm_limit_gb"] = round(
                ms.get("bytes_limit", 0) / (1 << 30), 2)
        except Exception as e:
            summary["memory_stats"] = f"unavailable: {e}"
    except Exception as e:
        summary.update(status="failed",
                       error=f"{type(e).__name__}: {str(e)[:2000]}")
        print(f"FAILED: {type(e).__name__}: {e}", flush=True)

    EVIDENCE.mkdir(parents=True, exist_ok=True)
    (EVIDENCE / "hires_train.json").write_text(
        json.dumps(summary, indent=1) + "\n")
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "accounting"}, indent=1))


if __name__ == "__main__":
    main()
