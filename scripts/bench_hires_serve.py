"""hires-cls-1024 single-chip serving probe.

The 935.57M-param hires config cannot TRAIN on one v5e chip (fp32 master +
Adam moments ~11 GB + activations OOM, NOTES.md) — but EVAL carries no
optimizer state: bf16 weights are ~1.9 GB and int8 ~0.94 GB, so 1024px
inference should fit a single 16 GB chip. This probes it and, if it runs,
reports img/s/chip for bf16 and w8a8-int8 serving.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from calm_vit_dte_tpu.serve import Predictor


def measure(p, batch: int, warmup: int = 2, chains: int = 3, chain: int = 3):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch, 1168, 1168, 3),
                                    dtype=np.uint8))
    out, _ = p._predict(p.params, p.sn_state, imgs)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        out, _ = p._predict(p.params, p.sn_state, imgs)
    jax.block_until_ready(out)
    times = []
    for _ in range(chains):
        t0 = time.perf_counter()
        for _ in range(chain):
            out, _ = p._predict(p.params, p.sn_state, imgs)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / chain)
    p50 = float(np.percentile(times, 50))
    ok = bool(np.all(np.isfinite(np.asarray(out, dtype=np.float32))))
    return batch / p50, p50, ok


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--modes", default="bf16,int8,int8-wo")
    args = ap.parse_args()

    for mode in args.modes.split(","):
        q = None if mode == "bf16" else mode
        try:
            p = Predictor.fresh("hires-cls-1024", seed=0, quantize=q)
            ips, p50, ok = measure(p, args.batch)
            print(json.dumps({"mode": mode, "batch": args.batch,
                              "img_s_chip": round(ips, 2),
                              "p50_ms": round(p50 * 1e3, 1),
                              "finite": ok}), flush=True)
            del p
        except Exception as e:  # noqa: BLE001 — probe reports, not crashes
            print(json.dumps({"mode": mode, "batch": args.batch,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
