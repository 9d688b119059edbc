"""On-chip A/B of the bf16 vs int8 (w8a8 dynamic) serving path.

Runs the flagship Predictor at several batch sizes on the real TPU and
prints one JSON line per (batch, mode) with img/s/chip and p50. The int8
path halves weight HBM traffic and doubles the MXU rate; whether it wins
depends on whether the shapes are weight-bound (small batch) or
activation/compute-bound (large batch).
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


def measure(p, batch: int, warmup: int = 3, iters: int = 20):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch, 256, 256, 3),
                                    dtype=np.uint8))
    out, _ = p._predict(p.params, p.sn_state, imgs)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        out, _ = p._predict(p.params, p.sn_state, imgs)
    jax.block_until_ready(out)
    chain = 5
    times = []
    for _ in range(max(1, iters // chain)):
        t0 = time.perf_counter()
        for _ in range(chain):
            out, _ = p._predict(p.params, p.sn_state, imgs)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / chain)
    p50 = float(np.percentile(times, 50))
    if not np.all(np.isfinite(np.asarray(out, dtype=np.float32))):
        raise RuntimeError("non-finite logits")
    return batch / p50, p50, np.asarray(out, dtype=np.float32)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="imagenet-cls-224")
    ap.add_argument("--batches", default="8,32,128")
    ap.add_argument("--quantize", default="int8",
                    choices=["int8", "int8-wo"],
                    help="quantized mode to A/B against bf16")
    args = ap.parse_args()

    p_f = Predictor.fresh(args.config, seed=0)
    p_q = Predictor.fresh(args.config, seed=0, quantize=args.quantize)
    for b in [int(x) for x in args.batches.split(",")]:
        ips_f, p50_f, out_f = measure(p_f, b)
        ips_q, p50_q, out_q = measure(p_q, b)
        rel = float(np.linalg.norm(out_q - out_f) /
                    max(np.linalg.norm(out_f), 1e-9))
        agree = float((out_f.argmax(-1) == out_q.argmax(-1)).mean())
        print(json.dumps({
            "batch": b,
            "bf16_img_s": round(ips_f, 1), "bf16_p50_ms": round(p50_f * 1e3, 2),
            "int8_img_s": round(ips_q, 1), "int8_p50_ms": round(p50_q * 1e3, 2),
            "speedup": round(ips_q / ips_f, 3),
            "logit_rel_err": round(rel, 4), "top1_agree": round(agree, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
