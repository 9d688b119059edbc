"""Projection-layout probes (VERDICT r3 items 1 & 9).

Measures, standalone on chip, alternative XLA formulations of the
projection + head-split (and merge + out-projection) chains that the
step budget attributes ~43.8 ms of dots + ~17.6 ms of transposes to
(NOTES.md "Roofline accounting"):

  split-baseline   y = x @ Wqkv^T; split; reshape; transpose -> (b,h,s,d)
  split-einsum     q/k/v = einsum('bsk,hdk->bhsd', x, W_h)  (one dot each,
                   head axis produced directly — no materialized transpose)
  merge-baseline   o = transpose(attn).reshape @ Wo^T
  merge-einsum     o = einsum('bhsd,ohd->bso', attn, Wo_h)  (merge + out
                   projection in ONE contraction over (h,d))

Each variant is timed fwd+bwd via the donated-chain harness
(scripts/_bench_util.time_chained — independent dispatches are elided /
round-trip-dominated on this remote runtime; primals are threaded with
their grads so every iteration depends on the last). Standalone wins
historically overstate in-step wins (r3 conv lesson), so a winning probe
graduates to an in-model env-flag A/B before adoption.

  python scripts/layout_probe.py [--batch 128] [--seq 224] [--dim 672]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parents[1]
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench_util import time_chained  # noqa: E402


def time_fwd_bwd(f, args, iters=10):
    """f(*args) -> scalar loss; times grad-of-f with primals threaded by
    their grads (shapes match, so the chain is exact)."""
    g = jax.grad(f, argnums=tuple(range(len(args))))

    def step(a):
        grads = g(*a)
        return tuple(x + 1e-6 * dx.astype(x.dtype)
                     for x, dx in zip(a, grads))

    return time_chained(step, tuple(args), iters=iters) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=224)
    ap.add_argument("--dim", type=int, default=672)
    ap.add_argument("--heads", type=int, default=12)
    args = ap.parse_args()
    b, s, dim, h = args.batch, args.seq, args.dim, args.heads
    d = dim // h

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s, dim)) * 0.3, jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((3 * dim, dim)) * 0.05,
                       jnp.bfloat16)
    attn = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.3,
                       jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((dim, dim)) * 0.05, jnp.bfloat16)

    # ---- projection + head split -------------------------------------
    def split_baseline(x, w):
        y = jnp.dot(x, w.T, preferred_element_type=jnp.bfloat16)
        qs = jnp.split(y, 3, axis=-1)
        return tuple(q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
                     for q in qs)

    def split_einsum(x, w):
        wh = w.reshape(3, h, d, dim)
        return tuple(
            jnp.einsum("bsk,hdk->bhsd", x, wh[i],
                       preferred_element_type=jnp.bfloat16)
            for i in range(3))

    def loss3(f):
        def g(x, w):
            q, k, v = f(x, w)
            return (jnp.sum(q.astype(jnp.float32) ** 2)
                    + jnp.sum(k.astype(jnp.float32) ** 2)
                    + jnp.sum(v.astype(jnp.float32) ** 2))
        return g

    for name, f in (("split-baseline", split_baseline),
                    ("split-einsum", split_einsum)):
        ms = time_fwd_bwd(loss3(f), (x, wqkv))
        print(f"{name:16s} fwd+bwd {ms:8.3f} ms", flush=True)

    # ---- head merge + out projection ---------------------------------
    def merge_baseline(a, w):
        y = a.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return jnp.dot(y, w.T, preferred_element_type=jnp.bfloat16)

    def merge_einsum(a, w):
        wh = w.reshape(dim, h, d)  # (out, h, d)
        return jnp.einsum("bhsd,ohd->bso", a, wh,
                          preferred_element_type=jnp.bfloat16)

    def loss1(f):
        def g(a, w):
            return jnp.sum(f(a, w).astype(jnp.float32) ** 2)
        return g

    for name, f in (("merge-baseline", merge_baseline),
                    ("merge-einsum", merge_einsum)):
        ms = time_fwd_bwd(loss1(f), (attn, wo))
        print(f"{name:16s} fwd+bwd {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
