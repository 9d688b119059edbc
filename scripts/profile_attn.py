"""Ad-hoc: old attention path (XLA rope+concat outside the kernel) vs the
rope-fused kernel, fwd and fwd+bwd, at flagship stage shapes."""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import time_chained

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def run(b, h, s, dc, dr, dtype=jnp.bfloat16):
    from calm_vit_dte_tpu.kernels.axial_attention import (
        fused_masked_attention, fused_rope_attention,
    )

    d = dc + dr
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.float32)

    qc, kc = mk(b, h, s, dc), mk(b, h, s, dc)
    qr, kr = mk(b, h, s, dr), mk(b, h, s, dr)
    v = mk(b, h, s, d)
    w1, b1 = mk(2 * s, s) * 0.1, jnp.zeros((2 * s,))
    w2, b2 = mk(s, 2 * s) * 0.1, jnp.zeros((s,))
    t = jnp.arange(s, dtype=jnp.float32)
    inv = 1.0 / (10.0 ** (jnp.arange(0, dr, 2, jnp.float32) / dr))
    fr = jnp.concatenate([jnp.outer(t, inv)] * 2, axis=-1)
    cq, sq = jnp.cos(fr), jnp.sin(fr)
    ck, sk = jnp.cos(1.1 * fr), jnp.sin(1.1 * fr)
    scale = 1.0 / math.sqrt(d)

    def rot(x, c, s_):
        half = x.shape[-1] // 2
        rh = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        xc = x.astype(dtype)
        return xc * c.astype(dtype) + rh.astype(dtype) * s_.astype(dtype)

    def old_path(qc, qr, kc, kr, v, cq, sq, ck, sk, w1, b1, w2, b2):
        q = jnp.concatenate([qc.astype(dtype), rot(qr, cq, sq)], -1)
        k = jnp.concatenate([kc.astype(dtype), rot(kr, ck, sk)], -1)
        return fused_masked_attention(q, k, v, w1, b1, w2, b2, scale=scale,
                                      dtype=dtype)

    def new_path(qc, qr, kc, kr, v, cq, sq, ck, sk, w1, b1, w2, b2):
        return fused_rope_attention(qc, qr, kc, kr, v, cq, sq, ck, sk,
                                    w1, b1, w2, b2, scale=scale, dtype=dtype)

    args = (qc, qr, kc, kr, v, cq, sq, ck, sk, w1, b1, w2, b2)
    for name, f in (("old", old_path), ("new", new_path)):
        def fwd_step(a, f=f):
            o = f(*a)
            v2 = a[4] + o.astype(a[4].dtype) * 1e-30  # dependency chain
            return a[:4] + (v2,) + a[5:]

        tf = time_chained(fwd_step, args)

        def loss(*a, f=f):
            o = f(*a)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        gfn = jax.grad(loss, argnums=tuple(range(13)))

        def bwd_step(a, gfn=gfn):
            g = gfn(*a)
            return tuple(x + gi.astype(x.dtype) * 1e-30
                         for x, gi in zip(a, g))

        tg = time_chained(bwd_step, args)
        print(f"  B={b} H={h} S={s} dc={dc} dr={dr} {name}: "
              f"fwd {tf*1e3:7.2f} ms   fwd+bwd {tg*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    run(128, 12, 224, 28, 28)   # stage-0 row/col self-attn shape
    run(128, 12, 80, 10, 10)    # bottleneck cross shape (slr=80, dim 240)
