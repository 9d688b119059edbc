"""Ad-hoc: conv-residual fused kernel vs the XLA chain at each stage shape,
fwd and fwd+bwd, sweeping batch tiles. Bypasses the production gate
(supported() returns False) by calling _make_fused directly."""

from __future__ import annotations

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

from calm_vit_dte_tpu.kernels import conv_residual as cr  # noqa: E402


def xla_chain(x, w1, b1, wd, bd, w2, b2, dtype):
    xc = x.astype(dtype)
    a1 = jnp.einsum("bhwc,oc->bhwo", xc, w1.astype(dtype)) + b1
    h = jax.nn.gelu(a1, approximate=False).astype(dtype)
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(h, dtype=jnp.float32)
    s = x.shape[1]
    for a in range(3):
        for b in range(3):
            acc = acc + hp[:, a:a + s, b:b + s, :].astype(jnp.float32) * wd[a, b]
    d = jax.nn.gelu(acc + bd, approximate=False).astype(dtype)
    return jnp.einsum("bhwo,co->bhwc", d, w2.astype(dtype)) + b2


def run(b, s, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s, s, 3)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((32, 3)) * 0.2, jnp.float32)
    b1 = jnp.zeros((32,))
    wd = jnp.asarray(rng.standard_normal((3, 3, 32)) * 0.2, jnp.float32)
    bd = jnp.zeros((32,))
    w2 = jnp.asarray(rng.standard_normal((3, 32)) * 0.2, jnp.float32)
    b2 = jnp.zeros((3,))
    args = (x, w1, b1, wd, bd, w2, b2)

    def bench_pair(f, label):
        def fwd_step(a):
            o = f(*a)
            return (a[0] + o.astype(a[0].dtype) * 1e-30,) + a[1:]

        t_f = time_chained(fwd_step, args)

        def loss(*a):
            o = f(*a)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        gfn = jax.grad(loss, argnums=tuple(range(7)))

        def bwd_step(a):
            g = gfn(*a)
            return tuple(x + gi.astype(x.dtype) * 1e-30
                         for x, gi in zip(a, g))

        t_g = time_chained(bwd_step, args)
        print(f"B={b} S={s} {label}: fwd {t_f*1e3:7.2f} ms  "
              f"fwd+bwd {t_g*1e3:7.2f} ms", flush=True)

    def xla_fn(*a):
        return xla_chain(*a, dtype=dtype)

    bench_pair(xla_fn, "   xla")

    bt_f = bt_b = 1

    def f_fn(*a):
        return cr.fused_conv_residual(*a, dtype=dtype)

    try:
        ref = jax.jit(xla_fn)(*args)
        got = jax.jit(f_fn)(*args)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)
        bench_pair(f_fn, f"fused(bt={bt_f}/{bt_b})")
    except Exception as e:
        print(f"B={b} S={s} fused: FAILED "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    import sys as _s
    stages = [int(v) for v in _s.argv[1:]] or [224, 176, 128, 80]
    for s in stages:
        run(128, s)
