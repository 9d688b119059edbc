"""Ad-hoc ablation of the conv-residual BACKWARD kernel cost at S=224:
time pallas_call variants with sections disabled to attribute the ms.
Throwaway profiling tool; not part of the test suite."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from calm_vit_dte_tpu.kernels import conv_residual as cr  # noqa: E402

HIDDEN = cr.HIDDEN
B, S = 128, 224
RS, NP, NPW = cr._geom(S)
CD = jnp.bfloat16


def bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w1t_ref, wdv_ref, w2t_ref,
               mask_ref, dx_ref, wg_ref, h_ref, hm_ref, hp_ref, dacc_ref,
               dacct_ref, *, parts: frozenset):
    rs, np_, npw = RS, NP, NPW

    @pl.when(pl.program_id(0) == 0)
    def _():
        wg_ref[:] = jnp.zeros_like(wg_ref)

    mask = mask_ref[:]
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)

    a1 = cr._conv1(x, w1_ref, b1_ref)
    if "recompute" in parts:
        cr._fill_bordered(h_ref, (cr._gelu(a1, CD) * mask).astype(CD),
                          rs, np_)
        hm, hp = cr._col_shifts(h_ref, npw)
        hm_ref[:] = hm
        hp_ref[:] = hp
        acc = cr._nine_taps(h_ref, hm_ref, hp_ref, wdv_ref, wdv_ref[:, 9:10],
                            rs, np_, flip=False)
        g2 = cr._gelu(acc, CD) * mask
    else:
        cr._fill_bordered(h_ref, (a1 * mask).astype(CD), rs, np_)
        hm_ref[:] = h_ref[:].astype(jnp.float32)
        hp_ref[:] = h_ref[:].astype(jnp.float32)
        acc = a1
        g2 = a1 * mask

    dg2 = cr._dot(w2t_ref[:], g)
    eye = cr._eye()
    if "dgelu2" in parts:
        dacc = dg2 * cr._dgelu(acc, CD) * mask
    else:
        dacc = dg2 * mask

    ones_col = jnp.ones((np_, 1), jnp.float32)
    if "trans" in parts:
        dacct_ref[:] = dacc.T
    else:
        dacct_ref[:, :] = jnp.zeros_like(dacct_ref)
    dacct = dacct_ref[:]
    if "wdots" in parts:
        wg_ref[:, 14:17] += cr._dot(g2.astype(jnp.float32), g.T)
        wg_ref[:, 9:10] += cr._dot(dacc, ones_col)
        o = rs
        for a in range(3):
            roff = (a - 1) * rs
            for b_, ref in ((0, hm_ref), (1, h_ref), (2, hp_ref)):
                m32 = cr._dot(
                    ref[:, o + roff:o + roff + np_].astype(jnp.float32),
                    dacct)
                wg_ref[:, a * 3 + b_:a * 3 + b_ + 1] += jnp.sum(
                    m32 * eye, axis=1, keepdims=True)

    if "dh" in parts:
        cr._fill_bordered(dacc_ref, dacc, rs, np_)
        dm, dp = cr._col_shifts(dacc_ref, npw)
        hm_ref[:] = dm
        hp_ref[:] = dp
        dh = cr._nine_taps(dacc_ref, hm_ref, hp_ref, wdv_ref,
                           jnp.zeros((HIDDEN, 1), jnp.float32), rs, np_,
                           flip=True)
    else:
        dh = dacc

    if "dgelu1" in parts:
        da1 = dh * cr._dgelu(a1, CD) * mask
    else:
        da1 = dh * mask
    if "wdots" in parts:
        wg_ref[:, 13:14] += cr._dot(da1, ones_col)
        wg_ref[:, 10:13] += cr._dot(da1, x.T)
    dx_ref[0] = cr._dot(w1t_ref[:], da1).astype(CD)


def make_call(parts: frozenset):
    img = pl.BlockSpec((1, 3, NP), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    h_scr = pltpu.VMEM((HIDDEN, NPW), CD)
    f_scr = pltpu.VMEM((HIDDEN, NPW), jnp.float32)
    return pl.pallas_call(
        functools.partial(bwd_kernel, parts=parts),
        grid=(B,),
        in_specs=[img, img, const((HIDDEN, 3)), const((HIDDEN, 1)),
                  const((3, HIDDEN)), const((HIDDEN, 10)),
                  const((HIDDEN, 3)), const((1, NP))],
        out_specs=(img, const((HIDDEN, 24))),
        out_shape=(jax.ShapeDtypeStruct((B, 3, NP), CD),
                   jax.ShapeDtypeStruct((HIDDEN, 24), jnp.float32)),
        scratch_shapes=[h_scr, f_scr, f_scr, f_scr,
                        pltpu.VMEM((NP, HIDDEN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=cr._VMEM_LIMIT))


def main():
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((B, 3, NP)) * 0.5, CD)
    gp = jnp.asarray(rng.standard_normal((B, 3, NP)) * 0.5, CD)
    w1 = jnp.asarray(rng.standard_normal((HIDDEN, 3)) * 0.2, jnp.float32)
    b1 = jnp.zeros((HIDDEN, 1), jnp.float32)
    wdv = jnp.asarray(rng.standard_normal((HIDDEN, 10)) * 0.2, jnp.float32)
    w2t = jnp.asarray(rng.standard_normal((3, HIDDEN)).T * 0.2,
                      jnp.float32)
    mask = jnp.ones((1, NP), jnp.float32)
    args = (xp, gp, w1, b1, w1.T, wdv, w2t.astype(jnp.float32), mask)

    all_parts = ("recompute", "dgelu2", "trans", "wdots", "dh", "dgelu1")
    variants = [frozenset(all_parts)]
    for drop in all_parts:
        variants.append(frozenset(p for p in all_parts if p != drop))

    for parts in variants:
        raw = make_call(parts)

        def chained(xp, gp, *rest):
            dx, wg = raw(xp, gp, *rest)
            return raw(xp, dx, *rest)

        call = jax.jit(chained)
        try:
            out = call(*args)
            s0 = float(out[0].astype(jnp.float32).sum())
            n, t0 = 10, time.perf_counter()
            for _ in range(n):
                out = call(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n / 2 * 1e3
            missing = set(all_parts) - parts
            label = f"-{','.join(sorted(missing))}" if missing else "FULL"
            print(f"{label:<24} {dt:7.2f} ms  (sum {s0:.3e})", flush=True)
        except Exception as e:
            print(f"{sorted(parts)}: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
