"""Fused Pallas TPU kernel: the CALM block's conv residual.

Reference (Vi_Tools_CNN_less_V2.py:379-385): 1x1 conv (3->32) -> exact GELU
-> depthwise 3x3 (zero pad) -> exact GELU -> 1x1 conv (32->3), applied to
the image-shaped (B, S, S, 3) view of the row tokens, result added back.

In XLA this chain makes ~5 HBM round trips of the (B, S, S, 32) hidden
tensor per direction (at batch 128 / S 224 that tensor is 411 MB in bf16).
Fused, the hidden channels never leave the chip at all: HBM traffic is
exactly x in + y out (~150x less at S=224). FLOPs are trivial (tiny channel
counts) — the op is purely bandwidth-bound, so the win is the traffic
ratio.

Formulation: channels-leading (B, C, S, S) blocks, one batch element per
grid step, and a `fori_loop` over the 32 hidden channels whose body works
on 2D (S, S) planes with per-channel SCALAR weights read from SMEM. The
depthwise channel independence means h[c] is consumed the moment it is
produced — a1/h/a2/d exist only as loop-local 2D values, the output plane
is the loop carry, and the kernel needs NO VMEM scratch. Two earlier
layouts lost: channels-minor (NHWC) pads the 3/32-lane dim to 128 (42x/4x
VMEM inflation — batch tiles capped at 2, kernel lost to XLA end-to-end),
and 4D channels-leading broadcast/reduce ops (x[:, c:c+1] * w[None, :,
None, None], sum over (0,2,3)) crash this toolchain's Mosaic backend. 2D
planes + SMEM scalars + loop carries is the conservative subset that
compiles everywhere.

Backward recomputes the forward per channel (flash-style) and accumulates
weight grads as SMEM scalars across the sequential grid.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIDDEN = 32
_VMEM_LIMIT = 100 * 1024 * 1024


def supported(b: int, s: int) -> bool:
    # OFF on the training path: the per-channel loop kernel is correct on
    # chip but VPU-bound at ~100x SoL and loses to the lax.conv chain
    # end-to-end (S=224 fwd+bwd 32.6 ms vs 21.3 ms; measured +70 ms/step
    # when accidentally enabled). See NOTES.md for the three formulations
    # tried and the path forward.
    return False


def _supported_ungated(b: int, s: int) -> bool:
    return s >= 8 and 10 * 4 * s * s * 4 <= _VMEM_LIMIT


def _erf(x):
    x32 = x.astype(jnp.float32)
    sign = jnp.sign(x32)
    ax = jnp.abs(x32)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return (sign * (1.0 - poly * jnp.exp(-ax * ax))).astype(x.dtype)


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _dgelu(x):
    phi = jnp.exp(-0.5 * x * x) * (1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))
    return cdf + x * phi


def _chan_parts(c, x0, x1, x2, w1_ref, b1_ref, wd_ref, bd_ref, dtype):
    """Forward middle for hidden channel c (all 2D planes, fp32):
    returns (a1, h_padded, a2) where h_padded is (S+2, S+2)."""
    s = x0.shape[0]
    a1 = (x0 * w1_ref[c, 0] + x1 * w1_ref[c, 1] + x2 * w1_ref[c, 2]
          + b1_ref[0, c])
    hp = jnp.pad(_gelu(a1).astype(dtype), ((1, 1), (1, 1)))
    a2 = jnp.full((s, s), bd_ref[0, c], jnp.float32)
    for a in range(3):
        for b in range(3):
            a2 = a2 + (hp[a:a + s, b:b + s].astype(jnp.float32)
                       * wd_ref[a, b, c])
    return a1, hp, a2


def _fwd_kernel(x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref,
                y_ref, *, dtype):
    s = x_ref.shape[2]
    x0 = x_ref[0, 0].astype(jnp.float32)
    x1 = x_ref[0, 1].astype(jnp.float32)
    x2 = x_ref[0, 2].astype(jnp.float32)

    def body(c, ys):
        _, _, a2 = _chan_parts(c, x0, x1, x2, w1_ref, b1_ref, wd_ref,
                               bd_ref, dtype)
        d = _gelu(a2)
        return (ys[0] + d * w2_ref[0, c],
                ys[1] + d * w2_ref[1, c],
                ys[2] + d * w2_ref[2, c])

    init = tuple(jnp.full((s, s), b2_ref[0, co], jnp.float32)
                 for co in range(3))
    y0, y1, y2 = jax.lax.fori_loop(0, HIDDEN, body, init)
    y_ref[0, 0] = y0.astype(dtype)
    y_ref[0, 1] = y1.astype(dtype)
    y_ref[0, 2] = y2.astype(dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref,
                g_ref, z1_ref, zb1_ref, zd_ref, zbd_ref, z2_ref, zb2_ref,
                dx_ref, dw1_ref, db1_ref, dwd_ref, dbd_ref,
                dw2_ref, db2_ref, *, dtype):
    # z*_refs are zero-filled inputs aliased to the grad outputs (SMEM
    # allows only scalar stores, so zero-init happens in XLA); the grad
    # refs are pure accumulators across the sequential grid.
    del z1_ref, zb1_ref, zd_ref, zbd_ref, z2_ref, zb2_ref
    s = x_ref.shape[2]

    x0 = x_ref[0, 0].astype(jnp.float32)
    x1 = x_ref[0, 1].astype(jnp.float32)
    x2 = x_ref[0, 2].astype(jnp.float32)
    g0 = g_ref[0, 0].astype(jnp.float32)
    g1 = g_ref[0, 1].astype(jnp.float32)
    g2 = g_ref[0, 2].astype(jnp.float32)

    db2_ref[0, 0] += jnp.sum(g0)
    db2_ref[0, 1] += jnp.sum(g1)
    db2_ref[0, 2] += jnp.sum(g2)

    def body(c, carry):
        dx0, dx1, dx2 = carry
        a1, hp, a2 = _chan_parts(c, x0, x1, x2, w1_ref, b1_ref, wd_ref,
                                 bd_ref, dtype)
        d = _gelu(a2)
        # y[co] = sum_c d*w2[co,c] + b2  =>  dd = sum_co g[co]*w2[co,c]
        dd = g0 * w2_ref[0, c] + g1 * w2_ref[1, c] + g2 * w2_ref[2, c]
        dw2_ref[0, c] += jnp.sum(g0 * d)
        dw2_ref[1, c] += jnp.sum(g1 * d)
        dw2_ref[2, c] += jnp.sum(g2 * d)

        da2 = dd * _dgelu(a2)
        dbd_ref[0, c] += jnp.sum(da2)
        for a in range(3):
            for b in range(3):
                dwd_ref[a, b, c] += jnp.sum(
                    da2 * hp[a:a + s, b:b + s].astype(jnp.float32))
        # dh = flipped-tap depthwise of da2
        dap = jnp.pad(da2.astype(dtype), ((1, 1), (1, 1)))
        dh = jnp.zeros((s, s), jnp.float32)
        for a in range(3):
            for b in range(3):
                dh = dh + (dap[2 - a:2 - a + s, 2 - b:2 - b + s]
                           .astype(jnp.float32) * wd_ref[a, b, c])
        da1 = dh * _dgelu(a1)
        db1_ref[0, c] += jnp.sum(da1)
        dw1_ref[c, 0] += jnp.sum(da1 * x0)
        dw1_ref[c, 1] += jnp.sum(da1 * x1)
        dw1_ref[c, 2] += jnp.sum(da1 * x2)
        return (dx0 + da1 * w1_ref[c, 0],
                dx1 + da1 * w1_ref[c, 1],
                dx2 + da1 * w1_ref[c, 2])

    zero = jnp.zeros((s, s), jnp.float32)
    dx0, dx1, dx2 = jax.lax.fori_loop(0, HIDDEN, body, (zero, zero, zero))
    dx_ref[0, 0] = dx0.astype(dtype)
    dx_ref[0, 1] = dx1.astype(dtype)
    dx_ref[0, 2] = dx2.astype(dtype)


@functools.lru_cache(maxsize=None)
def _make_fused(dtype_name: str, shapes: tuple, interpret: bool = False):
    dtype = jnp.dtype(dtype_name)
    b, s = shapes

    x_tile = pl.BlockSpec((1, 3, s, s), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    w_specs = [smem((HIDDEN, 3)), smem((1, HIDDEN)),
               smem((3, 3, HIDDEN)), smem((1, HIDDEN)),
               smem((3, HIDDEN)), smem((1, 3))]
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    traffic = 2 * 2 * b * s * s * 3

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, dtype=dtype),
        grid=(b,),
        in_specs=[x_tile] + w_specs,
        out_specs=x_tile,
        out_shape=jax.ShapeDtypeStruct((b, 3, s, s), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * s * HIDDEN * (3 + 9 + 3),
            bytes_accessed=traffic, transcendentals=2 * b * s * s * HIDDEN),
        compiler_params=params, interpret=interpret)

    grad_shapes = [(HIDDEN, 3), (1, HIDDEN), (3, 3, HIDDEN), (1, HIDDEN),
                   (3, HIDDEN), (1, 3)]
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, dtype=dtype),
        grid=(b,),
        in_specs=[x_tile] + w_specs + [x_tile]
        + [smem(sh) for sh in grad_shapes],
        input_output_aliases={8 + j: 1 + j for j in range(6)},
        out_specs=(x_tile, smem((HIDDEN, 3)), smem((1, HIDDEN)),
                   smem((3, 3, HIDDEN)), smem((1, HIDDEN)),
                   smem((3, HIDDEN)), smem((1, 3))),
        out_shape=(
            jax.ShapeDtypeStruct((b, 3, s, s), dtype),
            jax.ShapeDtypeStruct((HIDDEN, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, HIDDEN), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, HIDDEN), jnp.float32),
            jax.ShapeDtypeStruct((1, HIDDEN), jnp.float32),
            jax.ShapeDtypeStruct((3, HIDDEN), jnp.float32),
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * s * s * HIDDEN * (3 + 9 + 3),
            bytes_accessed=2 * traffic,
            transcendentals=4 * b * s * s * HIDDEN),
        compiler_params=params, interpret=interpret)

    @jax.custom_vjp
    def fused(x, w1, b1, wd, bd, w2, b2):
        return fwd_call(x, w1, b1, wd, bd, w2, b2)

    def fwd(x, w1, b1, wd, bd, w2, b2):
        return (fwd_call(x, w1, b1, wd, bd, w2, b2),
                (x, w1, b1, wd, bd, w2, b2))

    def bwd(res, g):
        x, w1, b1, wd, bd, w2, b2 = res
        zeros = [jnp.zeros(sh, jnp.float32) for sh in grad_shapes]
        dx, dw1, db1, dwd, dbd, dw2, db2 = bwd_call(x, w1, b1, wd, bd, w2,
                                                    b2, g, *zeros)
        return (dx.astype(x.dtype), dw1.astype(w1.dtype),
                db1.astype(b1.dtype), dwd.astype(wd.dtype),
                dbd.astype(bd.dtype), dw2.astype(w2.dtype),
                db2.astype(b2.dtype))

    fused.defvjp(fwd, bwd)
    return fused


def fused_conv_residual(x, w1, b1, wd, bd, w2, b2, *, dtype,
                        interpret: bool = False):
    """x: (B,S,S,3). Weights spectral-normalized, kernel-native layouts:
    w1 (32,3) [= OIHW (32,3,1,1) squeezed], wd (3,3,32) [= (32,1,3,3)
    transposed], w2 (3,32), biases as given. Returns the residual term
    (B,S,S,3) in `dtype`."""
    b, s, _, _ = x.shape
    fused = _make_fused(jnp.dtype(dtype).name, (b, s), interpret)
    x_cl = jnp.transpose(x.astype(dtype), (0, 3, 1, 2))
    y = fused(x_cl, w1, b1.reshape(1, HIDDEN), wd,
              bd.reshape(1, HIDDEN), w2, b2.reshape(1, 3))
    return jnp.transpose(y, (0, 2, 3, 1))
