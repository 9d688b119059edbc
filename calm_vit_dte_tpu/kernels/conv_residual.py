"""Fused Pallas TPU kernel: the CALM block's conv residual.

Reference (Vi_Tools_CNN_less_V2.py:379-385): 1x1 conv (3->32) -> exact GELU
-> depthwise 3x3 (zero pad) -> exact GELU -> 1x1 conv (32->3), applied to
the image-shaped (B, S, S, 3) view of the row tokens, result added back.

In XLA this chain makes ~5 HBM round trips of the (B, S, S, 32) hidden
tensor per direction (at batch 128 / S 224 that tensor is 411 MB in bf16).
Fused, the hidden channels never leave VMEM: HBM traffic is exactly
x in + y out. FLOPs are trivial (tiny channel counts) — the op is purely
bandwidth-bound, so the win is the traffic ratio (~5x per direction).

Layout: the kernel operates CHANNELS-LEADING (B, C, S, S). With channels
minor (NHWC) Mosaic pads the 3/32-channel lane dim to 128, inflating VMEM
42x/4x — that layout capped batch tiles at 2 and made the kernel lose to
XLA end-to-end. Channels-leading, the (rows, cols) planes fill the
(sublane, lane) tile and the hidden is stored dense, so full-image batch
tiles fit in VMEM at every stage (S=80..224) and all channel arithmetic
vectorizes across leading dims. The wrapper transposes NHWC<->NCHW in XLA
(one x-sized round trip, ~38 MB at B=128/S=224 vs the ~1 GB/direction
saved).

Grid: (B/Bt,) with standard BlockSpec pipelining (auto double-buffered
DMA). Backward recomputes the forward per tile and emits dx per tile plus
weight grads accumulated across the sequential grid.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIDDEN = 32
_VMEM_LIMIT = 120 * 1024 * 1024
_TILE_BUDGET = 72 * 1024 * 1024


def _lane_pad(s: int) -> int:
    return ((s + 127) // 128) * 128


def _pick_bt(b: int, s: int, *, bwd: bool) -> int | None:
    # Live VMEM per batch element: ~6 (fwd) / ~9 (bwd) channels-leading
    # (HIDDEN, S, S) planes counting fp32 accumulators and transients,
    # x1.5 Mosaic slack.  Lane dim padded to 128.
    per_elem = HIDDEN * s * _lane_pad(s) * (9 * 4 if bwd else 6 * 4)
    per_elem = int(per_elem * 1.5)
    for bt in (8, 4, 2, 1):
        if b % bt:
            continue
        if bt * per_elem <= _TILE_BUDGET:
            return bt
    return None


def supported(b: int, s: int) -> bool:
    # OFF on the training path: the channels-leading rewrite is
    # interpret-verified, but on-chip the Mosaic compile currently crashes
    # the axon remote-compile helper (HTTP 500) at S=80/128 and the
    # flagship S=176/224 tiles need row tiling to fit VMEM. Tracked in
    # NOTES.md; flip once the kernel beats the XLA chain end-to-end.
    return False


def _supported_ungated(b: int, s: int) -> bool:
    return (_pick_bt(b, s, bwd=False) is not None
            and _pick_bt(b, s, bwd=True) is not None)


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


def _conv_in(x, w1, b1, dtype):
    """x (bt,3,S,S) -> gelu(1x1 conv) (bt,32,S,S) in `dtype`.
    Channel-unrolled: 3 broadcasted fma planes, vectorized over the 32
    output channels via the leading dim."""
    a1 = (x[:, 0:1].astype(jnp.float32) * w1[:, 0][None, :, None, None]
          + x[:, 1:2].astype(jnp.float32) * w1[:, 1][None, :, None, None]
          + x[:, 2:3].astype(jnp.float32) * w1[:, 2][None, :, None, None]
          + b1[0][None, :, None, None])
    return a1, _gelu(a1).astype(dtype)


def _dw3x3(h, wd, bd, *, flip: bool = False):
    """Depthwise 3x3, zero padded. h (bt,32,S,S) -> fp32 (bt,32,S,S).
    Rows are sublane shifts, cols lane shifts of the padded copy; the
    per-channel tap scale broadcasts over the leading channel dim."""
    s = h.shape[2]
    hp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = bd[0][None, :, None, None] * jnp.ones(
        (h.shape[0], HIDDEN, s, s), jnp.float32)
    for a in range(3):
        for b in range(3):
            sa, sb = (2 - a, 2 - b) if flip else (a, b)
            acc = acc + (hp[:, :, sa:sa + s, sb:sb + s].astype(jnp.float32)
                         * wd[a, b][None, :, None, None])
    return acc


def _conv_out(d, w2, b2, dtype):
    """d (bt,32,S,S) -> (bt,3,S,S): per-output-channel weighted reduction
    over the leading hidden dim."""
    outs = [jnp.sum(d.astype(jnp.float32)
                    * w2[co][None, :, None, None], axis=1)
            + b2[0, co]
            for co in range(3)]
    return jnp.stack(outs, axis=1).astype(dtype)


def _fwd_kernel(x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref,
                y_ref, *, dtype):
    x = x_ref[:]
    _, h = _conv_in(x, w1_ref[:], b1_ref[:], dtype)
    a2 = _dw3x3(h, wd_ref[:], bd_ref[:])
    d = _gelu(a2).astype(dtype)
    y_ref[:] = _conv_out(d, w2_ref[:], b2_ref[:], dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref,
                g_ref, dx_ref, dw1_ref, db1_ref, dwd_ref, dbd_ref,
                dw2_ref, db2_ref, *, dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dwd_ref[:] = jnp.zeros_like(dwd_ref)
        dbd_ref[:] = jnp.zeros_like(dbd_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:]
    w1 = w1_ref[:]
    wd = wd_ref[:]
    w2 = w2_ref[:]
    s = x.shape[2]

    a1, h = _conv_in(x, w1, b1_ref[:], dtype)
    a2 = _dw3x3(h, wd, bd_ref[:])
    d = _gelu(a2).astype(dtype)
    g = g_ref[:]  # (bt,3,S,S)

    # y[co] = sum_k d[k]*w2[co,k] + b2  =>  dd[k] = sum_co g[co]*w2[co,k]
    g32 = g.astype(jnp.float32)
    dd = (g32[:, 0:1] * w2[0][None, :, None, None]
          + g32[:, 1:2] * w2[1][None, :, None, None]
          + g32[:, 2:3] * w2[2][None, :, None, None])
    for co in range(3):
        dw2_ref[co, :] += jnp.sum(g32[:, co:co + 1] * d.astype(jnp.float32),
                                  axis=(0, 2, 3)).reshape(HIDDEN)
    db2_ref[:] += jnp.sum(g32, axis=(0, 2, 3)).reshape(1, 3)

    da2 = dd * _dgelu(a2)
    dbd_ref[:] += jnp.sum(da2, axis=(0, 2, 3)).reshape(1, HIDDEN)
    # dwd[a,b,k] = sum_pixels da2[k,i,j] * h[k, i+a-1, j+b-1]
    hp32 = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1))).astype(jnp.float32)
    for a in range(3):
        for b in range(3):
            dwd_ref[a, b, :] += jnp.sum(
                da2 * hp32[:, :, a:a + s, b:b + s], axis=(0, 2, 3))
    # dh = transposed depthwise conv (flipped taps), no bias.
    dh = _dw3x3(da2.astype(dtype), wd, jnp.zeros_like(bd_ref[:]), flip=True)

    da1 = dh * _dgelu(a1)
    db1_ref[:] += jnp.sum(da1, axis=(0, 2, 3)).reshape(1, HIDDEN)
    x32 = x.astype(jnp.float32)
    for ci in range(3):
        dw1_ref[:, ci] += jnp.sum(da1 * x32[:, ci:ci + 1], axis=(0, 2, 3))
    # dx[ci] = sum_k da1[k] * w1[k,ci]
    dx = jnp.stack(
        [jnp.sum(da1 * w1[:, ci][None, :, None, None], axis=1)
         for ci in range(3)], axis=1)
    dx_ref[:] = dx.astype(dtype)


@functools.lru_cache(maxsize=None)
def _make_fused(dtype_name: str, shapes: tuple, interpret: bool = False):
    dtype = jnp.dtype(dtype_name)
    b, s = shapes
    bt_f = _pick_bt(b, s, bwd=False)
    bt_b = _pick_bt(b, s, bwd=True)
    if bt_f is None or bt_b is None:
        raise ValueError(f"no feasible batch tile for B={b}, S={s}")

    def x_tile(bt):
        return pl.BlockSpec((bt, 3, s, s), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    w_specs = [const((HIDDEN, 3)), const((1, HIDDEN)),
               const((3, 3, HIDDEN)), const((1, HIDDEN)),
               const((3, HIDDEN)), const((1, 3))]
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    traffic = 2 * 2 * b * s * s * 3

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, dtype=dtype),
        grid=(b // bt_f,),
        in_specs=[x_tile(bt_f)] + w_specs,
        out_specs=x_tile(bt_f),
        out_shape=jax.ShapeDtypeStruct((b, 3, s, s), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * s * HIDDEN * (3 + 9 + 3),
            bytes_accessed=traffic, transcendentals=2 * b * s * s * HIDDEN),
        compiler_params=params, interpret=interpret)

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, dtype=dtype),
        grid=(b // bt_b,),
        in_specs=[x_tile(bt_b)] + w_specs + [x_tile(bt_b)],
        out_specs=(x_tile(bt_b), const((HIDDEN, 3)), const((1, HIDDEN)),
                   const((3, 3, HIDDEN)), const((1, HIDDEN)),
                   const((3, HIDDEN)), const((1, 3))),
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
        dx, dw1, db1, dwd, dbd, dw2, db2 = bwd_call(x, w1, b1, wd, bd, w2,
                                                    b2, g)
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
