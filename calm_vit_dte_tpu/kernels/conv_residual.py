"""Fused Pallas TPU kernel: the CALM block's conv residual.

Reference (Vi_Tools_CNN_less_V2.py:379-385): 1x1 conv (3->32) -> exact GELU
-> depthwise 3x3 (zero pad) -> exact GELU -> 1x1 conv (32->3), applied to
the image-shaped (B, S, S, 3) view of the row tokens, result added back.

Why fuse: in XLA this chain round-trips the (B, S, S, 32) hidden tensor
through HBM ~4x per direction (411 MB bf16 at batch 128 / S 224), and the
depthwise lowering wastes the MXU on a 32-group masked contraction.
Measured standalone at B=128/S=224: lax.conv chain 12.7 ms fwd / 23.7 ms
fwd+bwd; this kernel 6.0 ms fwd (see NOTES.md round-3 conv log).

Formulation (round 3; the round-2 per-channel-plane loop kernel lives in
experimental/conv_residual_loop.py — VPU-bound ~100x SoL from 9
lane-unaligned slices serialized per channel): CHANNEL-MAJOR, LANE-ALIGNED
flat layout. The padded image is (32, NP) with NP = (S+2) * RS and
RS = (S+2) rounded up to 128 — hidden channels in sublanes, each image row
padded to a 128-multiple stride. Consequences, all measured on v5e:

  * every VPU op runs at full (8, 128) register occupancy (the round-2
    killer was 25% lane use);
  * vertical taps are shifts by +-RS — a lane-ALIGNED offset, so the 9-tap
    accumulation reads h at plain vreg offsets (an on-chip A/B showed
    unaligned tap reads — rolls or odd slices — cost ~4.7 ms of a 12 ms
    forward; aligned reads collapse that to ~2 ms);
  * only TWO unaligned ops remain: one roll by +-1 each to precompute the
    column-shifted copies hm/hp, amortized across all 9 taps;
  * the 1x1 convs are broadcast-fma / MXU dots ((3,32)@(32,NP));
  * exact GELU costs ~4.4 ms/call in erf+exp form; in bf16 mode both GELUs
    use an odd minimax polynomial Phi(x) = 0.5 + x*q(x^2) on |x|<=4.2
    (|gelu err| < 6e-4, |dgelu err| < 5e-3 — under bf16 resolution 8e-3),
    and the backward differentiates the APPROXIMATION, so the gradient is
    exactly consistent with the forward actually computed. fp32 mode (CPU
    interpret tests, parity oracles) keeps the exact erf formulation.

Grid is (B,): one image per program, weight grads accumulated across the
sequential grid in a constant-index (32, 24) fp32 block. The backward
recomputes h/acc flash-style (nothing saved from the forward); dm/dp
overwrite the hm/hp scratches once dwd no longer needs them.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIDDEN = 32
_VMEM_LIMIT = 110 * 1024 * 1024

# Joint value+derivative minimax fit of q in Phi(x) ~ 0.5 + x*q(x^2) over
# [0, 4.2] (odd symmetry covers the negative side): |Phi err| < 8.8e-4,
# |gelu err| < 5.8e-4, |dgelu err| < 5e-3.
_QC = (0.3964330854, -0.06295229794, 0.008138032854, -0.0006981381232,
       3.719092616e-05, -1.105441981e-06, 1.393749747e-08)
_CLAMP = 4.2


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _geom(s: int) -> tuple[int, int, int]:
    rs = _round_up(s + 2, 128)
    np_ = (s + 2) * rs
    return rs, np_, np_ + 2 * rs  # row stride, flat len, bordered len


def supported(b: int, s: int) -> bool:
    if s < 4:
        return False
    _, _, npw = _geom(s)
    # scratches (h bf16 + hm/hp f32 + dacc f32 = 14B/elem) + ~6 live fp32
    # working values (24B/elem) per (32, NPW) plane.
    return HIDDEN * npw * 38 <= 100 * 1024 * 1024


def _erf(x):
    # Abramowitz-Stegun 7.1.26, max abs error 1.5e-7.
    x32 = x.astype(jnp.float32)
    sign = jnp.sign(x32)
    ax = jnp.abs(x32)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return (sign * (1.0 - poly * jnp.exp(-ax * ax))).astype(x.dtype)


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _dgelu_exact(x):
    phi = jnp.exp(-0.5 * x * x) * (1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))
    return cdf + x * phi


def _phi_raw(xc):
    t = xc * xc
    q = _QC[6]
    for c in _QC[5::-1]:
        q = q * t + c
    return 0.5 + xc * q, q, t


def _gelu_fast(x):
    xc = jnp.clip(x, -_CLAMP, _CLAMP)
    raw, _, _ = _phi_raw(xc)
    return x * jnp.clip(raw, 0.0, 1.0)


def _dgelu_fast(x):
    """d/dx of _gelu_fast — the derivative OF THE APPROXIMATION (training
    sees a consistent function/gradient pair)."""
    xc = jnp.clip(x, -_CLAMP, _CLAMP)
    raw, q, t = _phi_raw(xc)
    qp = 6.0 * _QC[6]
    for k in range(5, 0, -1):
        qp = qp * t + k * _QC[k]
    inner = jnp.logical_and(
        jnp.logical_and(raw > 0.0, raw < 1.0),
        jnp.abs(x) < _CLAMP)
    dphi = jnp.where(inner, q + 2.0 * t * qp, 0.0)
    return jnp.clip(raw, 0.0, 1.0) + x * dphi


def _gelu(x, cdtype):
    return _gelu_exact(x) if cdtype == jnp.float32 else _gelu_fast(x)


def _dgelu(x, cdtype):
    return _dgelu_exact(x) if cdtype == jnp.float32 else _dgelu_fast(x)


def _conv1(x, w1_ref, b1_ref):
    """(32, NP) = W1 @ x + b1 via broadcast-fma (K=3 is too thin for the
    MXU to beat three full-width VPU fmas)."""
    return (w1_ref[:, 0:1] * x[0:1, :] + w1_ref[:, 1:2] * x[1:2, :]
            + w1_ref[:, 2:3] * x[2:3, :] + b1_ref[:])


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fill_bordered(ref, val, rs: int, np_: int):
    ref[:, rs:rs + np_] = val
    ref[:, :rs] = jnp.zeros((HIDDEN, rs), ref.dtype)
    ref[:, rs + np_:] = jnp.zeros((HIDDEN, rs), ref.dtype)


def _col_shifts(ref, np_w: int):
    """hm[p] = h[p-1], hp[p] = h[p+1] (the only unaligned ops; borders are
    zero so the circular wrap only moves zeros)."""
    hf = ref[:].astype(jnp.float32)
    return pltpu.roll(hf, 1, axis=1), pltpu.roll(hf, np_w - 1, axis=1)


def _nine_taps(center_ref, m_ref, p_ref, w_ref, bias_col, rs: int,
               np_: int, flip: bool):
    """acc[p] = bias + sum_{a,b} src[p + (a-1)RS + (b-1)] * w[a*3+b]
    (flip=False), or the transposed-conv sum src[p - delta] (flip=True).
    All nine reads are lane-aligned row offsets into the bordered
    scratches."""
    o = rs

    def rd(ref, roff):
        v = ref[:, o + roff:o + roff + np_]
        return v.astype(jnp.float32)

    def w(col):
        return w_ref[:, col:col + 1]

    acc = jnp.broadcast_to(bias_col, (HIDDEN, np_)).astype(jnp.float32)
    for a in range(3):
        roff = (a - 1) * rs if not flip else (1 - a) * rs
        cols = (a * 3, a * 3 + 1, a * 3 + 2)
        if not flip:
            # src[p + (b-1)]: b=0 -> col -1 -> m (m[p] = src[p-1] read at
            # p+roff ... m holds src shifted so m[x] = src[x-1]; we need
            # src[p+roff-1] = m[p+roff]).
            acc = (acc + rd(m_ref, roff) * w(cols[0])
                   + rd(center_ref, roff) * w(cols[1])
                   + rd(p_ref, roff) * w(cols[2]))
        else:
            # src[p - (b-1)]: b=0 -> +1 -> p_ref.
            acc = (acc + rd(p_ref, roff) * w(cols[0])
                   + rd(center_ref, roff) * w(cols[1])
                   + rd(m_ref, roff) * w(cols[2]))
    return acc


def _fwd_kernel(x_ref, w1_ref, b1_ref, wdv_ref, w2_ref, b2_ref, mask_ref,
                y_ref, h_ref, hm_ref, hp_ref, *, s: int, cdtype):
    rs, np_, npw = _geom(s)
    x = x_ref[0].astype(jnp.float32)
    mask = mask_ref[:]
    a1 = _conv1(x, w1_ref, b1_ref)
    _fill_bordered(h_ref, (_gelu(a1, cdtype) * mask).astype(cdtype),
                   rs, np_)
    hm, hp = _col_shifts(h_ref, npw)
    hm_ref[:] = hm
    hp_ref[:] = hp
    acc = _nine_taps(h_ref, hm_ref, hp_ref, wdv_ref, wdv_ref[:, 9:10],
                     rs, np_, flip=False)
    g2 = _gelu(acc, cdtype) * mask
    y = _dot(w2_ref[:], g2) + b2_ref[:]
    y_ref[0] = (y * mask).astype(cdtype)


def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w1t_ref, wdv_ref, w2t_ref,
                mask_ref, dx_ref, wg_ref, h_ref, hm_ref, hp_ref, dacc_ref,
                *, s: int, cdtype):
    rs, np_, npw = _geom(s)

    @pl.when(pl.program_id(0) == 0)
    def _():
        wg_ref[:] = jnp.zeros_like(wg_ref)

    mask = mask_ref[:]
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)         # zero outside the valid image

    # Recompute the forward middle (flash-style).
    a1 = _conv1(x, w1_ref, b1_ref)
    _fill_bordered(h_ref, (_gelu(a1, cdtype) * mask).astype(cdtype),
                   rs, np_)
    hm, hp = _col_shifts(h_ref, npw)
    hm_ref[:] = hm
    hp_ref[:] = hp
    acc = _nine_taps(h_ref, hm_ref, hp_ref, wdv_ref, wdv_ref[:, 9:10],
                     rs, np_, flip=False)
    g2 = _gelu(acc, cdtype) * mask

    # y = W2 @ g2 + b2 => dg2 = W2^T @ g; dw2[co, c] = <g_co, g2_c>.
    dg2 = _dot(w2t_ref[:], g)
    for co in range(3):
        wg_ref[:, 14 + co:15 + co] += jnp.sum(
            g2 * g[co:co + 1, :], axis=1, keepdims=True)

    dacc = dg2 * _dgelu(acc, cdtype) * mask
    wg_ref[:, 9:10] += jnp.sum(dacc, axis=1, keepdims=True)       # dbd
    # dwd[a,b] = sum_p dacc[p] * h[p + delta_ab]: same aligned read
    # pattern as the forward taps.
    o = rs
    for a in range(3):
        roff = (a - 1) * rs
        for b_, ref in ((0, hm_ref), (1, h_ref), (2, hp_ref)):
            wg_ref[:, a * 3 + b_:a * 3 + b_ + 1] += jnp.sum(
                dacc * ref[:, o + roff:o + roff + np_].astype(jnp.float32),
                axis=1, keepdims=True)

    # dh needs dacc's shifted copies; hm/hp are dead now — reuse them.
    _fill_bordered(dacc_ref, dacc, rs, np_)
    dm, dp = _col_shifts(dacc_ref, npw)
    hm_ref[:] = dm
    hp_ref[:] = dp
    dh = _nine_taps(dacc_ref, hm_ref, hp_ref, wdv_ref,
                    jnp.zeros((HIDDEN, 1), jnp.float32), rs, np_,
                    flip=True)

    da1 = dh * _dgelu(a1, cdtype) * mask
    wg_ref[:, 13:14] += jnp.sum(da1, axis=1, keepdims=True)       # db1
    for j in range(3):
        wg_ref[:, 10 + j:11 + j] += jnp.sum(
            da1 * x[j:j + 1, :], axis=1, keepdims=True)           # dw1
    dx_ref[0] = _dot(w1t_ref[:], da1).astype(cdtype)


@functools.lru_cache(maxsize=None)
def _make_fused(dtype_name: str, shapes: tuple, interpret: bool = False):
    cdtype = jnp.dtype(dtype_name)
    b, s = shapes
    rs, np_, npw = _geom(s)

    img = pl.BlockSpec((1, 3, np_), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # Keep the mask a NUMPY constant: _make_fused is lru_cached and its
    # first call may happen inside a jit trace — a jnp array created there
    # is trace-local and would escape via the cache (UnexpectedTracerError
    # on the next trace). numpy constants convert fresh at every use site.
    mask2d = np.zeros((s + 2, rs), np.float32)
    mask2d[1:-1, 1:s + 1] = 1.0
    mask = mask2d.reshape(1, np_)

    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    gelu_cost = b * np_ * HIDDEN
    flops_mm = 2 * b * np_ * HIDDEN * (3 + 9 + 3)
    traffic = 2 * 2 * b * np_ * 3
    h_scr = pltpu.VMEM((HIDDEN, npw), cdtype)
    f_scr = pltpu.VMEM((HIDDEN, npw), jnp.float32)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, s=s, cdtype=cdtype),
        grid=(b,),
        in_specs=[img, const((HIDDEN, 3)), const((HIDDEN, 1)),
                  const((HIDDEN, 10)), const((3, HIDDEN)), const((3, 1)),
                  const((1, np_))],
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct((b, 3, np_), cdtype),
        scratch_shapes=[h_scr, f_scr, f_scr],
        cost_estimate=pl.CostEstimate(
            flops=flops_mm, bytes_accessed=traffic,
            transcendentals=2 * gelu_cost),
        compiler_params=params, interpret=interpret)

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, s=s, cdtype=cdtype),
        grid=(b,),
        in_specs=[img, img, const((HIDDEN, 3)), const((HIDDEN, 1)),
                  const((3, HIDDEN)), const((HIDDEN, 10)),
                  const((HIDDEN, 3)), const((1, np_))],
        out_specs=(img, const((HIDDEN, 24))),
        out_shape=(jax.ShapeDtypeStruct((b, 3, np_), cdtype),
                   jax.ShapeDtypeStruct((HIDDEN, 24), jnp.float32)),
        scratch_shapes=[h_scr, f_scr, f_scr, f_scr],
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_mm, bytes_accessed=2 * traffic,
            transcendentals=4 * gelu_cost),
        compiler_params=params, interpret=interpret)

    def pack_weights(w1, b1, wd, bd, w2, b2):
        w1 = w1.astype(jnp.float32)
        w2 = w2.astype(jnp.float32)
        wdv = jnp.concatenate(
            [wd.astype(jnp.float32).reshape(9, HIDDEN).T,
             bd.astype(jnp.float32).reshape(HIDDEN, 1)], axis=1)
        return (w1, b1.astype(jnp.float32).reshape(HIDDEN, 1), wdv, w2,
                b2.astype(jnp.float32).reshape(3, 1))

    @jax.custom_vjp
    def fused(xp, w1, b1, wd, bd, w2, b2):
        w1v, b1v, wdv, w2v, b2v = pack_weights(w1, b1, wd, bd, w2, b2)
        return fwd_call(xp, w1v, b1v, wdv, w2v, b2v, mask)

    def fwd(xp, w1, b1, wd, bd, w2, b2):
        return fused(xp, w1, b1, wd, bd, w2, b2), (xp, w1, b1, wd, bd, w2,
                                                   b2)

    def bwd(res, gy):
        xp, w1, b1, wd, bd, w2, b2 = res
        w1v, b1v, wdv, w2v, _ = pack_weights(w1, b1, wd, bd, w2, b2)
        gp = (gy.astype(jnp.float32) * mask).astype(gy.dtype)
        dx, wg = bwd_call(xp, gp, w1v, b1v, w1v.T, wdv, w2v.T, mask)
        dwd = wg[:, 0:9].T.reshape(3, 3, HIDDEN)
        dbd = wg[:, 9]
        dw1 = wg[:, 10:13]
        db1 = wg[:, 13]
        dw2 = wg[:, 14:17].T
        db2 = jnp.sum(gp.astype(jnp.float32), axis=(0, 2))   # (3,)
        return (dx.astype(xp.dtype), dw1.astype(w1.dtype),
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
    rs, np_, _ = _geom(s)
    fused = _make_fused(jnp.dtype(dtype).name, (b, s), interpret)
    # Pad into the aligned-row layout; XLA fuses the pad/transpose with
    # whatever produced x.
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, rs - s - 1),
                                   (0, 0)))
    xp = xp.transpose(0, 3, 1, 2).reshape(b, 3, np_)
    y = fused(xp, w1, b1, wd, bd, w2, b2)
    y = y.reshape(b, 3, s + 2, rs)[:, :, 1:-1, 1:s + 1]
    return y.transpose(0, 2, 3, 1)
