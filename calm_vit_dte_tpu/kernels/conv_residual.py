"""Fused Pallas TPU kernel: the CALM block's conv residual.

Reference (Vi_Tools_CNN_less_V2.py:379-385): 1x1 conv (3->32) -> exact GELU
-> depthwise 3x3 (zero pad) -> exact GELU -> 1x1 conv (32->3), applied to
the image-shaped (B, S, S, 3) view of the row tokens, result added back.

Where it wins (measured in-step on v5e, b128 — NOTES.md round-3 conv log):
the FORWARD, ~3x over the XLA chain (12 vs 33 ms/step across the S>=128
stages) — the 32-channel hidden tensor never leaves VMEM, where the XLA
chain round-trips it through HBM (411 MB bf16 per stage at S=224).
Production uses it on the no-backward eval/serve path. For TRAINING the
lax chain wins: every fused backward tried (recomputing pallas kernel,
saved-residual pallas, saved-residual XLA taps, saved-residual conv-vjp)
lost in-step to XLA's fused NHWC autodiff (209.6-218.7 vs 202.0 ms step),
whose backward fuses the 1x1 grads and elementwise chain better than any
hand assembly of the same graph.

Formulation (round 3; the round-2 per-channel-plane loop kernel — VPU-bound
~100x SoL from 9 lane-unaligned slices serialized per channel — was deleted
in round 5; its formulation record lives in NOTES.md "Deleted experiments"):
CHANNEL-MAJOR, LANE-ALIGNED
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
    # Below S=128 the XLA chain ties or wins (on-chip A/B, B=128: S=80
    # lax 5.28 ms vs fused 5.42 fwd+bwd; S=128 13.76 vs 12.18; S=176
    # 22.95 vs 15.27; S=224 34.95 vs 18.95) — the small-plane kernel has
    # too little work per grid step to amortize its fixed costs.
    if s < 128:
        return False
    _, _, npw = _geom(s)
    # scratches (h bf16 + hm/hp f32 + dacc f32 + dacc^T f32 = 18B/elem) +
    # ~6 live fp32 working values (24B/elem) per (32, NPW) plane.
    return HIDDEN * npw * 42 <= 100 * 1024 * 1024


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


# d/dx[x*(0.5 + x*q(x^2))] = 0.5 + x*r(x^2) with r_k = 2(k+1)*q_k: the
# EXACT derivative of the forward polynomial (interior of the clamp) as a
# single same-degree Horner — ~11 VPU ops vs ~20 for the q/q' two-poly form
# (the two dgelu passes were 6.7 ms of the S=224 backward kernel). At the
# clamp boundary/clip region it deviates from the piecewise-exact derivative
# by <= 5.2e-3 (measured), the same error class as the fit itself vs true
# dgelu (5.1e-3) — under bf16 resolution either way.
_RC = tuple(2.0 * (k + 1) * _QC[k] for k in range(7))


def _dgelu_fast(x):
    xc = jnp.clip(x, -_CLAMP, _CLAMP)
    t = xc * xc
    r = _RC[6]
    for c in _RC[5::-1]:
        r = r * t + c
    return 0.5 + xc * r


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


def _eye():
    return (jax.lax.broadcasted_iota(jnp.int32, (HIDDEN, HIDDEN), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (HIDDEN, HIDDEN), 1)
            ).astype(jnp.float32)


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
                y_ref, h_out_ref, acc_out_ref, h_ref, hm_ref, hp_ref, *,
                s: int, cdtype, save_resid: bool):
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
    if save_resid:
        # Stream the middle activations to HBM for the XLA backward
        # (hybrid path): two extra (32, npw/np_) DMA writes (~1 ms total at
        # b128/S224) instead of recomputing taps + weight-grad reductions
        # in a VPU-bound backward kernel (measured 44 ms/step in-step).
        h_out_ref[0] = h_ref[:]
        acc_out_ref[0] = acc.astype(cdtype)


def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w1t_ref, wdv_ref, w2t_ref,
                mask_ref, dx_ref, wg_ref, h_ref, hm_ref, hp_ref, dacc_ref,
                dacct_ref, *, s: int, cdtype):
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

    # All weight-grad reductions run as NATURAL-LAYOUT MXU dots: transpose
    # the (32, np_) gradient operands ONCE into (np_, C) scratch/values, so
    # every contraction is (M, np_) @ (np_, N) with the contraction on the
    # LHS lane axis and the RHS sublane axis — no per-dot Mosaic relayout.
    # (The A@B^T lane-lane form re-laid out the RHS on every one of the 11
    # dots: measured 5.6 ms of the S=224 backward; this form + the cheap
    # dgelu cut the kernel ~2x.)
    dg2 = _dot(w2t_ref[:], g)
    gt = g.T                                                      # (np_, 3)
    wg_ref[:, 14:17] += _dot(g2.astype(jnp.float32), gt)          # dw2^T

    ones_col = jnp.ones((np_, 1), jnp.float32)
    eye = _eye()
    dacc = dg2 * _dgelu(acc, cdtype) * mask
    dacct_ref[:] = dacc.T
    dacct = dacct_ref[:]
    wg_ref[:, 9:10] += _dot(dacc, ones_col)                       # dbd
    # dwd[a,b][c] = sum_p dacc[c,p] * h[c, p + delta_ab] = the diagonal of
    # h_shift @ dacc^T — one MXU dot per tap (same aligned reads as the
    # forward taps), then a 32x32 diag extraction.
    o = rs
    for a in range(3):
        roff = (a - 1) * rs
        for b_, ref in ((0, hm_ref), (1, h_ref), (2, hp_ref)):
            m32 = _dot(ref[:, o + roff:o + roff + np_].astype(jnp.float32),
                       dacct)
            wg_ref[:, a * 3 + b_:a * 3 + b_ + 1] += jnp.sum(
                m32 * eye, axis=1, keepdims=True)

    # dh needs dacc's shifted copies; hm/hp are dead now — reuse them.
    _fill_bordered(dacc_ref, dacc, rs, np_)
    dm, dp = _col_shifts(dacc_ref, npw)
    hm_ref[:] = dm
    hp_ref[:] = dp
    dh = _nine_taps(dacc_ref, hm_ref, hp_ref, wdv_ref,
                    jnp.zeros((HIDDEN, 1), jnp.float32), rs, np_,
                    flip=True)

    da1 = dh * _dgelu(a1, cdtype) * mask
    wg_ref[:, 13:14] += _dot(da1, ones_col)                       # db1
    wg_ref[:, 10:13] += _dot(da1, x.T)                            # dw1
    dx_ref[0] = _dot(w1t_ref[:], da1).astype(cdtype)


def _fwd_kernel_plain(x_ref, w1_ref, b1_ref, wdv_ref, w2_ref, b2_ref,
                      mask_ref, y_ref, h_ref, hm_ref, hp_ref, *, s: int,
                      cdtype):
    _fwd_kernel(x_ref, w1_ref, b1_ref, wdv_ref, w2_ref, b2_ref, mask_ref,
                y_ref, None, None, h_ref, hm_ref, hp_ref, s=s,
                cdtype=cdtype, save_resid=False)


@functools.lru_cache(maxsize=None)
def _make_fused(dtype_name: str, shapes: tuple, interpret: bool = False,
                bwd_impl: str = "xla"):
    cdtype = jnp.dtype(dtype_name)
    b, s = shapes
    rs, np_, npw = _geom(s)

    img = pl.BlockSpec((1, 3, np_), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    himg = pl.BlockSpec((1, HIDDEN, npw), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    aimg = pl.BlockSpec((1, HIDDEN, np_), lambda i: (i, 0, 0),
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
        functools.partial(_fwd_kernel_plain, s=s, cdtype=cdtype),
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

    fwd_resid_call = pl.pallas_call(
        functools.partial(_fwd_kernel, s=s, cdtype=cdtype, save_resid=True),
        grid=(b,),
        in_specs=[img, const((HIDDEN, 3)), const((HIDDEN, 1)),
                  const((HIDDEN, 10)), const((3, HIDDEN)), const((3, 1)),
                  const((1, np_))],
        out_specs=(img, himg, aimg),
        out_shape=(jax.ShapeDtypeStruct((b, 3, np_), cdtype),
                   jax.ShapeDtypeStruct((b, HIDDEN, npw), cdtype),
                   jax.ShapeDtypeStruct((b, HIDDEN, np_), cdtype)),
        scratch_shapes=[h_scr, f_scr, f_scr],
        cost_estimate=pl.CostEstimate(
            flops=flops_mm,
            bytes_accessed=traffic + 2 * b * np_ * HIDDEN *
            jnp.dtype(cdtype).itemsize,
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
        scratch_shapes=[h_scr, f_scr, f_scr, f_scr,
                        pltpu.VMEM((np_, HIDDEN), jnp.float32)],
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

    def fwd_pallas(xp, w1, b1, wd, bd, w2, b2):
        return fused(xp, w1, b1, wd, bd, w2, b2), (xp, w1, b1, wd, bd, w2,
                                                   b2)

    def bwd_pallas(res, gy):
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

    def fwd_xla(xp, w1, b1, wd, bd, w2, b2):
        # The hybrid path: the forward kernel streams its middle
        # activations (bordered h, acc) to HBM (~1 ms of DMA at b128/S224)
        # so the backward is pure XLA elementwise+reduce passes over them —
        # measured far cheaper than either the VPU-bound pallas backward
        # (44 ms/step) or lax.conv autodiff (28 ms/step).
        w1v, b1v, wdv, w2v, b2v = pack_weights(w1, b1, wd, bd, w2, b2)
        y, h, acc = fwd_resid_call(xp, w1v, b1v, wdv, w2v, b2v, mask)
        return y, (xp, h, acc, w1, b1, wd, bd, w2, b2)

    def bwd_xla(res, gy):
        xp, h, acc, w1, b1, wd, bd, w2, b2 = res
        maskf = jnp.asarray(mask)                       # (1, np_)
        gp = gy.astype(jnp.float32) * maskf             # (b, 3, np_)
        accf = acc.astype(jnp.float32)
        w1f = w1.astype(jnp.float32)
        w2f = w2.astype(jnp.float32)

        g2 = _gelu(accf, cdtype) * maskf
        dw2 = jnp.einsum("bop,bcp->oc", gp, g2)
        db2 = jnp.sum(gp, axis=(0, 2))
        dg2 = jnp.einsum("oc,bop->bcp", w2f, gp)
        dacc = dg2 * _dgelu(accf, cdtype) * maskf
        dbd = jnp.sum(dacc, axis=(0, 2))

        # dwd / dh through XLA's grouped-conv machinery (its autodiff
        # lowering of depthwise convs is what the production lax path
        # already runs at ~28 ms/step for all stages — faster than any
        # hand-rolled tap formulation tried, in pallas or jnp). The
        # kernel's bordered flat layout reshapes for FREE into a padded
        # NCHW view: h (b, 32, npw) -> (b, 32, s+4, rs) with the halo rows
        # already zero, dacc (b, 32, np_) -> (b, 32, s+2, rs).
        hv = h.reshape(h.shape[0], HIDDEN, s + 4, rs)
        wd_oihw = jnp.transpose(wd, (2, 0, 1))[:, None].astype(hv.dtype)

        def mid(hh, w):
            return jax.lax.conv_general_dilated(
                hh, w, (1, 1), ((0, 0), (1, 1)),
                feature_group_count=HIDDEN,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        # vjp in the residuals' dtype (bf16 on TPU) with the cotangent
        # cast to match — the same operand precision as the lax production
        # path's autodiff (XLA accumulates conv grads in fp32 internally).
        _, vjp_mid = jax.vjp(mid, hv, wd_oihw)
        dh_v, dwd_oihw = vjp_mid(
            dacc.astype(hv.dtype).reshape(dacc.shape[0], HIDDEN,
                                          s + 2, rs))
        dwd = jnp.transpose(dwd_oihw[:, 0], (1, 2, 0)).astype(jnp.float32)
        dh = dh_v.reshape(dh_v.shape[0], HIDDEN, npw)[:, :, rs:rs + np_]
        dh = dh.astype(jnp.float32)

        xpf = xp.astype(jnp.float32)
        a1 = jnp.einsum("ci,bip->bcp", w1f, xpf) + b1.astype(
            jnp.float32).reshape(1, HIDDEN, 1)
        da1 = dh * _dgelu(a1, cdtype) * maskf
        db1 = jnp.sum(da1, axis=(0, 2))
        dw1 = jnp.einsum("bcp,bip->ci", da1, xpf)
        dx = jnp.einsum("ci,bcp->bip", w1f, da1)
        return (dx.astype(xp.dtype), dw1.astype(w1.dtype),
                db1.astype(b1.dtype), dwd.astype(wd.dtype),
                dbd.astype(bd.dtype), dw2.astype(w2.dtype),
                db2.astype(b2.dtype))

    if bwd_impl == "pallas":
        fused.defvjp(fwd_pallas, bwd_pallas)
    else:
        fused.defvjp(fwd_xla, bwd_xla)
    return fused


def fused_conv_residual(x, w1, b1, wd, bd, w2, b2, *, dtype,
                        interpret: bool = False):
    """x: (B,S,S,3). Weights spectral-normalized, kernel-native layouts:
    w1 (32,3) [= OIHW (32,3,1,1) squeezed], wd (3,3,32) [= (32,1,3,3)
    transposed], w2 (3,32), biases as given. Returns the residual term
    (B,S,S,3) in `dtype`.

    CALM_CONV_BWD selects the backward when this kernel is differentiated:
    'pallas' (default — the recomputing flash-style backward kernel;
    in-step 209.6 ms vs 218.7 for the hybrid) or 'xla' (kernel saves h/acc
    residuals, gradient is conv-vjp + elementwise XLA passes over them).
    NOTE production training uses neither: XLA's fused autodiff of the lax
    chain beats both in-step (202.0 ms) — models/block.py dispatches the
    fused kernel on the no-backward eval/serve path only."""
    import os

    bwd_impl = os.environ.get("CALM_CONV_BWD", "pallas")
    if bwd_impl not in ("xla", "pallas"):
        raise ValueError(f"CALM_CONV_BWD={bwd_impl!r}: expected "
                         "'xla' or 'pallas'")
    b, s, _, _ = x.shape
    rs, np_, _ = _geom(s)
    fused = _make_fused(jnp.dtype(dtype).name, (b, s), interpret, bwd_impl)
    # Pad into the aligned-row layout; XLA fuses the pad/transpose with
    # whatever produced x.
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, rs - s - 1),
                                   (0, 0)))
    xp = xp.transpose(0, 3, 1, 2).reshape(b, 3, np_)
    y = fused(xp, w1, b1, wd, bd, w2, b2)
    y = y.reshape(b, 3, s + 2, rs)[:, :, 1:-1, 1:s + 1]
    return y.transpose(0, 2, 3, 1)
