"""Fused Pallas TPU kernel: axial attention with learned additive masking.

Fuses the whole chain the reference runs as five separate CUDA launches
(reference: Vi_Tools_CNN_less_V2.py:286-298 — flattened QK^T, 2-layer mask
MLP, SDPA's internal QK^T again, softmax, PV):

    per (batch-tile i, query-tile j) grid step, Bt batch elements at once:
        scores[b,h] = q[b,h] @ k[b,h]^T       (Bt*H, Tq, S)  fp32, VMEM
        ssum[b]     = sum_h scores[b,h]       (Bt, Tq, S)    == flat QK^T
        mask[b]     = gelu(ssum @ w1^T + b1) @ w2^T + b2     (row-wise over
                                                              the key axis)
        p[b,h]      = softmax(scores*scale + mask)           fp32, full keys
        out[b,h]    = p[b,h] @ v[b,h]

The (B, H, S, S) score tensor NEVER reaches HBM — at the reference's batch
484 / S 224 it would be 109 GB in fp32, which is why the XLA fallback must
batch-chunk (ops/attention.py) and why the reference only survives on
torch's memory-efficient SDPA backend.

Performance notes (measured on v5e):
  * batch tiling (Bt > 1) amortizes per-grid-step fixed cost;
  * the mask-MLP weights are passed in BOTH orientations so no transpose
    ever runs inside the kernel (a per-grid-step VPU relayout otherwise);
  * marginal throughput ~167 TFLOP/s useful bf16 at S=224/D=56 = 85% of
    the v5e chip peak (197 TFLOP/s bf16) and ~97% of this shape's blended
    ceiling (~172 TFLOP/s): the QK^T/PV dots (11% of FLOPs) cap at 43.75%
    of peak from the K=56 contraction (MXU pads K to 128), while the mask
    MLP (89% of FLOPs, K=S/2S) runs near full ceiling. The kernel is at
    its shape-imposed roofline; see NOTES.md "Roofline accounting".

Query tiling makes the long-sequence (1024px, S=1024) stretch config work in
the same kernel: K/V stay resident per batch tile while q streams; the mask
MLP contracts only over the key axis, so it is exact per query tile (no
flash-style rescaling — the full key axis is always in VMEM).

Backward is a second Pallas kernel (flash-style recompute) emitting dq per
tile, dk/dv accumulated across query tiles (fp32), and mask-MLP weight grads
accumulated across the whole sequential grid.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e/v4 have 128 MB VMEM per core; the default *scoped* (stack) limit is
# 16 MB, so the pallas_calls below raise it explicitly.
_VMEM_LIMIT = 110 * 1024 * 1024
_TILE_BUDGET = 64 * 1024 * 1024


def _est_bytes(bt: int, h: int, tq: int, s: int, d: int, dv: int) -> int:
    # bwd working set: ~6 live fp32 (Bt*H,Tq,S) tensors + fp32 dk/dv
    # accumulators + bf16 k/v/q/g + mask MLP activations. Mosaic's actual
    # scoped allocation measured ~3x this analytic figure (it does not reuse
    # buffers across the reshape/broadcast chain), hence the multiplier.
    analytic = (4 * (6 * bt * h * tq * s + 2 * bt * h * s * max(d, dv)
                     + 4 * bt * tq * s)
                + 2 * (2 * bt * h * s * (d + dv)
                       + 2 * bt * h * tq * (d + dv)))
    return 3 * analytic


# Measured-best tiles, keyed (b, h, s, d): combos that beat the
# estimator's first-fit choice in the on-chip sweep AND compiled cleanly
# on this toolchain (several larger-bt combos crash the remote Mosaic
# helper, so only exact measured winners are listed — no extrapolation).
_MEASURED_TILES: dict[tuple, tuple[int, int]] = {
    (128, 12, 224, 56): (2, 224),   # 14.89 ms vs 15.19 first-fit
    (128, 12, 176, 44): (2, 176),   # 12.55 ms vs 12.72
    (128, 12, 128, 32): (4, 128),   # 8.92 ms vs 9.20
}

# Swept tile cache: scripts/sweep_tiles.py measures candidate tilings on
# chip for any config's attention shapes and records the winners in
# tile_cache.json (committed), so new shapes self-tune instead of falling
# back to the conservative 3x-slack analytic estimator. _TILE_OVERRIDE is
# the sweep's injection hook (the sweep clears the _make_* lru caches
# between candidates).
_TILE_CACHE_PATH = None  # resolved lazily (pathlib import kept local)
_TILE_OVERRIDE: dict[tuple, tuple] = {}
_tile_cache_data: dict | None = None


def _tuned_tiles(kind: str, key: tuple) -> tuple | None:
    """Sweep override, then the committed swept cache. kind in
    {'plain', 'rope', 'fwd', 'hires'}."""
    ov = _TILE_OVERRIDE.get((kind,) + key)
    if ov is not None:
        return tuple(ov)
    global _tile_cache_data
    if _tile_cache_data is None:
        import json
        import pathlib

        path = pathlib.Path(__file__).parent / "tile_cache.json"
        try:
            _tile_cache_data = json.loads(path.read_text())
        except Exception:
            _tile_cache_data = {}
    ent = _tile_cache_data.get(f"{kind}|" + ",".join(map(str, key)))
    return tuple(ent["tile"]) if ent else None


def _pick_tiles(b: int, h: int, s: int, d: int,
                dv: int) -> tuple[int, int] | None:
    """Largest (batch-tile, query-tile) whose backward fits VMEM."""
    tuned = _tuned_tiles("plain", (b, h, s, d, dv))
    if tuned is not None:
        return tuned
    if d == dv and (b, h, s, d) in _MEASURED_TILES:
        return _MEASURED_TILES[(b, h, s, d)]
    best = None
    for bt in (16, 8, 4, 2, 1):
        if b % bt:
            continue
        for tq in (512, 256, 128, 64):
            tile = min(tq, s)
            if s % tile:
                continue
            if _est_bytes(bt, h, tile, s, d, dv) <= _TILE_BUDGET:
                return bt, tile
    return best


def supported(h: int, sq: int, skv: int, d: int = 64) -> bool:
    return sq == skv and _pick_tiles(1, h, sq, d, d) is not None


def _pick_tiles_rope(b: int, h: int, s: int, dc: int, dr: int,
                     dv: int) -> tuple[int, int] | None:
    """Tiling for the rope-fused path. Its backward kernel carries MORE
    VMEM than the plain backward (`_est_bytes`): an fp32 (bt,h,s,d) dk
    scratch, fp32 dkc/dkr outputs (vs one dk accumulator), and four (s,dr)
    cos/sin table-grad blocks — so a shape can fit the plain kernel yet
    blow VMEM here. Same 3x Mosaic-overhead multiplier as `_est_bytes`."""
    d = dc + dr
    tuned = _tuned_tiles("rope", (b, h, s, dc, dr, dv))
    if tuned is not None:
        return tuned
    if d == dv and (b, h, s, d) in _MEASURED_TILES:
        # Measured winners were swept on the rope path itself (the
        # production flagship runs through fused_rope_attention).
        return _MEASURED_TILES[(b, h, s, d)]
    for bt in (16, 8, 4, 2, 1):
        if b % bt:
            continue
        for tq in (512, 256, 128, 64):
            tile = min(tq, s)
            if s % tile:
                continue
            rope_extra = 3 * 4 * (bt * h * s * d + 4 * s * dr)
            if (_est_bytes(bt, h, tile, s, d, dv) + rope_extra
                    <= _TILE_BUDGET):
                return bt, tile
    return None


def _pick_tiles_fwd(b: int, h: int, s: int, d: int,
                    dv: int) -> tuple[int, int] | None:
    """Forward-only tiling: no dk/dv accumulators, ~3 live fp32 score-tile
    tensors. Covers the hires (S=1024, D=256) stages the backward cannot."""
    tuned = _tuned_tiles("fwd", (b, h, s, d, dv))
    if tuned is not None:
        return tuned
    for bt in (8, 4, 2, 1):
        if b % bt:
            continue
        for tq in (512, 256, 128, 64):
            tile = min(tq, s)
            if s % tile:
                continue
            est = (3 * 4 * (3 * bt * h * tile * s + 2 * bt * tile * s)
                   + 2 * (2 * bt * h * s * (d + dv)))
            if est <= _TILE_BUDGET:
                return bt, tile
    return None


def fwd_supported(h: int, sq: int, skv: int, d: int = 64) -> bool:
    return sq == skv and _pick_tiles_fwd(1, h, sq, d, d) is not None


def _erf(x):
    # Mosaic has no erf/erfc lowering; Abramowitz-Stegun 7.1.26 polynomial,
    # max abs error 1.5e-7 — exact at bf16/fp32 working precision.
    x32 = x.astype(jnp.float32)
    sign = jnp.sign(x32)
    ax = jnp.abs(x32)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return (sign * y).astype(x.dtype)


def _gelu(x):
    # Exact-form (erf) gelu, matching the reference's approximate='none'.
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _dgelu(x):
    # d/dx [x * Phi(x)] = Phi(x) + x * phi(x), exact (erf) gelu.
    phi = jnp.exp(-0.5 * x * x) * (1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))
    return cdf + x * phi


def _bdot(a, b, contract, batch=(0,), out_dtype=jnp.float32):
    return jax.lax.dot_general(
        a, b, ((contract[0], contract[1]), (batch, batch)),
        preferred_element_type=out_dtype)


def _rot_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _rope_rotate(x, cos, sin):
    """x: (..., T, Dr); cos/sin: (T, Dr) broadcast over leading dims."""
    return x * cos + _rot_half(x) * sin


def _rope_rotate_vjp(g, cos, sin):
    """VJP of _rope_rotate w.r.t. x: R^T = -R for the rotate-half map.
    Used inline by the rope backward kernel; kept as the reference formula
    for tests."""
    return g * cos - _rot_half(g * sin)


def _mask_fwd(ssum2d, w1t, b1, w2t, b2, dtype):
    """ssum2d: (Bt*Tq, S). Weights pre-transposed: w1t (S,2S), w2t (2S,S).
    Mosaic requires 32-bit matmul accumulators; fp32 accumulation + fp32
    nonlinearity."""
    h1 = jnp.dot(ssum2d.astype(dtype), w1t.astype(dtype),
                 preferred_element_type=jnp.float32) + b1
    a = _gelu(h1)
    m = jnp.dot(a.astype(dtype), w2t.astype(dtype),
                preferred_element_type=jnp.float32) + b2
    return m, h1, a


def _fwd_body(q, k, v, w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref, *,
              scale: float, dtype, use_mask: bool, bt: int, h: int):
    """Shared forward: q (bt*h, tq, d), k (bt*h, s, d), v (bt*h, s, dv),
    already in compute dtype."""
    tq, s, dv = q.shape[1], k.shape[1], v.shape[2]
    scores = _bdot(q, k, (((2,), (2,))))  # (Bt*H, Tq, S) fp32
    logits = scores * scale
    if use_mask:
        ssum = jnp.sum(scores.reshape(bt, h, tq, s), axis=1)
        m, _, _ = _mask_fwd(ssum.reshape(bt * tq, s), w1t_ref[:], b1_ref[:],
                            w2t_ref[:], b2_ref[:], dtype)
        logits = (logits.reshape(bt, h, tq, s)
                  + m.reshape(bt, 1, tq, s)).reshape(bt * h, tq, s)
    p = jax.nn.softmax(logits, axis=-1)
    out = _bdot(p.astype(dtype), v, (((2,), (1,))))
    o_ref[:] = out.reshape(bt, h, tq, dv).astype(dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                o_ref, *, scale: float, dtype, use_mask: bool,
                bt: int, h: int):
    tq = q_ref.shape[2]
    s = k_ref.shape[2]
    d = q_ref.shape[3]
    dv = v_ref.shape[3]
    q = q_ref[:].reshape(bt * h, tq, d).astype(dtype)
    k = k_ref[:].reshape(bt * h, s, d).astype(dtype)
    v = v_ref[:].reshape(bt * h, s, dv).astype(dtype)
    _fwd_body(q, k, v, w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref, scale=scale,
              dtype=dtype, use_mask=use_mask, bt=bt, h=h)


def _bwd_core(q, k, v, g, w1_ref, b1_ref, w2_ref, b2_ref, w1t_ref, w2t_ref,
              dv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
              *, scale: float, dtype, use_mask: bool, bt: int, h: int):
    """Shared backward math: recompute scores/mask/softmax, accumulate dv
    and the mask-MLP weight grads into their refs, RETURN (dq_tile,
    dk_contrib) as fp32 values for the caller to place/rotate/accumulate.
    q (bt*h, tq, d), k (bt*h, s, d), v (bt*h, s, dv), g (bt*h, tq, dv)."""
    i_idx = pl.program_id(0)
    j_idx = pl.program_id(1)
    tq, s = q.shape[1], k.shape[1]
    d, dv = q.shape[2], v.shape[2]

    @pl.when(jnp.logical_and(i_idx == 0, j_idx == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    @pl.when(j_idx == 0)
    def _():
        dv_ref[:] = jnp.zeros_like(dv_ref)

    # Recompute forward for this tile (flash-style).
    scores = _bdot(q, k, (((2,), (2,))))
    logits = scores * scale
    if use_mask:
        ssum = jnp.sum(scores.reshape(bt, h, tq, s), axis=1)
        ssum2d = ssum.reshape(bt * tq, s)
        m, h1, a = _mask_fwd(ssum2d, w1t_ref[:], b1_ref[:], w2t_ref[:],
                             b2_ref[:], dtype)
        logits = (logits.reshape(bt, h, tq, s)
                  + m.reshape(bt, 1, tq, s)).reshape(bt * h, tq, s)
    p = jax.nn.softmax(logits, axis=-1)  # (Bt*H,Tq,S) fp32
    pc = p.astype(dtype)

    # dv[b,h] += p^T @ g   (accumulated over query tiles, fp32)
    dv_ref[:] += _bdot(pc, g, (((1,), (1,)))).reshape(bt, h, s, dv)
    # dp = g @ v^T
    dp = _bdot(g, v, (((2,), (2,))))
    # softmax vjp
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dscores = dlogits * scale
    if use_mask:
        dm = jnp.sum(dlogits.reshape(bt, h, tq, s), axis=1)
        dm2d = dm.reshape(bt * tq, s).astype(dtype)
        ac = a.astype(dtype)
        # m = a @ w2t + b2  (w2t = w2^T), so da = dm @ w2, dw2 = dm^T @ a.
        da = jnp.dot(dm2d, w2_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
        dw2_ref[:] += jax.lax.dot_general(
            dm2d, ac, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (S, 2S)
        db2_ref[:] += jnp.sum(dm2d.astype(jnp.float32), axis=0,
                              keepdims=True)
        dh1 = (da * _dgelu(h1)).astype(dtype)
        dw1_ref[:] += jax.lax.dot_general(
            dh1, ssum2d.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (2S, S)
        db1_ref[:] += jnp.sum(dh1.astype(jnp.float32), axis=0,
                              keepdims=True)
        dssum = jnp.dot(dh1, w1_ref[:].astype(dtype),
                        preferred_element_type=jnp.float32)  # (Bt*Tq, S)
        dscores = (dscores.reshape(bt, h, tq, s)
                   + dssum.reshape(bt, 1, tq, s)).reshape(bt * h, tq, s)

    ds = dscores.astype(dtype)
    dq = _bdot(ds, k, (((2,), (1,))), out_dtype=jnp.float32).reshape(
        bt, h, tq, d)
    dk_contrib = _bdot(ds, q, (((1,), (1,)))).reshape(bt, h, s, d)
    return dq, dk_contrib


def _bwd_kernel(q_ref, k_ref, v_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w1t_ref, w2t_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, scale: float, dtype, use_mask: bool, bt: int, h: int):
    j_idx = pl.program_id(1)
    tq = q_ref.shape[2]
    s = k_ref.shape[2]
    d = q_ref.shape[3]
    dv = v_ref.shape[3]
    q = q_ref[:].reshape(bt * h, tq, d).astype(dtype)
    k = k_ref[:].reshape(bt * h, s, d).astype(dtype)
    v = v_ref[:].reshape(bt * h, s, dv).astype(dtype)
    g = g_ref[:].reshape(bt * h, tq, dv).astype(dtype)

    @pl.when(j_idx == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    dq, dk_contrib = _bwd_core(
        q, k, v, g, w1_ref, b1_ref, w2_ref, b2_ref, w1t_ref, w2t_ref,
        dv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
        scale=scale, dtype=dtype, use_mask=use_mask, bt=bt, h=h)
    dq_ref[:] = dq.astype(dtype)
    dk_ref[:] += dk_contrib


def _make_rope_kernels(has_content: bool, scale: float, dtype, use_mask: bool,
                       bt: int, h: int):
    """Kernels that apply RoPE (learned-frequency tables) and the
    content/rope concat IN VMEM, so the rotated q/k never exist in HBM.

    Forward inputs ordered: [qc, kc,] qr, kr, v, cos_q, sin_q, cos_k, sin_k,
    mask weights. cos/sin blocks: q-side (tq, dr) indexed by the query tile,
    k-side (s, dr) full.

    The backward is ALSO fully in-kernel: it un-rotates the rope-slice
    grads (R^T = -R) and accumulates the cos/sin TABLE grads (the
    reference's RoPE frequencies are learned, Vi_Tools_CNN_less_V2.py:70-72)
    into (S, Dr) outputs — done in XLA these epilogues cost ~40-60 ms/step
    at batch 128 (hlo_stats: the 'neg' + 'reduce_sum' + slice_negate
    fusions), dominated by re-reading q/k-sized tensors from HBM."""

    def _build_parts(refs):
        if has_content:
            (qc_ref, kc_ref, qr_ref, kr_ref, v_ref,
             cq_ref, sq_ref, ck_ref, sk_ref) = refs
        else:
            (qr_ref, kr_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref) = refs
            qc_ref = kc_ref = None
        qr = qr_ref[:].astype(dtype)
        kr = kr_ref[:].astype(dtype)
        cq = cq_ref[:].astype(dtype)
        sq = sq_ref[:].astype(dtype)
        ck = ck_ref[:].astype(dtype)
        sk = sk_ref[:].astype(dtype)
        qrot = _rope_rotate(qr, cq, sq)
        krot = _rope_rotate(kr, ck, sk)
        if has_content:
            q = jnp.concatenate([qc_ref[:].astype(dtype), qrot], axis=-1)
            k = jnp.concatenate([kc_ref[:].astype(dtype), krot], axis=-1)
        else:
            q, k = qrot, krot
        tq = qr.shape[2]
        s = kr.shape[2]
        dv = v_ref.shape[3]
        d = q.shape[-1]
        v = v_ref[:].reshape(bt * h, s, dv).astype(dtype)
        return (q.reshape(bt * h, tq, d), k.reshape(bt * h, s, d), v,
                qr, kr, cq, sq, ck, sk)

    n_in = 9 if has_content else 7

    def fwd_kernel(*refs):
        q, k, v = _build_parts(refs[:n_in])[:3]
        w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref = refs[n_in:]
        _fwd_body(q, k, v, w1t_ref, b1_ref, w2t_ref, b2_ref, o_ref,
                  scale=scale, dtype=dtype, use_mask=use_mask, bt=bt, h=h)

    def bwd_kernel(*refs):
        q, k, v, qr, kr, cq, sq, ck, sk = _build_parts(refs[:n_in])
        (w1_ref, b1_ref, w2_ref, b2_ref, w1t_ref, w2t_ref,
         g_ref) = refs[n_in:n_in + 7]
        outs = refs[n_in + 7:-1]
        dk_acc = refs[-1]  # VMEM scratch (bt, h, s, d) fp32
        if has_content:
            (dqc_ref, dqr_ref, dkc_ref, dkr_ref, dv_ref, dcq_ref, dsq_ref,
             dck_ref, dsk_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = outs
        else:
            (dqr_ref, dkr_ref, dv_ref, dcq_ref, dsq_ref,
             dck_ref, dsk_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = outs
            dqc_ref = dkc_ref = None
        i_idx = pl.program_id(0)
        j_idx = pl.program_id(1)
        n_j = pl.num_programs(1)
        bt_, h_, tq, dr = qr.shape
        s = kr.shape[2]
        dc = q.shape[-1] - dr
        dvd = g_ref.shape[3]
        g = g_ref[:].reshape(bt * h, tq, dvd).astype(dtype)

        @pl.when(jnp.logical_and(i_idx == 0, j_idx == 0))
        def _():
            dcq_ref[:] = jnp.zeros_like(dcq_ref)
            dsq_ref[:] = jnp.zeros_like(dsq_ref)
            dck_ref[:] = jnp.zeros_like(dck_ref)
            dsk_ref[:] = jnp.zeros_like(dsk_ref)

        @pl.when(j_idx == 0)
        def _():
            dk_acc[:] = jnp.zeros_like(dk_acc)

        dq, dk_contrib = _bwd_core(
            q, k, v, g, w1_ref, b1_ref, w2_ref, b2_ref, w1t_ref, w2t_ref,
            dv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
            scale=scale, dtype=dtype, use_mask=use_mask, bt=bt, h=h)

        # q side: final per tile — un-rotate and form table-grad rows.
        gqr = dq[..., dc:]                      # (bt, h, tq, dr) fp32
        if has_content:
            dqc_ref[:] = dq[..., :dc].astype(dtype)
        gqr_c = gqr.astype(dtype)
        dqr_ref[:] = (gqr_c * cq - _rot_half(gqr_c * sq)).astype(dtype)
        qr32 = qr.astype(jnp.float32)
        dcq_ref[pl.ds(j_idx * tq, tq), :] += jnp.sum(
            qr32 * gqr, axis=(0, 1))
        dsq_ref[pl.ds(j_idx * tq, tq), :] += jnp.sum(
            _rot_half(qr32) * gqr, axis=(0, 1))

        # k side: accumulate over query tiles, un-rotate at the last one.
        dk_acc[:] += dk_contrib

        @pl.when(j_idx == n_j - 1)
        def _():
            dk_full = dk_acc[:]
            gkr = dk_full[..., dc:]             # (bt, h, s, dr) fp32
            if has_content:
                dkc_ref[:] = dk_full[..., :dc]
            gkr_c = gkr.astype(dtype)
            dkr_ref[:] = (gkr_c * ck - _rot_half(gkr_c * sk)).astype(
                jnp.float32)
            kr32 = kr.astype(jnp.float32)
            dck_ref[:] += jnp.sum(kr32 * gkr, axis=(0, 1))
            dsk_ref[:] += jnp.sum(_rot_half(kr32) * gkr, axis=(0, 1))

    return fwd_kernel, bwd_kernel


@functools.lru_cache(maxsize=None)
def _make_fused(scale: float, dtype_name: str, use_mask: bool,
                shapes: tuple, interpret: bool = False):
    dtype = jnp.dtype(dtype_name)
    b, h, s, d, dv, s2 = shapes
    tiles = _pick_tiles(b, h, s, d, dv)
    if tiles is None:
        raise ValueError(f"no feasible tiling for B={b}, H={h}, S={s}")
    bt, tq = tiles
    grid = (b // bt, s // tq)

    def q_tile(shape_d):
        return pl.BlockSpec((bt, h, tq, shape_d),
                            lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)

    def kv_full(shape_d):
        return pl.BlockSpec((bt, h, s, shape_d),
                            lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    flops_f = 2 * b * h * s * s * (d + dv) + 4 * b * s * s * s2

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, dtype=dtype,
                          use_mask=use_mask, bt=bt, h=h),
        grid=grid,
        in_specs=[q_tile(d), kv_full(d), kv_full(dv),
                  const((s, s2)), const((1, s2)), const((s2, s)),
                  const((1, s))],
        out_specs=q_tile(dv),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dv), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_f,
            bytes_accessed=4 * b * h * s * (2 * d + 2 * dv),
            transcendentals=b * h * s * s + b * s * s2),
        compiler_params=params,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, dtype=dtype,
                          use_mask=use_mask, bt=bt, h=h),
        grid=grid,
        in_specs=[q_tile(d), kv_full(d), kv_full(dv),
                  const((s2, s)), const((1, s2)), const((s, s2)),
                  const((1, s)), const((s, s2)), const((s2, s)),
                  q_tile(dv)],
        out_specs=(q_tile(d), kv_full(d), kv_full(dv),
                   const((s2, s)), const((1, s2)), const((s, s2)),
                   const((1, s))),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s, d), dtype),
            jax.ShapeDtypeStruct((b, h, s, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, s, dv), jnp.float32),
            jax.ShapeDtypeStruct((s2, s), jnp.float32),
            jax.ShapeDtypeStruct((1, s2), jnp.float32),
            jax.ShapeDtypeStruct((s, s2), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_f,
            bytes_accessed=12 * b * h * s * (d + dv),
            transcendentals=b * h * s * s + b * s * s2),
        compiler_params=params,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(q, k, v, w1, b1, w2, b2):
        return fwd_call(q, k, v, w1.T, b1, w2.T, b2)

    def fused_fwd(q, k, v, w1, b1, w2, b2):
        return (fwd_call(q, k, v, w1.T, b1, w2.T, b2),
                (q, k, v, w1, b1, w2, b2))

    def fused_bwd(res, g):
        q, k, v, w1, b1, w2, b2 = res
        dq, dk, dv, dw1, db1, dw2, db2 = bwd_call(
            q, k, v, w1, b1, w2, b2, w1.T, w2.T, g)
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(b2.dtype))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_masked_attention(q, k, v, w1, b1, w2, b2, *, scale: float, dtype,
                           use_mask: bool = True, interpret: bool = False):
    """q, k: (B,H,S,D); v: (B,H,S,Dv); w1 (2S,S), b1 (2S,), w2 (S,2S),
    b2 (S,) — spectral-normalized weights. Returns (B,H,S,Dv) in `dtype`.

    The weight transposes for the in-kernel mask MLP happen OUTSIDE the
    kernel (XLA, once per call) so no relayout runs per grid step.
    """
    b, h, s, d = q.shape
    dv = v.shape[-1]
    s2 = 2 * s
    # Cast to the compute dtype OUTSIDE the kernel: halves the DMA'd window
    # sizes and the autodiff residuals, and removes in-kernel cast copies.
    # (The cast's own vjp restores the caller's dtypes.)
    q = q.astype(dtype)
    k = k.astype(dtype)
    v = v.astype(dtype)
    if not use_mask:
        z1 = jnp.zeros((s2, s), jnp.float32)
        zb1 = jnp.zeros((1, s2), jnp.float32)
        z2 = jnp.zeros((s, s2), jnp.float32)
        zb2 = jnp.zeros((1, s), jnp.float32)
        fused = _make_fused(scale, jnp.dtype(dtype).name, False,
                            (b, h, s, d, dv, s2), interpret)
        return fused(q, k, v, z1, zb1, z2, zb2)
    fused = _make_fused(scale, jnp.dtype(dtype).name, True,
                        (b, h, s, d, dv, s2), interpret)
    return fused(q, k, v, w1, b1.reshape(1, s2), w2, b2.reshape(1, s))


def rope_supported(b: int, h: int, sq: int, skv: int, dc: int,
                   dr: int) -> bool:
    return (sq == skv
            and _pick_tiles_rope(b, h, sq, dc, dr, dc + dr) is not None)


@functools.lru_cache(maxsize=None)
def _make_rope_fused(scale: float, dtype_name: str, use_mask: bool,
                     has_content: bool, shapes: tuple,
                     interpret: bool = False):
    """fused attention with IN-KERNEL RoPE rotation (+ content concat).

    The rotated q/k and the concatenated (content ++ rope) head tensors
    never exist in HBM — the XLA path materializes both per layer
    (models/vmla.py round-trips ~30-40 ms/step at batch 128 on them). The
    backward kernel emits dq/dk over the concatenated dim; the rope-slice
    un-rotation (R^T = -R) and the cos/sin table grads (needed because the
    reference's RoPE frequencies are LEARNED, Vi_Tools_CNN_less_V2.py:70-72)
    are cheap XLA elementwise/reduction epilogues in the wrapper."""
    dtype = jnp.dtype(dtype_name)
    b, h, s, dc, dr, dv, s2 = shapes
    d = dc + dr
    tiles = _pick_tiles_rope(b, h, s, dc, dr, dv)
    if tiles is None:
        raise ValueError(f"no feasible tiling for B={b}, H={h}, S={s}")
    bt, tq = tiles
    grid = (b // bt, s // tq)

    def q_tile(shape_d):
        return pl.BlockSpec((bt, h, tq, shape_d),
                            lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)

    def kv_full(shape_d):
        return pl.BlockSpec((bt, h, s, shape_d),
                            lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # q-side tables follow the query tile; k-side tables are full-length.
    tab_q = pl.BlockSpec((tq, dr), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM)
    tab_k = const((s, dr))

    qk_specs = ([q_tile(dc), kv_full(dc)] if has_content else []) + [
        q_tile(dr), kv_full(dr), kv_full(dv), tab_q, tab_q, tab_k, tab_k]
    mask_w_fwd = [const((s, s2)), const((1, s2)), const((s2, s)),
                  const((1, s))]
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    flops_f = 2 * b * h * s * s * (d + dv) + 4 * b * s * s * s2

    fwd_kernel, bwd_kernel = _make_rope_kernels(
        has_content, scale, dtype, use_mask, bt, h)

    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid=grid,
        in_specs=qk_specs + mask_w_fwd,
        out_specs=q_tile(dv),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dv), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_f,
            bytes_accessed=4 * b * h * s * (2 * d + 2 * dv),
            transcendentals=b * h * s * s + b * s * s2),
        compiler_params=params,
        interpret=interpret,
    )

    grad_out_specs = ([q_tile(dc)] if has_content else []) + [q_tile(dr)] \
        + ([kv_full(dc)] if has_content else []) + [
        kv_full(dr), kv_full(dv),
        const((s, dr)), const((s, dr)), const((s, dr)), const((s, dr)),
        const((s2, s)), const((1, s2)), const((s, s2)), const((1, s))]
    grad_out_shapes = (
        ([jax.ShapeDtypeStruct((b, h, s, dc), dtype)] if has_content
         else []) + [jax.ShapeDtypeStruct((b, h, s, dr), dtype)]
        + ([jax.ShapeDtypeStruct((b, h, s, dc), jnp.float32)]
           if has_content else []) + [
            jax.ShapeDtypeStruct((b, h, s, dr), jnp.float32),
            jax.ShapeDtypeStruct((b, h, s, dv), jnp.float32),
            jax.ShapeDtypeStruct((s, dr), jnp.float32),
            jax.ShapeDtypeStruct((s, dr), jnp.float32),
            jax.ShapeDtypeStruct((s, dr), jnp.float32),
            jax.ShapeDtypeStruct((s, dr), jnp.float32),
            jax.ShapeDtypeStruct((s2, s), jnp.float32),
            jax.ShapeDtypeStruct((1, s2), jnp.float32),
            jax.ShapeDtypeStruct((s, s2), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.float32)])

    bwd_call = pl.pallas_call(
        bwd_kernel,
        grid=grid,
        in_specs=qk_specs + [const((s2, s)), const((1, s2)),
                             const((s, s2)), const((1, s)),
                             const((s, s2)), const((s2, s)),
                             q_tile(dv)],
        out_specs=tuple(grad_out_specs),
        out_shape=tuple(grad_out_shapes),
        scratch_shapes=[pltpu.VMEM((bt, h, s, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_f,
            bytes_accessed=12 * b * h * s * (d + dv),
            transcendentals=b * h * s * s + b * s * s2),
        compiler_params=params,
        interpret=interpret,
    )

    if has_content:
        @jax.custom_vjp
        def fused(qc, kc, qr, kr, v, cq, sq, ck, sk, w1, b1, w2, b2):
            return fwd_call(qc, kc, qr, kr, v, cq, sq, ck, sk,
                            w1.T, b1, w2.T, b2)

        def fused_fwd(qc, kc, qr, kr, v, cq, sq, ck, sk, w1, b1, w2, b2):
            return (fwd_call(qc, kc, qr, kr, v, cq, sq, ck, sk,
                             w1.T, b1, w2.T, b2),
                    (qc, kc, qr, kr, v, cq, sq, ck, sk, w1, b1, w2, b2))

        def fused_bwd(res, g):
            qc, kc, qr, kr, v, cq, sq, ck, sk, w1, b1, w2, b2 = res
            (dqc, dqr, dkc, dkr, dvv, dcq, dsq, dck, dsk,
             dw1, db1, dw2, db2) = bwd_call(
                qc, kc, qr, kr, v, cq, sq, ck, sk,
                w1, b1, w2, b2, w1.T, w2.T, g)
            return (dqc.astype(qc.dtype), dkc.astype(kc.dtype),
                    dqr.astype(qr.dtype), dkr.astype(kr.dtype),
                    dvv.astype(v.dtype),
                    dcq.astype(cq.dtype), dsq.astype(sq.dtype),
                    dck.astype(ck.dtype), dsk.astype(sk.dtype),
                    dw1.astype(w1.dtype), db1.astype(b1.dtype),
                    dw2.astype(w2.dtype), db2.astype(b2.dtype))
    else:
        @jax.custom_vjp
        def fused(qr, kr, v, cq, sq, ck, sk, w1, b1, w2, b2):
            return fwd_call(qr, kr, v, cq, sq, ck, sk, w1.T, b1, w2.T, b2)

        def fused_fwd(qr, kr, v, cq, sq, ck, sk, w1, b1, w2, b2):
            return (fwd_call(qr, kr, v, cq, sq, ck, sk, w1.T, b1, w2.T, b2),
                    (qr, kr, v, cq, sq, ck, sk, w1, b1, w2, b2))

        def fused_bwd(res, g):
            qr, kr, v, cq, sq, ck, sk, w1, b1, w2, b2 = res
            (dqr, dkr, dvv, dcq, dsq, dck, dsk,
             dw1, db1, dw2, db2) = bwd_call(
                qr, kr, v, cq, sq, ck, sk, w1, b1, w2, b2, w1.T, w2.T, g)
            return (dqr.astype(qr.dtype), dkr.astype(kr.dtype),
                    dvv.astype(v.dtype),
                    dcq.astype(cq.dtype), dsq.astype(sq.dtype),
                    dck.astype(ck.dtype), dsk.astype(sk.dtype),
                    dw1.astype(w1.dtype), db1.astype(b1.dtype),
                    dw2.astype(w2.dtype), db2.astype(b2.dtype))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_rope_attention(qc, qr, kc, kr, v, cos_q, sin_q, cos_k, sin_k,
                         w1, b1, w2, b2, *, scale: float, dtype,
                         use_mask: bool = True, interpret: bool = False):
    """Fused attention with in-kernel RoPE (+ optional content concat).

    qr, kr: (B,H,S,Dr) raw (un-rotated) rope projections; qc, kc:
    (B,H,S,Dc) content halves or None (full-dim rotation, the non-reduce
    VMLA layers); cos/sin: (S,Dr) fp32 tables from the learned frequencies.
    Returns (B,H,S,Dv) in `dtype`. Reference chain being fused:
    Vi_Tools_CNN_less_V2.py:274-298 (rotate, concat, mask MLP, SDPA)."""
    has_content = qc is not None
    b, h, s, dr = qr.shape
    dc = qc.shape[-1] if has_content else 0
    dv = v.shape[-1]
    s2 = 2 * s
    qr = qr.astype(dtype)
    kr = kr.astype(dtype)
    v = v.astype(dtype)
    if not use_mask:
        w1 = jnp.zeros((s2, s), jnp.float32)
        b1 = jnp.zeros((s2,), jnp.float32)
        w2 = jnp.zeros((s, s2), jnp.float32)
        b2 = jnp.zeros((s,), jnp.float32)
    fused = _make_rope_fused(scale, jnp.dtype(dtype).name, use_mask,
                             has_content, (b, h, s, dc, dr, dv, s2),
                             interpret)
    b1 = b1.reshape(1, s2)
    b2 = b2.reshape(1, s)
    if has_content:
        return fused(qc.astype(dtype), kc.astype(dtype), qr, kr, v,
                     cos_q, sin_q, cos_k, sin_k, w1, b1, w2, b2)
    return fused(qr, kr, v, cos_q, sin_q, cos_k, sin_k, w1, b1, w2, b2)


def _est_hires_a(bt: int, h: int, tq: int, s: int, d: int, dv: int,
                 s2: int) -> int:
    # Query-tiled dq+mask-grad pass: ~6 live fp32 score tiles (x2 Mosaic
    # slack — measured: (1, tq=64) at S=1024/D=256 compiles and runs, and
    # is 7.6% faster than tq=32, so the x3 slack the one-kernel bwd needs
    # is too conservative here) + resident k/v (bf16, x2 pipeline) +
    # 3 mask weights bf16 + fp32 weight-grad accumulators + small tiles.
    live = 2 * 4 * (6 * bt * h * tq * s + 4 * bt * tq * s)
    resident = (2 * 2 * bt * h * s * (d + dv)      # k, v double-buffered
                + 2 * 3 * s * s2                   # w1t, w1, w2 bf16
                + 4 * 2 * s * s2 + 4 * 3 * s2)     # dw1, dw2 fp32 + biases
    return live + resident


def _est_hires_b(bt: int, h: int, tk: int, s: int, d: int, dv: int) -> int:
    # Key-tiled dk/dv pass: ~5 live fp32 (s, tk) score tiles (x2 slack;
    # tk=128 measured on chip) + resident q/g (bf16, x2) + saved-residual
    # column tiles.
    live = 2 * 4 * (5 * bt * h * s * tk + 4 * bt * s * tk)
    resident = 2 * 2 * bt * h * s * (d + dv)       # q, g double-buffered
    return live + resident


_HIRES_BUDGET = 96 * 1024 * 1024

# On-chip sweep (v5e, fwd+bwd chained, r3): at S=1024/D=256 the analytic
# VMEM estimates are too conservative — tq=tk=128 compiles and runs, and
# the tuned tiles put the fused path AHEAD of chunked-XLA at every batch
# (B=2: 4.50 vs 4.93 ms; B=8: 7.51 vs 9.73), where the round-2 tq=32/tk=64
# default lost at small batch (7.6 vs 5.1 ms).
_MEASURED_HIRES_TILES: dict[tuple, dict[int, tuple[int, int, int]]] = {
    (12, 1024, 256): {2: (1, 64, 64), 8: (1, 128, 128)},
}


def _pick_hires_tiles(b: int, h: int, s: int, d: int,
                      dv: int, s2: int) -> tuple[int, int, int] | None:
    """(bt, tq, tk) for the two-pass hires backward, or None."""
    tuned = _tuned_tiles("hires", (b, h, s, d, dv, s2))
    if tuned is not None:
        return tuned
    by_b = _MEASURED_HIRES_TILES.get((h, s, d))
    if by_b is not None and d == dv:
        best = by_b.get(b) or by_b[max(by_b)]
        if b % best[0] == 0:
            return best
    for bt in (2, 1):
        if b % bt:
            continue
        tq = next((t for t in (128, 64, 32)
                   if s % t == 0
                   and _est_hires_a(bt, h, t, s, d, dv, s2)
                   <= _HIRES_BUDGET), None)
        tk = next((t for t in (128, 64, 32)
                   if s % t == 0
                   and _est_hires_b(bt, h, t, s, d, dv) <= _HIRES_BUDGET),
                  None)
        if tq and tk:
            return bt, tq, tk
    return None


def hires_supported(b: int, h: int, sq: int, skv: int, d: int,
                    dv: int | None = None) -> bool:
    dv = d if dv is None else dv
    return (sq == skv
            and _pick_tiles_fwd(b, h, sq, d, dv) is not None
            and _pick_hires_tiles(b, h, sq, d, dv, 2 * sq) is not None)


def _fwd_res_kernel(q_ref, k_ref, v_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                    o_ref, m_ref, lse_ref, *, scale: float, dtype,
                    bt: int, h: int):
    """Forward emitting softmax/mask residuals for the two-pass backward:
    m (mask MLP output, fp32) and lse (log-sum-exp of the masked logits).
    lse is laid out (B, S, H) — a (tq, h) block satisfies the TPU
    block-shape rule (tq % 8 == 0, h equals the full array dim), which the
    natural (B, H, S) tile does not."""
    tq = q_ref.shape[2]
    s = k_ref.shape[2]
    d = q_ref.shape[3]
    dv = v_ref.shape[3]
    q = q_ref[:].reshape(bt * h, tq, d).astype(dtype)
    k = k_ref[:].reshape(bt * h, s, d).astype(dtype)
    v = v_ref[:].reshape(bt * h, s, dv).astype(dtype)
    scores = _bdot(q, k, (((2,), (2,))))
    logits = scores * scale
    ssum = jnp.sum(scores.reshape(bt, h, tq, s), axis=1)
    m, _, _ = _mask_fwd(ssum.reshape(bt * tq, s), w1t_ref[:], b1_ref[:],
                        w2t_ref[:], b2_ref[:], dtype)
    m_ref[:] = m.reshape(bt, tq, s)
    logits = (logits.reshape(bt, h, tq, s)
              + m.reshape(bt, 1, tq, s)).reshape(bt * h, tq, s)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    se = jnp.sum(jnp.exp(logits - mx), axis=-1, keepdims=True)
    lse = mx + jnp.log(se)
    lse_ref[:] = jnp.swapaxes(lse.reshape(bt, h, tq), 1, 2)
    p = jnp.exp(logits - lse)
    out = _bdot(p.astype(dtype), v, (((2,), (1,))))
    o_ref[:] = out.reshape(bt, h, tq, dv).astype(dtype)


def _hires_dq_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, lse_ref, delta_ref,
                     w1t_ref, b1_ref, w1_ref, w2_ref,
                     dq_ref, dssum_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                     *, scale: float, dtype, bt: int, h: int):
    """Pass A (query-tiled): dq + mask-MLP weight grads + the dssum
    residual pass B needs. Uses saved m/lse (no softmax re-derivation) and
    delta = rowsum(g*o) (the standard flash-backward identity for the
    softmax jacobian contraction)."""
    i_idx = pl.program_id(0)
    j_idx = pl.program_id(1)
    tq = q_ref.shape[2]
    s = k_ref.shape[2]
    d = q_ref.shape[3]
    dv = v_ref.shape[3]

    @pl.when(jnp.logical_and(i_idx == 0, j_idx == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    q = q_ref[:].reshape(bt * h, tq, d).astype(dtype)
    k = k_ref[:].reshape(bt * h, s, d).astype(dtype)
    v = v_ref[:].reshape(bt * h, s, dv).astype(dtype)
    g = g_ref[:].reshape(bt * h, tq, dv).astype(dtype)

    scores = _bdot(q, k, (((2,), (2,))))
    logits = (scores.reshape(bt, h, tq, s) * scale
              + m_ref[:].reshape(bt, 1, tq, s)).reshape(bt * h, tq, s)
    # lse/delta arrive (bt, tq, h) — see _fwd_res_kernel layout note.
    lse = jnp.swapaxes(lse_ref[:], 1, 2).reshape(bt * h, tq, 1)
    p = jnp.exp(logits - lse)
    dp = _bdot(g, v, (((2,), (2,))))
    delta = jnp.swapaxes(delta_ref[:], 1, 2).reshape(bt * h, tq, 1)
    dlogits = p * (dp - delta)

    dm = jnp.sum(dlogits.reshape(bt, h, tq, s), axis=1)
    dm2d = dm.reshape(bt * tq, s).astype(dtype)
    ssum = jnp.sum(scores.reshape(bt, h, tq, s), axis=1)
    ssum2d = ssum.reshape(bt * tq, s)
    h1 = jnp.dot(ssum2d.astype(dtype), w1t_ref[:].astype(dtype),
                 preferred_element_type=jnp.float32) + b1_ref[:]
    a = _gelu(h1).astype(dtype)
    da = jnp.dot(dm2d, w2_ref[:].astype(dtype),
                 preferred_element_type=jnp.float32)
    dw2_ref[:] += jax.lax.dot_general(
        dm2d, a, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(dm2d.astype(jnp.float32), axis=0, keepdims=True)
    dh1 = (da * _dgelu(h1)).astype(dtype)
    dw1_ref[:] += jax.lax.dot_general(
        dh1, ssum2d.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dh1.astype(jnp.float32), axis=0, keepdims=True)
    dssum = jnp.dot(dh1, w1_ref[:].astype(dtype),
                    preferred_element_type=jnp.float32)
    dssum_ref[:] = dssum.reshape(bt, tq, s)

    dscores = (dlogits.reshape(bt, h, tq, s) * scale
               + dssum.reshape(bt, 1, tq, s)).reshape(bt * h, tq, s)
    dq_ref[:] = _bdot(dscores.astype(dtype), k, (((2,), (1,))),
                      out_dtype=jnp.float32).reshape(
        bt, h, tq, d).astype(dtype)


def _hires_dkv_kernel(q_ref, k_ref, v_ref, g_ref, mt_ref, lse_ref,
                      delta_ref, dssumt_ref, dk_ref, dv_ref,
                      *, scale: float, dtype, bt: int, h: int):
    """Pass B (key-tiled): dk and dv from the saved residuals. No mask
    weights needed — the mask's contribution to dscores arrives via the
    dssum residual computed in pass A. Everything runs in (key-tile,
    query) orientation: score tiles are (tk, S), the m/dssum residuals
    arrive pre-transposed (B, S_key, S_query) from XLA, and lse/delta
    broadcast along the last (query) axis — no in-kernel transposes and
    every block shape is TPU-legal (tk % 8 == 0, last dim full)."""
    s = q_ref.shape[2]
    tk = k_ref.shape[2]
    d = q_ref.shape[3]
    dvd = v_ref.shape[3]
    q = q_ref[:].reshape(bt * h, s, d).astype(dtype)
    k = k_ref[:].reshape(bt * h, tk, d).astype(dtype)
    v = v_ref[:].reshape(bt * h, tk, dvd).astype(dtype)
    g = g_ref[:].reshape(bt * h, s, dvd).astype(dtype)

    scores = _bdot(k, q, (((2,), (2,))))  # (bt*h, tk, s)
    logits = (scores.reshape(bt, h, tk, s) * scale
              + mt_ref[:].reshape(bt, 1, tk, s)).reshape(bt * h, tk, s)
    lse = lse_ref[:].reshape(bt * h, 1, s)
    p = jnp.exp(logits - lse)
    pc = p.astype(dtype)
    dv_ref[:] = _bdot(pc, g, (((2,), (1,)))).reshape(
        bt, h, tk, dvd).astype(dtype)
    dp = _bdot(v, g, (((2,), (2,))))  # (bt*h, tk, s)
    delta = delta_ref[:].reshape(bt * h, 1, s)
    dlogits = p * (dp - delta)
    dscores = (dlogits.reshape(bt, h, tk, s) * scale
               + dssumt_ref[:].reshape(bt, 1, tk, s)).reshape(bt * h, tk, s)
    dk_ref[:] = _bdot(dscores.astype(dtype), q, (((2,), (1,)))).reshape(
        bt, h, tk, d).astype(dtype)


@functools.lru_cache(maxsize=None)
def _make_hires_fused(scale: float, dtype_name: str, shapes: tuple,
                      interpret: bool = False):
    """Fully fused attention for shapes whose one-kernel backward exceeds
    VMEM (the 1024px stretch stages): forward saves (m, lse) residuals;
    backward is TWO kernels — query-tiled dq+mask-grads (emitting dssum)
    and key-tiled dk/dv — flash-style with delta = rowsum(g*o), so nothing
    score-sized ever reaches HBM except the (B,S,S) fp32 m/dssum residuals
    (~17 MB at the hires batch; the score tensor itself would be 50x that
    per head stack). Replaces the round-1 hybrid pallas-fwd/chunked-XLA
    path (VERDICT r1 #6)."""
    dtype = jnp.dtype(dtype_name)
    b, h, s, d, dv, s2 = shapes
    fwd_tiles = _pick_tiles_fwd(b, h, s, d, dv)
    bwd_tiles = _pick_hires_tiles(b, h, s, d, dv, s2)
    if fwd_tiles is None or bwd_tiles is None:
        raise ValueError(f"no feasible hires tiling for B={b}, H={h}, S={s}")
    btf, tqf = fwd_tiles
    bt, tq, tk = bwd_tiles

    def q_tile(bt_, t, shape_d):
        return pl.BlockSpec((bt_, h, t, shape_d),
                            lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)

    def kv_full(bt_, shape_d):
        return pl.BlockSpec((bt_, h, s, shape_d),
                            lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    flops_f = 2 * b * h * s * s * (d + dv) + 4 * b * s * s * s2

    # row-tiled (b, s, s) / (b, s, h) residual specs (lse/delta live in
    # (B, S, H) layout — see _fwd_res_kernel)
    def row_tile(bt_, t):
        return pl.BlockSpec((bt_, t, s), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def sh_tile(bt_, t):
        return pl.BlockSpec((bt_, t, h), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_res_kernel, scale=scale, dtype=dtype,
                          bt=btf, h=h),
        grid=(b // btf, s // tqf),
        in_specs=[q_tile(btf, tqf, d), kv_full(btf, d), kv_full(btf, dv),
                  const((s, s2)), const((1, s2)), const((s2, s)),
                  const((1, s))],
        out_specs=(q_tile(btf, tqf, dv), row_tile(btf, tqf),
                   sh_tile(btf, tqf)),
        out_shape=(jax.ShapeDtypeStruct((b, h, s, dv), dtype),
                   jax.ShapeDtypeStruct((b, s, s), jnp.float32),
                   jax.ShapeDtypeStruct((b, s, h), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=flops_f,
            bytes_accessed=4 * b * h * s * (2 * d + 2 * dv) + 8 * b * s * s,
            transcendentals=b * h * s * s + b * s * s2),
        compiler_params=params, interpret=interpret)

    dq_call = pl.pallas_call(
        functools.partial(_hires_dq_kernel, scale=scale, dtype=dtype,
                          bt=bt, h=h),
        grid=(b // bt, s // tq),
        in_specs=[q_tile(bt, tq, d), kv_full(bt, d), kv_full(bt, dv),
                  q_tile(bt, tq, dv), row_tile(bt, tq), sh_tile(bt, tq),
                  sh_tile(bt, tq),
                  const((s, s2)), const((1, s2)), const((s2, s)),
                  const((s, s2))],
        out_specs=(q_tile(bt, tq, d), row_tile(bt, tq),
                   const((s2, s)), const((1, s2)), const((s, s2)),
                   const((1, s))),
        out_shape=(jax.ShapeDtypeStruct((b, h, s, d), dtype),
                   jax.ShapeDtypeStruct((b, s, s), jnp.float32),
                   jax.ShapeDtypeStruct((s2, s), jnp.float32),
                   jax.ShapeDtypeStruct((1, s2), jnp.float32),
                   jax.ShapeDtypeStruct((s, s2), jnp.float32),
                   jax.ShapeDtypeStruct((1, s), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=flops_f + 4 * b * s * s * s2,
            bytes_accessed=4 * b * h * s * (2 * d + dv) + 16 * b * s * s,
            transcendentals=b * s * s2),
        compiler_params=params, interpret=interpret)

    # key-tiled residual specs: m/dssum arrive pre-transposed (B, Sk, Sq),
    # so a key tile is a ROW block of the transposed array.
    def colt_tile(t):
        return pl.BlockSpec((bt, t, s), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def k_tile(t, shape_d):
        return pl.BlockSpec((bt, h, t, shape_d), lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)

    def hs_full():
        return pl.BlockSpec((bt, h, s), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    dkv_call = pl.pallas_call(
        functools.partial(_hires_dkv_kernel, scale=scale, dtype=dtype,
                          bt=bt, h=h),
        grid=(b // bt, s // tk),
        in_specs=[kv_full(bt, d), k_tile(tk, d), k_tile(tk, dv),
                  kv_full(bt, dv), colt_tile(tk), hs_full(), hs_full(),
                  colt_tile(tk)],
        out_specs=(k_tile(tk, d), k_tile(tk, dv)),
        out_shape=(jax.ShapeDtypeStruct((b, h, s, d), dtype),
                   jax.ShapeDtypeStruct((b, h, s, dv), dtype)),
        cost_estimate=pl.CostEstimate(
            flops=flops_f,
            bytes_accessed=4 * b * h * s * (2 * d + 2 * dv) + 16 * b * s * s,
            transcendentals=b * h * s * s),
        compiler_params=params, interpret=interpret)

    @jax.custom_vjp
    def fused(q, k, v, w1, b1, w2, b2):
        o, _, _ = fwd_call(q, k, v, w1.T, b1, w2.T, b2)
        return o

    def fused_fwd(q, k, v, w1, b1, w2, b2):
        o, m, lse = fwd_call(q, k, v, w1.T, b1, w2.T, b2)
        return o, (q, k, v, w1, b1, w2, b2, m, lse, o)

    def fused_bwd(res, g):
        q, k, v, w1, b1, w2, b2, m, lse, o = res
        # delta = rowsum(dp * p) = rowsum(g * o): tiny XLA epilogue,
        # emitted in the (B, S, H) layout pass A consumes.
        delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1).swapaxes(1, 2)
        g = g.astype(q.dtype)
        # bf16 mask weights: the kernels cast before use anyway; passing
        # them pre-cast halves their VMEM residency in pass A.
        w1c = w1.astype(dtype)
        w2c = w2.astype(dtype)
        dq, dssum, dw1, db1, dw2, db2 = dq_call(
            q, k, v, g, m, lse, delta, w1c.T, b1, w1c, w2c)
        # Pass B consumes the score-shaped residuals transposed to
        # (B, S_key, S_query) and lse/delta back in (B, H, S).
        dk, dvv = dkv_call(q, k, v, g, m.swapaxes(1, 2),
                           lse.swapaxes(1, 2), delta.swapaxes(1, 2),
                           dssum.swapaxes(1, 2))
        return (dq.astype(q.dtype), dk.astype(k.dtype), dvv.astype(v.dtype),
                dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(b2.dtype))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_hires_attention(q, k, v, w1, b1, w2, b2, *, scale: float, dtype,
                          interpret: bool = False):
    """Fully fused masked attention with the two-pass flash backward, for
    long-sequence shapes (hires 1024px config) whose one-kernel backward
    exceeds VMEM. Same interface as fused_masked_attention (mask always
    on — every reference call site passes mask=True)."""
    b, h, s, d = q.shape
    dv = v.shape[-1]
    s2 = 2 * s
    q = q.astype(dtype)
    k = k.astype(dtype)
    v = v.astype(dtype)
    fused = _make_hires_fused(scale, jnp.dtype(dtype).name,
                              (b, h, s, d, dv, s2), interpret)
    return fused(q, k, v, w1, b1.reshape(1, s2), w2, b2.reshape(1, s))


@functools.lru_cache(maxsize=None)
def _make_fwd_only(scale: float, dtype_name: str, use_mask: bool,
                   shapes: tuple, interpret: bool = False):
    """Forward-only pallas_call with the (laxer) forward tiling — used by the
    hybrid pallas-forward / XLA-backward path (ops/attention.py) for shapes
    whose backward kernel exceeds VMEM or the toolchain."""
    dtype = jnp.dtype(dtype_name)
    b, h, s, d, dv, s2 = shapes
    tiles = _pick_tiles_fwd(b, h, s, d, dv)
    if tiles is None:
        raise ValueError(f"no feasible fwd tiling for B={b}, H={h}, S={s}")
    bt, tq = tiles
    grid = (b // bt, s // tq)

    def q_tile(shape_d):
        return pl.BlockSpec((bt, h, tq, shape_d),
                            lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)

    def kv_full(shape_d):
        return pl.BlockSpec((bt, h, s, shape_d),
                            lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, dtype=dtype,
                          use_mask=use_mask, bt=bt, h=h),
        grid=grid,
        in_specs=[q_tile(d), kv_full(d), kv_full(dv),
                  const((s, s2)), const((1, s2)), const((s2, s)),
                  const((1, s))],
        out_specs=q_tile(dv),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dv), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * s * s * (d + dv) + 4 * b * s * s * s2,
            bytes_accessed=4 * b * h * s * (2 * d + 2 * dv),
            transcendentals=b * h * s * s + b * s * s2),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


def fused_attention_forward(q, k, v, w1, b1, w2, b2, *, scale: float,
                            dtype, use_mask: bool = True,
                            interpret: bool = False):
    """Forward-only fused attention (no custom VJP — callers provide their
    own backward, see ops/attention.py hybrid path)."""
    b, h, s, d = q.shape
    dv = v.shape[-1]
    s2 = 2 * s
    q = q.astype(dtype)
    k = k.astype(dtype)
    v = v.astype(dtype)
    if not use_mask:
        w1 = jnp.zeros((s2, s), jnp.float32)
        b1 = jnp.zeros((s2,), jnp.float32)
        w2 = jnp.zeros((s, s2), jnp.float32)
        b2 = jnp.zeros((s,), jnp.float32)
    call = _make_fwd_only(scale, jnp.dtype(dtype).name, use_mask,
                          (b, h, s, d, dv, s2), interpret)
    return call(q, k, v, w1.T, b1.reshape(1, s2), w2.T, b2.reshape(1, s))
