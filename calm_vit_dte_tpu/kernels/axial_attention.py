"""Fused Pallas TPU kernel: axial attention with learned additive masking.

Fuses the whole chain the reference runs as five separate CUDA launches
(reference: Vi_Tools_CNN_less_V2.py:286-298 — flattened QK^T, 2-layer mask
MLP, SDPA's internal QK^T again, softmax, PV):

    per batch element b (one grid step):
        scores[h]  = q[h] @ k[h]^T            (H, S, S)   fp32 accum, VMEM
        ssum       = sum_h scores[h]          (S, S)      == flattened QK^T
        mask       = gelu(ssum @ w1^T + b1) @ w2^T + b2
        p[h]       = softmax(scores[h]*scale + mask)      fp32
        out[h]     = p[h] @ v[h]

The (B, H, S, S) score tensor NEVER reaches HBM — at the reference's batch
484 / S 224 it would be 109 GB in fp32, which is why the XLA fallback must
batch-chunk (ops/attention.py) and why the reference only survives on
torch's memory-efficient SDPA backend. Here HBM traffic is exactly
q,k,v in + out: the kernel is compute-bound on the MXU.

Backward is a second Pallas kernel (flash-style): recomputes scores/mask/p
from the inputs in VMEM and emits dq, dk, dv per batch element plus mask-MLP
weight grads accumulated across the sequential grid.

Supported when Sq == Skv (always true in CALM-ViT: every mask MLP operates
on a square S x S matrix) and the per-batch working set fits VMEM —
S <= ~512 at H = 12. The 1024px stretch config needs the blocked variant
(future work; ops/attention.py falls back to the chunked XLA path there).
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
_VMEM_BUDGET = 80 * 1024 * 1024


def supported(h: int, sq: int, skv: int) -> bool:
    if sq != skv:
        return False
    # Backward working set: ~6 live fp32 (H,S,S) tensors (scores, logits, p,
    # dp, dlogits, dscores) + bf16 copies + the mask MLP activations.
    est = 4 * (6 * h * sq * skv + 6 * sq * skv)
    return est <= _VMEM_BUDGET


def _erf(x):
    # Mosaic has no erf/erfc lowering; Abramowitz-Stegun 7.1.26 polynomial,
    # max abs error 1.5e-7 — exact at bf16/fp32 working precision. Evaluated
    # in fp32.
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
    """(H,S,D) x (H,S,D) -> (H,S,S) fp32."""
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
        logits = logits + m.astype(jnp.float32)[None]
    p = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, scale: float, dtype, use_mask: bool):
    q = q_ref[0].astype(dtype)
    k = k_ref[0].astype(dtype)
    v = v_ref[0].astype(dtype)
    g = g_ref[0].astype(dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # Recompute forward (flash-style).
    scores = _scores(q, k)
    logits = scores * scale
    if use_mask:
        w1 = w1_ref[:]
        b1 = b1_ref[:]
        w2 = w2_ref[:]
        b2 = b2_ref[:]
        ssum = jnp.sum(scores, axis=0)
        m, h1, a = _mask_fwd(ssum, w1, b1, w2, b2, dtype)
        logits = logits + m.astype(jnp.float32)[None]
    p = jax.nn.softmax(logits, axis=-1)  # (H,S,S) fp32
    pc = p.astype(dtype)

    # dv[h] = p[h]^T @ g[h]
    dv_ref[0] = jax.lax.dot_general(
        pc, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dtype)
    # dp[h] = g[h] @ v[h]^T
    dp = jax.lax.dot_general(
        g, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # softmax vjp: dlogits = p * (dp - sum(dp * p, -1))
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dscores = dlogits * scale
    if use_mask:
        dm = jnp.sum(dlogits, axis=0).astype(dtype)  # (S,S)
        a = a.astype(dtype)
        # m = a @ w2^T + b2
        da = jnp.dot(dm, w2.astype(dtype),
                     preferred_element_type=jnp.float32)
        dw2 = jax.lax.dot_general(
            dm, a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (S, 2S)
        db2 = jnp.sum(dm, axis=0, keepdims=True).astype(jnp.float32)
        dh1 = (da * _dgelu(h1)).astype(dtype)
        dw1 = jax.lax.dot_general(
            dh1, ssum.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (2S, S)
        db1 = jnp.sum(dh1.astype(jnp.float32), axis=0, keepdims=True)
        dssum = jnp.dot(dh1, w1.astype(dtype),
                        preferred_element_type=jnp.float32)  # (S,S)
        dscores = dscores + dssum[None]

        dw1_ref[:] += dw1
        db1_ref[:] += db1
        dw2_ref[:] += dw2
        db2_ref[:] += db2

    ds = dscores.astype(dtype)
    # dq[h] = ds[h] @ k[h]; dk[h] = ds[h]^T @ q[h]
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dtype)


def _batch_specs(b, h, s, d, dv):
    item = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return item, full


@functools.lru_cache(maxsize=None)
def _make_fused(scale: float, dtype_name: str, use_mask: bool,
                shapes: tuple, interpret: bool = False):
    dtype = jnp.dtype(dtype_name)
    b, h, s, d, dv, s2 = shapes

    item, full = _batch_specs(b, h, s, d, dv)
    in_specs = [item((h, s, d)), item((h, s, d)), item((h, s, dv)),
                full((s2, s)), full((1, s2)), full((s, s2)), full((1, s))]

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, dtype=dtype,
                          use_mask=use_mask),
        grid=(b,),
        in_specs=in_specs,
        out_specs=item((h, s, dv)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dv), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * s * s * (d + dv) + 4 * b * s * s * s2,
            bytes_accessed=4 * b * h * s * (2 * d + 2 * dv),
            transcendentals=b * h * s * s + b * s * s2),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, dtype=dtype,
                          use_mask=use_mask),
        grid=(b,),
        in_specs=in_specs + [item((h, s, dv))],
        out_specs=(item((h, s, d)), item((h, s, d)), item((h, s, dv)),
                   full((s2, s)), full((1, s2)), full((s, s2)),
                   full((1, s))),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s, d), dtype),
            jax.ShapeDtypeStruct((b, h, s, d), dtype),
            jax.ShapeDtypeStruct((b, h, s, dv), dtype),
            jax.ShapeDtypeStruct((s2, s), jnp.float32),
            jax.ShapeDtypeStruct((1, s2), jnp.float32),
            jax.ShapeDtypeStruct((s, s2), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * s * s * (d + dv) + 12 * b * s * s * s2,
            bytes_accessed=12 * b * h * s * (d + dv),
            transcendentals=b * h * s * s + b * s * s2),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
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
