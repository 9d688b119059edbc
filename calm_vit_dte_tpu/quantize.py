"""Post-training int8 quantization for the serving path.

The reference has no serving or quantization story at all (SURVEY.md §1);
this module adds one the TPU way, in two schemes:

w8a8 dynamic (``mode='w8a8'``, Predictor quantize='int8'):
  * weights: symmetric per-output-channel int8 — each row of the frozen,
    already spectral-normalized (out, in) matrix is scaled by
    absmax(row)/127 and rounded; stored as {'w_q': int8, 'w_s': f32 (out,)}
    replacing 'w'.
  * activations: symmetric per-token dynamic quantization at trace time —
    absmax over the contraction axis, no calibration data needed.
  * the matmul runs int8 x int8 with preferred_element_type=int32 (MXU,
    2x the bf16 rate on v5e), then one fused rescale (sx * w_s) back to
    the compute dtype.

w8a16 weight-only (``mode='w8a16'``, Predictor quantize='int8-wo'):
  * same per-output-channel int8 weights, stored as {'w_q', 'w_so'} —
    the distinct scale key statically selects the scheme at trace time.
  * activations stay bf16; the weight dequant is an exact int8->bf16
    convert (|q| <= 127 is exactly representable) feeding a bf16 MXU
    matmul, with the per-channel scale applied to the fp32 accumulator.
  * rationale: on memory-bound serving shapes (hires 935M params at
    small batch) the w8a8 per-token absmax/round/rescale is pure VPU
    overhead added to every matmul and measured SLOWER than bf16
    (NOTES.md); weight-only keeps the 2x weight-HBM win and drops that
    overhead, and is strictly more accurate (no activation rounding).

What gets quantized: every 2-D spectral-normed linear weight EXCEPT the
attention-mask MLP (its weights are operands of the fused Pallas attention
kernel, kernels/axial_attention.py, which consumes float tiles). LayerNorm,
LayerScale, RoPE tables, biases and conv taps stay float — they are
vector-unit work, not MXU work.

Training is never quantized: quantize_tree applies to the frozen eval-mode
weights only (serve.Predictor(..., quantize=...)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Param-tree keys a quantized node carries instead of 'w'. The scale key
# doubles as the scheme selector (dict keys are static pytree structure):
# SKEY -> w8a8 dynamic, WOKEY -> w8a16 weight-only.
QKEY = "w_q"
SKEY = "w_s"
WOKEY = "w_so"

# Node names whose weights must stay float (consumed inside Pallas kernels).
_SKIP = ("linear_mask",)


def is_quantized(node: dict) -> bool:
    return isinstance(node, dict) and QKEY in node


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 of a (out, in) matrix.
    Returns (w_q int8 (out, in), w_s f32 (out,))."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=1)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w32 / scale[:, None]), -127, 127)
    return wq.astype(jnp.int8), scale


def _dynamic_quant(x: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric dynamic int8 over `axis` (the contraction axis).
    Returns (x_q int8, scale f32 keepdims)."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def qdot(x: jax.Array, wq: jax.Array, ws: jax.Array, b=None, *,
         dtype) -> jax.Array:
    """y = x @ dequant(wq).T (+ b): int8 MXU matmul with fused rescale.
    x: (..., in); wq: (out, in) int8; ws: (out,) f32."""
    xq, sx = _dynamic_quant(x, axis=-1)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * sx * ws).astype(dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y


def qdot_seq(x: jax.Array, wq: jax.Array, ws: jax.Array, *,
             dtype) -> jax.Array:
    """Sequence-axis contraction einsum('ns,bsd->bnd', w, x) quantized.
    x: (b, s, d); wq: (n, s) int8; ws: (n,) f32. Activation scales are
    per (b, d) column — absmax over the contracted s axis."""
    xq, sx = _dynamic_quant(x, axis=-2)  # sx: (b, 1, d)
    y = jnp.einsum("ns,bsd->bnd", wq, xq,
                   preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * ws[None, :, None] * sx).astype(dtype)
    return y


def qdot_wo(x: jax.Array, wq: jax.Array, ws: jax.Array, b=None, *,
            dtype) -> jax.Array:
    """Weight-only (w8a16) y = x @ dequant(wq).T (+ b): bf16 activations
    against an exact int8->dtype weight convert (values <= 127 are exactly
    representable in bf16), per-channel scale applied to the fp32
    accumulator. Weight HBM traffic is int8 — the convert fuses into the
    matmul's operand read."""
    y = jax.lax.dot_general(
        x.astype(dtype), wq.astype(dtype),
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = (y * ws).astype(dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y


def qdot_seq_wo(x: jax.Array, wq: jax.Array, ws: jax.Array, *,
                dtype) -> jax.Array:
    """Weight-only sequence-axis contraction einsum('ns,bsd->bnd', w, x).
    x: (b, s, d); wq: (n, s) int8; ws: (n,) f32."""
    y = jnp.einsum("ns,bsd->bnd", wq.astype(dtype), x.astype(dtype),
                   preferred_element_type=jnp.float32)
    return (y * ws[None, :, None]).astype(dtype)


def quantize_tree(params, sn_state, mode: str = "w8a8"):
    """Quantize every eligible spectral-normed 2-D linear weight in a
    NORMALIZED param tree (run serve-style normalize_tree(training=False)
    first). Returns a new params tree where each eligible node's 'w' is
    replaced by {'w_q', 'w_s'} (mode='w8a8') or {'w_q', 'w_so'}
    (mode='w8a16' weight-only), plus its existing bias. The sn_state tree
    locates the linears, exactly as nn.spectral_norm.normalize_tree walks it.
    """
    if mode not in ("w8a8", "w8a16"):
        raise ValueError(f"unknown quantize_tree mode: {mode!r}")
    scale_key = SKEY if mode == "w8a8" else WOKEY

    def walk(p, s, path):
        if isinstance(s, dict) and "u" in s and "v" in s:
            w = p["w"]
            if w.ndim != 2 or any(k in path for k in _SKIP):
                return p
            new_p = {k: v for k, v in p.items() if k != "w"}
            new_p[QKEY], new_p[scale_key] = quantize_weight(w)
            return new_p
        new_p = dict(p)
        for key, sub in s.items():
            new_p[key] = walk(p[key], sub, path + (key,))
        return new_p

    return walk(params, sn_state, ())
