"""Post-training int8 quantization for the serving path (w8a8 dynamic).

The reference has no serving or quantization story at all (SURVEY.md §1);
this module adds one the TPU way: v5e's MXU runs int8 x int8 -> int32
matmuls at 2x the bf16 rate (394 vs 197 peak TFLOP/s), so the serving
Predictor can trade <=0.5% logit error for roughly half the matmul time and
half the weight HBM footprint.

Scheme (standard w8a8 dynamic PTQ):
  * weights: symmetric per-output-channel int8 — each row of the frozen,
    already spectral-normalized (out, in) matrix is scaled by
    absmax(row)/127 and rounded; stored as {'w_q': int8, 'w_s': f32 (out,)}
    replacing 'w'.
  * activations: symmetric per-token dynamic quantization at trace time —
    absmax over the contraction axis, no calibration data needed.
  * the matmul runs int8 x int8 with preferred_element_type=int32 (MXU),
    then one fused rescale (sx * w_s) back to the compute dtype.

What gets quantized: every 2-D spectral-normed linear weight EXCEPT the
attention-mask MLP (its weights are operands of the fused Pallas attention
kernel, kernels/axial_attention.py, which consumes float tiles). LayerNorm,
LayerScale, RoPE tables, biases and conv taps stay float — they are
vector-unit work, not MXU work.

Training is never quantized: quantize_tree applies to the frozen eval-mode
weights only (serve.Predictor(..., quantize='int8')).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Param-tree keys a quantized node carries instead of 'w'.
QKEY = "w_q"
SKEY = "w_s"

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


def quantize_tree(params, sn_state):
    """Quantize every eligible spectral-normed 2-D linear weight in a
    NORMALIZED param tree (run serve-style normalize_tree(training=False)
    first). Returns a new params tree where each eligible node's 'w' is
    replaced by {'w_q', 'w_s'} (plus its existing bias). The sn_state tree
    locates the linears, exactly as nn.spectral_norm.normalize_tree walks it.
    """

    def walk(p, s, path):
        if isinstance(s, dict) and "u" in s and "v" in s:
            w = p["w"]
            if w.ndim != 2 or any(k in path for k in _SKIP):
                return p
            new_p = {k: v for k, v in p.items() if k != "w"}
            new_p[QKEY], new_p[SKEY] = quantize_weight(w)
            return new_p
        new_p = dict(p)
        for key, sub in s.items():
            new_p[key] = walk(p[key], sub, path + (key,))
        return new_p

    return walk(params, sn_state, ())
