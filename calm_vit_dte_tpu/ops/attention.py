"""Scaled dot-product attention with a learned additive mask ("latent
masking"), XLA reference path.

The reference computes QK^T twice — once flattened across heads to feed the
mask MLP, once inside F.scaled_dot_product_attention (reference:
Vi_Tools_CNN_less_V2.py:286-298, the comment at :286 admits the redundancy).
Because the flattened product q_mask @ k_mask^T over the concatenated head
axis equals the per-head score tensors summed over heads, we compute the
per-head scores ONCE, reduce over the head axis for the mask-MLP input, and
reuse the same scores for the softmax — mathematically identical, one big
matmul cheaper. The Pallas kernel (kernels/axial_attention.py) fuses the
whole chain; this module is the XLA fallback and the correctness oracle.

Mask MLP (reference: :189-194): Linear(S, 2S, bias) -> exact GELU ->
Linear(2S, S, bias), both spectral-normed, applied over the last (key) axis
of the (B, Sq, Skv) summed score matrix; the result is broadcast over heads
as an additive float mask.

Softmax runs in fp32 (torch SDPA accumulates softmax in fp32 on bf16 inputs);
score matmuls accumulate fp32 on the MXU via preferred_element_type.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.nn.linear import sn_linear_apply


def mask_mlp_apply(mask_params: dict, mask_state: dict, scores_sum: jax.Array,
                   *, training: bool, dtype) -> tuple[jax.Array, dict]:
    """scores_sum: (B, Sq, Skv) -> additive mask (B, Sq, Skv)."""
    h, st1 = sn_linear_apply(mask_params["fc1"], mask_state["fc1"],
                             scores_sum.astype(dtype), training=training,
                             dtype=dtype)
    h = jax.nn.gelu(h, approximate=False)
    m, st2 = sn_linear_apply(mask_params["fc2"], mask_state["fc2"], h,
                             training=training, dtype=dtype)
    return m, {"fc1": st1, "fc2": st2}


def masked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     mask_params: dict | None, mask_state: dict | None, *,
                     training: bool, dtype,
                     use_mask: bool = True) -> tuple[jax.Array, dict]:
    """q, k: (B, H, Sq|Skv, D); v: (B, H, Skv, Dv).

    Returns (out (B, H, Sq, Dv), new mask state). Scale is 1/sqrt(D) as in
    torch SDPA's default (reference: :293-298 passes no explicit scale).
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)

    qc = q.astype(dtype)
    kc = k.astype(dtype)
    # Per-head raw scores, fp32 accumulation on the MXU.
    scores = jnp.einsum("bhqd,bhkd->bhqk", qc, kc,
                        preferred_element_type=jnp.float32)

    new_mask_state = mask_state
    logits = scores * scale
    if use_mask:
        scores_sum = jnp.sum(scores, axis=1)  # == flattened-head QK^T
        mask, new_mask_state = mask_mlp_apply(
            mask_params, mask_state, scores_sum, training=training,
            dtype=dtype)
        logits = logits + mask.astype(jnp.float32)[:, None, :, :]

    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(dtype),
                     v.astype(dtype), preferred_element_type=dtype)
    return out, new_mask_state
