"""Scaled dot-product attention with a learned additive mask ("latent
masking").

The reference computes QK^T twice — once flattened across heads to feed the
mask MLP, once inside F.scaled_dot_product_attention (reference:
Vi_Tools_CNN_less_V2.py:286-298, the comment at :286 admits the redundancy).
Because the flattened product q_mask @ k_mask^T over the concatenated head
axis equals the per-head score tensors summed over heads, we compute the
per-head scores ONCE, reduce over the head axis for the mask-MLP input, and
reuse the same scores for the softmax — mathematically identical, one big
matmul cheaper.

Mask MLP (reference: :189-194): Linear(S, 2S, bias) -> exact GELU ->
Linear(2S, S, bias), both spectral-normed, applied over the last (key) axis
of the (B, Sq, Skv) summed score matrix; broadcast over heads additively.

Implementations (select with the attention_impl() context):
  'xla'    — whole-batch einsum path: the correctness oracle. Materializes
             (B, H, Sq, Skv) scores; fine for tests/small batches.
  'chunked'— lax.map over batch chunks with rematerialization: HBM-bounded
             (never more than chunk*H*Sq*Skv scores live), matching how the
             reference survives batch 484 only via torch's memory-efficient
             SDPA backend.
  'pallas' — fused TPU kernel (kernels/axial_attention.py): scores, mask
             MLP, softmax and PV never leave VMEM.
  'auto'   — pallas on TPU when supported, else chunked when the score
             tensor would exceed the HBM budget, else xla.

Softmax always runs in fp32 (torch SDPA accumulates softmax in fp32 on bf16
inputs); score matmuls accumulate fp32 on the MXU via
preferred_element_type.
"""

from __future__ import annotations

import functools
import math
from contextlib import contextmanager
from contextvars import ContextVar
from functools import partial

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.nn.spectral_norm import spectral_normalize

# ContextVar, not a module global: impl selection is trace-time-only but
# must not leak across threads (e.g. a test tracing the 'xla' oracle while
# the trainer thread traces 'auto').
_STATE: ContextVar[tuple[str, int | None]] = ContextVar(
    "attention_impl", default=("auto", None))
# 'auto' switches from whole-batch to chunked when the fp32 score tensor
# would exceed this many bytes.
_AUTO_SCORE_BUDGET = 1 << 28  # 256 MB


@contextmanager
def attention_impl(impl: str, chunk: int | None = None):
    """Select the attention implementation for a scope (per-context)."""
    token = _STATE.set((impl, chunk))
    try:
        yield
    finally:
        _STATE.reset(token)


def _pick_impl(b: int, h: int, sq: int, skv: int,
               d: int) -> tuple[str, int]:
    impl, chunk = _STATE.get()
    if impl == "auto":
        if _pallas_supported(b, h, sq, skv, d):
            impl = "pallas"
        elif _pallas_hires_supported(b, h, sq, skv, d):
            # Long-sequence shapes whose one-kernel backward exceeds VMEM:
            # fully fused forward + two-pass flash backward with saved
            # (m, lse, dssum) residuals.
            impl = "pallas_hires"
        elif _pallas_fwd_supported(b, h, sq, skv, d):
            # Last-resort hires fallback: pallas forward + chunked-XLA
            # recompute backward.
            impl = "pallas_fwd"
        elif b * h * sq * skv * 4 > _AUTO_SCORE_BUDGET:
            impl = "chunked"
        else:
            impl = "xla"
    if impl in ("chunked", "pallas_fwd") and chunk is None:
        per_item = h * sq * skv * 4
        chunk = max(1, _AUTO_SCORE_BUDGET // (4 * per_item))
        while b % chunk:
            chunk -= 1
    return impl, chunk


def _pallas_supported(b: int, h: int, sq: int, skv: int, d: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    from calm_vit_dte_tpu.kernels import axial_attention as ka

    return ka.supported(h, sq, skv, d)


def _pallas_fwd_supported(b: int, h: int, sq: int, skv: int,
                          d: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    from calm_vit_dte_tpu.kernels import axial_attention as ka

    return ka.fwd_supported(h, sq, skv, d)


def _pallas_hires_supported(b: int, h: int, sq: int, skv: int,
                            d: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    from calm_vit_dte_tpu.kernels import axial_attention as ka

    return ka.hires_supported(b, h, sq, skv, d)


@functools.lru_cache(maxsize=None)
def _make_hybrid(scale: float, dtype_name: str, use_mask: bool,
                 chunk: int | None, shapes: tuple,
                 interpret: bool = False):
    """Pallas fused forward + chunked-XLA recompute backward, for shapes
    whose backward kernel exceeds VMEM (hires stages)."""
    dtype = jnp.dtype(dtype_name)
    b = shapes[0]

    def xla_fn(q, k, v, w1, b1, w2, b2):
        core = jax.checkpoint(partial(_attention_core, scale=scale,
                                      dtype=dtype, use_mask=use_mask))
        if chunk and b > chunk:
            n = b // chunk

            def run_chunk(args):
                qc, kc, vc = args
                return core(qc, kc, vc, w1, b1, w2, b2)

            out = jax.lax.map(run_chunk, (
                q.reshape(n, chunk, *q.shape[1:]),
                k.reshape(n, chunk, *k.shape[1:]),
                v.reshape(n, chunk, *v.shape[1:])))
            return out.reshape(b, *out.shape[2:])
        return core(q, k, v, w1, b1, w2, b2)

    @jax.custom_vjp
    def hybrid(q, k, v, w1, b1, w2, b2):
        from calm_vit_dte_tpu.kernels.axial_attention import (
            fused_attention_forward,
        )

        return fused_attention_forward(q, k, v, w1, b1, w2, b2,
                                       scale=scale, dtype=dtype,
                                       use_mask=use_mask,
                                       interpret=interpret)

    def hybrid_fwd(q, k, v, w1, b1, w2, b2):
        return hybrid(q, k, v, w1, b1, w2, b2), (q, k, v, w1, b1, w2, b2)

    def hybrid_bwd(res, g):
        _, vjp = jax.vjp(xla_fn, *res)
        return vjp(g)

    hybrid.defvjp(hybrid_fwd, hybrid_bwd)
    return hybrid


def _attention_core(q, k, v, w1, b1, w2, b2, *, scale: float, dtype,
                    use_mask: bool):
    """Whole-batch reference math. q,k: (B,H,Sq|Skv,D); v: (B,H,Skv,Dv);
    mask weights already spectral-normalized."""
    qc = q.astype(dtype)
    kc = k.astype(dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qc, kc,
                        preferred_element_type=jnp.float32)
    logits = scores * scale
    if use_mask:
        ssum = jnp.sum(scores, axis=1).astype(dtype)  # flattened-head QK^T
        hmid = jnp.dot(ssum, w1.T.astype(dtype),
                       preferred_element_type=dtype) + b1.astype(dtype)
        hmid = jax.nn.gelu(hmid, approximate=False)
        mask = jnp.dot(hmid, w2.T.astype(dtype),
                       preferred_element_type=dtype) + b2.astype(dtype)
        logits = logits + mask.astype(jnp.float32)[:, None, :, :]
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(dtype),
                      v.astype(dtype), preferred_element_type=dtype)


def masked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     mask_params: dict | None, mask_state: dict | None, *,
                     training: bool, dtype,
                     use_mask: bool = True) -> tuple[jax.Array, dict]:
    """q, k: (B, H, Sq|Skv, D); v: (B, H, Skv, Dv).

    Returns (out (B, H, Sq, Dv), new mask-MLP spectral-norm state). Scale is
    1/sqrt(D), torch SDPA's default (reference :293-298 passes no scale).
    """
    b, h, sq, _ = q.shape
    skv = k.shape[2]
    scale = 1.0 / math.sqrt(q.shape[-1])

    new_mask_state = mask_state
    w1 = b1 = w2 = b2 = None
    if use_mask:
        w1, st1 = spectral_normalize(mask_params["fc1"]["w"],
                                     mask_state["fc1"], training=training)
        w2, st2 = spectral_normalize(mask_params["fc2"]["w"],
                                     mask_state["fc2"], training=training)
        b1 = mask_params["fc1"]["b"]
        b2 = mask_params["fc2"]["b"]
        new_mask_state = {"fc1": st1, "fc2": st2}

    from jax.ad_checkpoint import checkpoint_name

    impl, chunk = _pick_impl(b, h, sq, skv, q.shape[-1])
    if impl == "pallas":
        from calm_vit_dte_tpu.kernels.axial_attention import (
            fused_masked_attention,
        )

        out = fused_masked_attention(q, k, v, w1, b1, w2, b2, scale=scale,
                                     dtype=dtype, use_mask=use_mask)
    elif impl == "pallas_hires":
        from calm_vit_dte_tpu.kernels.axial_attention import (
            fused_hires_attention,
        )

        if not use_mask:
            s2 = 2 * sq
            w1 = jnp.zeros((s2, sq), jnp.float32)
            b1 = jnp.zeros((s2,), jnp.float32)
            w2 = jnp.zeros((sq, s2), jnp.float32)
            b2 = jnp.zeros((sq,), jnp.float32)
        out = fused_hires_attention(q, k, v, w1, b1, w2, b2, scale=scale,
                                    dtype=dtype)
    elif impl == "pallas_fwd":
        hybrid = _make_hybrid(scale, jnp.dtype(dtype).name, use_mask,
                              chunk, (b, h, sq, q.shape[-1]))
        if not use_mask:
            s2 = 2 * sq
            w1 = jnp.zeros((s2, sq), jnp.float32)
            b1 = jnp.zeros((s2,), jnp.float32)
            w2 = jnp.zeros((sq, s2), jnp.float32)
            b2 = jnp.zeros((sq,), jnp.float32)
        out = hybrid(q.astype(dtype), k.astype(dtype), v.astype(dtype),
                     w1, b1, w2, b2)
    elif impl == "chunked" and b > chunk:
        core = jax.checkpoint(partial(_attention_core, scale=scale,
                                      dtype=dtype, use_mask=use_mask))

        def run_chunk(args):
            qc, kc, vc = args
            return core(qc, kc, vc, w1, b1, w2, b2)

        n = b // chunk
        qr = q.reshape(n, chunk, *q.shape[1:])
        kr = k.reshape(n, chunk, *k.shape[1:])
        vr = v.reshape(n, chunk, *v.shape[1:])
        out = jax.lax.map(run_chunk, (qr, kr, vr))
        out = out.reshape(b, *out.shape[2:])
    else:
        out = _attention_core(q, k, v, w1, b1, w2, b2, scale=scale,
                              dtype=dtype, use_mask=use_mask)
    # Named so the remat policy can SAVE attention outputs: backward then
    # re-runs only the cheap elementwise/linear parts, not the 24 fused
    # attention kernels (train/step.py remat policy).
    out = checkpoint_name(out, "attn_out")
    return out, new_mask_state


def masked_rope_attention(qc, qr, kc, kr, v, rope_q: dict, rope_k: dict,
                          mask_params: dict | None, mask_state: dict | None,
                          *, training: bool, dtype,
                          use_mask: bool = True) -> tuple[jax.Array, dict]:
    """Attention taking the PRE-rotation rope projections.

    qr, kr: (B,H,S,Dr) un-rotated rope halves; qc, kc: (B,H,S,Dc) content
    halves or None (full-dim rotation — the non-reduce VMLA layers);
    rope_q/rope_k: learned-frequency RoPE param dicts. On TPU this dispatches
    to the fused kernel that rotates and concatenates IN VMEM
    (kernels/axial_attention.fused_rope_attention); elsewhere (and under an
    attention_impl override) it builds q/k in XLA exactly as the reference
    does (Vi_Tools_CNN_less_V2.py:274-285) and defers to masked_attention,
    keeping oracle math bit-identical to the unfused path.
    """
    from calm_vit_dte_tpu.ops.rope import rope_apply, rope_tables

    b, h, sq, dr = qr.shape
    skv = kr.shape[2]
    dc = qc.shape[-1] if qc is not None else 0
    d = dc + dr

    impl, _ = _pick_impl(b, h, sq, skv, d)
    if impl == "pallas":
        # The rope-fused backward carries more VMEM than the plain kernel
        # (_pick_impl's estimate): re-check with the rope-specific
        # estimator, falling back to XLA rotation + standard dispatch for
        # near-budget shapes that would fail Mosaic at runtime.
        from calm_vit_dte_tpu.kernels import axial_attention as ka

        if not ka.rope_supported(b, h, sq, skv, dc, dr):
            impl = "fallback"
    if impl == "pallas":
        from jax.ad_checkpoint import checkpoint_name

        from calm_vit_dte_tpu.kernels.axial_attention import (
            fused_rope_attention,
        )

        new_mask_state = mask_state
        w1 = b1 = w2 = b2 = None
        if use_mask:
            w1, st1 = spectral_normalize(mask_params["fc1"]["w"],
                                         mask_state["fc1"],
                                         training=training)
            w2, st2 = spectral_normalize(mask_params["fc2"]["w"],
                                         mask_state["fc2"],
                                         training=training)
            b1 = mask_params["fc1"]["b"]
            b2 = mask_params["fc2"]["b"]
            new_mask_state = {"fc1": st1, "fc2": st2}
        cos_q, sin_q = rope_tables(rope_q, sq)
        cos_k, sin_k = rope_tables(rope_k, skv)
        out = fused_rope_attention(
            qc, qr, kc, kr, v, cos_q, sin_q, cos_k, sin_k, w1, b1, w2, b2,
            scale=1.0 / math.sqrt(d), dtype=dtype, use_mask=use_mask)
        return checkpoint_name(out, "attn_out"), new_mask_state

    # Fallback: rotate/concat in XLA (reference math), standard dispatch.
    q = rope_apply(rope_q, qr, dtype)
    k = rope_apply(rope_k, kr, dtype)
    if qc is not None:
        q = jnp.concatenate([qc.astype(dtype), q], axis=-1)
        k = jnp.concatenate([kc.astype(dtype), k], axis=-1)
    return masked_attention(q, k, v, mask_params, mask_state,
                            training=training, dtype=dtype,
                            use_mask=use_mask)
