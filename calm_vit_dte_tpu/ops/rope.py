"""1-D rotary position embedding with learnable frequencies, as a pure
function.

The reference's RoPE (reference: Vi_Tools_CNN_less_V2.py:55-95) is always
instantiated with learned=True by VMLA (reference: :187-188): inv_freq is a
trainable parameter and cos/sin are regenerated each forward (the reference
mutates self.freqs inside forward — impure; here the tables are a pure
function of the inv_freq leaf, so jit/grad see a clean dataflow and XLA CSEs
the table construction across the q/k applications).

Math (matching torch):
  inv_freq[i] = theta ** (-2i / dim),  i in [0, dim/2)
  freqs = outer(arange(S), inv_freq);  emb = concat(freqs, freqs)
  out   = x * cos(emb) + rotate_half(x) * sin(emb)

cos/sin are computed in fp32 (torch autocast leaves this elementwise chain in
fp32 because inv_freq is an fp32 master param); the caller casts the result
back to its compute dtype at the attention matmul boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_init(dim: int, theta: float = 10000.0) -> dict:
    if dim % 2 != 0:
        raise ValueError(
            f"RoPE dim must be even, got {dim}. For CALM-ViT this requires "
            "stage_dim % (4 * heads) == 0 at every stage (the reference's "
            "Encoder_8 defaults violate this and crash; see SURVEY.md s2a).")
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    return {"inv_freq": inv_freq}


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def rope_tables(params: dict, seq_len: int) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables of shape (seq_len, dim), fp32."""
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, params["inv_freq"].astype(jnp.float32))
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rope_apply(params: dict, x: jax.Array, dtype=None) -> jax.Array:
    """x: (..., seq, dim) with seq on axis -2.

    Tables are always built in fp32 from the learned frequencies; the
    rotation itself runs in `dtype` (default fp32 — the torch-parity
    setting). Under bf16 training the rotation runs in bf16: values are
    bounded by |x| so the precision loss is one bf16 ulp, and the (B,H,S,D)
    elementwise chain (the dominant non-matmul cost at batch 128, measured
    ~120 ms/step in fp32) halves its HBM traffic."""
    dtype = dtype or jnp.float32
    cos, sin = rope_tables(params, x.shape[-2])
    xc = x.astype(dtype)
    return xc * cos.astype(dtype) + _rotate_half(xc) * sin.astype(dtype)
