"""LayerNorm (scale-only, eps=1e-6), always computed in fp32.

The reference constructs every norm as LayerNorm(dim, eps=1e-6, bias=False)
(reference: Vi_Tools_CNN_less_V2.py:115,131-132,197); torch autocast keeps
LayerNorm in fp32, which we mirror so bf16 training matches reference
numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32)}


def layer_norm_apply(params: dict, x: jax.Array, *, eps: float = 1e-6,
                     dtype=None) -> jax.Array:
    dtype = dtype or x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * params["scale"]
    return y.astype(dtype)
