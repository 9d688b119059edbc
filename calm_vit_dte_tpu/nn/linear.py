"""Plain and spectral-normalized linear layers (functional).

Weights are stored in torch layout (out_dim, in_dim) so reference .pth state
dicts import without transposition bookkeeping (compat/torch_import.py); the
matmul contracts x @ W^T. Parameters live in fp32; the matmul runs in the
requested compute dtype (bf16 on TPU), mirroring torch autocast semantics
where the spectral-norm math stays fp32 (reference autocast usage:
distributed_trainer_cls.py:84).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.nn import init as vinit
from calm_vit_dte_tpu.nn.spectral_norm import sn_state_init, spectral_normalize


def linear_init(key: jax.Array, in_dim: int, out_dim: int, *,
                bias: bool = False) -> dict:
    kw, kb = jax.random.split(key)
    p = {"w": vinit.kaiming_uniform(kw, (out_dim, in_dim), fan_in=in_dim)}
    if bias:
        p["b"] = vinit.bias_uniform(kb, (out_dim,), fan_in=in_dim)
    return p


def linear_apply(params: dict, x: jax.Array, *, dtype=None) -> jax.Array:
    dtype = dtype or x.dtype
    w = params["w"].astype(dtype)
    y = jnp.dot(x.astype(dtype), w.T, preferred_element_type=dtype)
    if "b" in params:
        y = y + params["b"].astype(dtype)
    return y


def sn_linear_init(key: jax.Array, in_dim: int, out_dim: int, *,
                   bias: bool = False) -> tuple[dict, dict]:
    kp, ks = jax.random.split(key)
    params = linear_init(kp, in_dim, out_dim, bias=bias)
    state = sn_state_init(ks, out_dim, in_dim)
    return params, state


def sn_linear_apply(params: dict, state: dict, x: jax.Array, *,
                    training: bool, dtype=None) -> tuple[jax.Array, dict]:
    dtype = dtype or x.dtype
    if "w_q" in params:  # int8-quantized serving path (quantize.py)
        from calm_vit_dte_tpu.quantize import qdot, qdot_wo

        if "w_so" in params:  # w8a16 weight-only
            return qdot_wo(x, params["w_q"], params["w_so"],
                           params.get("b"), dtype=dtype), state
        return qdot(x, params["w_q"], params["w_s"], params.get("b"),
                    dtype=dtype), state
    w_norm, new_state = spectral_normalize(params["w"], state,
                                           training=training)
    w = w_norm.astype(dtype)
    y = jnp.dot(x.astype(dtype), w.T, preferred_element_type=dtype)
    if "b" in params:
        y = y + params["b"].astype(dtype)
    return y, new_state
