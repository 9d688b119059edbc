"""Spectral normalization as an explicit functional state transform.

The reference wraps ~150 linears/convs in torch.nn.utils.spectral_norm
(reference: Vi_Tools_CNN_less_V2.py:5 and every `sn(...)` call site), which
hides a power-iteration state (u, v) inside a pre-forward hook. On TPU/JAX
that state must be explicit: `power_iteration` maps
(w, u, v) -> (u', v') with one iteration (torch default n_power_iterations=1),
and `spectral_normalize` returns w / sigma with sigma = u . (W v).

Semantics matched to torch (torch.nn.utils.spectral_norm, old API):
  * training: one power iteration updates (u, v) in fp32, gradients stopped;
  * eval: stored (u, v) are used unchanged;
  * sigma is computed from the *updated* u, v during training;
  * the weight matrix is the 2-D view (out_dim, -1) of the raw weight.

All math runs in fp32 regardless of the model's compute dtype (torch keeps
u/v as fp32 buffers and the master weight in fp32 under autocast).
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.nn import init as vinit

_EPS = 1e-12
# ContextVar (not a module global): trace-time-only flag, but tests and the
# trainer may trace on different threads concurrently — a shared dict would
# leak the scope across threads.
_PRENORMALIZED: ContextVar[bool] = ContextVar("sn_prenormalized",
                                              default=False)


@contextmanager
def prenormalized_scope():
    """Inside this scope every spectral_normalize call is a no-op: the param
    tree was already normalized by normalize_tree(). The train step hoists
    normalization OUT of the (rematerialized) model graph — power iteration
    depends only on the weights, so running it per-layer inside the forward
    (as torch's hook does) re-executes ~150 tiny matvec chains in the
    backward replay and threads ~300 small state tensors through every remat
    segment (measured: ~80 ms/step of sub-64K fusions + ~50 ms of tiny
    copies at batch 128)."""
    token = _PRENORMALIZED.set(True)
    try:
        yield
    finally:
        _PRENORMALIZED.reset(token)


def sn_state_init(key: jax.Array, out_dim: int, in_dim: int) -> dict:
    """Initialize the power-iteration state for a (out_dim, in_dim) matrix."""
    ku, kv = jax.random.split(key)
    return {
        "u": vinit.normalized_normal(ku, (out_dim,)),
        "v": vinit.normalized_normal(kv, (in_dim,)),
    }


def _l2n(x: jax.Array) -> jax.Array:
    return x / (jnp.linalg.norm(x) + _EPS)


def power_iteration(w_mat: jax.Array, u: jax.Array, v: jax.Array):
    """One torch-ordered power iteration: v = norm(W^T u); u = norm(W v)."""
    v = _l2n(w_mat.T @ u)
    u = _l2n(w_mat @ v)
    return u, v


def spectral_normalize(w: jax.Array, state: dict, *, training: bool):
    """Return (w / sigma, new_state). `w` may be any rank; the 2-D view is
    (w.shape[0], -1), matching torch's dim=0 reshape for Linear and Conv2d."""
    if _PRENORMALIZED.get():
        return w, state
    w32 = w.astype(jnp.float32)
    w_mat = w32.reshape(w32.shape[0], -1)
    u, v = state["u"], state["v"]
    if training:
        u, v = power_iteration(w_mat, u, v)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    sigma = jnp.dot(u, w_mat @ v)
    w_norm = (w32 / sigma).astype(w.dtype)
    return w_norm, {"u": u, "v": v}


def normalize_tree(params, sn_state, *, training: bool):
    """Normalize every spectral-normed weight in one pre-pass.

    The sn_state tree mirrors the params tree: wherever a state node holds
    {'u','v'}, the matching params node holds the raw weight 'w'. Returns
    (params with every such 'w' replaced by w/sigma, updated sn_state).
    Run the model inside prenormalized_scope() afterwards.
    """
    if isinstance(sn_state, dict) and "u" in sn_state and "v" in sn_state:
        w_norm, new_state = spectral_normalize(params["w"], sn_state,
                                               training=training)
        new_params = dict(params)
        new_params["w"] = w_norm
        return new_params, new_state
    new_params = dict(params)
    new_state = {}
    for key, sub in sn_state.items():
        new_params[key], new_state[key] = normalize_tree(
            params[key], sub, training=training)
    return new_params, new_state
