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


def _l2n_rows(x: jax.Array) -> jax.Array:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + _EPS)


def _batched_normalize(ws, us, vs, *, training: bool):
    """Power-iterate + normalize a STACK of same-shape weights at once.
    ws: (n, out, in) fp32; us: (n, out); vs: (n, in). Returns
    (ws/sigma, us', vs'). Same math as spectral_normalize per slice; the
    batched einsums only change fp32 reduction order (sub-1e-6 noise;
    tests/test_reproducibility.py::test_hoisted_spectral_norm_matches_in_model
    pins equivalence to the per-weight path)."""
    if training:
        vs = _l2n_rows(jnp.einsum("noi,no->ni", ws, us))
        us = _l2n_rows(jnp.einsum("noi,ni->no", ws, vs))
        us = jax.lax.stop_gradient(us)
        vs = jax.lax.stop_gradient(vs)
    sigma = jnp.einsum("no,noi,ni->n", us, ws, vs)
    return ws / sigma[:, None, None], us, vs


def normalize_tree(params, sn_state, *, training: bool):
    """Normalize every spectral-normed weight in one pre-pass.

    The sn_state tree mirrors the params tree: wherever a state node holds
    {'u','v'}, the matching params node holds the raw weight 'w'. Returns
    (params with every such 'w' replaced by w/sigma, updated sn_state).
    Run the model inside prenormalized_scope() afterwards.

    The ~150 per-weight power iterations are BATCHED by (out, in) shape
    group: naively they lower to ~700 sequential sub-64K TPU ops (~32 ms/
    step at the flagship config, measured); grouped, the whole pre-pass is
    a handful of batched einsums. Per-weight math is unchanged up to fp32
    reduction order.
    """
    entries: list[tuple[tuple, jax.Array, dict]] = []

    def walk(p, s, path):
        if isinstance(s, dict) and "u" in s and "v" in s:
            entries.append((path, p["w"], s))
            return
        for key, sub in s.items():
            walk(p[key], sub, path + (key,))

    walk(params, sn_state, ())

    groups: dict[tuple[int, int], list[int]] = {}
    for idx, (_, w, _) in enumerate(entries):
        shape2d = (w.shape[0], int(w.size) // w.shape[0])
        groups.setdefault(shape2d, []).append(idx)

    results: dict[tuple, tuple[jax.Array, dict]] = {}
    for shape2d, idxs in groups.items():
        if len(idxs) == 1:
            path, w, s = entries[idxs[0]]
            results[path] = spectral_normalize(w, s, training=training)
            continue
        ws = jnp.stack([entries[i][1].reshape(shape2d).astype(jnp.float32)
                        for i in idxs])
        us = jnp.stack([entries[i][2]["u"] for i in idxs])
        vs = jnp.stack([entries[i][2]["v"] for i in idxs])
        wn, us, vs = _batched_normalize(ws, us, vs, training=training)
        for row, i in enumerate(idxs):
            path, w, _ = entries[i]
            results[path] = (wn[row].reshape(w.shape).astype(w.dtype),
                             {"u": us[row], "v": vs[row]})

    def rebuild(p, s, path):
        if isinstance(s, dict) and "u" in s and "v" in s:
            w_norm, new_state = results[path]
            new_p = dict(p)
            new_p["w"] = w_norm
            return new_p, new_state
        new_p = dict(p)
        new_s = {}
        for key, sub in s.items():
            new_p[key], new_s[key] = rebuild(p[key], sub, path + (key,))
        return new_p, new_s

    return rebuild(params, sn_state, ())
