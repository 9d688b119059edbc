"""Variational (reparameterized Gaussian) bottleneck primitives.

The reference parameterizes sigma directly (not log-variance):
sigma = softplus(raw) + 1e-6 (reference: Vi_Tools_CNN_less_V2.py:234-235),
samples z = mu + eps * sigma during training / z = mu at eval (:237-242), and
accumulates KL = -0.5 * mean(1 + 2*log(sigma) - mu^2 - sigma^2) (:24-26).

torch's randn_like pulls from the global CUDA RNG; here noise comes from an
explicit jax.random key threaded per layer (fold_in on the layer index), so
sampling is reproducible and shard-safe. All variational math runs in fp32
(torch autocast promotes softplus/log/pow to fp32; the unbounded "sum"
accumulation mode overflows bf16 otherwise — see SURVEY.md hard-part 5).
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from typing import Callable

import jax
import jax.numpy as jnp

# Trace-time noise injection hook: when set, reparameterize() draws eps from
# this callable (shape -> array) instead of jax.random. Used by the
# train-mode parity tests to feed torch and JAX IDENTICAL Gaussian noise —
# torch's Mersenne/Philox and JAX's threefry can never agree at equal seeds,
# so cross-framework train parity is defined on fixed noise (see
# docs/ADR-bitexact.md).
_NOISE_OVERRIDE: ContextVar[Callable | None] = ContextVar(
    "variational_noise_override", default=None)


@contextmanager
def noise_override(fn: Callable):
    """Scope in which reparameterize() calls fn(shape) for its noise."""
    token = _NOISE_OVERRIDE.set(fn)
    try:
        yield
    finally:
        _NOISE_OVERRIDE.reset(token)


def softplus_var(var_raw: jax.Array, eps: float = 1e-6) -> jax.Array:
    return jax.nn.softplus(var_raw.astype(jnp.float32)) + eps


def reparameterize(key: jax.Array | None, mean: jax.Array, var: jax.Array, *,
                   training: bool) -> jax.Array:
    """z = mean + eps * var when training (eps ~ N(0,1)), else mean."""
    mean = mean.astype(jnp.float32)
    if not training:
        return mean
    override = _NOISE_OVERRIDE.get()
    if override is not None:
        noise = jnp.asarray(override(var.shape), jnp.float32)
    else:
        if key is None:
            raise ValueError(
                "training-mode reparameterization requires a PRNG key")
        noise = jax.random.normal(key, var.shape, jnp.float32)
    return mean + noise * var


def kl_divergence(mean: jax.Array, var: jax.Array) -> jax.Array:
    """Reference KL with sigma parameterization: scalar fp32."""
    mean = mean.astype(jnp.float32)
    var = var.astype(jnp.float32)
    return -0.5 * jnp.mean(
        1.0 + 2.0 * jnp.log(var) - jnp.square(mean) - jnp.square(var))
