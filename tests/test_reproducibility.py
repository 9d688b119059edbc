"""Determinism and reproducibility guarantees the reference lacks: the
variational noise sequence is a pure function of (base rng, step), so resumed
training reproduces the exact same steps."""

import numpy as np

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.models.vit import vit_apply, vit_init
from calm_vit_dte_tpu.utils.configs import TINY_VIT, get_config


def test_train_forward_deterministic_given_key():
    cfg = TINY_VIT
    params, state = vit_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3))
    f = jax.jit(lambda p, s, x, r: vit_apply(cfg, p, s, x, training=True,
                                             rng=r))
    y1, kl1, _ = f(params, state, x, jax.random.PRNGKey(7))
    y2, kl2, _ = f(params, state, x, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3, _, _ = f(params, state, x, jax.random.PRNGKey(8))
    assert not np.array_equal(np.asarray(y1), np.asarray(y3))


def test_train_vs_eval_distinct():
    cfg = TINY_VIT
    params, state = vit_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3))
    ye, _, _ = jax.jit(lambda p, s, x: vit_apply(cfg, p, s, x,
                                                 training=False))(
        params, state, x)
    yt, _, _ = jax.jit(lambda p, s, x: vit_apply(
        cfg, p, s, x, training=True, rng=jax.random.PRNGKey(0)))(
        params, state, x)
    # training samples z = mu + eps*sigma; eval uses z = mu
    assert not np.array_equal(np.asarray(ye), np.asarray(yt))


def test_eval_does_not_mutate_sn_state():
    cfg = TINY_VIT
    params, state = vit_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3))
    _, _, new_state = jax.jit(lambda p, s, x: vit_apply(
        cfg, p, s, x, training=False))(params, state, x)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_forward_finite():
    cfg = TINY_VIT
    params, state = vit_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3))
    y, kl, _ = jax.jit(lambda p, s, x: vit_apply(
        cfg, p, s, x, training=True, rng=jax.random.PRNGKey(3),
        dtype=jnp.bfloat16))(params, state, x)
    assert y.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(y, np.float32)).all()
    assert np.isfinite(float(kl))


def test_hoisted_spectral_norm_matches_in_model():
    """normalize_tree + prenormalized_scope (the train-step fast path) must
    match in-model spectral norm, including the u/v updates. normalize_tree
    BATCHES same-shape power iterations, which permutes fp32 reduction
    order, so the comparison is tight-tolerance rather than bit-equal."""
    from calm_vit_dte_tpu.nn.spectral_norm import (
        normalize_tree,
        prenormalized_scope,
    )

    cfg = TINY_VIT
    params, state = vit_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3))
    r = jax.random.PRNGKey(2)
    y1, kl1, st1 = jax.jit(
        lambda p, s, x, r: vit_apply(cfg, p, s, x, training=True, rng=r))(
        params, state, x, r)

    def hoisted(p, s, x, r):
        np_, ns = normalize_tree(p, s, training=True)
        with prenormalized_scope():
            y, kl, _ = vit_apply(cfg, np_, s, x, training=True, rng=r)
        return y, kl, ns

    y2, kl2, st2 = jax.jit(hoisted)(params, state, x, r)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(float(kl1), float(kl2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
