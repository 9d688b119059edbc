"""Model-stack structure tests: shapes, constraints, variants the parity
goldens don't cover (Encoder8, CALMLatentDiffusion, force_reduce, use_mask
off, latent-state combine modes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calm_vit_dte_tpu.models.block import axial_transpose
from calm_vit_dte_tpu.models.encoder_decoder import (
    CALMLatentDiffusionConfig,
    Encoder8Config,
    EncoderDecoder8Config,
    calm_latent_diffusion_apply,
    calm_latent_diffusion_init,
    encoder8_apply,
    encoder8_init,
    encoder_decoder8_apply,
    encoder_decoder8_init,
)
from calm_vit_dte_tpu.models.vit import ViTConfig, vit_init
from calm_vit_dte_tpu.models.vmla import VMLAConfig
from calm_vit_dte_tpu.ops.latent_state import LatentState

TINY = dict(heads=3, dim1=144, dim_step=12, mean_var_hidden=24,
            seq_length=48, seq_len_step=4, seq_len_reduce=8)


def test_axial_transpose_involution():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 24))
    y = axial_transpose(axial_transpose(x))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # transpose actually swaps the spatial axes
    img = np.asarray(x).reshape(2, 8, 8, 3)
    t = np.asarray(axial_transpose(x)).reshape(2, 8, 8, 3)
    np.testing.assert_array_equal(img.transpose(0, 2, 1, 3), t)


def test_vmla_rejects_odd_rope_dim():
    # The reference Encoder_8 defaults crash this way at runtime; we reject
    # at construction (SURVEY.md s2a).
    # A stepped (reduce=True) layer with dim2=600: head_dim_rope = 25, odd.
    cfg = VMLAConfig(heads=12, dim1=672, dim2=600, mean_var_hidden=192,
                     seq_length=224, seq_len_reduce=96, seq_len_new=200,
                     mlp_dim=1200, is_cross=True)
    with pytest.raises(ValueError, match="RoPE"):
        cfg.validate()


def test_vit_config_validation():
    with pytest.raises(ValueError, match="3\\*seq_length"):
        ViTConfig(heads=3, seq_length=48, in_features=150,
                  dim_step=12, seq_len_step=4).validate()
    with pytest.raises(ValueError, match="dim_step"):
        ViTConfig(heads=3, seq_length=48, in_features=144,
                  dim_step=12, seq_len_step=5).validate()


def test_encoder8_shapes():
    cfg = Encoder8Config(**{**TINY, "seq_len_reduce": 8})
    params, state = encoder8_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3))
    y, _ = jax.jit(lambda p, s, x: encoder8_apply(cfg, p, s, x,
                                                  training=False))(
        params, state, x)
    # two steps of -3*dim_step: 144 -> 108 -> 72; seq 48 -> 36 -> 24
    assert y.shape == (2, 24, 72)
    assert np.isfinite(np.asarray(y)).all()


def test_calm_latent_diffusion_shapes():
    cfg = CALMLatentDiffusionConfig(**TINY, mean_var_hidden_diffusion=8,
                                    seq_len_reduce_diffusion=4)
    params, state = calm_latent_diffusion_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3))
    y, kl, _ = jax.jit(
        lambda p, s, x: calm_latent_diffusion_apply(cfg, p, s, x,
                                                    training=False))(
        params, state, x)
    assert y.shape == (2, 48, 144)
    assert np.isfinite(float(kl))


def test_force_reduce_branch():
    cfg = EncoderDecoder8Config(**TINY, force_reduce=True)
    params, state = encoder_decoder8_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 48, 3))
    y, kl, _ = jax.jit(
        lambda p, s, x: encoder_decoder8_apply(cfg, p, s, x,
                                               training=False))(
        params, state, x)
    assert y.shape == (1, 48, 144)
    # esm + dsm + csm all contribute
    assert np.isfinite(float(kl))


def test_use_mask_false_works():
    # The reference crashes with mask=False (Vi_Tools_CNN_less_V2.py:290-291)
    # — fixed here.
    cfg = EncoderDecoder8Config(**TINY)
    params, state = encoder_decoder8_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 48, 3))
    y, kl, _ = jax.jit(
        lambda p, s, x: encoder_decoder8_apply(cfg, p, s, x, training=False,
                                               use_mask=False))(
        params, state, x)
    assert y.shape == (1, 48, 144)


@pytest.mark.parametrize("mode,expected", [
    # after two updates of values 1.0 then 3.0:
    ("sum", 4.0),           # 1 + 3
    ("sma", 2.0),           # (1+3)/2
    ("ema", 1.0 + (2/3) * (3.0 - 1.0)),   # m = 2/(2+1)
    ("lp", 1.0 + 0.5 * (3.0 - 1.0)),      # m = count/(count+1) with count=2... see below
    ("static", 1.0 + 0.9 * (3.0 - 1.0)),  # momentum 0.9
])
def test_latent_state_modes(mode, expected):
    # Reference combine semantics (Vi_Tools_CNN_less_V2.py:31-47).
    ls = LatentState(mode=mode)
    one = jnp.ones((2, 2))
    mean = jnp.zeros((2, 2))
    var = jnp.ones((2, 2))
    ls.update(one, one, mean, var, mean, var)
    zq, _ = ls.update(3 * one, 3 * one, mean, var, mean, var)
    if mode == "lp":
        expected = (2 / 3) * 3.0 + (1 / 3) * 1.0
    np.testing.assert_allclose(np.asarray(zq)[0, 0], expected, rtol=1e-6)


def test_latent_kl_mean_over_count():
    ls = LatentState(mode="sum")
    mean = jnp.full((2, 2), 0.5)
    var = jnp.full((2, 2), 0.7)
    for _ in range(3):
        ls.update(mean, mean, mean, var, mean, var)
    # kl per layer = 2 * kl(mean, var); total / count
    from calm_vit_dte_tpu.ops.variational import kl_divergence
    per = 2 * kl_divergence(mean, var)
    np.testing.assert_allclose(float(ls.kl_loss()), float(per), rtol=1e-6)


def test_param_count_tiny():
    from calm_vit_dte_tpu.utils.configs import TINY_VIT
    params, _ = vit_init(TINY_VIT, jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree.leaves(params))
    assert n == 1_551_602  # pinned: tiny cls config


def test_conv_impl_variants_match(monkeypatch):
    """The CALM_CONV_IMPL experimental formulations (matmul 1x1s + lax or
    9-tap depthwise) are numerically equivalent to the default lax.conv
    chain (models/block.py conv_residual_apply)."""
    from calm_vit_dte_tpu.models.block import (
        conv_residual_apply, conv_residual_init,
    )

    params, st = conv_residual_init(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 48)) * 0.5
    outs = {}
    for impl in ("lax", "mix", "tap"):
        monkeypatch.setenv("CALM_CONV_IMPL", impl)
        y, _ = conv_residual_apply(params, st, x, training=True,
                                   dtype=jnp.float32)
        outs[impl] = np.asarray(y)
    for impl in ("mix", "tap"):
        np.testing.assert_allclose(outs[impl], outs["lax"], rtol=2e-5,
                                   atol=2e-5, err_msg=impl)


def test_conv_impl_env_var_validated(monkeypatch):
    """CALM_CONV_IMPL is a trace-time experiment switch: an unknown value
    must raise, not silently pick a formulation (multi-host SPMD programs
    must not change numerics on a typo'd env var)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from calm_vit_dte_tpu.models.block import conv_residual_apply, \
        conv_residual_init

    params, state = conv_residual_init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 8, 24))
    monkeypatch.setenv("CALM_CONV_IMPL", "bogus")
    with pytest.raises(ValueError, match="CALM_CONV_IMPL"):
        conv_residual_apply(params, state, x, training=False,
                            dtype=jnp.float32)


def test_projection_impls_match():
    """The eval-default einsum head-split projections and the training
    merged-dot+split path compute the same function (models/vmla.py
    CALM_PROJ_IMPL): fp32 forward agreement on the tiny model."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from calm_vit_dte_tpu.models.vit import vit_apply, vit_init
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = get_config("tiny-cls").model
    params, sn = vit_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 48, 48, 3)),
                    jnp.float32)
    prev = os.environ.get("CALM_PROJ_IMPL")
    try:
        os.environ["CALM_PROJ_IMPL"] = "split"
        out0, _, _ = vit_apply(cfg, params, sn, x, training=False,
                               dtype=jnp.float32)
        os.environ["CALM_PROJ_IMPL"] = "einsum"
        out1, _, _ = vit_apply(cfg, params, sn, x, training=False,
                               dtype=jnp.float32)
    finally:
        if prev is None:
            os.environ.pop("CALM_PROJ_IMPL", None)
        else:
            os.environ["CALM_PROJ_IMPL"] = prev
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               atol=2e-5, rtol=2e-5)
