"""Fused Pallas axial-attention kernel vs the XLA oracle (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calm_vit_dte_tpu.kernels.axial_attention import fused_masked_attention
from calm_vit_dte_tpu.ops.attention import _attention_core


def _inputs(b=2, h=3, s=48, d=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    w1 = jax.random.normal(ks[3], (2 * s, s)) / math.sqrt(s)
    b1 = jax.random.normal(ks[4], (2 * s,)) * 0.1
    w2 = jax.random.normal(ks[5], (s, 2 * s)) / math.sqrt(2 * s)
    b2 = jax.random.normal(ks[6], (s,)) * 0.1
    return q, k, v, w1, b1, w2, b2


@pytest.mark.parametrize("use_mask", [True, False])
def test_fused_forward_matches_oracle(use_mask):
    q, k, v, w1, b1, w2, b2 = _inputs()
    scale = 1.0 / math.sqrt(q.shape[-1])
    ref = _attention_core(q, k, v, w1, b1, w2, b2, scale=scale,
                          dtype=jnp.float32, use_mask=use_mask)
    out = fused_masked_attention(q, k, v, w1, b1, w2, b2, scale=scale,
                                 dtype=jnp.float32, use_mask=use_mask,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_fused_backward_matches_oracle():
    q, k, v, w1, b1, w2, b2 = _inputs()
    scale = 1.0 / math.sqrt(q.shape[-1])

    def loss_ref(args):
        out = _attention_core(*args, scale=scale, dtype=jnp.float32,
                              use_mask=True)
        return jnp.sum(out * jnp.cos(out.shape[-1] + out))

    def loss_fused(args):
        out = fused_masked_attention(*args, scale=scale, dtype=jnp.float32,
                                     use_mask=True, interpret=True)
        return jnp.sum(out * jnp.cos(out.shape[-1] + out))

    args = (q, k, v, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref)(args)
    g_fused = jax.grad(loss_fused)(args)
    for name, a, b_ in zip("q k v w1 b1 w2 b2".split(), g_ref, g_fused):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch for {name}")


def _rope_inputs(b=2, h=3, s=48, dc=8, dr=8, seed=1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    d = dc + dr
    qc = jax.random.normal(ks[0], (b, h, s, dc)) if dc else None
    kc = jax.random.normal(ks[1], (b, h, s, dc)) if dc else None
    qr = jax.random.normal(ks[2], (b, h, s, dr))
    kr = jax.random.normal(ks[3], (b, h, s, dr))
    v = jax.random.normal(ks[4], (b, h, s, d))
    w1 = jax.random.normal(ks[5], (2 * s, s)) / math.sqrt(s)
    b1 = jax.random.normal(ks[6], (2 * s,)) * 0.1
    w2 = jax.random.normal(ks[7], (s, 2 * s)) / math.sqrt(2 * s)
    b2 = jax.random.normal(ks[8], (s,)) * 0.1
    t = jnp.arange(s, dtype=jnp.float32)
    inv = 1.0 / (10.0 ** (jnp.arange(0, dr, 2, jnp.float32) / dr))
    fr = jnp.concatenate([jnp.outer(t, inv)] * 2, axis=-1)
    return (qc, qr, kc, kr, v, jnp.cos(fr), jnp.sin(fr),
            jnp.cos(fr * 1.1), jnp.sin(fr * 1.1), w1, b1, w2, b2)


def _rope_oracle(qc, qr, kc, kr, v, cq, sq, ck, sk, w1, b1, w2, b2, *,
                 scale, use_mask):
    def rot(x, c, s_):
        half = x.shape[-1] // 2
        rh = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return x * c + rh * s_

    q = rot(qr, cq, sq)
    k = rot(kr, ck, sk)
    if qc is not None:
        q = jnp.concatenate([qc, q], axis=-1)
        k = jnp.concatenate([kc, k], axis=-1)
    return _attention_core(q, k, v, w1, b1, w2, b2, scale=scale,
                           dtype=jnp.float32, use_mask=use_mask)


@pytest.mark.parametrize("dc", [8, 0])
@pytest.mark.parametrize("use_mask", [True, False])
def test_rope_fused_forward_matches_oracle(dc, use_mask):
    from calm_vit_dte_tpu.kernels.axial_attention import fused_rope_attention

    args = _rope_inputs(dc=dc)
    scale = 1.0 / math.sqrt(dc + 8)
    ref = _rope_oracle(*args, scale=scale, use_mask=use_mask)
    out = fused_rope_attention(*args, scale=scale, dtype=jnp.float32,
                               use_mask=use_mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("dc", [8, 0])
def test_rope_fused_backward_matches_oracle(dc):
    """Grads for content/rope inputs, v, the cos/sin TABLES (learned-
    frequency RoPE needs them) and the mask MLP weights."""
    from calm_vit_dte_tpu.kernels.axial_attention import fused_rope_attention

    args = _rope_inputs(dc=dc)
    scale = 1.0 / math.sqrt(dc + 8)
    names = "qc qr kc kr v cq sq ck sk w1 b1 w2 b2".split()
    argnums = tuple(i for i, a in enumerate(args) if a is not None)

    def loss_ref(*a):
        out = _rope_oracle(*a, scale=scale, use_mask=True)
        return jnp.sum(out * jnp.cos(out))

    def loss_fused(*a):
        out = fused_rope_attention(*a, scale=scale, dtype=jnp.float32,
                                   use_mask=True, interpret=True)
        return jnp.sum(out * jnp.cos(out))

    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    g_fused = jax.grad(loss_fused, argnums=argnums)(*args)
    for i, a, b_ in zip(argnums, g_ref, g_fused):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch for {names[i]}")


def test_masked_rope_attention_fallback_matches_fused():
    """The vmla entry point: CPU fallback (XLA rope+concat) vs the fused
    kernel in interpret mode must agree."""
    import functools

    from calm_vit_dte_tpu.kernels import axial_attention as ka
    from calm_vit_dte_tpu.ops.attention import masked_rope_attention

    qc, qr, kc, kr, v, cq, sq, ck, sk, w1, b1, w2, b2 = _rope_inputs()
    s, dr = 48, 8
    inv = 1.0 / (10.0 ** (jnp.arange(0, dr, 2, jnp.float32) / dr))
    rope_q = {"inv_freq": inv}
    rope_k = {"inv_freq": inv * 1.3}
    mask_params = {"fc1": {"w": w1, "b": b1}, "fc2": {"w": w2, "b": b2}}
    mask_state = {
        "fc1": {"u": jnp.ones((2 * s,)) / math.sqrt(2 * s),
                "v": jnp.ones((s,)) / math.sqrt(s)},
        "fc2": {"u": jnp.ones((s,)) / math.sqrt(s),
                "v": jnp.ones((2 * s,)) / math.sqrt(2 * s)},
    }
    out_fb, _ = masked_rope_attention(
        qc, qr, kc, kr, v, rope_q, rope_k, mask_params, mask_state,
        training=False, dtype=jnp.float32)

    from calm_vit_dte_tpu.nn.spectral_norm import spectral_normalize
    from calm_vit_dte_tpu.ops.rope import rope_tables

    w1n, _ = spectral_normalize(w1, mask_state["fc1"], training=False)
    w2n, _ = spectral_normalize(w2, mask_state["fc2"], training=False)
    cq2, sq2 = rope_tables(rope_q, s)
    ck2, sk2 = rope_tables(rope_k, s)
    out_k = ka.fused_rope_attention(
        qc, qr, kc, kr, v, cq2, sq2, ck2, sk2, w1n, b1, w2n, b2,
        scale=1.0 / math.sqrt(16), dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_fb),
                               rtol=1e-4, atol=1e-4)


def test_chunked_equals_whole_batch():
    from calm_vit_dte_tpu.ops.attention import attention_impl, masked_attention

    q, k, v, w1, b1, w2, b2 = _inputs(b=4)
    mask_params = {"fc1": {"w": w1, "b": b1}, "fc2": {"w": w2, "b": b2}}
    mask_state = {
        "fc1": {"u": jnp.ones((2 * 48,)) / math.sqrt(2 * 48),
                "v": jnp.ones((48,)) / math.sqrt(48)},
        "fc2": {"u": jnp.ones((48,)) / math.sqrt(48),
                "v": jnp.ones((2 * 48,)) / math.sqrt(2 * 48)},
    }
    with attention_impl("xla"):
        ref, _ = masked_attention(q, k, v, mask_params, mask_state,
                                  training=False, dtype=jnp.float32)
    with attention_impl("chunked", chunk=2):
        out, _ = masked_attention(q, k, v, mask_params, mask_state,
                                  training=False, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


class TestConvResidual:
    def _setup(self, b=2, s=32, seed=0):
        import jax
        import jax.numpy as jnp

        ks = jax.random.split(jax.random.PRNGKey(seed), 7)
        x = jax.random.normal(ks[0], (b, s, s, 3))
        w1 = jax.random.normal(ks[1], (32, 3)) * 0.3
        b1 = jax.random.normal(ks[2], (32,)) * 0.1
        wd = jax.random.normal(ks[3], (3, 3, 32)) * 0.3
        bd = jax.random.normal(ks[4], (32,)) * 0.1
        w2 = jax.random.normal(ks[5], (3, 32)) * 0.2
        b2 = jax.random.normal(ks[6], (3,)) * 0.1
        return x, w1, b1, wd, bd, w2, b2

    @staticmethod
    def _oracle(x, w1, b1, wd, bd, w2, b2):
        """lax.conv reference of the same chain."""
        import jax
        import jax.numpy as jnp

        def conv(x, w_hwio, b):
            return jax.lax.conv_general_dilated(
                x, w_hwio, (1, 1), "SAME",
                feature_group_count=w_hwio.shape[2] == 1 and w_hwio.shape[3]
                or 1,
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

        h = jax.lax.conv_general_dilated(
            x, w1.T.reshape(1, 1, 3, 32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
        h = jax.nn.gelu(h, approximate=False)
        h = jax.lax.conv_general_dilated(
            h, wd.reshape(3, 3, 1, 32), (1, 1), "SAME",
            feature_group_count=32,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bd
        h = jax.nn.gelu(h, approximate=False)
        return jax.lax.conv_general_dilated(
            h, w2.T.reshape(1, 1, 32, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2

    def test_forward_matches_lax_conv(self):
        import jax.numpy as jnp

        from calm_vit_dte_tpu.kernels.conv_residual import (
            fused_conv_residual,
        )

        args = self._setup()
        ref = self._oracle(*args)
        out = fused_conv_residual(*args, dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_backward_matches_lax_conv(self):
        import jax.numpy as jnp

        from calm_vit_dte_tpu.kernels.conv_residual import (
            fused_conv_residual,
        )

        args = self._setup()

        def loss_ref(a):
            return jnp.sum(jnp.sin(self._oracle(*a)))

        def loss_fused(a):
            return jnp.sum(jnp.sin(fused_conv_residual(
                *a, dtype=jnp.float32, interpret=True)))

        g_ref = jax.grad(loss_ref)(args)
        g_fused = jax.grad(loss_fused)(args)
        for name, a, b in zip("x w1 b1 wd bd w2 b2".split(), g_ref,
                              g_fused):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
                err_msg=f"grad mismatch for {name}")


def test_auto_impl_dispatch():
    """'auto' picks pallas only on TPU, chunked when the score tensor would
    blow the HBM budget, whole-batch otherwise (CPU here -> never pallas)."""
    from calm_vit_dte_tpu.ops.attention import _pick_impl

    impl, _ = _pick_impl(2, 3, 48, 48, 16)
    assert impl == "xla"
    impl, chunk = _pick_impl(512, 12, 224, 224, 56)
    assert impl == "chunked"
    assert chunk >= 1 and 512 % chunk == 0


def test_hybrid_pallas_fwd_xla_bwd():
    """The hires-path hybrid (fused forward in interpret mode + XLA
    recompute backward) matches the whole-batch oracle in both directions."""
    import math

    from calm_vit_dte_tpu.ops.attention import _attention_core, _make_hybrid

    q, k, v, w1, b1, w2, b2 = _inputs(b=4)
    scale = 1.0 / math.sqrt(q.shape[-1])
    hybrid = _make_hybrid(scale, "float32", True, 2,
                          (4, 3, 48, 16), interpret=True)
    out = hybrid(q, k, v, w1, b1, w2, b2)
    ref = _attention_core(q, k, v, w1, b1, w2, b2, scale=scale,
                          dtype=jnp.float32, use_mask=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)

    def loss_h(args):
        return jnp.sum(hybrid(*args) ** 2)

    def loss_r(args):
        return jnp.sum(_attention_core(*args, scale=scale,
                                       dtype=jnp.float32,
                                       use_mask=True) ** 2)

    gh = jax.grad(loss_h)((q, k, v, w1, b1, w2, b2))
    gr = jax.grad(loss_r)((q, k, v, w1, b1, w2, b2))
    for name, a, b_ in zip("q k v w1 b1 w2 b2".split(), gr, gh):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"hybrid grad mismatch {name}")


def test_hires_two_pass_backward_matches_oracle():
    """The hires path (fwd saving m/lse residuals + query-tiled dq/mask
    pass + key-tiled dk/dv pass) == oracle, fwd and all grads."""
    from calm_vit_dte_tpu.kernels.axial_attention import (
        fused_hires_attention,
    )

    q, k, v, w1, b1, w2, b2 = _inputs(b=2, h=3, s=64, d=16, seed=3)
    scale = 1.0 / math.sqrt(q.shape[-1])

    ref = _attention_core(q, k, v, w1, b1, w2, b2, scale=scale,
                          dtype=jnp.float32, use_mask=True)
    out = fused_hires_attention(q, k, v, w1, b1, w2, b2, scale=scale,
                                dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)

    def loss_ref(args):
        out = _attention_core(*args, scale=scale, dtype=jnp.float32,
                              use_mask=True)
        return jnp.sum(out * jnp.cos(out.shape[-1] + out))

    def loss_fused(args):
        out = fused_hires_attention(*args, scale=scale, dtype=jnp.float32,
                                    interpret=True)
        return jnp.sum(out * jnp.cos(out.shape[-1] + out))

    args = (q, k, v, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref)(args)
    g_fused = jax.grad(loss_fused)(args)
    for name, a, b_ in zip("q k v w1 b1 w2 b2".split(), g_ref, g_fused):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-4, atol=1e-4,
            err_msg=f"grad mismatch for {name}")
