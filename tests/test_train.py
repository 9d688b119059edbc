"""Training-stack tests: schedule parity, losses, step mechanics, checkpoint
roundtrip, overfit sanity."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from calm_vit_dte_tpu.models.vit import vit_init
from calm_vit_dte_tpu.train.losses import (
    dominant_class_accuracy,
    huber,
    softmax_cross_entropy,
)
from calm_vit_dte_tpu.train.optim import (
    cosine_per_epoch_schedule,
    make_optimizer,
)
from calm_vit_dte_tpu.train.state import create_train_state
from calm_vit_dte_tpu.train.step import make_train_step
from calm_vit_dte_tpu.utils.configs import TINY_VIT, get_config


def test_cosine_schedule_matches_torch_formula():
    # torch CosineAnnealingLR(T_max=65, eta_min=1e-6), stepped per epoch.
    base, epochs, spe = 3.1e-3, 65, 7
    sched = cosine_per_epoch_schedule(base, epochs, spe)
    for step, epoch in [(0, 0), (6, 0), (7, 1), (65 * 7 - 1, 64)]:
        expected = 1e-6 + (base - 1e-6) * (1 + np.cos(np.pi * epoch /
                                                      epochs)) / 2
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6)
    np.testing.assert_allclose(float(sched(0)), base, rtol=1e-6)


def test_ce_matches_torch_semantics():
    logits = jnp.asarray([[2.0, 1.0, 0.1], [0.3, 0.2, 0.5]])
    soft = jnp.asarray([[0.7, 0.2, 0.1], [0.0, 1.0, 0.0]])
    lp = jax.nn.log_softmax(logits)
    expected = float(-(soft * lp).sum(-1).mean())
    np.testing.assert_allclose(float(softmax_cross_entropy(logits, soft)),
                               expected, rtol=1e-6)
    # int labels == one-hot
    np.testing.assert_allclose(
        float(softmax_cross_entropy(logits, jnp.asarray([0, 1]))),
        float(-(lp[0, 0] + lp[1, 1]) / 2), rtol=1e-6)


def test_huber_matches_torch_semantics():
    pred = jnp.asarray([0.0, 2.0, -3.0])
    tgt = jnp.asarray([0.5, 0.0, 0.0])
    # |d|: 0.5 -> quadratic; 2, 3 -> linear
    expected = np.mean([0.5 * 0.25, 1 * (2 - 0.5), 1 * (3 - 0.5)])
    np.testing.assert_allclose(float(huber(pred, tgt)), expected, rtol=1e-6)


def test_dominant_accuracy():
    logits = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    soft = jnp.asarray([[0.6, 0.4], [0.7, 0.3]])
    assert float(dominant_class_accuracy(logits, soft)) == 0.5


@pytest.fixture(scope="module")
def tiny_step():
    cfg = get_config("tiny-cls")
    params, sn_state = vit_init(cfg.model, jax.random.PRNGKey(0))
    tx = make_optimizer(1e-3, 0.02, epochs=2, steps_per_epoch=4)
    state = create_train_state(params, sn_state, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(cfg.model, tx, "cls",
                                   dtype=jnp.float32, remat=False))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((8, 48, 48, 3)), jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(rng.integers(0, 10, 8)), 10),
    }
    return state, step, batch


def test_train_step_decreases_loss(tiny_step):
    state, step, batch = tiny_step
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # spectral norm state actually updates during training
    u0 = None


def test_sn_state_updates_in_training(tiny_step):
    state, step, batch = tiny_step
    leaf = lambda s: np.asarray(jax.tree.leaves(s.sn_state)[0])
    before = leaf(state)
    state2, _ = step(state, batch)
    after = leaf(state2)
    assert not np.array_equal(before, after)


def test_checkpoint_roundtrip(tmp_path, tiny_step):
    from calm_vit_dte_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    state, step, batch = tiny_step
    state2, _ = step(state, batch)
    save_checkpoint(str(tmp_path / "ckpt"), state2)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), state2)
    assert restored is not None
    assert int(restored.step) == int(state2.step)
    for a, b in zip(jax.tree.leaves(state2.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume continues identically: one more step from each matches
    s_a, m_a = step(state2, batch)
    s_b, m_b = step(restored, batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)


def test_reg_step_runs():
    cfg = get_config("tiny-reg")
    params, sn_state = vit_init(cfg.model, jax.random.PRNGKey(0))
    tx = make_optimizer(1e-3, 0.02, epochs=2, steps_per_epoch=4)
    state = create_train_state(params, sn_state, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(cfg.model, tx, "reg",
                                   dtype=jnp.float32, remat=False))
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.standard_normal((4, 48, 48, 3)),
                                  jnp.float32)}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["kl"]))


def test_fused_adamw_matches_optax_chain():
    """The fused flat AdamW == flatten(apply_if_finite(clip+adamw)):
    same params after several steps, same skip-on-NaN behavior, same
    schedule/bias-correction counting across skipped steps."""
    import optax

    from calm_vit_dte_tpu.train.optim import (
        cosine_per_epoch_schedule, make_optimizer,
    )

    key = jax.random.PRNGKey(0)
    params = {
        "a": {"w": jax.random.normal(key, (64, 32)),
              "b": jnp.zeros((64,))},
        "c": jax.random.normal(jax.random.fold_in(key, 1), (8, 8, 3)),
    }
    sched = cosine_per_epoch_schedule(3.1e-3, 65, 4)
    ref_tx = optax.flatten(optax.apply_if_finite(optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(learning_rate=sched, b1=0.9, b2=0.98, eps=1e-8,
                    weight_decay=0.02)), 100))
    fused_tx = make_optimizer(3.1e-3, 0.02, 0.9, 0.98, epochs=65,
                              steps_per_epoch=4, flatten=True)

    def run(tx, with_nan_step):
        p = jax.tree.map(jnp.copy, params)
        s = tx.init(p)
        for i in range(6):
            g = jax.tree.map(
                lambda x, k=i: jax.random.normal(
                    jax.random.fold_in(key, 100 + k), x.shape) * (2.0 + k),
                p)
            if with_nan_step and i == 2:
                g = jax.tree.map(lambda x: x.at[(0,) * x.ndim].set(
                    jnp.nan) if x.ndim else x * jnp.nan, g)
            u, s = tx.update(g, s, p)
            p = optax.apply_updates(p, u)
        return p

    for with_nan in (False, True):
        p_ref = run(ref_tx, with_nan)
        p_fused = run(fused_tx, with_nan)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


def test_steplr_coupled_adam_matches_torch():
    """single-node-cls optimizer semantics (CALM_ViT_V2.py:151-152):
    torch Adam(lr=3.1e-3, weight_decay=0.02) — COUPLED L2 — with
    StepLR(step_size=5, gamma=0.1) stepped per epoch. Cross-checked
    against real torch on a small param vector."""
    import torch

    lr, wd, spe = 3.1e-3, 0.02, 3
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(7,)).astype(np.float32)
    grads = [rng.normal(size=(7,)).astype(np.float32) for _ in range(18)]

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd,
                            betas=(0.9, 0.999))
    tsched = torch.optim.lr_scheduler.StepLR(topt, step_size=5, gamma=0.1)
    for e in range(6):  # 6 epochs x 3 steps
        for i in range(spe):
            g = grads[e * spe + i]
            topt.zero_grad()
            tp.grad = torch.tensor(g)
            topt.step()
        tsched.step()

    tx = make_optimizer(lr, wd, 0.9, 0.999, epochs=6, steps_per_epoch=spe,
                        clip_norm=1e9, schedule="steplr", lr_step_size=5,
                        lr_gamma=0.1, decoupled_wd=False, flatten=False,
                        skip_nonfinite=False)
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    import optax

    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=2e-4, atol=2e-6)


def test_single_node_config_registered():
    cfg = get_config("single-node-cls")
    assert cfg.global_batch_size == 100 and cfg.epochs == 5
    assert cfg.schedule == "steplr" and not cfg.decoupled_wd
    assert cfg.beta2 == 0.999  # torch Adam default, not the 0.98 AdamW set


def test_microbatch_accumulation_matches_manual_mean(tiny_step):
    """microbatches=k must equal: mean over k slice-grads (each drawn with
    fold_in(step_rng, 2+i)), one optimizer update — computed here manually
    through the same loss pieces as an independent check on the scan."""
    from calm_vit_dte_tpu.models.vit import vit_apply
    from calm_vit_dte_tpu.nn.spectral_norm import (
        normalize_tree,
        prenormalized_scope,
    )
    from calm_vit_dte_tpu.train.losses import softmax_cross_entropy

    from calm_vit_dte_tpu.train.state import create_train_state

    state0, _, batch = tiny_step
    cfg = get_config("tiny-cls")
    # SGD(1.0) makes the param delta literally equal the mean gradient —
    # comparing post-Adam params would be ill-conditioned (Adam's first
    # step is +-lr per element, so reassociation noise on near-zero grads
    # flips signs).
    import optax

    tx = optax.sgd(1.0)
    state = create_train_state(state0.params, state0.sn_state, tx,
                               jax.random.PRNGKey(1))
    k = 2
    step2 = jax.jit(make_train_step(cfg.model, tx, "cls",
                                    dtype=jnp.float32, remat=False,
                                    microbatches=k))
    got, metrics = step2(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    step_rng = jax.random.fold_in(state.rng, state.step)
    b = batch["image"].shape[0]

    def loss_fn(params, mb_img, mb_lab, rng):
        norm_params, _ = normalize_tree(params, state.sn_state,
                                        training=True)
        with prenormalized_scope():
            out, kl, _ = vit_apply(cfg.model, norm_params, state.sn_state,
                                   mb_img, training=True, rng=rng,
                                   dtype=jnp.float32)
        return softmax_cross_entropy(out, mb_lab)

    grads = None
    for i in range(k):
        sl = slice(i * b // k, (i + 1) * b // k)
        g = jax.grad(loss_fn)(state.params, batch["image"][sl],
                              batch["label"][sl],
                              jax.random.fold_in(step_rng, 2 + i))
        grads = g if grads is None else jax.tree.map(
            lambda a, x: a + x, grads, g)
    grads = jax.tree.map(lambda a: a / k, grads)
    delta = jax.tree.map(lambda p0, p1: p0 - p1, state.params, got.params)
    for a, w in zip(jax.tree.leaves(delta), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=2e-3, atol=1e-6)


def test_microbatch_requires_divisible_batch(tiny_step):
    state, _, batch = tiny_step
    cfg = get_config("tiny-cls")
    tx = make_optimizer(1e-3, 0.02, epochs=2, steps_per_epoch=4)
    step3 = jax.jit(make_train_step(cfg.model, tx, "cls",
                                    dtype=jnp.float32, remat=False,
                                    microbatches=3))
    with pytest.raises(ValueError, match="not divisible"):
        step3(state, batch)


def test_fused_adamw_bf16_moments():
    """moment_dtype=bfloat16 (the hires single-chip memory mode): moments
    are STORED in bf16 (half HBM), update math stays fp32 — trajectories
    track the fp32-moment optimizer closely over several steps."""
    import optax

    from calm_vit_dte_tpu.train.optim import make_optimizer

    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (64, 32)),
              "b": jnp.zeros((16,))}
    tx32 = make_optimizer(3.1e-3, 0.02, epochs=4, steps_per_epoch=2)
    tx16 = make_optimizer(3.1e-3, 0.02, epochs=4, steps_per_epoch=2,
                          moment_dtype=jnp.bfloat16)
    s32, s16 = tx32.init(params), tx16.init(params)
    assert s16.mu.dtype == jnp.bfloat16 and s16.nu.dtype == jnp.bfloat16
    assert s32.mu.dtype == jnp.float32
    p32 = jax.tree.map(jnp.copy, params)
    p16 = jax.tree.map(jnp.copy, params)
    for i in range(5):
        g = jax.tree.map(
            lambda p: 0.1 * jax.random.normal(
                jax.random.fold_in(key, i), p.shape), params)
        u32, s32 = tx32.update(g, s32, p32)
        p32 = optax.apply_updates(p32, u32)
        u16, s16 = tx16.update(g, s16, p16)
        p16 = optax.apply_updates(p16, u16)
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(p16)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)

    # tree path rejects it (moments must keep per-param shardings under TP)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="moment_dtype"):
        make_optimizer(3.1e-3, 0.02, flatten=False,
                       moment_dtype=jnp.bfloat16)
