"""Checkpoint format versioning + optimizer-layout migration.

Round-5 feature (VERDICT r4 items 3/8): checkpoints carry a meta item
(format_version, opt_layout); restore migrates Adam moments between the
fused-flat layout (DP production) and the per-param tree layout (required
under tensor parallelism), so a run checkpointed at data=N resumes at
data=N/2 x model=2 — the real-world resume-after-resize scenario. Legacy
(v1) checkpoints restore unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calm_vit_dte_tpu.models.vit import vit_init
from calm_vit_dte_tpu.train.checkpoint import (
    checkpoint_meta,
    migrate_opt_state,
    opt_layout,
    restore_checkpoint,
    save_checkpoint,
)
from calm_vit_dte_tpu.train.optim import make_optimizer
from calm_vit_dte_tpu.train.state import TrainState, create_train_state
from calm_vit_dte_tpu.train.step import make_train_step
from calm_vit_dte_tpu.utils.configs import get_config


def _mk(flatten: bool):
    cfg = get_config("tiny-cls")
    params, sn_state = vit_init(cfg.model, jax.random.PRNGKey(0))
    # steps_per_epoch=2 so the save-at-step-3 point sits INSIDE epoch 1:
    # the continued step's LR differs from epoch 0, which catches a
    # migration that forgets the schedule's own counter.
    tx = make_optimizer(1e-3, 0.02, epochs=4, steps_per_epoch=2,
                        flatten=flatten)
    state = create_train_state(params, sn_state, tx, jax.random.PRNGKey(1))
    # donate_argnums mirrors the production trainer — and catches migrated
    # states that alias one buffer into two tree slots (donating such a
    # state is an XLA error; the schedule-count copy in migrate_opt_state
    # exists exactly for this).
    step = jax.jit(make_train_step(cfg.model, tx, "cls",
                                   dtype=jnp.float32, remat=False),
                   donate_argnums=0)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((8, 48, 48, 3)),
                             jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(rng.integers(0, 10, 8)), 10),
    }
    return tx, state, step, batch


def _losses_match(m_a, m_b, rtol):
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=rtol)


def test_meta_written_and_versioned(tmp_path):
    tx, state, step, batch = _mk(flatten=True)
    state, _ = step(state, batch)
    save_checkpoint(str(tmp_path / "c"), state)
    meta = checkpoint_meta(str(tmp_path / "c"))
    assert meta["format_version"] == 2
    assert meta["opt_layout"] == "fused-flat"
    assert meta["step"] == 1


def test_fused_to_tree_resume(tmp_path):
    """Save under the fused-flat DP optimizer, restore + continue under the
    per-param tree optimizer (the TP layout). The continued step must match
    the unreshaped continuation (fused==chain math is pinned by
    test_fused_adamw_matches_optax_chain; migration must not perturb it)."""
    tx_f, state, step_f, batch = _mk(flatten=True)
    for _ in range(3):
        state, _ = step_f(state, batch)
    save_checkpoint(str(tmp_path / "c"), state)

    # Ground truth: continue WITHOUT reshaping.
    ref_state, ref_metrics = step_f(state, batch)

    tx_t, t_state, step_t, _ = _mk(flatten=False)
    restored = restore_checkpoint(str(tmp_path / "c"), t_state)
    assert restored is not None
    assert opt_layout(restored.opt_state) == "tree"
    assert int(restored.step) == 3

    cont_state, cont_metrics = step_t(restored, batch)
    _losses_match(ref_metrics, cont_metrics, rtol=1e-6)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.params),
            jax.tree_util.tree_leaves_with_path(cont_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


def test_tree_to_fused_resume(tmp_path):
    """The reverse direction (TP checkpoint -> DP fused resume) via
    saved_opt_template."""
    tx_t, state, step_t, batch = _mk(flatten=False)
    for _ in range(3):
        state, _ = step_t(state, batch)
    save_checkpoint(str(tmp_path / "c"), state)
    ref_state, ref_metrics = step_t(state, batch)

    tx_f, f_state, step_f, _ = _mk(flatten=True)
    restored = restore_checkpoint(str(tmp_path / "c"), f_state,
                                  saved_opt_template=tx_t.init(
                                      f_state.params))
    assert restored is not None
    assert opt_layout(restored.opt_state) == "fused-flat"
    cont_state, cont_metrics = step_f(restored, batch)
    _losses_match(ref_metrics, cont_metrics, rtol=1e-6)


def test_tree_to_fused_without_template_raises(tmp_path):
    tx_t, state, step_t, batch = _mk(flatten=False)
    state, _ = step_t(state, batch)
    save_checkpoint(str(tmp_path / "c"), state)
    _, f_state, _, _ = _mk(flatten=True)
    with pytest.raises(ValueError, match="saved_opt_template"):
        restore_checkpoint(str(tmp_path / "c"), f_state)


def test_legacy_v1_restore(tmp_path):
    """Round 1-4 checkpoints (bare StandardSave, no meta item) still
    restore, and checkpoint_meta reports them as format 1."""
    import orbax.checkpoint as ocp

    tx, state, step, batch = _mk(flatten=True)
    state, _ = step(state, batch)
    with ocp.CheckpointManager(
            str(tmp_path / "c"),
            options=ocp.CheckpointManagerOptions(create=True)) as mgr:
        mgr.save(int(state.step), args=ocp.args.StandardSave(state))

    meta = checkpoint_meta(str(tmp_path / "c"))
    assert meta["format_version"] == 1
    restored = restore_checkpoint(str(tmp_path / "c"), state)
    assert restored is not None
    ref_state, m_a = step(state, batch)
    _, m_b = step(restored, batch)
    _losses_match(m_a, m_b, rtol=1e-6)


def test_migrate_roundtrip_pure():
    """fused -> tree -> fused is lossless on the moments."""
    tx_f, state_f, step_f, batch = _mk(flatten=True)
    for _ in range(2):
        state_f, _ = step_f(state_f, batch)
    tx_t, _, _, _ = _mk(flatten=False)
    tree_tpl = tx_t.init(state_f.params)
    tree = migrate_opt_state(state_f.opt_state, tree_tpl, state_f.params)
    back = migrate_opt_state(tree, state_f.opt_state, state_f.params)
    np.testing.assert_allclose(np.asarray(back.mu),
                               np.asarray(state_f.opt_state.mu), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(back.nu),
                               np.asarray(state_f.opt_state.nu), rtol=1e-7)
    assert int(back.count) == int(state_f.opt_state.count)
