"""End-to-end trainer integration: synthetic data -> loader -> on-device
preprocessing -> jitted step -> checkpoint -> exact resume."""

import os

import numpy as np

from calm_vit_dte_tpu.train.trainer import train
from calm_vit_dte_tpu.utils.configs import get_config


def test_train_checkpoint_resume_exact(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    cfg = get_config("tiny-cls", checkpoint_dir=ckpt, epochs=1,
                     global_batch_size=16, log_every=100)
    # run 2 steps, checkpointing at epoch end (max_steps caps mid-epoch,
    # checkpoint still written after the loop)
    s1 = train(cfg, max_steps=2)
    assert int(s1.step) == 2
    # resume: picks up the epoch-end checkpoint and continues the SAME
    # trajectory (rng folded on the step counter)
    s2 = train(cfg, max_steps=2)
    assert int(s2.step) > 2
    # params evolved (training continued, not restarted)
    diff = 0.0
    import jax

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        diff += float(np.abs(np.asarray(a) - np.asarray(b)).sum())
    assert diff > 0.0


def test_reg_trainer_dumps_samples(tmp_path):
    cfg = get_config("tiny-reg", checkpoint_dir=str(tmp_path / "ckpt"),
                     epochs=1, global_batch_size=16,
                     save_samples_dir=str(tmp_path / "samples"))
    train(cfg, max_steps=1)
    files = os.listdir(tmp_path / "samples")
    assert any(f.endswith(".png") for f in files)
