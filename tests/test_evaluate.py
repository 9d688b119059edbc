"""End-to-end eval path (reference eval branch, CALM_ViT_V2.py:227-240,
with its tuple-unpack bug fixed)."""

from calm_vit_dte_tpu.train.evaluate import evaluate
from calm_vit_dte_tpu.utils.configs import get_config


def test_evaluate_tiny(tmp_path):
    cfg = get_config("tiny-cls", checkpoint_dir=str(tmp_path / "none"))
    acc = evaluate(cfg, max_batches=2)
    assert 0.0 <= acc <= 1.0
