"""Serving path: frozen eval-normalized weights, classify + reconstruct."""

import numpy as np

from calm_vit_dte_tpu.serve import Predictor


def test_classify_tiny():
    p = Predictor.fresh("tiny-cls")
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 56, 56, 3), dtype=np.uint8)
    labels, probs = p.classify(imgs, top_k=3)
    assert labels.shape == (4, 3)
    assert probs.shape == (4, 3)
    assert (probs >= 0).all() and (probs <= 1).all()
    # top-1 prob >= top-3 prob (sorted)
    assert (np.diff(probs, axis=-1) <= 1e-6).all()
    # deterministic
    labels2, probs2 = p.classify(imgs, top_k=3)
    np.testing.assert_array_equal(labels, labels2)


def test_reconstruct_tiny():
    p = Predictor.fresh("tiny-reg")
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 56, 56, 3), dtype=np.uint8)
    out = p.reconstruct(imgs)
    assert out.shape == (2, 48, 48, 3)
    assert (out >= 0).all() and (out <= 1).all()
