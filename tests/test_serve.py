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


def test_serving_artifact_roundtrip(tmp_path):
    """save()/load() restores the frozen quantized tree bit-exactly: same
    top-k and identical probs, no re-normalization or re-quantization."""
    import jax.numpy as jnp

    p = Predictor.fresh("tiny-cls", seed=0, quantize="int8-wo")
    p.save(str(tmp_path / "artifact"))
    p2 = Predictor.load(str(tmp_path / "artifact"), config="tiny-cls")
    assert p2.quantize == "int8-wo" and p2.crop == p.crop

    # The restored tree kept the quantized structure (int8 weights present).
    import jax

    dtypes = {str(jnp.asarray(x).dtype) for x in jax.tree.leaves(p2.params)}
    assert "int8" in dtypes, dtypes
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 56, 56, 3), dtype=np.uint8)
    out1, _ = p._predict(p.params, p.sn_state, jnp.asarray(imgs))
    out2, _ = p2._predict(p2.params, p2.sn_state, jnp.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
