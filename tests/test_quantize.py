"""Post-training int8 serving path (quantize.py).

The reference has no quantization/serving story; this validates the w8a8
dynamic scheme end-to-end: per-channel weight quantization round-trips
within int8 resolution, the quantized matmuls track their float oracles,
and a quantized Predictor stays close to the bf16 one on real model
forwards (logit error small, top-1 agreement).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from calm_vit_dte_tpu.quantize import (qdot, qdot_seq, qdot_seq_wo, qdot_wo,
                                       quantize_tree, quantize_weight)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(48, 96)).astype(np.float32))
    wq, ws = quantize_weight(w)
    assert wq.dtype == jnp.int8
    assert ws.shape == (48,)
    deq = wq.astype(jnp.float32) * ws[:, None]
    # Max error per row is half a quantization step.
    step = np.asarray(ws)[:, None]
    assert (np.abs(np.asarray(deq - w)) <= 0.5 * step + 1e-7).all()


def test_qdot_tracks_float_oracle():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 32, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(48, 96)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
    wq, ws = quantize_weight(w)
    y = qdot(x, wq, ws, b, dtype=jnp.float32)
    ref = x @ w.T + b
    rel = jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref)
    assert rel < 0.02, rel


def test_qdot_seq_tracks_float_oracle():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 32, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(24, 32)).astype(np.float32))
    wq, ws = quantize_weight(w)
    y = qdot_seq(x, wq, ws, dtype=jnp.float32)
    ref = jnp.einsum("ns,bsd->bnd", w, x)
    rel = jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref)
    assert rel < 0.02, rel


def test_qdot_wo_tracks_float_oracle_tighter_than_w8a8():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 32, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(48, 96)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
    wq, ws = quantize_weight(w)
    ref = x @ w.T + b
    rel_wo = jnp.linalg.norm(qdot_wo(x, wq, ws, b, dtype=jnp.float32) - ref)
    rel_a8 = jnp.linalg.norm(qdot(x, wq, ws, b, dtype=jnp.float32) - ref)
    nrm = jnp.linalg.norm(ref)
    assert rel_wo / nrm < 0.01, rel_wo / nrm
    # Weight-only skips activation rounding: strictly more accurate.
    assert rel_wo <= rel_a8, (rel_wo, rel_a8)


def test_qdot_seq_wo_tracks_float_oracle():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 32, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(24, 32)).astype(np.float32))
    wq, ws = quantize_weight(w)
    y = qdot_seq_wo(x, wq, ws, dtype=jnp.float32)
    ref = jnp.einsum("ns,bsd->bnd", w, x)
    rel = jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref)
    assert rel < 0.01, rel


def test_quantize_tree_weight_only_mode():
    from calm_vit_dte_tpu.models.factory import create_vit
    from calm_vit_dte_tpu.nn.spectral_norm import normalize_tree

    _, params, sn_state = create_vit("tiny-cls", seed=0)
    norm, _ = normalize_tree(params, sn_state, training=False)
    qtree = quantize_tree(norm, sn_state, mode="w8a16")

    n_quant = [0]

    def walk(p):
        if isinstance(p, dict):
            if "w_q" in p:
                n_quant[0] += 1
                assert "w_so" in p and "w_s" not in p
            for v in p.values():
                walk(v)

    walk(qtree)
    assert n_quant[0] > 10

    with pytest.raises(ValueError, match="unknown quantize_tree mode"):
        quantize_tree(norm, sn_state, mode="int4")


def test_quantize_tree_skips_mask_mlp_and_vectors():
    from calm_vit_dte_tpu.models.factory import create_vit
    from calm_vit_dte_tpu.nn.spectral_norm import normalize_tree

    _, params, sn_state = create_vit("tiny-cls", seed=0)
    norm, _ = normalize_tree(params, sn_state, training=False)
    qtree = quantize_tree(norm, sn_state)

    n_quant = [0]

    def walk(p, path=()):
        if isinstance(p, dict):
            if "w_q" in p:
                n_quant[0] += 1
                assert p["w_q"].dtype == jnp.int8
                assert "w" not in p
                assert "linear_mask" not in path
            for k, v in p.items():
                walk(v, path + (k,))

    walk(qtree)
    assert n_quant[0] > 10  # every eligible linear got quantized

    # The mask MLP kept its float weights (fused-kernel operand).
    def find_mask(p):
        if isinstance(p, dict):
            if "linear_mask" in p:
                yield p["linear_mask"]
            for v in p.values():
                yield from find_mask(v)

    masks = list(find_mask(qtree))
    assert masks
    for m in masks:
        assert "w" in m["fc1"] and "w_q" not in m["fc1"]


@pytest.mark.parametrize("quantize", ["int8", "int8-wo"])
@pytest.mark.parametrize("config,shape", [("tiny-cls", (4, 56, 56, 3)),
                                          ("tiny-reg", (2, 56, 56, 3))])
def test_quantized_predictor_matches_bf16(config, shape, quantize):
    from calm_vit_dte_tpu.serve import Predictor

    p_f = Predictor.fresh(config, seed=0)
    p_q = Predictor.fresh(config, seed=0, quantize=quantize)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, shape, dtype=np.uint8)
    out_f, _ = p_f._predict(p_f.params, p_f.sn_state, jnp.asarray(imgs))
    out_q, _ = p_q._predict(p_q.params, p_q.sn_state, jnp.asarray(imgs))
    out_f = np.asarray(out_f, dtype=np.float32)
    out_q = np.asarray(out_q, dtype=np.float32)
    rel = np.linalg.norm(out_q - out_f) / max(np.linalg.norm(out_f), 1e-9)
    # int8 PTQ vs the bf16 path on a 12-layer net: a few percent relative.
    assert rel < 0.15, rel
    if config == "tiny-cls":
        # Top-1 agreement on at least 3 of 4 random images.
        agree = (out_f.argmax(-1) == out_q.argmax(-1)).sum()
        assert agree >= 3, (agree, out_f.argmax(-1), out_q.argmax(-1))


def test_quantized_predictor_rejects_unknown_mode():
    from calm_vit_dte_tpu.serve import Predictor

    with pytest.raises(ValueError, match="unknown quantize mode"):
        Predictor.fresh("tiny-cls", quantize="fp4")
