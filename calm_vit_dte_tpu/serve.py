"""Inference / serving entry point.

The reference has no serving path at all (SURVEY.md s1: "no
serving/inference layer"); this module provides one, TPU-first:

  * weights are spectral-normalized ONCE at load (eval-mode sigma from the
    stored u,v — exactly torch's eval behavior), then frozen;
  * a single jitted predict function with donated activations, bf16 compute;
  * batched classify() (top-k) and reconstruct() (sigmoid image output, the
    reg task's sample path) APIs;
  * accepts raw uint8 images; eval preprocessing (center crop + normalize)
    runs on device inside the same program.

    from calm_vit_dte_tpu.serve import Predictor
    p = Predictor.from_checkpoint("checkpoints", config="imagenet-cls-224")
    labels, probs = p.classify(images_u8)          # (B,256,256,3) uint8

CLI:  python -m calm_vit_dte_tpu.serve --config tiny-cls [--checkpoint DIR]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from calm_vit_dte_tpu.data.pipeline import make_eval_preprocess
from calm_vit_dte_tpu.models.vit import vit_apply
from calm_vit_dte_tpu.nn.spectral_norm import (
    normalize_tree,
    prenormalized_scope,
)
from calm_vit_dte_tpu.utils.configs import get_config


_QUANTIZE_MODES = (None, "int8", "int8-wo")


def _tree_fingerprint(params) -> dict:
    """Architecture fingerprint of a param tree: total element count plus a
    stable hash over the sorted (path, shape, dtype) triples. Written to
    serving.json at save() and checked at load() so a mismatched or
    corrupted artifact fails with a clear message instead of a cryptic
    pytree/shape error inside the first jitted predict."""
    import hashlib

    leaves = jax.tree_util.tree_leaves_with_path(params)
    n = 0
    h = hashlib.sha256()
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
        n += int(np.prod(leaf.shape)) if leaf.ndim else 1
        h.update(f"{jax.tree_util.keystr(path)}:{tuple(leaf.shape)}:"
                 f"{jnp.asarray(leaf).dtype.name};".encode())
    return {"n_params": n, "tree_sha256": h.hexdigest()[:16]}


class Predictor:
    def __init__(self, model_cfg, params, sn_state, crop: int = 224,
                 dtype=jnp.bfloat16, quantize: str | None = None,
                 config_name: str | None = None, _prefrozen: bool = False):
        """quantize='int8' serves w8a8 dynamically-quantized weights: every
        dense matmul outside the fused attention kernel runs int8 on the MXU
        (2x the bf16 rate on v5e) with per-channel weight scales and
        per-token activation scales. quantize='int8-wo' is w8a16
        weight-only: int8 weight storage/HBM-reads, bf16 activations — no
        per-token quant overhead, strictly more accurate; the right scheme
        for memory-bound shapes (hires at small batch). See quantize.py."""
        self.cfg = model_cfg
        self.crop = crop
        self.dtype = jnp.dtype(dtype)
        self.config_name = config_name
        if _prefrozen:
            # Restored serving artifact: params are already eval-normalized
            # (and quantized, if quantize is set) — use as-is.
            self.params = params
        else:
            # Freeze eval-mode normalized weights once; u/v never update
            # when serving (torch eval semantics).
            self.params, _ = normalize_tree(params, sn_state,
                                            training=False)
            if quantize is not None:
                modes = {"int8": "w8a8", "int8-wo": "w8a16"}
                if quantize not in modes:
                    raise ValueError(f"unknown quantize mode: {quantize!r} "
                                     f"(supported: {sorted(modes)})")
                from calm_vit_dte_tpu.quantize import quantize_tree

                self.params = quantize_tree(self.params, sn_state,
                                            mode=modes[quantize])
        self.quantize = quantize
        self.sn_state = sn_state
        pre = make_eval_preprocess(crop)

        def predict(params, sn_state, images_u8):
            x = pre({"image": images_u8})["image"]
            with prenormalized_scope():
                out, kl, _ = vit_apply(model_cfg, params, sn_state, x,
                                       training=False, dtype=dtype)
            return out, kl

        self._predict = jax.jit(predict)

    @classmethod
    def from_checkpoint(cls, source: str, config: str = "imagenet-cls-224",
                        quantize: str | None = None, **overrides):
        """source: an Orbax checkpoint dir or a reference .pth file."""
        from calm_vit_dte_tpu.models.factory import create_vit

        train_cfg = get_config(config, **overrides)
        model_cfg, params, sn_state = create_vit(config, weights=source)
        return cls(model_cfg, params, sn_state, crop=train_cfg.crop,
                   quantize=quantize, config_name=config)

    @classmethod
    def fresh(cls, config: str = "imagenet-cls-224", seed: int = 0,
              quantize: str | None = None):
        from calm_vit_dte_tpu.models.factory import create_vit
        from calm_vit_dte_tpu.nn.spectral_norm import normalize_tree

        train_cfg = get_config(config)
        model_cfg, params, sn_state = create_vit(config, seed=seed)
        # Converge the spectral-norm power iteration before freezing: a
        # trained checkpoint carries converged u vectors, but at raw init
        # the single-step sigma estimates are wild underestimates — the
        # effectively-unnormalized weights blow up the 24-layer forward to
        # NaN at flagship scale (measured: logits absmax NaN -> 0.118, KL
        # 4.7e6 -> 0.35 after convergence). Serving a fresh model must
        # behave like serving a trained one.
        warm = jax.jit(lambda p, s: normalize_tree(p, s, training=True)[1])
        for _ in range(30):
            sn_state = warm(params, sn_state)
        return cls(model_cfg, params, sn_state, crop=train_cfg.crop,
                   quantize=quantize, config_name=config)

    def save(self, path: str) -> None:
        """Persist the frozen serving artifact: the eval-normalized (and,
        if enabled, int8-quantized) param tree plus sn_state, with the
        quantize mode and crop in a sidecar JSON. Cold-start serving then
        skips the normalize/quantize passes entirely, and an int8 artifact
        is ~half the size of the bf16/fp32 training checkpoint (the 935M
        hires model: ~0.94 GB int8 vs ~3.7 GB fp32 params)."""
        import json
        import os

        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        os.makedirs(path, exist_ok=True)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(path, "tree"),
                       {"params": self.params, "sn_state": self.sn_state},
                       force=True)
        meta = {"quantize": self.quantize, "crop": self.crop,
                "config": self.config_name, "dtype": self.dtype.name}
        meta.update(_tree_fingerprint(self.params))
        with open(os.path.join(path, "serving.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str, config: str | None = None):
        """Restore a serving artifact written by save(). The architecture
        (config name), compute dtype, quantization and crop all come from
        the artifact's serving.json; pass `config` only to assert which
        architecture you expect (a mismatch fails loudly here rather than
        as a shape error inside the first jitted predict)."""
        import json
        import os

        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        with open(os.path.join(path, "serving.json")) as f:
            meta = json.load(f)
        saved_config = meta.get("config")
        if config is not None and saved_config is not None \
                and config != saved_config:
            raise ValueError(
                f"serving artifact at {path} was saved from config "
                f"{saved_config!r} but load() was asked for {config!r}")
        config = saved_config or config or "imagenet-cls-224"
        if meta.get("quantize") not in _QUANTIZE_MODES:
            raise ValueError(f"serving.json at {path} has invalid quantize "
                             f"mode {meta.get('quantize')!r} "
                             f"(expected one of {_QUANTIZE_MODES})")
        if not (isinstance(meta.get("crop"), int) and meta["crop"] > 0):
            raise ValueError(f"serving.json at {path} has invalid crop "
                             f"{meta.get('crop')!r} (expected positive int)")
        with ocp.StandardCheckpointer() as ckptr:
            tree = ckptr.restore(os.path.join(path, "tree"))
        if "n_params" in meta:
            fp = _tree_fingerprint(tree["params"])
            if fp != {k: meta[k] for k in ("n_params", "tree_sha256")}:
                raise ValueError(
                    f"serving artifact at {path} does not match its "
                    f"serving.json fingerprint: restored tree has "
                    f"{fp['n_params']} params / hash {fp['tree_sha256']}, "
                    f"sidecar says {meta['n_params']} / "
                    f"{meta['tree_sha256']} — artifact corrupted or "
                    f"hand-edited")
        model_cfg = get_config(config).model
        return cls(model_cfg, tree["params"], tree["sn_state"],
                   crop=meta["crop"], quantize=meta["quantize"],
                   dtype=jnp.dtype(meta.get("dtype", "bfloat16")),
                   config_name=config, _prefrozen=True)

    def classify(self, images_u8, top_k: int = 5):
        """images_u8: (B, H, W, 3) uint8. Returns (top-k labels (B,k),
        top-k probs (B,k))."""
        if self.cfg.generate:
            raise ValueError("generate-head model; use reconstruct()")
        logits, _ = self._predict(self.params, self.sn_state,
                                  jnp.asarray(images_u8))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = np.asarray(jax.device_get(probs))
        idx = np.argsort(-probs, axis=-1)[:, :top_k]
        return idx, np.take_along_axis(probs, idx, axis=-1)

    def reconstruct(self, images_u8):
        """Returns sigmoid'd reconstructions (B, S, S, 3) float in [0,1]
        (the reference's sample-generation output, CALM_ViT_V2.py:113-118)."""
        if not self.cfg.generate:
            raise ValueError("classification-head model; use classify()")
        tokens, _ = self._predict(self.params, self.sn_state,
                                  jnp.asarray(images_u8))
        b, s, _ = tokens.shape
        img = jax.nn.sigmoid(tokens.astype(jnp.float32)).reshape(b, s, s, 3)
        return np.asarray(jax.device_get(img))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="imagenet-cls-224")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--quantize", default=None,
                    choices=["int8", "int8-wo"],
                    help="serve int8-quantized weights: 'int8' = w8a8 "
                         "dynamic, 'int8-wo' = w8a16 weight-only")
    args = ap.parse_args()
    cfg = get_config(args.config)
    if args.checkpoint:
        p = Predictor.from_checkpoint(args.checkpoint, config=args.config,
                                      quantize=args.quantize)
    else:
        p = Predictor.fresh(args.config, quantize=args.quantize)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (args.batch, cfg.image_size, cfg.image_size,
                                 3), dtype=np.uint8)
    if cfg.model.generate:
        out = p.reconstruct(imgs)
        print(f"reconstructed {out.shape}, range "
              f"[{out.min():.3f}, {out.max():.3f}]")
    else:
        labels, probs = p.classify(imgs)
        print(f"top-5 labels for {args.batch} images:", labels[:2].tolist())


if __name__ == "__main__":
    main()
