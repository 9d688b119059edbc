"""Training evidence harness (VERDICT r3 item 2): prove the model LEARNS.

Three runs, all on the flagship 224px architectures through the production
train step (train/step.py) and the on-disk JPEG data plane (data/corpus.py
generates the corpus — this environment has no network egress, so a
procedural stand-in corpus replaces staged ImageNet; see corpus.py):

  overfit     flagship imagenet-cls-224 memorizes 512 fixed JPEG images
              with fixed random labels to >= 95% train top-1 (eval-style
              preprocessing, no mixup — the standard overfit protocol).
  generalize  flagship cls trains on 2048 class-conditional images through
              the FULL production pipeline (augment + CutMix/MixUp) and is
              scored on 512 held-out images: val top-1 above chance proves
              end-to-end learning, not memorization.
  reg         imagenet-reg-224 (Huber + 0.1*KL) trains for N steps; dumps
              a before/after reconstruction grid (the reference's only
              empirical artifact is its 372 trained-sample PNGs,
              CALM-ViT/samples/).

Each run prints a steps-vs-metric table and writes JSON (+ PNGs for reg)
under docs/evidence/.

  python scripts/train_proof.py overfit    --steps 800 --eval-every 100
  python scripts/train_proof.py generalize --steps 800 --eval-every 100
  python scripts/train_proof.py reg        --steps 300
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

EVIDENCE = pathlib.Path(__file__).resolve().parents[1] / "docs" / "evidence"


def _load_split(root: str, split: str, size: int):
    """Decode a whole ImageFolder split into memory through the production
    data plane (native C++ decoder when available)."""
    from calm_vit_dte_tpu.data.loader import ImageFolderDataset

    ds = ImageFolderDataset(root, split=split, size=size)
    imgs, labels = ds.load_batch(np.arange(len(ds)))
    return imgs, labels.astype(np.int32)


def _build(config: str, task: str, preprocess, lr: float, steps: int):
    import jax

    from calm_vit_dte_tpu.models.vit import vit_init
    from calm_vit_dte_tpu.train.optim import make_optimizer
    from calm_vit_dte_tpu.train.state import create_train_state
    from calm_vit_dte_tpu.train.step import make_train_step
    from calm_vit_dte_tpu.utils.configs import get_config

    cfg = get_config(config)
    params, sn_state = vit_init(cfg.model, jax.random.PRNGKey(cfg.init_seed))
    tx = make_optimizer(lr, cfg.weight_decay, cfg.beta1, cfg.beta2,
                        epochs=1, steps_per_epoch=steps)
    state = create_train_state(params, sn_state, tx, jax.random.PRNGKey(1))
    import jax.numpy as jnp

    step_fn = make_train_step(cfg.model, tx, task, dtype=jnp.bfloat16,
                              remat=False, preprocess=preprocess)
    return cfg, state, jax.jit(step_fn, donate_argnums=0)


def _make_eval_fn(cfg):
    """Jitted top-1 counter over a preprocessed eval batch."""
    import jax
    import jax.numpy as jnp

    from calm_vit_dte_tpu.data.pipeline import make_eval_preprocess
    from calm_vit_dte_tpu.models.vit import vit_apply
    from calm_vit_dte_tpu.nn.spectral_norm import (
        normalize_tree,
        prenormalized_scope,
    )

    pre = make_eval_preprocess(cfg.crop)

    @jax.jit
    def count(params, sn_state, imgs_u8, labels):
        b = pre({"image": imgs_u8})
        norm, _ = normalize_tree(params, sn_state, training=False)
        with prenormalized_scope():
            logits, _, _ = vit_apply(cfg.model, norm, sn_state, b["image"],
                                     training=False, dtype=jnp.bfloat16)
        return jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.int32))

    def top1(state, imgs, labels, batch: int = 128):
        n = len(imgs)
        batch = min(batch, n)
        correct = 0
        for i in range(0, n, batch):
            im, lb = imgs[i:i + batch], labels[i:i + batch]
            if len(im) < batch:  # wrap-pad the tail; padded labels = -1
                pad = batch - len(im)  # (argmax >= 0) never match
                im = np.concatenate([im, imgs[:pad]])
                lb = np.concatenate([lb, np.full(pad, -1, lb.dtype)])
            correct += int(count(state.params, state.sn_state, im, lb))
        return correct / n

    return top1


def _run_cls(args, mode: str) -> None:
    import jax
    import jax.numpy as jnp

    from calm_vit_dte_tpu.data.corpus import make_corpus
    from calm_vit_dte_tpu.data.pipeline import (
        make_cls_preprocess,
        make_eval_preprocess,
    )

    from calm_vit_dte_tpu.utils.configs import get_config

    t_start = time.time()
    tcfg = get_config(args.config)
    n_classes = tcfg.model.out_features
    if mode == "overfit":
        root = args.root or f"/tmp/calm_corpus_memorize_{n_classes}"
        make_corpus(root, n_train=args.n_train, n_val=0,
                    num_classes=n_classes, mode="memorize", seed=11)
        eval_split = "train"
    else:
        root = args.root or "/tmp/calm_corpus_learnable"
        make_corpus(root, n_train=args.n_train, n_val=args.n_train // 4,
                    num_classes=10, mode="learnable", seed=12)
        eval_split = "val"

    size = tcfg.image_size
    tr_imgs, tr_labels = _load_split(root, "train", size)
    ev_imgs, ev_labels = _load_split(root, eval_split, size)
    print(f"corpus: {len(tr_imgs)} train / {len(ev_imgs)} {eval_split} "
          f"images from {root}", flush=True)

    if mode == "overfit":
        # Standard overfit protocol: deterministic preprocessing (center
        # crop + normalize) and hard one-hot labels — no mixup, no jitter.
        evpre = make_eval_preprocess(tcfg.crop)

        def preprocess(key, batch):
            b = evpre(batch)
            return {"image": b["image"],
                    "label": jax.nn.one_hot(b["label"], n_classes)}
    else:
        # The FULL production pipeline: augmentation chain + CutMix/MixUp.
        preprocess = make_cls_preprocess(n_classes, tcfg.crop)

    cfg, state, jit_step = _build(args.config, "cls", preprocess,
                                  args.lr, args.steps)
    top1 = _make_eval_fn(cfg)

    tr_dev = jnp.asarray(tr_imgs)
    lab_dev = jnp.asarray(tr_labels)
    rng = np.random.default_rng(0)
    history = []
    losses = []
    order = None
    for step in range(args.steps):
        if step % max(len(tr_imgs) // args.batch, 1) == 0:
            order = rng.permutation(len(tr_imgs))
        off = (step * args.batch) % max(len(tr_imgs) - args.batch + 1, 1)
        idx = jnp.asarray(order[off:off + args.batch])
        batch = {"image": jnp.take(tr_dev, idx, 0),
                 "label": jnp.take(lab_dev, idx, 0)}
        state, metrics = jit_step(state, batch)
        losses.append(metrics["loss"])
        if (step + 1) % args.eval_every == 0 or step + 1 == args.steps:
            acc = top1(state, ev_imgs, ev_labels)
            loss = float(np.mean([float(x) for x in losses]))
            losses = []
            history.append({"step": step + 1, "loss": round(loss, 4),
                            f"{eval_split}_top1": round(acc, 4)})
            print(f"step {step+1:5d}  loss {loss:8.4f}  "
                  f"{eval_split} top-1 {acc*100:6.2f}%", flush=True)

    EVIDENCE.mkdir(parents=True, exist_ok=True)
    out = {"mode": mode, "config": args.config, "batch": args.batch,
           "lr": args.lr, "steps": args.steps,
           "n_train": len(tr_imgs), "n_eval": len(ev_imgs),
           "eval_split": eval_split, "chance_top1": round(
               1.0 / (n_classes if mode == "overfit" else 10), 4),
           "wall_s": round(time.time() - t_start, 1),
           "backend": jax.default_backend(), "history": history}
    path = EVIDENCE / f"train_proof_{mode}.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}", flush=True)


def _run_reg(args) -> None:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from calm_vit_dte_tpu.data.corpus import make_corpus
    from calm_vit_dte_tpu.data.pipeline import (
        make_eval_preprocess,
        make_reg_preprocess,
    )
    from calm_vit_dte_tpu.models.vit import vit_apply
    from calm_vit_dte_tpu.nn.spectral_norm import (
        normalize_tree,
        prenormalized_scope,
    )

    from calm_vit_dte_tpu.utils.configs import get_config

    t_start = time.time()
    root = args.root or "/tmp/calm_corpus_learnable"
    make_corpus(root, n_train=args.n_train, n_val=args.n_train // 4,
                num_classes=10, mode="learnable", seed=12)
    size = get_config(args.config).image_size
    tr_imgs, _ = _load_split(root, "train", size)
    cfg, state, jit_step = _build(args.config, "reg",
                                  make_reg_preprocess(
                                      get_config(args.config).crop),
                                  args.lr, args.steps)

    evpre = make_eval_preprocess(cfg.crop)

    @jax.jit
    def reconstruct(params, sn_state, imgs_u8):
        b = evpre({"image": imgs_u8})
        norm, _ = normalize_tree(params, sn_state, training=False)
        with prenormalized_scope():
            tokens, _, _ = vit_apply(cfg.model, norm, sn_state, b["image"],
                                     training=False, dtype=jnp.bfloat16)
        n, s, _ = tokens.shape
        return jax.nn.sigmoid(tokens.astype(jnp.float32)).reshape(
            n, s, s, 3)

    def grid(arr_f01, path):
        """4x4 grid of (S,S,3) float[0,1] images -> PNG."""
        n = 16
        s = arr_f01.shape[1]
        g = np.zeros((4 * s, 4 * s, 3), np.float32)
        for i in range(n):
            r, c = divmod(i, 4)
            g[r * s:(r + 1) * s, c * s:(c + 1) * s] = arr_f01[i]
        Image.fromarray(
            np.clip(np.round(g * 255), 0, 255).astype(np.uint8)).save(path)

    EVIDENCE.mkdir(parents=True, exist_ok=True)
    probe = tr_imgs[:16]
    crop = cfg.crop
    top = (size - crop) // 2
    grid(probe[:, top:top + crop, top:top + crop].astype(np.float32) / 255.0,
         EVIDENCE / "reg_inputs.png")
    # The step-0 probe needs a CONVERGED power iteration: raw-init u/v
    # under-estimate sigma and the unnormalized 24-layer eval forward goes
    # NaN at flagship scale (same issue Predictor.fresh fixes; NOTES.md r3).
    warm = jax.jit(lambda p, s: normalize_tree(p, s, training=True)[1])
    probe_sn = state.sn_state
    for _ in range(30):
        probe_sn = warm(state.params, probe_sn)
    before = np.asarray(reconstruct(state.params, probe_sn,
                                    jnp.asarray(probe)))
    grid(before, EVIDENCE / "reg_samples_step0.png")

    tr_dev = jnp.asarray(tr_imgs)
    rng = np.random.default_rng(0)
    losses, history = [], []
    for step in range(args.steps):
        idx = jnp.asarray(rng.choice(len(tr_imgs), args.batch,
                                     replace=False))
        state, metrics = jit_step(state, {"image": jnp.take(tr_dev, idx, 0)})
        losses.append(metrics["loss"])
        if (step + 1) % args.eval_every == 0 or step + 1 == args.steps:
            loss = float(np.mean([float(x) for x in losses]))
            losses = []
            history.append({"step": step + 1, "loss": round(loss, 5)})
            print(f"step {step+1:5d}  recon loss {loss:8.5f}", flush=True)

    after = np.asarray(reconstruct(state.params, state.sn_state,
                                   jnp.asarray(probe)))
    grid(after, EVIDENCE / f"reg_samples_step{args.steps}.png")
    # Quantify: trained reconstructions must be closer to the inputs.
    tgt = probe[:, top:top + crop, top:top + crop].astype(np.float32) / 255.0
    mse0 = float(np.mean((before - tgt) ** 2))
    mse1 = float(np.mean((after - tgt) ** 2))
    out = {"mode": "reg", "config": args.config, "batch": args.batch,
           "lr": args.lr, "steps": args.steps,
           "probe_mse_step0": round(mse0, 5),
           f"probe_mse_step{args.steps}": round(mse1, 5),
           "wall_s": round(time.time() - t_start, 1),
           "backend": jax.default_backend(), "history": history}
    path = EVIDENCE / "train_proof_reg.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}; probe MSE {mse0:.5f} -> {mse1:.5f}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["overfit", "generalize", "reg"])
    ap.add_argument("--config", default=None)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--n-train", type=int, default=None,
                    help="corpus train-split size (default: 512 for "
                         "overfit, 2048 otherwise)")
    ap.add_argument("--root", default=None,
                    help="corpus dir (generated if absent)")
    args = ap.parse_args()
    if args.config is None:
        args.config = ("imagenet-reg-224" if args.mode == "reg"
                       else "imagenet-cls-224")
    if args.n_train is None:
        args.n_train = 512 if args.mode == "overfit" else 2048
    if args.mode == "reg":
        _run_reg(args)
    else:
        _run_cls(args, args.mode)


if __name__ == "__main__":
    main()
