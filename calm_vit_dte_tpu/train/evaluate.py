"""Top-1 evaluation over the validation split.

Reference: the eval branch of CALM_ViT_V2.py:227-240 (which unpacks the
model's (logits, kl) tuple incorrectly at :235 — fixed here), distributed
across the mesh.

    python -m calm_vit_dte_tpu.train.evaluate --config imagenet-cls-224
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from calm_vit_dte_tpu.data.loader import BatchLoader
from calm_vit_dte_tpu.data.pipeline import make_eval_preprocess
from calm_vit_dte_tpu.data.sampler import ShardedSampler
from calm_vit_dte_tpu.models.vit import vit_apply, vit_init
from calm_vit_dte_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from calm_vit_dte_tpu.train.checkpoint import restore_checkpoint
from calm_vit_dte_tpu.train.optim import make_optimizer
from calm_vit_dte_tpu.train.state import create_train_state
from calm_vit_dte_tpu.train.trainer import build_dataset, maybe_init_distributed
from calm_vit_dte_tpu.utils.configs import TrainConfig, get_config
from calm_vit_dte_tpu.utils.logging import is_chief


def evaluate(cfg: TrainConfig, max_batches: int | None = None,
             mesh=None, quantize: str | None = None,
             stats_out: dict | None = None) -> float:
    """Top-1 accuracy over the val split. quantize='int8'/'int8-wo' runs
    the whole evaluation through the post-training-quantized serving tree
    (quantize.py), pinning int8 top-1 end-to-end — the number serving users
    actually get, not a per-op error bound.

    stats_out, if given, is filled with end-to-end timing (wall_s, images,
    img_per_s, loader_wait_s, device_s) — the full-val-scale bench
    (scripts/bench_eval_50k.py) reads these to report loader-vs-chip
    utilization over an ImageNet-val-sized corpus."""
    maybe_init_distributed()
    mesh = mesh if mesh is not None else make_mesh()

    params, sn_state = vit_init(cfg.model, jax.random.PRNGKey(cfg.init_seed))
    tx = make_optimizer(cfg.lr, epochs=cfg.epochs, steps_per_epoch=1)
    state = create_train_state(params, sn_state, tx,
                               jax.random.PRNGKey(cfg.init_seed + 1))
    state = jax.device_put(state, replicated_sharding(mesh))
    restored = restore_checkpoint(cfg.checkpoint_dir, state)
    if restored is not None:
        state = restored
        if is_chief():
            print(f"evaluating checkpoint at step {int(state.step)}",
                  flush=True)
    elif is_chief():
        print("no checkpoint found; evaluating fresh init", flush=True)

    pre = make_eval_preprocess(cfg.crop)

    from calm_vit_dte_tpu.nn.spectral_norm import (
        normalize_tree,
        prenormalized_scope,
    )

    # Freeze eval-mode normalized weights once (numerically identical to
    # normalizing per batch — training=False is deterministic — and what the
    # serving path does); optionally quantize the frozen tree.
    frozen = jax.jit(lambda p, s: normalize_tree(p, s, training=False)[0])(
        state.params, state.sn_state)
    if quantize is not None:
        modes = {"int8": "w8a8", "int8-wo": "w8a16"}
        if quantize not in modes:
            raise ValueError(f"unknown quantize mode: {quantize!r} "
                             f"(supported: {sorted(modes)})")
        from calm_vit_dte_tpu.quantize import quantize_tree

        frozen = quantize_tree(frozen, state.sn_state, mode=modes[quantize])

    def eval_step(params, sn_state, batch):
        b = pre(batch)
        with prenormalized_scope():
            logits, _, _ = vit_apply(cfg.model, params, sn_state,
                                     b["image"], training=False,
                                     dtype=jnp.bfloat16)
        pred = jnp.argmax(logits, axis=-1)
        return (jnp.sum(((pred == b["label"]) & b["valid"]).astype(jnp.int32)),
                jnp.sum(b["valid"].astype(jnp.int32)))

    jit_eval = jax.jit(eval_step)

    dataset = build_dataset(cfg, split="val")
    per_host = cfg.global_batch_size // jax.process_count()
    sampler = ShardedSampler(len(dataset), jax.process_count(),
                             jax.process_index(), shuffle=False)
    # pad_last + valid masks: static jit shapes, yet each val image counts
    # exactly once (no wrap-padding duplicates, no dropped tail batch).
    loader = BatchLoader(dataset, sampler, per_host,
                         num_workers=cfg.num_workers, pad_last=True)
    sh = batch_sharding(mesh)
    correct = total = 0
    import time

    t_start = time.time()
    loader_wait = device_s = 0.0
    it = enumerate(loader)
    while True:
        t = time.time()
        try:
            i, host_batch = next(it)
        except StopIteration:
            break
        loader_wait += time.time() - t
        t = time.time()
        batch = {k: jax.make_array_from_process_local_data(sh, v)
                 for k, v in host_batch.items()}
        c, n = jax.device_get(jit_eval(frozen, state.sn_state, batch))
        device_s += time.time() - t
        correct += int(c)
        total += int(n)
        if is_chief() and i % 10 == 0:
            print(f"Batch {i}, Accuracy: {correct / max(total, 1) * 100}%",
                  flush=True)
        if max_batches is not None and i + 1 >= max_batches:
            break
    acc = correct / max(total, 1)
    if stats_out is not None:
        wall = time.time() - t_start
        stats_out.update(
            wall_s=round(wall, 2), images=total,
            img_per_s=round(total / max(wall, 1e-9), 2),
            loader_wait_s=round(loader_wait, 2),
            device_s=round(device_s, 2))
    if is_chief():
        print(f"top-1 accuracy: {acc * 100:.2f}% over {total} images",
              flush=True)
    return acc


def main() -> None:
    from calm_vit_dte_tpu.train.train_cls import _parse_overrides

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="imagenet-cls-224")
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--quantize", default=None, choices=["int8", "int8-wo"],
                    help="evaluate through the int8 PTQ serving tree")
    ap.add_argument("overrides", nargs="*",
                    help="TrainConfig field overrides, key=value")
    args = ap.parse_args()
    evaluate(get_config(args.config, **_parse_overrides(args.overrides)),
             max_batches=args.max_batches, quantize=args.quantize)


if __name__ == "__main__":
    main()
