"""Jitted train/eval steps for the two reference workloads.

Classification (reference: distributed_trainer_cls.py:79-104): bf16 forward,
CE loss on CutMix/MixUp soft labels, global-norm clip 1.0, AdamW; metrics are
loss + dominant-class accuracy.

Regression/reconstruction (reference: distributed_trainer_reg.py:71-100):
bf16 forward, Huber(recon, input) + 0.1*KL.

The returned step functions are pure (TrainState, batch) -> (TrainState,
metrics); the trainer jits them over the mesh with donated state. Data
parallelism comes from batch sharding — XLA inserts the gradient all-reduce
(the reference needed DDP + NCCL for this).

Variational sampling: the per-step key is fold_in(state.rng, state.step), so
resume-from-checkpoint reproduces the exact noise sequence (the reference's
CUDA RNG state was lost on restart).
"""

from __future__ import annotations


from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from calm_vit_dte_tpu.models.vit import ViTConfig, vit_apply
from calm_vit_dte_tpu.nn.spectral_norm import (
    normalize_tree,
    prenormalized_scope,
)
from calm_vit_dte_tpu.train.losses import (
    dominant_class_accuracy,
    reconstruction_loss,
    softmax_cross_entropy,
)
from calm_vit_dte_tpu.train.state import TrainState


def make_train_step(cfg: ViTConfig, tx: optax.GradientTransformation,
                    task: str, dtype=jnp.bfloat16, remat: bool = True,
                    preprocess: Callable | None = None,
                    microbatches: int = 1) -> Callable:
    """task: 'cls' (CE on soft labels) or 'reg' (Huber + 0.1*KL).

    `preprocess(key, batch) -> batch` (e.g. data.pipeline.train_preprocess)
    runs INSIDE the jitted step, so host->device traffic is raw uint8 images
    and augmentation/mixup fuse into the same XLA program as the model.

    `microbatches > 1` = gradient accumulation: the batch is split into
    `microbatches` equal slices, a `lax.scan` accumulates mean gradients
    across them, and ONE optimizer update is applied — semantically a
    single large-batch step. This is how the reference's per-chip batch 484
    (distributed_trainer_cls.py:166-167) runs here: the monolithic bs=484
    graph crashes this environment's remote compiler, but the scanned body
    compiles once at bs=484/k. Each microbatch draws a distinct
    reparameterization key (fold_in of the step key), mirroring how a
    monolithic batch would sample per-example noise."""
    if task not in ("cls", "reg"):
        raise ValueError(task)
    if microbatches < 1:
        raise ValueError(f"microbatches must be >= 1, got {microbatches}")

    def _train_apply(params, sn_state, x, rng):
        return vit_apply(cfg, params, sn_state, x, training=True, rng=rng,
                         dtype=dtype)

    if remat:
        # Rematerialize the forward during backprop: trades MXU FLOPs for
        # HBM, letting the big per-chip batches (484/456) fit. Attention
        # outputs are SAVED (checkpoint_name in ops/attention.py), so the
        # backward never re-runs the fused attention kernels — only the
        # cheap linear/elementwise chain recomputes. Conv residuals are
        # saved too (checkpoint_name in models/block.py), so the fused conv
        # kernel runs fwd once + bwd once per step instead of
        # fwd + remat-replay + bwd (38 MB bf16 per stage at b128/S224).
        apply_fn = jax.checkpoint(
            _train_apply,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out", "conv_out"))
    else:
        apply_fn = _train_apply

    def train_step(state: TrainState, batch: dict[str, Any]):
        step_rng = jax.random.fold_in(state.rng, state.step)
        if preprocess is not None:
            data_rng = jax.random.fold_in(step_rng, 1)
            batch = preprocess(data_rng, batch)

        # The spectral-norm pre-pass is hoisted out of the (rematerialized,
        # possibly scanned) model graph: one batched normalize + one VJP
        # pull-back instead of ~150 per-layer chains replayed per microbatch
        # (r2 measured ~130 ms/step of tiny fusions at batch 128 for the
        # in-model variant). Exact by linearity of the VJP in the cotangent:
        # sum_i J^T g_i == J^T sum_i g_i. (Hoisting out of the scan itself
        # measured neutral — 627.1 vs 626.6 img/s — XLA already treated the
        # loop-invariant forward as such; kept for the single normalize
        # semantics and one shared loss_fn.)
        (norm_params, new_sn), norm_vjp = jax.vjp(
            lambda p: normalize_tree(p, state.sn_state, training=True),
            state.params)

        def loss_fn(norm_params, mb, mb_rng):
            with prenormalized_scope():
                out, kl, _ = apply_fn(norm_params, state.sn_state,
                                      mb["image"], mb_rng)
            if task == "cls":
                loss = softmax_cross_entropy(out, mb["label"])
                metrics = {
                    "loss": loss,
                    "accuracy": dominant_class_accuracy(out, mb["label"]),
                    "kl": kl,
                }
            else:
                loss = reconstruction_loss(out, mb["image"], kl)
                metrics = {"loss": loss, "kl": kl}
            return loss, metrics

        grad_fn = jax.grad(loss_fn, has_aux=True)
        if microbatches == 1:
            g_normed, metrics = grad_fn(norm_params, batch, step_rng)
        else:
            # Slice the batch into (k, B/k, ...) and scan; the carry holds
            # the running MEAN of grads/metrics (sum/k is folded into the
            # accumulate so the carry magnitude matches the final result —
            # no large-k overflow in the sum).
            k = microbatches
            b = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if b % k != 0:
                raise ValueError(f"batch {b} not divisible by "
                                 f"microbatches {k}")
            mbs = jax.tree_util.tree_map(
                lambda a: a.reshape((k, b // k) + a.shape[1:]), batch)

            def body(carry, xs):
                g_acc, m_acc = carry
                mb, i = xs
                grads_i, metrics_i = grad_fn(
                    norm_params, mb, jax.random.fold_in(step_rng, 2 + i))
                g_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g / k, g_acc, grads_i)
                m_acc = jax.tree_util.tree_map(
                    lambda a, m: a + m / k, m_acc, metrics_i)
                return (g_acc, m_acc), None

            zeros_g = jax.tree_util.tree_map(jnp.zeros_like, norm_params)
            m_shape = jax.eval_shape(
                lambda: grad_fn(norm_params,
                                jax.tree_util.tree_map(lambda a: a[0],
                                                       mbs),
                                step_rng)[1])
            zeros_m = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
            (g_normed, metrics), _ = jax.lax.scan(
                body, (zeros_g, zeros_m), (mbs, jnp.arange(k)))
        # Pull the accumulated grad back through the normalize pre-pass
        # once. The cotangent for new_sn is zero: u/v power-iteration state
        # is stop-gradiented inside spectral_normalize.
        (grads,) = norm_vjp((g_normed,
                             jax.tree_util.tree_map(jnp.zeros_like,
                                                    new_sn)))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # The fused optimizer computes the pre-clip global norm anyway
        # (it drives clipping + the finiteness skip); reuse it instead of
        # a second full pass over the gradients.
        if hasattr(new_opt, "gnorm"):
            metrics["grad_norm"] = new_opt.gnorm
        else:
            metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            params=new_params,
            sn_state=new_sn,
            opt_state=new_opt,
            step=state.step + 1,
            rng=state.rng,
        )
        return new_state, metrics

    return train_step


def make_eval_step(cfg: ViTConfig, task: str,
                   dtype=jnp.bfloat16) -> Callable:
    def eval_step(state: TrainState, batch: dict[str, Any]):
        norm_params, _ = normalize_tree(state.params, state.sn_state,
                                        training=False)
        with prenormalized_scope():
            out, kl, _ = vit_apply(cfg, norm_params, state.sn_state,
                                   batch["image"], training=False,
                                   dtype=dtype)
        if task == "cls":
            pred = jnp.argmax(out, axis=-1)
            correct = jnp.sum((pred == batch["label"]).astype(jnp.int32))
            return {"correct": correct,
                    "total": jnp.asarray(batch["label"].shape[0], jnp.int32),
                    "kl": kl}
        loss = reconstruction_loss(out, batch["image"], kl)
        return {"loss": loss, "kl": kl, "tokens": out}

    return eval_step
