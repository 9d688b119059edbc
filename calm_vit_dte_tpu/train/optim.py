"""Optimizer and LR schedule, matching the reference trainers.

AdamW(lr=3.1e-3, weight_decay=0.02, betas=(0.9, 0.98)) (reference:
distributed_trainer_cls.py:158) with global-norm gradient clipping at 1.0
(:92) and cosine annealing to eta_min=1e-6 stepped per *epoch* (:52,108-109 —
the trainer overrides whatever scheduler was passed in; we reproduce the
effective behavior and drop the dead argument, per SURVEY.md decision log).

The reference's GradScaler is a no-op under bf16 (bf16 has fp32-range
exponent); it is intentionally dropped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def cosine_per_epoch_schedule(base_lr: float, epochs: int,
                              steps_per_epoch: int,
                              eta_min: float = 1e-6):
    """torch CosineAnnealingLR(T_max=epochs) stepped once per epoch:
    lr(step) = eta_min + (base - eta_min) * (1 + cos(pi*epoch/T_max)) / 2."""

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / epochs))

    return schedule


def step_lr_schedule(base_lr: float, steps_per_epoch: int,
                     step_size: int = 5, gamma: float = 0.1):
    """torch StepLR stepped once per epoch (reference single-node driver,
    CALM_ViT_V2.py:152): lr(step) = base * gamma^(epoch // step_size)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size).astype(jnp.float32)

    return schedule


def make_optimizer(base_lr: float = 3.1e-3, weight_decay: float = 0.02,
                   b1: float = 0.9, b2: float = 0.98, epochs: int = 65,
                   steps_per_epoch: int = 1000, clip_norm: float = 1.0,
                   eta_min: float = 1e-6,
                   skip_nonfinite: bool = True,
                   flatten: bool = True,
                   *,
                   schedule: str = "cosine-epoch",
                   lr_step_size: int = 5,
                   lr_gamma: float = 0.1,
                   decoupled_wd: bool = True,
                   moment_dtype=jnp.float32,
                   ) -> optax.GradientTransformation:
    """skip_nonfinite reproduces torch GradScaler's step-skipping on inf/nan
    gradients (the only thing the scaler actually did under bf16; reference:
    distributed_trainer_cls.py:87-94).

    flatten=True runs the update on one flat vector — the param tree has
    ~700 leaves, so the per-leaf clip/adam chain becomes ~7k tiny TPU ops
    (~30 ms/step at 42M params); flattened it is a handful of large VPU
    passes. Use flatten=False under tensor parallelism: the flat vector
    cannot carry per-param TP shardings, so the moments must keep the param
    tree structure (see parallel.mesh.state_shardings).

    schedule='steplr' + decoupled_wd=False reproduce the single-node
    driver's optim.Adam(lr, weight_decay=0.02) + StepLR(5, 0.1)
    (CALM_ViT_V2.py:151-152): torch Adam's weight_decay is COUPLED L2
    (added to the gradient before the moments), unlike the distributed
    trainers' AdamW.

    moment_dtype=jnp.bfloat16 halves the Adam-moment HBM footprint (the
    update math still runs in fp32; only the stored mu/nu round) — the
    hires-cls-1024 single-chip memory mode: 935.57M params x 8 B of fp32
    moments = 7.5 GB does not leave room on a 16 GB chip, x 4 B does.
    Only supported on the fused flat path."""
    if schedule == "steplr":
        sched = step_lr_schedule(base_lr, steps_per_epoch, lr_step_size,
                                 lr_gamma)
    elif schedule == "cosine-epoch":
        sched = cosine_per_epoch_schedule(base_lr, epochs, steps_per_epoch,
                                          eta_min)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    if flatten and decoupled_wd:
        return _fused_flat_adamw(sched, b1, b2, 1e-8, weight_decay,
                                 clip_norm, skip_nonfinite,
                                 moment_dtype=moment_dtype)
    if moment_dtype != jnp.float32:
        raise ValueError("moment_dtype is only supported on the fused "
                         "flat path (flatten=True, decoupled_wd=True)")
    if decoupled_wd:
        inner = optax.adamw(learning_rate=sched, b1=b1, b2=b2, eps=1e-8,
                            weight_decay=weight_decay)
    else:
        inner = optax.chain(
            optax.add_decayed_weights(weight_decay),  # coupled L2, pre-Adam
            optax.adam(learning_rate=sched, b1=b1, b2=b2, eps=1e-8),
        )
    tx = optax.chain(optax.clip_by_global_norm(clip_norm), inner)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


# CHECKPOINT COMPATIBILITY: FusedAdamWState replaced the round-1
# optax.flatten(apply_if_finite(chain(...))) state in round 2 — checkpoints
# saved before that cannot be restored for resume (Orbax will fail on the
# mismatched opt_state tree). No migration shim is provided: no pre-change
# production checkpoints exist; if one surfaces, restore params-only via
# warm_start_params and retrain the optimizer moments.
class FusedAdamWState(NamedTuple):
    count: jax.Array       # applied steps (drives bias correction + LR)
    notfinite: jax.Array   # consecutive skipped steps
    gnorm: jax.Array       # last pre-clip global grad norm (free metric)
    mu: jax.Array          # flat first moment, fp32
    nu: jax.Array          # flat second moment, fp32


def _fused_flat_adamw(schedule, b1: float, b2: float, eps: float,
                      weight_decay: float, clip_norm: float,
                      skip_nonfinite: bool,
                      max_consecutive_errors: int = 100,
                      moment_dtype=jnp.float32,
                      ) -> optax.GradientTransformation:
    """clip_by_global_norm + AdamW + if-finite step-skip as ONE fused flat
    update.

    The equivalent optax chain (flatten(apply_if_finite(chain(clip,
    adamw)))) materializes ~10 full-tree-sized intermediates per step —
    scaled grads, mu_hat/nu_hat, decayed weights, per-stage selects —
    ~9 ms at the 42.6M-param flagship (measured, scripts/profile_opt.py).
    Here the entire update is one jnp expression over four flat fp32
    vectors (g, p, mu, nu), which XLA fuses into a single multi-output
    pass; the finiteness test rides the clip norm for free (any NaN/inf in
    g makes sum(g^2) non-finite). Update math is element-for-element the
    optax semantics: trigger-style clip scaling, bias-corrected moments
    with the APPLIED-step count (skipped steps advance neither the count
    nor the schedule, exactly like apply_if_finite), decoupled weight
    decay, and raw-update passthrough once max_consecutive_errors is
    exceeded so a persistent NaN surfaces instead of silently stalling."""
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        flat = flat.astype(moment_dtype)
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            notfinite=jnp.zeros((), jnp.int32),
            gnorm=jnp.zeros((), jnp.float32),
            mu=jnp.zeros_like(flat),
            nu=jnp.zeros_like(flat))

    def update(grads, state, params=None):
        assert params is not None, "fused adamw requires params"
        g, unravel = ravel_pytree(grads)
        g = g.astype(jnp.float32)
        p, _ = ravel_pytree(params)
        p = p.astype(jnp.float32)

        gsq = jnp.vdot(g, g)
        gnorm = jnp.sqrt(gsq)
        # optax.clip_by_global_norm: scale only when the norm exceeds clip.
        scale = jnp.where(gnorm < clip_norm, 1.0,
                          clip_norm / jnp.maximum(gnorm, 1e-30))
        finite = jnp.isfinite(gsq)
        apply_step = jnp.logical_or(
            finite, state.notfinite >= max_consecutive_errors
        ) if skip_nonfinite else jnp.array(True)

        def do_apply(_):
            t = state.count + 1
            gc = g * scale
            # Moment math always in fp32; only storage rounds to
            # moment_dtype (the hires single-chip memory mode).
            mu = b1 * state.mu.astype(jnp.float32) + (1.0 - b1) * gc
            nu = b2 * state.nu.astype(jnp.float32) + (1.0 - b2) * gc * gc
            tf = t.astype(jnp.float32)
            mu_hat = mu / (1.0 - b1 ** tf)
            nu_hat = nu / (1.0 - b2 ** tf)
            lr = schedule(state.count).astype(jnp.float32)
            upd = -lr * (mu_hat / (jnp.sqrt(nu_hat) + eps)
                         + weight_decay * p)
            return (upd, mu.astype(moment_dtype), nu.astype(moment_dtype),
                    t, jnp.zeros((), jnp.int32))

        def do_skip(_):
            return (jnp.zeros_like(g), state.mu, state.nu, state.count,
                    state.notfinite + 1)

        upd, mu, nu, count, notfinite = jax.lax.cond(
            apply_step, do_apply, do_skip, None)
        return unravel(upd), FusedAdamWState(count=count,
                                             notfinite=notfinite,
                                             gnorm=gnorm, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
