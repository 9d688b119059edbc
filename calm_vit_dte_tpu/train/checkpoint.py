"""Orbax checkpointing of the full train state.

Upgrades the reference's epoch-granularity torch.save of bare model weights
(reference: distributed_trainer_cls.py:105-107 — optimizer/scheduler/step
state was NOT saved, so resume restarted the LR schedule) to full-train-state
checkpoints: params, spectral-norm u/v, optimizer moments, step counter and
the base PRNG key, so resume is exact. A strict=False-style warm start from
bare params is kept for reference-checkpoint migration
(compat/torch_import.py).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from calm_vit_dte_tpu.train.state import TrainState


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(path: str, state: TrainState, step: int | None = None,
                    keep: int = 3) -> None:
    """Save under path/<step>/ (CheckpointManager keeps the newest `keep`)."""
    step = int(state.step) if step is None else step
    with ocp.CheckpointManager(
            _abs(path),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True)) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


def latest_step(path: str) -> int | None:
    try:
        with ocp.CheckpointManager(_abs(path)) as mgr:
            return mgr.latest_step()
    except (FileNotFoundError, ValueError):
        return None


def restore_checkpoint(path: str, template: TrainState,
                       step: int | None = None) -> TrainState | None:
    """Restore into the shape/sharding of `template`; None if no checkpoint."""
    with ocp.CheckpointManager(_abs(path)) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            return None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def warm_start_params(path: str, params: Any, sn_state: Any):
    """strict=False-equivalent warm start from a reference .pth (torch) or a
    previous orbax checkpoint; unknown/missing keys are skipped with a note
    (reference behavior: distributed_trainer_cls.py:153-157)."""
    if path.endswith(".pth"):
        import torch

        from calm_vit_dte_tpu.compat.torch_import import (
            import_torch_state_dict,
        )

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return import_torch_state_dict(params, sn_state, sd)
    raise ValueError(f"unsupported warm-start file: {path}")
