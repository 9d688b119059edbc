"""Named configs reproducing the reference's (hardcoded) hyperparameter sets.

The reference has no config system — every hyperparameter is a Python
literal at a call site (SURVEY.md s5). Each named config here cites the call
site it reproduces. BASELINE.json's five target configs all appear.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from calm_vit_dte_tpu.models.vit import ViTConfig


@dataclass(frozen=True)
class TrainConfig:
    name: str
    model: ViTConfig
    task: str  # 'cls' | 'reg'
    global_batch_size: int
    epochs: int
    lr: float = 3.1e-3
    weight_decay: float = 0.02
    beta1: float = 0.9
    beta2: float = 0.98
    clip_norm: float = 1.0
    eta_min: float = 1e-6
    kl_weight: float = 0.1
    sampler_seed: int = 2006          # reference DistributedSampler seed
    init_seed: int = 0
    image_size: int = 256             # host decode/resize target
    crop: int = 224
    dataset_root: str = "/dataset/imagenet"
    checkpoint_dir: str = "checkpoints"
    warm_start: str | None = None     # optional reference .pth
    log_every: int = 100              # reference rank-0 print cadence
    num_workers: int = 5
    save_samples_dir: str | None = None
    remat: bool = True                # forward rematerialization in backprop
    schedule: str = "cosine-epoch"    # or 'steplr' (single-node driver)
    lr_step_size: int = 5             # StepLR step_size (epochs)
    lr_gamma: float = 0.1             # StepLR gamma
    decoupled_wd: bool = True         # AdamW; False = torch Adam coupled L2
    microbatch: int = 1               # grad-accumulation splits per step
    mesh_model: int = 1               # tensor-parallel axis size (data axis
                                      # spans the remaining devices)
    tp_min_shard_dim: int = 512       # smallest weight dim sharded under TP
    epoch_stats_path: str = ""        # chief writes one JSONL line per epoch
                                      # (p50, steps/s, RSS) — soak evidence


def _vit_224(generate: bool, out_features: int) -> ViTConfig:
    """The trainer config: reference distributed_trainer_cls.py:148-151 /
    distributed_trainer_reg.py:140-143."""
    return ViTConfig(heads=12, seq_length=224, in_features=672, dim_step=48,
                     mean_var_hidden=240, seq_len_step=16, seq_len_reduce=80,
                     out_features=out_features, force_reduce=False,
                     generate=generate)


TINY_VIT = ViTConfig(heads=3, seq_length=48, in_features=144, dim_step=12,
                     mean_var_hidden=24, seq_len_step=4, seq_len_reduce=8,
                     out_features=10, generate=False)


CONFIGS: dict[str, TrainConfig] = {}


def _register(cfg: TrainConfig) -> TrainConfig:
    CONFIGS[cfg.name] = cfg
    return cfg


# BASELINE.json configs[0]: CPU-runnable tiny classification.
_register(TrainConfig(
    name="tiny-cls", model=TINY_VIT, task="cls", global_batch_size=16,
    epochs=2, image_size=56, crop=48, dataset_root="synthetic",
    log_every=10, remat=False))

_register(TrainConfig(
    name="tiny-reg",
    model=replace(TINY_VIT, out_features=144, generate=True),
    task="reg", global_batch_size=16, epochs=2, image_size=56, crop=48,
    dataset_root="synthetic", log_every=10, remat=False))

# BASELINE.json configs[1]: ImageNet-1k 224px classification
# (train-cls.sh solo-job equivalent: 4 ranks x bs 484 = 1936 global,
# 65 epochs; reference distributed_trainer_cls.py:159-168).
_register(TrainConfig(
    name="imagenet-cls-224", model=_vit_224(False, 1000), task="cls",
    global_batch_size=1936, epochs=65))

# BASELINE.json configs[2]: regression/reconstruction with sample generation
# (4 x 456 = 1824 global; epochs unrecorded in the reference — the committed
# file has a SyntaxError at distributed_trainer_reg.py:158 — we use 65).
_register(TrainConfig(
    name="imagenet-reg-224", model=_vit_224(True, 672), task="reg",
    global_batch_size=1824, epochs=65,
    save_samples_dir="samples"))

# BASELINE.json configs[1] variant: the reference's SINGLE-NODE `__main__`
# hyperparameter set (CALM_ViT_V2.py:151-152,183,186): optim.Adam(3.1e-3,
# weight_decay=0.02) — COUPLED L2, torch Adam's default betas (0.9, 0.999)
# — StepLR(step_size=5, gamma=0.1), batch 100, 5 epochs.
_register(TrainConfig(
    name="single-node-cls", model=_vit_224(False, 1000), task="cls",
    global_batch_size=100, epochs=5, beta2=0.999, schedule="steplr",
    lr_step_size=5, lr_gamma=0.1, decoupled_wd=False))

# EncoderDecoder_8 256px defaults (reference Vi_Tools_CNN_less_V2.py:407-421).
_register(TrainConfig(
    name="imagenet-cls-256",
    model=ViTConfig(heads=12, seq_length=256, in_features=768, dim_step=48,
                    mean_var_hidden=192, seq_len_step=16, seq_len_reduce=128,
                    out_features=1000, force_reduce=False, generate=False),
    task="cls", global_batch_size=1536, epochs=65, image_size=292, crop=256))

# BASELINE.json configs[4]: 1024px high-res stretch (grid-wise axial
# attention at long sequence; dims keep the dim=3*seq and dim%(4*heads)==0
# invariants: 3072/48=64).
_register(TrainConfig(
    name="hires-cls-1024",
    model=ViTConfig(heads=12, seq_length=1024, in_features=3072,
                    dim_step=192, mean_var_hidden=768, seq_len_step=64,
                    seq_len_reduce=256, out_features=1000,
                    force_reduce=False, generate=False),
    task="cls", global_batch_size=64, epochs=65, image_size=1168,
    crop=1024))


def get_config(name: str, **overrides) -> TrainConfig:
    if name not in CONFIGS:
        raise KeyError(f"unknown config '{name}'; have {sorted(CONFIGS)}")
    cfg = CONFIGS[name]
    return replace(cfg, **overrides) if overrides else cfg
