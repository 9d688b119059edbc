from calm_vit_dte_tpu.data.augment import (
    augment_batch,
    eval_preprocess,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from calm_vit_dte_tpu.data.mixup import cutmix, mixup, cutmix_or_mixup
from calm_vit_dte_tpu.data.sampler import ShardedSampler
from calm_vit_dte_tpu.data.loader import (
    ImageFolderDataset,
    SyntheticDataset,
    BatchLoader,
)
from calm_vit_dte_tpu.data.pipeline import (
    make_cls_preprocess,
    make_reg_preprocess,
    make_eval_preprocess,
)

__all__ = [
    "augment_batch", "eval_preprocess", "IMAGENET_MEAN", "IMAGENET_STD",
    "cutmix", "mixup", "cutmix_or_mixup",
    "ShardedSampler",
    "ImageFolderDataset", "SyntheticDataset", "BatchLoader",
    "make_cls_preprocess", "make_reg_preprocess", "make_eval_preprocess",
]
