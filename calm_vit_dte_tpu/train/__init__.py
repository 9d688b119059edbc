from calm_vit_dte_tpu.train.losses import (
    softmax_cross_entropy,
    huber,
    reconstruction_loss,
    dominant_class_accuracy,
)
from calm_vit_dte_tpu.train.optim import make_optimizer, cosine_per_epoch_schedule
from calm_vit_dte_tpu.train.state import TrainState, create_train_state
from calm_vit_dte_tpu.train.step import make_train_step, make_eval_step
from calm_vit_dte_tpu.train.trainer import train

__all__ = [
    "softmax_cross_entropy", "huber", "reconstruction_loss",
    "dominant_class_accuracy",
    "make_optimizer", "cosine_per_epoch_schedule",
    "TrainState", "create_train_state",
    "make_train_step", "make_eval_step",
    "train",
]
