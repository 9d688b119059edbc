from calm_vit_dte_tpu.utils.configs import CONFIGS, TrainConfig, get_config
from calm_vit_dte_tpu.utils.logging import MetricLogger, is_chief

__all__ = ["CONFIGS", "TrainConfig", "get_config", "MetricLogger",
           "is_chief"]
