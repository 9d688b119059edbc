from calm_vit_dte_tpu.compat.torch_import import (
    import_torch_state_dict,
    vit_from_torch_state_dict,
)
from calm_vit_dte_tpu.compat.torch_export import export_torch_state_dict

__all__ = ["import_torch_state_dict", "vit_from_torch_state_dict",
           "export_torch_state_dict"]
