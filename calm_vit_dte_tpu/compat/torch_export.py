"""Export our param/state pytrees back to a reference-format (torch-style)
state dict — the inverse of torch_import, so models trained here can be
loaded by the reference's torch code (load_state_dict on the .pth the
reference trainers expect, reference: distributed_trainer_cls.py:154).

Returns numpy arrays keyed by reference names; serialize with torch.save
(if torch is available) or np.savez.
"""

from __future__ import annotations

import numpy as np


def _rename_back(path: list[str]) -> list[str]:
    out: list[str] = []
    for t in path:
        if t.startswith("encoder_") and t[8:].isdigit():
            out += ["encoder_blocks", t[8:]]
        elif t.startswith("decoder_") and t[8:].isdigit():
            out += ["decoder_blocks", t[8:]]
        elif t.startswith("block_") and t[6:].isdigit():
            # Encoder8 naming: block_{i} -> encoder_blocks.{i}
            out += ["encoder_blocks", t[6:]]
        elif t == "bottleneck_1":
            out.append("block_bottle_neck_1")
        elif t == "bottleneck_2":
            out.append("block_bottle_neck_2")
        elif t == "conv1":
            out[-1:] = ["proj", "0"]
        elif t == "conv2":
            out[-1:] = ["proj", "2"]
        elif t == "conv3":
            out[-1:] = ["proj", "4"]
        elif t == "mlp_fc1":
            out += ["mlp", "0"]
        elif t == "mlp_fc2":
            out += ["mlp", "3"]
        elif t == "fc1":
            out.append("0")
        elif t == "fc2":
            out.append("2")
        else:
            out.append(t)
    return out


def export_torch_state_dict(params: dict, sn_state: dict) -> dict:
    """Flatten (params, sn_state) into reference-named numpy tensors."""
    sd: dict[str, np.ndarray] = {}

    def walk_params(node, path):
        if not isinstance(node, dict):
            name = path[-1]
            prefix = ".".join(_rename_back(path[:-1]))
            arr = np.asarray(node)
            if name == "w":
                sd[f"{prefix}.weight_orig"] = arr
            elif name == "b":
                sd[f"{prefix}.bias"] = arr
            elif name == "scale":
                sd[f"{prefix}.weight"] = arr
            elif name == "inv_freq":
                sd[f"{prefix}.inv_freq"] = arr
            elif name in ("ls_att", "ls_mlp"):
                sd[".".join(_rename_back(path))] = arr
            else:
                raise KeyError(f"unmapped param leaf {'.'.join(path)}")
            return
        for k, v in node.items():
            walk_params(v, path + [k])

    def walk_state(node, path):
        if isinstance(node, dict) and "u" in node and "v" in node:
            prefix = ".".join(_rename_back(path))
            sd[f"{prefix}.weight_u"] = np.asarray(node["u"])
            sd[f"{prefix}.weight_v"] = np.asarray(node["v"])
            return
        for k, v in node.items():
            walk_state(v, path + [k])

    walk_params(params, [])
    walk_state(sn_state, [])
    return sd
