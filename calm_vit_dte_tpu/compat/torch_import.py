"""Import reference PyTorch checkpoints (.pth state dicts) into this
framework's param/state pytrees.

This serves two purposes:
  1. migration: a user of the reference can load model_cls.pth /
     model_reg.pth (reference: distributed_trainer_cls.py:106,169) directly;
  2. parity testing: golden-activation tests copy reference weights and
     compare forward activations (tests/test_parity_torch.py).

Key mapping (torch module tree -> our pytree):
  autoencoder.encoder_blocks.{i}   -> autoencoder.encoder_{i}
  autoencoder.block_bottle_neck_k  -> autoencoder.bottleneck_k
  autoencoder.decoder_blocks.{i}   -> autoencoder.decoder_{i}
  <block>.proj.{0,2,4}             -> proj.conv{1,2,3}
  <vmla>.linear_mask.{0,2}         -> linear_mask.{fc1,fc2}
  <vmla>.mlp.{0,3}                 -> mlp_fc1 / mlp_fc2
  head.{0,2}                       -> head.{fc1,fc2}
  X.weight_orig / weight_u / weight_v (spectral norm)
                                   -> params[X].w / state[X].u / state[X].v
  LayerNorm weight                 -> scale;   rope inv_freq -> inv_freq

Weights keep torch layout (Linear (out,in), Conv OIHW), so no transposes.
Tensors are moved through numpy; torch is only required when this module is
actually used.
"""

from __future__ import annotations



import jax.numpy as jnp
import numpy as np


def _rename_tokens(tokens: list[str]) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t in ("encoder_blocks", "decoder_blocks"):
            prefix = t.split("_")[0]
            out.append(f"{prefix}_{tokens[i + 1]}")
            i += 2
            continue
        if t == "block_bottle_neck_1":
            out.append("bottleneck_1")
        elif t == "block_bottle_neck_2":
            out.append("bottleneck_2")
        elif t == "proj" and i + 1 < len(tokens) and tokens[i + 1] in "024":
            out.append("proj")
            out.append({"0": "conv1", "2": "conv2", "4": "conv3"}[tokens[i + 1]])
            i += 2
            continue
        elif t == "linear_mask" and i + 1 < len(tokens):
            out.append("linear_mask")
            out.append({"0": "fc1", "2": "fc2"}[tokens[i + 1]])
            i += 2
            continue
        elif t == "mlp" and i + 1 < len(tokens) and tokens[i + 1] in "03":
            out.append({"0": "mlp_fc1", "3": "mlp_fc2"}[tokens[i + 1]])
            i += 2
            continue
        elif t == "head" and i + 1 < len(tokens) and tokens[i + 1] in "02":
            out.append("head")
            out.append({"0": "fc1", "2": "fc2"}[tokens[i + 1]])
            i += 2
            continue
        else:
            out.append(t)
        i += 1
    return out


def _set_leaf(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    if path[-1] not in node:
        raise KeyError(f"target leaf {'.'.join(path)} not found in pytree")
    expected = node[path[-1]]
    if tuple(expected.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'.'.join(path)}: pytree {expected.shape} "
            f"vs torch {value.shape}")
    node[path[-1]] = jnp.asarray(value, dtype=jnp.float32)


def import_torch_state_dict(params: dict, state: dict,
                            torch_sd: dict) -> tuple[dict, dict]:
    """Return (params, state) with every matching torch tensor copied in.

    `torch_sd` maps reference names to torch tensors or numpy arrays.
    Unknown reference keys raise; missing targets are allowed (strict=False
    warm-start behavior lives at the trainer level, not here).
    """
    import copy

    params = copy.deepcopy(params)
    state = copy.deepcopy(state)
    for key, tensor in torch_sd.items():
        val = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
            else tensor, dtype=np.float32)
        tokens = key.split(".")
        leaf = tokens[-1]
        path = _rename_tokens(tokens[:-1])
        if leaf == "weight_orig":
            _set_leaf(params, path + ["w"], val)
        elif leaf == "weight_u":
            _set_leaf(state, path + ["u"], val)
        elif leaf == "weight_v":
            _set_leaf(state, path + ["v"], val)
        elif leaf == "bias":
            _set_leaf(params, path + ["b"], val)
        elif leaf == "inv_freq":
            _set_leaf(params, path + ["inv_freq"], val)
        elif leaf in ("ls_att", "ls_mlp"):
            _set_leaf(params, path + [leaf], val)
        elif leaf == "weight":
            # Only LayerNorms keep a plain `weight` (everything else is
            # spectral-normed).
            _set_leaf(params, path + ["scale"], val)
        elif leaf in ("t", "cos_emb", "sin_emb"):
            continue  # non-persistent rope buffers
        else:
            raise KeyError(f"unrecognized reference key: {key}")
    return params, state


def vit_from_torch_state_dict(cfg, torch_sd, seed: int = 0):
    """Build a ViT param/state pytree initialized from a reference .pth."""
    import jax

    from calm_vit_dte_tpu.models.vit import vit_init

    params, state = vit_init(cfg, jax.random.PRNGKey(seed))
    return import_torch_state_dict(params, state, torch_sd)
