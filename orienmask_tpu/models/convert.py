"""PyTorch -> JAX weight conversion.

The reference ships ``orienmask_yolo*.pth`` checkpoints (torch state_dicts, OIHW conv
kernels); this module maps them onto our NHWC/HWIO param pytrees so the published
weights reproduce reference accuracy without retraining (SURVEY.md §5.4).

State-dict naming follows the reference module tree exactly (e.g.
``backbone.conv2.1.conv.0.conv_block.0.weight``); our module descriptions mirror that
tree, so conversion is a structural recursion.
"""

import os

import numpy as np

from .darknet import DarkNet53, DarkNetBlock
from .layers import Conv, ConvBNLeaky, NearestUpsample, Sequential


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _conv_kernel(t):
    """torch OIHW -> jax HWIO."""
    return np.ascontiguousarray(_np(t).transpose(2, 3, 1, 0))


def module_from_torch(module, sd, prefix):
    """Recursively extract (params, stats) for ``module`` from torch state_dict ``sd``."""
    if isinstance(module, ConvBNLeaky):
        params = {
            "kernel": _conv_kernel(sd[f"{prefix}.conv_block.0.weight"]),
            "scale": _np(sd[f"{prefix}.conv_block.1.weight"]),
            "bias": _np(sd[f"{prefix}.conv_block.1.bias"]),
        }
        stats = {
            "mean": _np(sd[f"{prefix}.conv_block.1.running_mean"]),
            "var": _np(sd[f"{prefix}.conv_block.1.running_var"]),
        }
        return params, stats
    if isinstance(module, Conv):
        return (
            {"kernel": _conv_kernel(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])},
            {},
        )
    if isinstance(module, NearestUpsample):
        return {}, {}
    if isinstance(module, Sequential):
        params, stats = [], []
        for i, m in enumerate(module.modules):
            p, s = module_from_torch(m, sd, f"{prefix}.{i}" if prefix else str(i))
            params.append(p)
            stats.append(s)
        return params, stats
    if isinstance(module, DarkNetBlock):
        return module_from_torch(module.conv, sd, f"{prefix}.conv")
    if isinstance(module, DarkNet53):
        params, stats = {}, {}
        for name in module.stage_names:
            sub = f"{prefix}.{name}" if prefix else name
            params[name], stats[name] = module_from_torch(getattr(module, name), sd, sub)
        return params, stats
    raise TypeError(f"no torch mapping for {type(module).__name__}")


def torch_to_variables(model, state_dict):
    """Convert a full-model torch state_dict into ``{'params', 'batch_stats'}``."""
    if "state_dict" in state_dict and not hasattr(state_dict.get("state_dict"), "shape"):
        state_dict = state_dict["state_dict"]
    params, stats = {}, {}
    for name in model._module_names():
        params[name], stats[name] = module_from_torch(getattr(model, name), state_dict, name)
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(model, path):
    """Load a reference ``.pth`` checkpoint file and convert it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return torch_to_variables(model, state_dict)


def load_pretrained_backbone(model, params, stats, path):
    """Partially load DarkNet-53 pretrained weights (shape-checked, like reference
    model/base.py:48-64). Missing file is tolerated with a warning."""
    if not os.path.exists(path):
        print(f"[DarkNet53] pretrained file not found, skipping: {path}")
        return params, stats
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    # Accept keys with or without a 'backbone.' prefix.
    sd = {k[len("backbone."):] if k.startswith("backbone.") else k: v for k, v in sd.items()}
    try:
        bb_params, bb_stats = module_from_torch(model.backbone, sd, "")
    except KeyError as e:
        print(f"[DarkNet53] pretrained load failed (missing key {e}), skipping")
        return params, stats
    params = dict(params, backbone=bb_params)
    stats = dict(stats, backbone=bb_stats)
    print(f"[DarkNet53] loaded pretrained backbone from {path}")
    return params, stats


# ------------------------------------------------------------- JAX -> torch

def _torch_kernel(k):
    """jax HWIO -> torch OIHW."""
    return np.ascontiguousarray(np.asarray(k).transpose(3, 2, 0, 1))


def module_to_torch(module, params, stats, prefix, out):
    """Inverse of ``module_from_torch``: write ``module``'s params/stats into a
    torch-layout state_dict ``out`` (numpy values)."""
    if isinstance(module, ConvBNLeaky):
        out[f"{prefix}.conv_block.0.weight"] = _torch_kernel(params["kernel"])
        out[f"{prefix}.conv_block.1.weight"] = np.asarray(params["scale"])
        out[f"{prefix}.conv_block.1.bias"] = np.asarray(params["bias"])
        out[f"{prefix}.conv_block.1.running_mean"] = np.asarray(stats["mean"])
        out[f"{prefix}.conv_block.1.running_var"] = np.asarray(stats["var"])
        out[f"{prefix}.conv_block.1.num_batches_tracked"] = np.asarray(0, np.int64)
        return
    if isinstance(module, Conv):
        out[f"{prefix}.weight"] = _torch_kernel(params["kernel"])
        out[f"{prefix}.bias"] = np.asarray(params["bias"])
        return
    if isinstance(module, NearestUpsample):
        return
    if isinstance(module, Sequential):
        for i, m in enumerate(module.modules):
            module_to_torch(m, params[i], stats[i],
                            f"{prefix}.{i}" if prefix else str(i), out)
        return
    if isinstance(module, DarkNetBlock):
        module_to_torch(module.conv, params, stats, f"{prefix}.conv", out)
        return
    if isinstance(module, DarkNet53):
        for name in module.stage_names:
            sub = f"{prefix}.{name}" if prefix else name
            module_to_torch(getattr(module, name), params[name], stats[name],
                            sub, out)
        return
    raise TypeError(f"no torch mapping for {type(module).__name__}")


def variables_to_torch(model, variables):
    """``{'params', 'batch_stats'}`` -> reference-layout state_dict (numpy
    values; wrap with torch.as_tensor for torch consumption)."""
    out = {}
    params, stats = variables["params"], variables["batch_stats"]
    for name in model._module_names():
        module_to_torch(getattr(model, name), params[name], stats[name],
                        name, out)
    return out


def export_torch_checkpoint(model, variables, path):
    """Save weights as a reference-loadable ``.pth`` (torch state_dict wrapped
    as {'state_dict': ...}, the format reference train.py emits) — lets users
    move checkpoints back to the PyTorch reference."""
    import torch

    sd = {k: torch.as_tensor(np.ascontiguousarray(v))
          for k, v in variables_to_torch(model, variables).items()}
    torch.save({"state_dict": sd}, path)
    return path
