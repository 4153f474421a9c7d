"""Detectron2-style parameter grouping as per-leaf factor pytrees
(reference optim/param_groups.py — optional, unused by shipped configs).

Classification by pytree structure: a ConvBNLeaky leaf dict holds
``{kernel, scale, bias}`` — ``scale``/``bias`` there are norm params; a plain Conv
holds ``{kernel, bias}`` — its ``bias`` is a conv bias.
"""

import jax


def param_group_factors(params, base_lr=1e-3, weight_decay=1e-4,
                        norm_weight_decay=0.0, bias_lr_factor=1.0,
                        bias_weight_decay=1e-4):
    """Returns (lr_factors, wd_factors) pytrees matching ``params``."""

    def classify(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        name = keys[-1] if keys else ""
        # does this leaf live in a BN-bearing dict? detect via sibling structure:
        # handled below by the caller passing the parent dict context
        return name

    lr_factors = jax.tree_util.tree_map(lambda _: 1.0, params)
    wd_factors = jax.tree_util.tree_map(lambda _: weight_decay, params)

    def walk(node, set_lr, set_wd):
        if isinstance(node, dict):
            is_cbl = "scale" in node and "kernel" in node
            is_conv = "bias" in node and "kernel" in node and "scale" not in node
            out_lr, out_wd = {}, {}
            for k, v in node.items():
                if is_cbl and k in ("scale", "bias"):
                    out_lr[k] = jax.tree_util.tree_map(lambda _: 1.0, v)
                    out_wd[k] = jax.tree_util.tree_map(lambda _: norm_weight_decay, v)
                elif is_conv and k == "bias":
                    out_lr[k] = jax.tree_util.tree_map(lambda _: bias_lr_factor, v)
                    out_wd[k] = jax.tree_util.tree_map(lambda _: bias_weight_decay, v)
                else:
                    out_lr[k], out_wd[k] = walk(v, set_lr, set_wd)
            return out_lr, out_wd
        if isinstance(node, (list, tuple)):
            pairs = [walk(v, set_lr, set_wd) for v in node]
            return [p[0] for p in pairs], [p[1] for p in pairs]
        return 1.0, weight_decay

    return walk(params, None, None)
