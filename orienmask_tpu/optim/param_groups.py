"""Detectron2-style parameter grouping as per-leaf factor pytrees
(reference optim/param_groups.py — optional, unused by shipped configs).

Classification by pytree structure: a ConvBNLeaky leaf dict holds
``{kernel, scale, bias}`` — its ``scale``/``bias`` are norm params; a plain Conv
holds ``{kernel, bias}`` — its ``bias`` is a conv bias.
"""

import jax


def param_group_factors(params, weight_decay=1e-4,
                        norm_weight_decay=0.0, bias_lr_factor=1.0,
                        bias_weight_decay=1e-4):
    """Returns (lr_factors, wd_factors) pytrees matching ``params`` for
    ``optim.SGD(lr_factors=..., wd_factors=...)``.

    lr factors are multipliers on the scheduled lr; wd entries are absolute
    per-leaf weight-decay values (so the base lr never enters here)."""

    def const(tree, value):
        return jax.tree_util.tree_map(lambda _: value, tree)

    def walk(node):
        if isinstance(node, dict):
            is_cbl = "scale" in node and "kernel" in node
            is_conv = "bias" in node and "kernel" in node and "scale" not in node
            out_lr, out_wd = {}, {}
            for k, v in node.items():
                if is_cbl and k in ("scale", "bias"):
                    out_lr[k], out_wd[k] = const(v, 1.0), const(v, norm_weight_decay)
                elif is_conv and k == "bias":
                    out_lr[k], out_wd[k] = const(v, bias_lr_factor), const(v, bias_weight_decay)
                else:
                    out_lr[k], out_wd[k] = walk(v)
            return out_lr, out_wd
        if isinstance(node, (list, tuple)):
            pairs = [walk(v) for v in node]
            return [p[0] for p in pairs], [p[1] for p in pairs]
        return 1.0, weight_decay

    return walk(params)
