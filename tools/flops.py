"""Analytic FLOP accounting for the OrienMask forward / train step.

Two independent counts that must agree (within the non-conv epsilon):

1. XLA's own cost analysis of the compiled program
   (``lowered.compile().cost_analysis()['flops']``) — counts every HLO.
2. A hand conv-only sum: for each conv, ``2 * N * H_out * W_out * C_out *
   (K_h * K_w * C_in)`` — the textbook MAC*2 count, collected by walking the
   jaxpr for conv_general_dilated eqns.

Run on the CPU backend (the traced HLO and therefore the FLOP count is
backend-independent); prints a JSON table used by docs/PERFORMANCE.md's MFU
section and bench.py's sanity floor (VERDICT r3 task 2: the round-3 docs
carried a ~3x-understated "66 GFLOP/frame" floor).

Usage: python tools/flops.py [--sizes 544 736 1088] [--batch 1 8]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def conv_flops_from_jaxpr(closed_jaxpr):
    """Sum 2*MACs over every conv_general_dilated in the jaxpr (recursing
    into sub-jaxprs: pjit, scan, remat...)."""
    total = 0

    def walk(jaxpr):
        nonlocal total
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                out = eqn.outvars[0].aval
                dn = eqn.params["dimension_numbers"]
                # kernel spatial dims + input-feature dim from rhs spec
                rhs_spec = dn.rhs_spec  # (out_c, in_c, *spatial) positions
                k_spatial = [rhs.shape[i] for i in range(len(rhs.shape))
                             if i not in (rhs_spec[0], rhs_spec[1])]
                c_in = rhs.shape[rhs_spec[1]]
                out_elems = int(np.prod(out.shape))
                macs = out_elems * c_in * int(np.prod(k_spatial))
                fg = eqn.params.get("feature_group_count", 1)
                total += 2 * macs  # grouped convs already have reduced c_in
                del fg, lhs
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)
        return total

    walk(closed_jaxpr.jaxpr)
    return total


def xla_flops(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def build(size):
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus

    model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[544, 736, 1088])
    ap.add_argument("--batch", type=int, nargs="+", default=[1])
    ap.add_argument("--train", action="store_true",
                    help="also count the train step (fwd+bwd) at --sizes[0]")
    args = ap.parse_args()

    rows = []
    for size in args.sizes:
        model, variables = build(size)

        def fwd(v, x):
            return model.forward(v, x, train=False, dtype=jnp.bfloat16)[0]

        for b in args.batch:
            x = jnp.zeros((b, size, size, 3), jnp.float32)
            jaxpr = jax.make_jaxpr(fwd)(variables, x)
            conv_f = conv_flops_from_jaxpr(jaxpr)
            xla_f = xla_flops(fwd, variables, x)
            rows.append({
                "what": "forward", "size": size, "batch": b,
                "conv_gflops_per_frame": round(conv_f / b / 1e9, 2),
                "xla_gflops_per_frame": round(xla_f / b / 1e9, 2),
            })
            print(json.dumps(rows[-1]))

    if args.train:
        size = args.sizes[0]
        model, variables = build(size)

        def loss_fn(params, stats, x):
            out, new_stats = model.forward(
                {"params": params, "batch_stats": stats}, x, train=True,
                dtype=jnp.bfloat16)
            del new_stats
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in leaves)

        grad = jax.grad(loss_fn)
        b = 8
        x = jnp.zeros((b, size, size, 3), jnp.float32)
        jaxpr = jax.make_jaxpr(grad)(variables["params"],
                                     variables["batch_stats"], x)
        conv_f = conv_flops_from_jaxpr(jaxpr)
        xla_f = xla_flops(grad, variables["params"],
                          variables["batch_stats"], x)
        rows.append({
            "what": "train fwd+bwd", "size": size, "batch": b,
            "conv_gflops_per_frame": round(conv_f / b / 1e9, 2),
            "xla_gflops_per_frame": round(xla_f / b / 1e9, 2),
        })
        print(json.dumps(rows[-1]))

    return rows


if __name__ == "__main__":
    main()
