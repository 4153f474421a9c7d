"""Spatial-partitioning halo-exchange cost model (projection, no TPU needed).

The spatial path (orienmask_tpu/parallel/spatial.py) row-shards the image over
a mesh axis and lets GSPMD insert halo exchanges at every conv whose window
straddles a shard boundary. Multi-chip hardware is not reachable in this
environment, so this tool gives the latency claim its quantitative basis:

  1. trace the model's forward jaxpr at a given input size (shape-only, CPU),
  2. pull out every `conv_general_dilated` (shapes, window, strides),
  3. per candidate shard count S: per-device MXU FLOPs (= total/S) and halo
     traffic (rows that must cross each shard boundary = (kh-1)//2 per side
     per conv, at that layer's width/channels/dtype),
  4. convert to time with the measured single-chip effective FLOP/s (anchored
     to the real fused-frame measurements in docs/PERFORMANCE.md) and the
     public v5e ICI figure (45 GB/s/link/direction, 2D torus, ~1 us/hop —
     jax-ml.github.io/scaling-book), and Amdahl the unsharded tail (detect +
     mask assembly run replicated after a small gather).

Prints one table per input size: S, per-device conv ms, halo MB & ms, gather
ms, projected frame ms, speedup, parallel efficiency. The single-chip row is
the measured anchor, not a projection.

Run: python tools/spatial_cost_model.py [--sizes 544 736 1088] [--spaces 2 4 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # analysis only — never the chip

import jax.numpy as jnp
from jax.extend import core as jex_core

# Measured single-chip anchors (docs/PERFORMANCE.md, 2026-08-21 round 5 —
# Pallas radix-select detect stage; tools/bench_breakdown.py --size N).
# Convention: each stage's standalone time is scaled by fused/sum(standalone)
# so the three stages sum exactly to the measured fused frame (standalone
# subprograms each carry ~0.3 ms dispatch the fused program does not).  The
# row-sharded tail program itself was measured degenerate on one chip
# (--spatial-tail, S=1): within 0.5-2% of the replicated tail at both 544
# (0.720 vs 0.705 ms) and 1088 (2.217 vs 2.209 ms), so scaling mask_ms by
# 1/S charges no unmeasured shard_map overhead.
MEASURED = {
    # tail = detect_ms (replicated: radix-select top-k + decode + NMS
    # fixpoint, sequential dependence) + mask_ms (row-shardable: x4 upsample
    # + rasterization, parallel/spatial.run_batch_spatial).
    # standalone (fwd, det, pp, fused), post perm-fix (stride-4 channel
    # permutation): 544: 1.876/0.515/0.705/2.160 (pre-fix splits; fused
    # improved to ~2.12 with the same proportions)
    #   736: 3.094/0.617/1.253/3.779   1088: 6.957/0.730/1.556/7.224
    544: {"fwd_ms": 1.570, "detect_ms": 0.431, "mask_ms": 0.159},  # 2.160
    736: {"fwd_ms": 2.690, "detect_ms": 0.536, "mask_ms": 0.553},  # 3.779
    1088: {"fwd_ms": 5.906, "detect_ms": 0.620, "mask_ms": 0.700},  # 7.224
}
NMS_POST = 100  # kept detections per image (packed-mask gather term)
ICI_GBPS = 45.0      # v5e per-link one-direction (scaling book)
HOP_US = 1.0         # per-exchange latency


def conv_specs(model, variables, size, dtype=jnp.bfloat16):
    """[(Hin, Win, Cin, kh, kw, stride, Hout, Wout, Cout, groups)] from the
    traced forward jaxpr (recursing through pjit/custom calls)."""
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda v, im: model.forward(v, im, train=False, dtype=dtype)
    )(variables, x)

    out = []

    def walk(jpr):
        for eqn in jpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                # layers.py:conv2d always uses NHWC/HWIO/NHWC
                n, hin, win, cin = lhs.shape
                kh, kw, _, cout = rhs.shape
                sh, sw = eqn.params["window_strides"]
                ho, wo = eqn.outvars[0].aval.shape[1:3]
                g = eqn.params["feature_group_count"]
                out.append(dict(hin=hin, win=win, cin=cin, kh=kh, kw=kw,
                                stride=sh, hout=ho, wout=wo, cout=cout,
                                groups=g, n=n))
            for v in eqn.params.values():
                if isinstance(v, jex_core.ClosedJaxpr):
                    walk(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for u in v:
                        if isinstance(u, jex_core.ClosedJaxpr):
                            walk(u.jaxpr)
    walk(jaxpr.jaxpr)
    return out


def project(specs, size, spaces, fwd_ms=None, detect_ms=None, mask_ms=None,
            bytes_per=2, shard_tail=False):
    """``shard_tail=False``: head outputs gather to replicated, the whole
    detect+mask tail runs replicated (spatial_forward default).
    ``shard_tail=True``: the mask stage (x4 upsample + rasterization) is
    row-sharded via parallel/spatial.run_batch_spatial — mask_ms/S per
    device, plus a packed-mask gather ((S-1)/S of K*H*W/8 uint8) when the
    consumer wants replicated output; detect stays replicated (its operands
    are the tiny grids and the NMS fixpoint is sequential)."""
    conv_flops = sum(
        2 * c["n"] * c["hout"] * c["wout"] * c["cout"]
        * c["kh"] * c["kw"] * (c["cin"] // c["groups"]) for c in specs)
    halo_layers = [c for c in specs if c["kh"] > 1]
    rows = []
    if fwd_ms is None:
        raise SystemExit(f"no measured anchor for {size}; run "
                         f"tools/bench_breakdown.py --size {size} first")
    tail_ms = detect_ms + mask_ms
    eff_tflops = conv_flops / (fwd_ms * 1e-3) / 1e12
    for S in spaces:
        if S == 1:
            rows.append((1, fwd_ms, 0.0, 0.0, 0.0, fwd_ms + tail_ms, 1.0, 1.0))
            continue
        comp = fwd_ms / S
        halo_bytes = 0
        for c in halo_layers:
            per_side = (c["kh"] - 1) // 2
            # each device exchanges with both neighbours (edge devices: one);
            # critical path = interior device = 2 sides
            halo_bytes += 2 * per_side * c["win"] * c["cin"] * bytes_per
        halo_ms = halo_bytes / (ICI_GBPS * 1e9) * 1e3 \
            + len(halo_layers) * HOP_US * 1e-3
        # stride-4 orientation map to every device (heads are tiny next to
        # it): 2 * (S-1)/S of (size/4)^2 * 6 ch * 4B — an all-gather when the
        # tail is replicated, the same broadcast when it is row-sharded
        # (shard_map replicated-in of the stride-4 maps).
        gather_ms = ((size // 4) ** 2 * 6 * 4 * (S - 1) / S * 2
                     / (ICI_GBPS * 1e9) * 1e3)
        if shard_tail:
            # packed kept-mask gather to replicated (skip entirely if the
            # consumer fetches shards host-side or keeps them device-resident)
            mask_gather = (NMS_POST * size * (size // 8) * (S - 1) / S
                           / (ICI_GBPS * 1e9) * 1e3)
            tail = detect_ms + mask_ms / S + mask_gather
        else:
            tail = tail_ms
        total = comp + halo_ms + gather_ms + tail
        base = fwd_ms + tail_ms
        rows.append((S, comp, halo_bytes / 1e6, halo_ms, gather_ms, total,
                     base / total, base / total / S))
    return conv_flops, eff_tflops, len(halo_layers), rows


def project_train_dp(n_params, spaces, step_ms=49.1, local_batch=8,
                     grad_bytes=4):
    """DP training scaling: each chip keeps the measured B=8 step; ring
    all-reduce of f32 grads (2*(S-1)/S * bytes / ICI bw) is the only added
    cost (parallel/mesh.py replicates params; SyncBN stats ride the same
    collective and are negligible next to 50M grads). XLA can overlap the
    all-reduce with tail wgrads; this projection charges it fully serial, so
    it is a LOWER bound on throughput."""
    bytes_total = n_params * grad_bytes
    print(f"\n[train DP, B={local_batch}/chip, measured step {step_ms} ms, "
          f"grads {bytes_total/1e6:.0f} MB f32, serial all-reduce bound]")
    print(f"{'S':>2} {'AR ms':>7} {'step ms':>8} {'img/s':>8} "
          f"{'ideal':>8} {'eff':>5}")
    for S in spaces:
        ar = 0.0 if S == 1 else (2 * (S - 1) / S * bytes_total
                                 / (ICI_GBPS * 1e9) * 1e3)
        tot = step_ms + ar
        ips = local_batch * S / (tot * 1e-3)
        ideal = local_batch * S / (step_ms * 1e-3)
        print(f"{S:>2} {ar:>7.2f} {tot:>8.1f} {ips:>8.0f} {ideal:>8.0f} "
              f"{ips/ideal:>5.2f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[544, 736, 1088])
    ap.add_argument("--spaces", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--anchor", type=str, default=None,
                    help="size:fwd_ms:detect_ms:mask_ms extra measured "
                    "anchor, e.g. 1088:6.5:1.2:0.7")
    args = ap.parse_args()
    if args.anchor:
        s, f, d, t = args.anchor.split(":")
        MEASURED[int(s)] = {"fwd_ms": float(f), "detect_ms": float(d),
                            "mask_ms": float(t)}

    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.config import (
        orienmask_yolo_coco_544_anchor4_fpn_plus_infer as cfg,
    )

    mc = {k: v for k, v in cfg["model"].items() if k != "type"}
    mc["pretrained"] = None
    model = OrienMaskYOLOFPNPlus(**mc)
    variables = jax.eval_shape(model.init_variables, jax.random.PRNGKey(0))

    for size in args.sizes:
        if size not in MEASURED:
            print(f"[{size}] no measured anchor — pass --anchor "
                  f"{size}:<fwd_ms>:<detect_ms>:<mask_ms> (from "
                  f"tools/bench_breakdown.py)")
            continue
        specs = conv_specs(model, variables, size)
        m = MEASURED[size]
        for shard_tail in (False, True):
            flops, eff, nhalo, rows = project(
                specs, size, args.spaces, m["fwd_ms"], m["detect_ms"],
                m["mask_ms"], shard_tail=shard_tail)
            label = ("tail row-sharded (run_batch_spatial)" if shard_tail
                     else "tail replicated")
            print(f"\n[{size}x{size}, {label}] convs={len(specs)} "
                  f"(halo layers={nhalo}) conv GFLOP={flops/1e9:.1f} "
                  f"measured fwd={m['fwd_ms']}ms detect={m['detect_ms']}ms "
                  f"masks={m['mask_ms']}ms eff={eff:.0f} TF/s bf16")
            print(f"{'S':>2} {'conv ms':>8} {'halo MB':>8} {'halo ms':>8} "
                  f"{'gather ms':>9} {'frame ms':>9} {'speedup':>8} {'eff':>5}")
            for r in rows:
                print(f"{r[0]:>2} {r[1]:>8.2f} {r[2]:>8.2f} {r[3]:>8.3f} "
                      f"{r[4]:>9.3f} {r[5]:>9.2f} {r[6]:>8.2f} {r[7]:>5.2f}")

    import numpy as _np
    n_params = sum(int(_np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(variables["params"]))
    project_train_dp(n_params, [s for s in args.spaces] + [16, 32])


if __name__ == "__main__":
    main()
