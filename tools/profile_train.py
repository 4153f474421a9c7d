"""Capture a jax.profiler trace of the train step and print a per-op time
breakdown (aggregated by HLO op-name prefix) from the TensorBoard trace.

Usage:
    python tools/profile_train.py --batch 8 --dtype bfloat16 [--size 544]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run_step(args):
    from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss
    from orienmask_tpu.optim import SGD
    from orienmask_tpu.parallel.mesh import data_mesh, shard_batch
    from orienmask_tpu.trainer.train_state import make_train_step
    from tools.bench_train import synthetic_batch

    grid = [[args.size // 32] * 2, [args.size // 16] * 2, [args.size // 8] * 2]
    model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    variables = model.init_variables(jax.random.PRNGKey(0))
    loss = OrienMaskYOLOMultiScaleLoss(
        grid_size=grid, image_size=[args.size, args.size],
        anchors=ANCHORS_YOLOV4, anchor_mask=ANCHORS_MASK, num_classes=80,
        obj_ignore_threshold=0.7, weight=[1, 1, 1, 1, 1, 20, 20],
        scales_weight=[1, 1, 1], target_chunk=8,
    )
    optimizer = SGD(lr=1e-3, momentum=0.9, weight_decay=5e-4)
    mesh = data_mesh()
    train_step, init_state = make_train_step(
        model, loss, optimizer, mesh,
        compute_dtype=jnp.dtype(args.dtype),
    )
    state = init_state(variables)
    batch = shard_batch(synthetic_batch(args.batch, args.size), mesh)
    lr = jnp.float32(1e-3)
    done = jnp.asarray(True)

    state, logs = train_step(state, batch, lr, done)
    jax.block_until_ready(logs["loss"])
    print("[profile] compiled; tracing", flush=True)

    trace_dir = args.out
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            state, logs = train_step(state, batch, lr, done)
        jax.block_until_ready(logs["loss"])
    with open(os.path.join(trace_dir, "iters.txt"), "w") as fh:
        fh.write(str(args.iters))
    return trace_dir


def analyze(trace_dir, iters, top=40, per_instance=False):
    """``per_instance`` keys the aggregation by raw HLO op name (e.g.
    ``convolution.123``) instead of source line — separates the individual
    convs that a per-line view lumps together."""
    try:  # the capture records its own iteration count; trust it over the flag
        with open(os.path.join(trace_dir, "iters.txt")) as fh:
            iters = int(fh.read().strip())
    except (OSError, ValueError):
        pass
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print("no trace found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # XLA Ops thread on the TPU device process holds the per-op events;
    # the Steps thread holds whole-step wrappers (excluded).
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if tid_name.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)  # microseconds
        args_ = e.get("args") or {}
        key = name if per_instance else (args_.get("tf_op") or name)
        agg[key + "|" + (args_.get("source") or "")] += dur
        total += dur

    per_iter = total / iters / 1000.0
    print(f"\ndevice op time total: {total/1000:.1f} ms over {iters} iters "
          f"-> {per_iter:.2f} ms/step (sum of op durations)")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    for k, v in items[:top]:
        op, src = k.split("|", 1)
        print(f"{v/iters/1000:9.3f}  {100*v/total:5.1f}  {op[:70]} {src.split('/')[-1]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=544)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="/tmp/om_trace")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        run_step(args)
    analyze(args.out, args.iters)


if __name__ == "__main__":
    main()
