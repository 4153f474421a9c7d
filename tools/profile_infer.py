"""Capture a jax.profiler trace of the fused 544x544 bs=1 inference pipeline
and print the per-op device-time breakdown (same analyzer as profile_train).

Usage:
    python tools/profile_infer.py [--iters 50] [--out /tmp/om_infer_trace]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from tools.profile_train import analyze


def run(args):
    import cv2

    from orienmask_tpu.config import (
        orienmask_yolo_coco_544_anchor4_fpn_plus_infer as cfg,
    )
    import orienmask_tpu.models as mm
    from orienmask_tpu.pipeline import InferencePipeline
    from orienmask_tpu.trainer.builder import build, build_postprocess, \
        build_transform

    mc = dict(cfg["model"])
    mc["pretrained"] = None
    model = build(mc, mm)
    variables = model.init_variables(jax.random.PRNGKey(0))
    pipe = InferencePipeline(
        model, variables, build_transform(cfg["transform"]),
        build_postprocess(cfg["postprocess"], pack_masks=True),
        compute_dtype=cfg.get("compute_dtype", "bfloat16"))
    print(f"[profile] devices: {jax.devices()}", flush=True)

    img = cv2.cvtColor(cv2.imread("/root/reference/assets/000000163126.jpg"),
                       cv2.COLOR_BGR2RGB)
    import jax.numpy as jnp
    one = np.ascontiguousarray(img, np.uint8)[None]
    image_u8 = jnp.asarray(np.repeat(one, args.batch, axis=0))

    out = None
    for _ in range(10):
        out = pipe.run_device(image_u8)
    jax.block_until_ready(out["mask"])
    print("[profile] compiled; tracing", flush=True)

    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            out = pipe.run_device(image_u8)
        jax.block_until_ready(out["mask"])
    with open(os.path.join(args.out, "iters.txt"), "w") as fh:
        fh.write(str(args.iters))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1,
                    help="batch size (image replicated) — per-op times are "
                    "per CALL, divide by batch for per-image")
    ap.add_argument("--out", default="/tmp/om_infer_trace")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--per-instance", action="store_true",
                    help="aggregate by raw HLO op name, not source line")
    args = ap.parse_args()
    if not args.analyze_only:
        run(args)
    analyze(args.out, args.iters, top=args.top,
            per_instance=args.per_instance)


if __name__ == "__main__":
    main()
