"""Batched inference throughput (the test.py / val-epoch shape of work).

Same pipelined methodology as bench.py (device-staged input, full fused
program, outputs device-resident, one sync per window), at batch sizes the
reference's test config uses (16) plus 8.  Single image reused across the
batch — throughput depends on shapes, not content.

Usage: python tools/bench_batched.py [batch ...]   (default: 1 8 16)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

t0 = time.time()


def tick(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def main():
    import cv2

    from orienmask_tpu.config import (
        orienmask_yolo_coco_544_anchor4_fpn_plus_infer as cfg,
    )
    import orienmask_tpu.models as mm
    from orienmask_tpu.pipeline import InferencePipeline
    from orienmask_tpu.trainer.builder import build, build_postprocess, \
        build_transform

    batches = [int(a) for a in sys.argv[1:]] or [1, 8, 16]
    tick(f"devices: {jax.devices()}")

    mc = dict(cfg["model"])
    mc["pretrained"] = None
    model = build(mc, mm)
    variables = model.init_variables(jax.random.PRNGKey(0))
    wpath = os.environ.get("ORIENMASK_BENCH_WEIGHTS")
    if wpath:
        # trained weights: real detection counts through NMS + mask assembly
        # (same hook as bench.py; VERDICT r2 task 8)
        from orienmask_tpu.trainer.checkpoint import load_checkpoint

        st = load_checkpoint(wpath, model)
        variables = {"params": st["params"], "batch_stats": st["batch_stats"]}
        tick(f"loaded weights from {wpath}")
    pipe = InferencePipeline(
        model, variables, build_transform(cfg["transform"]),
        build_postprocess(cfg["postprocess"], pack_masks=True),
        compute_dtype=cfg.get("compute_dtype", "bfloat16"))

    img = cv2.cvtColor(cv2.imread("/root/reference/assets/000000163126.jpg"),
                       cv2.COLOR_BGR2RGB)
    one = np.ascontiguousarray(img, np.uint8)[None]

    if os.environ.get("ORIENMASK_BENCH_INT8"):
        pipe.quantize_int8(one)
        tick("int8 quantized")

    for b in batches:
        image = jnp.asarray(np.repeat(one, b, axis=0))
        out = None
        for _ in range(6):
            out = pipe.run_device(image)
        jax.block_until_ready(out["mask"])
        n = max(1, 200 // b)
        rates = []
        for _ in range(5):
            start = time.perf_counter()
            outs = [pipe.run_device(image) for _ in range(n)]
            jax.block_until_ready(outs)
            rates.append(n * b / (time.perf_counter() - start))
        r = sorted(rates)[len(rates) // 2]
        tick(f"batch {b:3d}: {r:7.1f} img/s  ({1000*b/r:.2f} ms/batch)")


if __name__ == "__main__":
    main()
