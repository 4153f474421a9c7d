"""Export a serving artifact from an infer config (+ optional checkpoint) and
verify the deserialized programs are bit-identical to the live pipeline.

    python tools/export_serving.py -c orienmask_yolo_coco_544_anchor4_fpn_plus_infer \
        [-w ckpt.{ckpt,pth}] [-o outdir] [--shape B,H,W ...] [--platforms tpu cpu]

On the real chip the 544^2 artifact round-trips the full fused program
(including the Pallas mask kernel's tpu_custom_call) through serialize ->
deserialize -> execute.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-w", "--weights", default=None)
    ap.add_argument("-o", "--output", default="/tmp/orienmask_serving")
    ap.add_argument("--shape", action="append", default=None,
                    help="B,H,W input shape (repeatable); default 1,<net>,<net>")
    ap.add_argument("--platforms", nargs="*", default=None)
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    import jax
    print("[export] devices:", jax.devices())
    import numpy as np

    import orienmask_tpu.config as config_module
    import orienmask_tpu.models as model_module
    from orienmask_tpu.pipeline import InferencePipeline
    from orienmask_tpu.serving import export_pipeline, load_serving
    from orienmask_tpu.trainer.builder import build, build_postprocess, build_transform
    from orienmask_tpu.trainer.checkpoint import load_checkpoint

    if args.config.endswith(".json"):
        with open(args.config) as fh:
            config = json.load(fh)
    else:
        config = getattr(config_module, args.config)

    model_cfg = dict(config["model"])
    model_cfg["pretrained"] = None
    model = build(model_cfg, model_module)
    if args.weights:
        ckpt = load_checkpoint(args.weights, model)
        variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    else:
        print("[export] no -w: random weights (program structure is identical)")
        variables = model.init_variables(jax.random.PRNGKey(0))

    transform = build_transform(config["transform"])
    postprocess = build_postprocess(config["postprocess"])
    pipeline = InferencePipeline(model, variables, transform, postprocess,
                                 compute_dtype=config.get("compute_dtype",
                                                          "bfloat16"))

    net_h, net_w = transform.size
    if args.shape:
        shapes = [tuple(int(x) for x in s.split(",")) + (3,) for s in args.shape]
    else:
        shapes = [(1, net_h, net_w, 3)]

    t0 = time.time()
    manifest = export_pipeline(pipeline, shapes, args.output,
                               platforms=args.platforms)
    sizes = {f: os.path.getsize(os.path.join(args.output, f)) // 1024
             for f in sorted(os.listdir(args.output))}
    print("[export] %.1fs -> %s" % (time.time() - t0, args.output))
    print("[export] platforms=%s files(KiB)=%s" % (manifest["platforms"], sizes))

    if args.skip_verify:
        return
    rng = np.random.default_rng(0)
    served = load_serving(args.output)
    for shape in shapes:
        img = rng.integers(0, 255, shape, np.uint8)
        t0 = time.time()
        got = jax.device_get(served.run_device(img))
        t_first = time.time() - t0
        want = jax.device_get(pipeline.run_device(img))
        for k in want:
            np.testing.assert_array_equal(np.asarray(want[k]),
                                          np.asarray(got[k]), err_msg=k)
        print("[verify] %s bit-exact vs live pipeline (first call %.1fs "
              "incl. compile)" % (shape, t_first))
    print("[export] OK")


if __name__ == "__main__":
    main()
