"""int8 PTQ accuracy A/B: bf16 vs int8 fused pipeline, scored COCO AP.

Runs the trained checkpoint over the mini COCO-statistics val set through the
fused inference pipeline twice — float (bf16 convs) and int8-quantized
(models/quantize.py, calibrated on the first --calib val images) — and scores
both through the full eval stack (RLE + LiteCOCOeval).  The deltas are the
accuracy cost of quantization; bench.py (ORIENMASK_BENCH_INT8=1) measures the
FPS side.

Usage:
    tools/tpu_run.sh "tools/validate_int8.py -w <ckpt>" /tmp/int8_ab.log 240 3 1800

Defaults target the rehearsal dataset layout (/tmp/cocostats_544).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

import jax

t0 = time.time()


def tick(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def build_pipeline(cfg, weights):
    import jax.numpy as jnp

    from orienmask_tpu.data.transform import FastCOCOTransform
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.pipeline import InferencePipeline
    from orienmask_tpu.trainer.builder import build_postprocess
    from orienmask_tpu.trainer.checkpoint import load_checkpoint

    mc = {k: v for k, v in cfg["model"].items() if k != "type"}
    mc["pretrained"] = None
    model = OrienMaskYOLOFPNPlus(**mc)
    variables = model.init_variables(jax.random.PRNGKey(0))
    state = load_checkpoint(weights, model)
    variables = {"params": state["params"], "batch_stats": state["batch_stats"]}

    tf_cfg = cfg["test_loader"]["transform"]
    size = tuple(tf_cfg["pipeline"][0]["size"])
    norm = next(p for p in tf_cfg["pipeline"] if p["type"] == "Normalize")
    transform = FastCOCOTransform([
        dict(type="Resize", size=size),
        dict(type="Normalize", mean=norm["mean"], std=norm["std"]),
    ])
    postprocess = build_postprocess(cfg["postprocess"], pack_masks=True)
    pipe = InferencePipeline(model, variables, transform, postprocess,
                             compute_dtype="bfloat16")
    return pipe


def evaluate(pipe, images, infos, gt_file, cat2label, tag):
    from orienmask_tpu.eval.coco_eval import COCOMetrics

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        metrics = COCOMetrics(gt_file, cat2label, with_mask=True, save_dir=tmp)
        t = time.time()
        for i, (img, info) in enumerate(zip(images, infos)):
            dets, _ = pipe(img[None])
            metrics.update_results(metrics.to_coco_format([info], dets))
            if i % 32 == 0:
                tick(f"{tag}: image {i}/{len(images)}")
        dt = time.time() - t
        metrics.coco_eval()
        stats = {"bbox": np.asarray(metrics.bbox_eval_stats),
                 "segm": np.asarray(metrics.segm_eval_stats)}
    tick(f"{tag}: {len(images)} images in {dt:.1f}s")
    for kind in ("bbox", "segm"):
        tick(f"{tag} {kind.upper()} "
             + " ".join("%.3f" % v for v in stats[kind]))
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-w", "--weights", required=True)
    ap.add_argument("-c", "--config",
                    default="/tmp/cocostats_544/test_config.json")
    ap.add_argument("--calib", type=int, default=8,
                    help="number of val images used for activation calibration")
    ap.add_argument("--stem", action="store_true",
                    help="also quantize the space-to-depth phase stem")
    ap.add_argument("--limit", type=int, default=0,
                    help="evaluate only the first N images (0 = all)")
    args = ap.parse_args()

    with open(args.config) as fh:
        cfg = json.load(fh)
    gt_file = cfg["gt_file"]
    with open(gt_file) as fh:
        gt = json.load(fh)
    image_dir = cfg["test_loader"]["dataset"]["image_dir"]

    from orienmask_tpu.data.dataset import COCODataset

    records = gt["images"]
    if args.limit:
        records = records[:args.limit]
    images, infos = [], []
    for rec in records:
        img = cv2.cvtColor(cv2.imread(os.path.join(image_dir, rec["file_name"])),
                           cv2.COLOR_BGR2RGB)
        images.append(np.ascontiguousarray(img, np.uint8))
        infos.append({"id": rec["id"], "height": rec["height"],
                      "width": rec["width"]})

    print(f"[{time.time()-t0:6.1f}s] devices: {jax.devices()}", flush=True)
    pipe = build_pipeline(cfg, args.weights)
    cat2label = COCODataset.CAT2LABEL

    ref = evaluate(pipe, images, infos, gt_file, cat2label, "bf16")

    calib = np.stack([cv2.resize(im, (images[0].shape[1], images[0].shape[0]))
                      for im in images[:args.calib]])
    tick(f"calibrating int8 on {len(calib)} images (eager CPU pass)")
    pipe.quantize_int8(calib, stem=args.stem)
    tick("quantized; recompiling")
    q = evaluate(pipe, images, infos, gt_file, cat2label, "int8")

    for kind in ("bbox", "segm"):
        d = q[kind] - ref[kind]
        tick(f"DELTA {kind.upper()} " + " ".join("%+.3f" % v for v in d))
    tick("DONE")


if __name__ == "__main__":
    main()
