"""Synthetic-AP regression harness: train the FULL model on synthetic scenes on
TPU and score COCO AP through the complete eval stack.

Stronger than tools/overfit_validation.py (slim backbone, 4 images, CPU): this
drives the real DarkNet53+FPNPlus model, the bf16 TPU train step, and
decode -> NMS -> orientation-mask assembly -> RLE -> LiteCOCOeval on a larger
scene set.  Because no COCO data or published weights exist in this
environment, a high AP here is the end-to-end evidence that the learning loop
(targets/loss/gradients/optimizer) and the eval stack are wired correctly
(reference equivalent: val2017 scoring via test.py, trainer/tester.py:52).

Scenes: class-colored axis-aligned rectangles and ellipses on noise background
(color encodes class, so classification is learnable; exact GT masks).

Run:  tools/tpu_run.sh tools/synthetic_ap.py /tmp/synth_ap.log 300 2 1800
Recorded result (2026-08-16, one v5e, 2000 bf16 steps @256x256 in 52s, 16 scenes):
    SYNTH-AP bbox AP=0.981 segm AP=0.844 (44 dets / 45 GT)
Re-validated 2026-08-17 after the dtype-uniform-BN + space-to-depth-stem
train-step optimizations: SYNTH-AP bbox AP=0.981 segm AP=0.865.
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


from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4  # noqa: E402
from orienmask_tpu.eval import rle  # noqa: E402
from orienmask_tpu.eval.lite_cocoeval import COCOGroundTruth, LiteCOCOeval  # noqa: E402
from orienmask_tpu.models import OrienMaskYOLOFPNPlus  # noqa: E402
from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss  # noqa: E402
from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess  # noqa: E402
from orienmask_tpu.optim import SGD  # noqa: E402
from orienmask_tpu.parallel.mesh import data_mesh, shard_batch  # noqa: E402
from orienmask_tpu.trainer.train_state import make_train_step  # noqa: E402

SIZE = 256
B = 16
N_MAX = 8
NC = 8
STEPS = int(os.environ.get("SYNTH_AP_STEPS", 2000))
GRIDS = [[SIZE // 32] * 2, [SIZE // 16] * 2, [SIZE // 8] * 2]
# anchors scaled from the 544 config to this resolution
ANCHORS = [[a * SIZE / 544, b * SIZE / 544] for a, b in ANCHORS_YOLOV4]

CLASS_COLORS = np.array([
    [0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9], [0.9, 0.9, 0.1],
    [0.9, 0.1, 0.9], [0.1, 0.9, 0.9], [0.8, 0.5, 0.2], [0.5, 0.2, 0.8],
], np.float32)


def make_scenes(rng):
    images = rng.normal(0.0, 0.08, (B, SIZE, SIZE, 3)).astype(np.float32)
    gt_bbox = np.zeros((B, N_MAX, 4), np.float32)
    gt_cls = np.zeros((B, N_MAX), np.int32)
    gt_mask = np.zeros((B, N_MAX, SIZE, SIZE), bool)
    gt_valid = np.zeros((B, N_MAX), bool)
    coco_images, coco_anns = [], []
    ys, xs = np.mgrid[0:SIZE, 0:SIZE]
    aid = 1
    for b in range(B):
        n = int(rng.integers(2, 5))
        for k in range(n):
            bw, bh = rng.uniform(0.15, 0.55, 2)
            cx = rng.uniform(bw / 2 + 0.02, 0.98 - bw / 2)
            cy = rng.uniform(bh / 2 + 0.02, 0.98 - bh / 2)
            c = int(rng.integers(0, NC))
            if rng.random() < 0.5:  # rectangle
                m = ((np.abs(xs / SIZE - cx) <= bw / 2)
                     & (np.abs(ys / SIZE - cy) <= bh / 2))
            else:  # ellipse
                m = (((xs / SIZE - cx) / (bw / 2)) ** 2
                     + ((ys / SIZE - cy) / (bh / 2)) ** 2) <= 1.0
            # later instances occlude earlier ones
            for kk in range(k):
                gt_mask[b, kk] &= ~m
            if not m.any():
                continue
            images[b][m] = CLASS_COLORS[c] + rng.normal(0, 0.05, 3).astype(np.float32)
            gt_bbox[b, k] = [cx, cy, bw, bh]
            gt_cls[b, k] = c
            gt_mask[b, k] = m
            gt_valid[b, k] = True
        for k in range(N_MAX):
            if not gt_valid[b, k]:
                continue
            m = gt_mask[b, k]
            if not m.any():  # fully occluded
                gt_valid[b, k] = False
                gt_bbox[b, k] = 0
                continue
            ys_k, xs_k = np.nonzero(m)
            x1, x2 = xs_k.min(), xs_k.max() + 1
            y1, y2 = ys_k.min(), ys_k.max() + 1
            # tighten the box to the visible mask (cxcywh normalized)
            gt_bbox[b, k] = [(x1 + x2) / 2 / SIZE, (y1 + y2) / 2 / SIZE,
                             (x2 - x1) / SIZE, (y2 - y1) / SIZE]
            coco_anns.append({
                "id": aid, "image_id": b, "category_id": int(gt_cls[b, k]) + 1,
                "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                "area": float(m.sum()), "iscrowd": 0,
                "segmentation": rle.encode(m.astype(np.uint8)),
            })
            aid += 1
        coco_images.append({"id": b, "height": SIZE, "width": SIZE})
    gt = COCOGroundTruth({
        "images": coco_images,
        "categories": [{"id": i + 1} for i in range(NC)],
        "annotations": coco_anns,
    })
    return images, gt_bbox, gt_cls, gt_mask, gt_valid, gt, aid - 1


def main():
    rng = np.random.default_rng(7)
    images, gt_bbox, gt_cls, gt_mask, gt_valid, gt, n_gt = make_scenes(rng)
    tick(f"scenes made ({n_gt} GT instances)")

    model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=NC)
    variables = model.init_variables(jax.random.PRNGKey(0))
    loss = OrienMaskYOLOMultiScaleLoss(
        grid_size=GRIDS, image_size=[SIZE, SIZE], anchors=ANCHORS,
        anchor_mask=ANCHORS_MASK, num_classes=NC, obj_ignore_threshold=0.7,
        weight=[1, 1, 1, 1, 1, 20, 20], scales_weight=[1, 1, 1], target_chunk=8,
    )
    optimizer = SGD(lr=1e-3, momentum=0.9, weight_decay=0.0)
    mesh = data_mesh()
    train_step, init_state = make_train_step(
        model, loss, optimizer, mesh, compute_dtype=jnp.bfloat16,
    )
    state = init_state(variables)
    batch = {"image": images, "bbox": gt_bbox, "cls": gt_cls,
             "mask": gt_mask, "valid": gt_valid}
    sb = shard_batch(batch, mesh)
    tick("setup")

    for i in range(STEPS):
        lr = 1e-4 if i < 100 else (1e-3 if i < STEPS * 3 // 4 else 1e-4)
        state, logs = train_step(state, sb, lr, True)
        if i % 200 == 0:
            tick(f"step {i} loss={float(logs['loss']):.2f}")
    tick(f"trained {STEPS} steps, final loss={float(logs['loss']):.2f}")

    pp = OrienMaskYOLOPostProcess(
        grid_size=GRIDS, image_size=[SIZE, SIZE], anchors=ANCHORS,
        anchor_mask=ANCHORS_MASK, num_classes=NC, conf_thresh=0.05,
        nms=dict(threshold=0.5), nms_pre=100, nms_post=20, orien_thresh=0.3,
    )
    out, _ = model.forward(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        jnp.asarray(images), train=False,
    )
    dets = pp(out)
    results_bbox, results_segm = [], []
    for b, det in enumerate(dets):
        for m, bb, c in zip(det["mask"], det["bbox"], det["cls"]):
            x1 = (bb[0] - bb[2] / 2) * SIZE
            y1 = (bb[1] - bb[3] / 2) * SIZE
            results_bbox.append({
                "image_id": b, "category_id": int(c) + 1,
                "bbox": [float(x1), float(y1),
                         float(bb[2] * SIZE), float(bb[3] * SIZE)],
                "score": float(bb[4]),
            })
            results_segm.append({
                "image_id": b, "category_id": int(c) + 1,
                "segmentation": rle.encode(np.asarray(m, np.uint8)),
                "score": float(bb[4]),
            })
    bbox_ap = LiteCOCOeval(gt, results_bbox, "bbox").summarize()[0]
    segm_ap = LiteCOCOeval(gt, results_segm, "segm").summarize()[0]
    print(f"SYNTH-AP bbox AP={bbox_ap:.3f} segm AP={segm_ap:.3f} "
          f"({len(results_bbox)} dets / {n_gt} GT)", flush=True)


if __name__ == "__main__":
    main()
