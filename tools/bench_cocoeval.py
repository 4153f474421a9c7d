"""Benchmark LiteCOCOeval at val2017 scale (VERDICT r1 item 4).

Synthesizes a COCO-shaped corpus — 5k images, ~7 GT instances each over 80
categories (mix of polygon/RLE/crowd), ~36 detections per image with noisy
boxes/masks — and times the full bbox + segm evaluation through
eval/lite_cocoeval.py (RLE-space IoU, no mask decode on the hot path).

The reference scores val2017 with pycocotools in a few minutes
(reference trainer/tester.py:52); this must be in the same class because it
runs inside training validation every val_freq epochs.

Run:  python tools/bench_cocoeval.py [n_images]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from orienmask_tpu.eval import rle
from orienmask_tpu.eval.lite_cocoeval import COCOGroundTruth, LiteCOCOeval

N_IMAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_CATS = 80
H, W = 480, 640
rng = np.random.default_rng(0)


def rect_poly(x0, y0, x1, y1):
    return [float(x0), float(y0), float(x1), float(y0),
            float(x1), float(y1), float(x0), float(y1)]


def make_corpus():
    images, anns, dets_bbox, dets_segm = [], [], [], []
    aid = 1
    for img in range(N_IMAGES):
        images.append({"id": img, "height": H, "width": W})
        n_gt = int(rng.integers(3, 12))
        for _ in range(n_gt):
            bw, bh = rng.uniform(8, 200), rng.uniform(8, 200)
            x0 = rng.uniform(0, W - bw)
            y0 = rng.uniform(0, H - bh)
            cat = int(rng.integers(1, N_CATS + 1))
            crowd = int(rng.random() < 0.03)
            seg = rect_poly(x0, y0, x0 + bw, y0 + bh)
            ann = {
                "id": aid, "image_id": img, "category_id": cat,
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": crowd,
                "segmentation": [seg],
            }
            if crowd:  # crowd anns ship as RLE in COCO
                m = np.zeros((H, W), np.uint8)
                m[int(y0):int(y0 + bh), int(x0):int(x0 + bw)] = 1
                ann["segmentation"] = rle.encode(m)
            anns.append(ann)
            aid += 1
            # ~3 detections per GT: one good, two noisy/weak
            for d in range(3):
                jitter = rng.normal(0, 4 + 8 * d, 4)
                dx0, dy0 = x0 + jitter[0], y0 + jitter[1]
                dw, dh = max(4, bw + jitter[2]), max(4, bh + jitter[3])
                score = float(np.clip(rng.normal(0.8 - 0.3 * d, 0.1), 0.01, 1))
                dcat = cat if rng.random() > 0.05 else int(rng.integers(1, N_CATS + 1))
                dets_bbox.append({
                    "image_id": img, "category_id": dcat, "score": score,
                    "bbox": [dx0, dy0, dw, dh],
                })
                dm = np.zeros((H, W), np.uint8)
                yy0 = int(np.clip(dy0, 0, H - 1))
                xx0 = int(np.clip(dx0, 0, W - 1))
                dm[yy0:int(np.clip(dy0 + dh, 0, H)),
                   xx0:int(np.clip(dx0 + dw, 0, W))] = 1
                dets_segm.append({
                    "image_id": img, "category_id": dcat, "score": score,
                    "segmentation": rle.encode(dm),
                })
    return images, anns, dets_bbox, dets_segm


def main():
    t0 = time.time()
    images, anns, dets_bbox, dets_segm = make_corpus()
    gt = COCOGroundTruth({
        "images": images,
        "categories": [{"id": i + 1} for i in range(N_CATS)],
        "annotations": anns,
    })
    print(f"[{time.time()-t0:6.1f}s] corpus: {N_IMAGES} images, "
          f"{len(anns)} GT, {len(dets_bbox)} dets", flush=True)

    t = time.time()
    ev = LiteCOCOeval(gt, dets_bbox, "bbox")
    stats = ev.summarize()
    t_bbox = time.time() - t
    print(f"[{time.time()-t0:6.1f}s] bbox eval: {t_bbox:.1f}s  "
          f"AP={stats[0]:.3f} AP50={stats[1]:.3f} AR100={stats[8]:.3f}",
          flush=True)

    t = time.time()
    ev = LiteCOCOeval(gt, dets_segm, "segm")
    stats = ev.summarize()
    t_segm = time.time() - t
    print(f"[{time.time()-t0:6.1f}s] segm eval: {t_segm:.1f}s  "
          f"AP={stats[0]:.3f} AP50={stats[1]:.3f} AR100={stats[8]:.3f}",
          flush=True)
    print(f"BENCH-COCOEVAL n={N_IMAGES} bbox={t_bbox:.1f}s segm={t_segm:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
