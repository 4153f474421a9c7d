"""Build a tiny on-disk synthetic dataset + train config for a full-stack
``train.py`` smoke run without COCO data.

    python tools/make_mini_dataset.py [root=/tmp/minicoco_e2e] [options]
    python train.py -c <root>/config.json

Options (all optional; defaults reproduce the round-1 smoke setup):
    --size N          image + train resolution (default 160; use 544 for the
                      realistic-scale rehearsal, VERDICT r1 item 9)
    --n-images N      dataset size (default 16)
    --epochs N        config epochs (default 2)
    --accumulate N    gradient accumulation (default 1)
    --batch-size N    per-device batch (default 4)
    --val-freq N      validation cadence in epochs (default 1)
    --classes N       number of distinct classes used (default 80: random,
                      unlearnable classification; small values color-code the
                      class so AP can actually rise during the rehearsal)

Validated on one TPU v5e (2026-08-17): 2 epochs through the complete stack —
uint8-transport loader, bf16 jitted train step, val epoch with sample-weighted
counters, LiteCOCOeval, best/epochN checkpoint cadence.
"""
import argparse, json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cv2, numpy as np
from orienmask_tpu.eval import rle

ap = argparse.ArgumentParser()
ap.add_argument("root", nargs="?", default="/tmp/minicoco_e2e")
ap.add_argument("--size", type=int, default=160)
ap.add_argument("--n-images", type=int, default=16)
ap.add_argument("--epochs", type=int, default=2)
ap.add_argument("--accumulate", type=int, default=1)
ap.add_argument("--batch-size", type=int, default=4)
ap.add_argument("--val-freq", type=int, default=1)
ap.add_argument("--classes", type=int, default=80)
ap.add_argument("--lr", type=float, default=1e-3)
ap.add_argument("--warmup-iter", type=int, default=4)
args = ap.parse_args()

root = args.root
img_dir = os.path.join(root, "images")
os.makedirs(img_dir, exist_ok=True)
rng = np.random.default_rng(0)
# deterministic class->color table so classification is learnable when
# --classes is small (same idea as tools/synthetic_ap.py scenes)
palette = rng.integers(90, 255, (args.classes, 3))
annos, names = {}, []
gt_coco = {"images": [], "annotations": [], "categories": [
    {"id": cid, "name": f"c{cid}"} for cid in range(1, 81)]}
aid = 1
for i in range(args.n_images):
    h = w = args.size
    img = rng.integers(0, 80, (h, w, 3), np.uint8)
    n = int(rng.integers(1, 4))
    bboxes, clses, masks = [], [], []
    for _ in range(n):
        bw, bh = rng.uniform(0.25, 0.5), rng.uniform(0.25, 0.5)
        cx, cy = rng.uniform(bw/2, 1-bw/2), rng.uniform(bh/2, 1-bh/2)
        cls = int(rng.integers(0, args.classes))
        x1, y1 = int((cx-bw/2)*w), int((cy-bh/2)*h)
        x2, y2 = int((cx+bw/2)*w), int((cy+bh/2)*h)
        color = tuple(int(c) for c in palette[cls])
        cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
        m = np.zeros((h, w), np.uint8); m[y1:y2, x1:x2] = 1
        bboxes.append([cx, cy, bw, bh]); clses.append(cls)
        masks.append(rle.encode(m))
        gt_coco["annotations"].append({
            "id": aid, "image_id": i, "category_id": cls + 1,
            "bbox": [x1, y1, x2-x1, y2-y1], "area": float((x2-x1)*(y2-y1)),
            "iscrowd": 0, "segmentation": rle.encode(m)})
        aid += 1
    name = f"img{i:03d}.jpg"
    cv2.imwrite(os.path.join(img_dir, name), img)
    annos[name] = {"anno": {"bbox": bboxes, "cls": clses, "mask": masks}, "image_id": i}
    names.append(name)
    gt_coco["images"].append({"id": i, "file_name": name, "height": h, "width": w})
json.dump(annos, open(os.path.join(root, "annos.json"), "w"))
open(os.path.join(root, "list.txt"), "w").write("\n".join(names))
json.dump(gt_coco, open(os.path.join(root, "gt.json"), "w"))

size = args.size
ds = dict(type="COCODataset", list_file=f"{root}/list.txt",
          image_dir=img_dir, anno_file=f"{root}/annos.json")
transform = dict(type="COCOTransform", pipeline=[
    dict(type="Resize", size=(size, size), pad_needed=True, warp_p=1.0,
         jitter=0.0, random_place=False, pad_p=0.0, pad_ratio=0.0,
         pad_value=(123.675, 116.28, 103.53)),
    dict(type="ToArray"),
    dict(type="Normalize", mean=(0, 0, 0), std=(255, 255, 255)),
])
loader = dict(dataset=ds, transform=transform, batch_size=args.batch_size,
              num_workers=0, shuffle=True, drop_last=False, max_instances=8,
              pack_masks=True, image_transport="uint8")
anchors = [[12,16],[19,36],[40,28],[36,75],[76,55],[72,146],[142,110],[192,243],[459,401]]
anchors = [[a[0]*size/544, a[1]*size/544] for a in anchors]
mask3 = [[6,7,8],[3,4,5],[0,1,2]]
grids = [[size//32]*2, [size//16]*2, [size//8]*2]
cfg = dict(
    name="mini_e2e", n_device=1, epochs=args.epochs, accumulate=args.accumulate,
    seed=0, monitor="segm_AP", monitor_mode="max", val_freq=args.val_freq,
    save_freq=max(2, args.epochs // 4), log_freq=1, compute_dtype="bfloat16",
    model=dict(type="OrienMaskYOLOFPNPlus", num_anchors=3, num_classes=80,
               pretrained=None),
    train_loader=loader,
    val_loader=dict(loader, shuffle=False, image_transport="uint8"),
    loss=dict(type="OrienMaskYOLOMultiScaleLoss", grid_size=grids,
              image_size=[size, size], anchors=anchors, anchor_mask=mask3,
              num_classes=80, center_region=0.6, valid_region=0.6,
              label_smooth=False, obj_ignore_threshold=0.7,
              weight=[1,1,1,1,1,20,20], scales_weight=[1,1,1], target_chunk=4),
    postprocess=dict(type="OrienMaskYOLOPostProcess", grid_size=grids,
                     image_size=[size, size], anchors=anchors,
                     anchor_mask=mask3, num_classes=80, conf_thresh=0.005,
                     nms=dict(type="batched_nms", threshold=0.5),
                     nms_pre=200, nms_post=50, orien_thresh=0.3),
    optimizer=dict(type="SGD", lr=args.lr, momentum=0.9, weight_decay=5e-4),
    lr_scheduler=dict(type="StepWarmUpLR", warmup_type="linear",
                      warmup_iter=args.warmup_iter, warmup_ratio=0.1,
                      milestones=[100000], gamma=0.1),
    val_gt_file=f"{root}/gt.json",
    log_dir=f"{root}/runs",
)
json.dump(cfg, open(f"{root}/config.json", "w"))
print("dataset + config at", root)
