"""Config building blocks.

The config system mirrors the reference (`/root/reference/config/base.py`): plain nested
python dicts with a ``type`` key resolved by the builder registry, composed through
``construct_config`` (deep-merge update + dotted-path pop).  Config *names* are part of
the public CLI contract (``train.py -c orienmask_yolo_coco_544_anchor4_fpn_plus``) and
are kept identical.

TPU-specific additions relative to the reference:
  * ``n_device`` replaces ``n_gpu`` (``n_gpu`` is still accepted as an alias),
  * ``max_instances`` — static per-image instance cap for XLA static shapes,
  * ``compute_dtype`` — bf16/float32 compute policy for the conv stack.
"""

import copy

# ImageNet statistics kept for transform parity (reference config/base.py:4-5).
MEAN = [123.675, 116.280, 103.530]
STD = [58.395, 57.120, 57.375]

# Per-scale anchor index groups: scale-32 owns anchors 6..8, scale-16 owns 3..5,
# scale-8 owns 0..2 (reference config/base.py:6).
ANCHORS_MASK = [[6, 7, 8], [3, 4, 5], [0, 1, 2]]

# Anchor priors in input-image pixels (reference config/base.py:7-16).
ANCHORS_YOLOV3 = [
    [10, 13], [16, 30], [33, 23],
    [30, 61], [62, 45], [59, 119],
    [116, 90], [156, 198], [373, 326],
]
ANCHORS_YOLOV4 = [
    [12, 16], [19, 36], [40, 28],
    [36, 75], [76, 55], [72, 146],
    [142, 110], [192, 243], [459, 401],
]


def construct_config(config, update=None, pop=None):
    """Compose a config from a base one.

    ``update`` deep-merges dict values key-by-key (non-dict values replace).
    ``pop`` removes dotted paths, e.g. ``"model.pretrained"``.
    Matches reference ``construct_config`` semantics (config/base.py:19-50).
    """
    out = copy.deepcopy(config)
    if update:
        for key, value in update.items():
            if isinstance(value, dict) and isinstance(out.get(key), dict):
                out[key] = construct_config(out[key], update=value)
            else:
                out[key] = value
    for path in pop or ():
        node = out
        *parents, leaf = path.split(".")
        for p in parents:
            node = node[p]
        node.pop(leaf)
    return out


# --------------------------------------------------------------------------------------
# model blocks (reference config/base.py:99-111)
# --------------------------------------------------------------------------------------

orienmask_yolo_coco = dict(
    type="OrienMaskYOLO",
    num_anchors=3,
    num_classes=80,
    pretrained="checkpoints/pretrained/pretrained_darknet53.pth",
    freeze_backbone=False,
    backbone_batchnorm_eval=False,
)

orienmask_yolo_fpn_plus_coco = construct_config(
    orienmask_yolo_coco, update=dict(type="OrienMaskYOLOFPNPlus")
)


# --------------------------------------------------------------------------------------
# dataset blocks (reference config/base.py:115-131)
# --------------------------------------------------------------------------------------

coco_train_dataset = dict(
    type="COCODataset",
    list_file="coco/list/coco_train.txt",
    image_dir="coco/train2017",
    anno_file="coco/annotations/orienmask_coco_train.json",
    with_mask=True,
    with_info=False,
)

coco_val_dataset = dict(
    type="COCODataset",
    list_file="coco/list/coco_val.txt",
    image_dir="coco/val2017",
    anno_file="coco/annotations/orienmask_coco_val.json",
    with_mask=True,
    with_info=True,
)


# --------------------------------------------------------------------------------------
# transform blocks (reference config/base.py:135-164)
# --------------------------------------------------------------------------------------

transform_train_544 = dict(
    type="COCOTransform",
    pipeline=[
        dict(type="ColorJitter", brightness=0.2, contrast=0.5, saturation=0.5, hue=0.1),
        dict(type="RandomCrop", p=0.5, image_min_iou=0.64, bbox_min_iou=0.64),
        dict(type="Resize", size=(544, 544), pad_needed=True, warp_p=0.25, jitter=0.3,
             random_place=True, pad_p=0.75, pad_ratio=0.75, pad_value=MEAN),
        dict(type="RandomHorizontalFlip", p=0.5),
        dict(type="ToArray"),
        dict(type="Normalize", mean=(0, 0, 0), std=(255, 255, 255)),
    ],
)

transform_val_544 = dict(
    type="COCOTransform",
    pipeline=[
        dict(type="Resize", size=(544, 544), pad_needed=False, warp_p=0., jitter=0.,
             random_place=False, pad_p=0., pad_ratio=0., pad_value=MEAN),
        dict(type="ToArray"),
        dict(type="Normalize", mean=(0, 0, 0), std=(255, 255, 255)),
    ],
)

# Device-side (jit-fused) inference transform: resize + normalize inside XLA.
transform_infer_544 = dict(
    type="FastCOCOTransform",
    pipeline=[
        dict(type="Resize", size=(544, 544), interpolation="bilinear", align_corners=False),
        dict(type="Normalize", mean=(0, 0, 0), std=(255, 255, 255)),
    ],
)


# --------------------------------------------------------------------------------------
# dataloader blocks (reference config/base.py:168-188)
# --------------------------------------------------------------------------------------

coco_544_train_loader = dict(
    type="DataLoader",
    dataset=coco_train_dataset,
    transform=transform_train_544,
    batch_size=8,
    # Sized from the measured host pipeline: ~49 samples/s/core end to end
    # (aug ~17 ms + collate ~3.6 ms, docs/PERFORMANCE.md "Host data-pipeline
    # sizing"), so feeding the ~170 img/s bf16 train step needs >=4 workers.
    num_workers=4,
    shuffle=True,
    # TPU static-shape knobs: per-image instance cap and packed-bit GT masks.
    # max_instances bounds the per-sample GT tensor for one compiled step.
    # COCO eval itself scores at most 100 detections/image (pycocotools
    # maxDets), and >100-annotation train2017 images are a rare tail; when a
    # sample does exceed the cap, collate keeps the 100 largest-area
    # instances deterministically and warns loudly (data/collate.py) — the
    # reference's cumsum collate keeps all instances at the cost of dynamic
    # shapes (reference data/collate.py:13-30).
    max_instances=100,
    pack_masks=True,
    collate=dict(type="collate"),
)

coco_544_val_loader = dict(
    type="DataLoader",
    dataset=coco_val_dataset,
    transform=transform_val_544,
    batch_size=8,
    num_workers=4,  # see train loader note
    shuffle=False,
    max_instances=100,
    pack_masks=True,
    collate=dict(type="collate"),
)


coco_train2017_gt_file = "coco/annotations/instances_train2017.json"
coco_val2017_gt_file = "coco/annotations/instances_val2017.json"


# --------------------------------------------------------------------------------------
# loss blocks (reference config/base.py:197-215)
# --------------------------------------------------------------------------------------

orienmask_yolo_coco_544_loss = dict(
    type="OrienMaskYOLOMultiScaleLoss",
    grid_size=[[17, 17], [34, 34], [68, 68]],
    image_size=[544, 544],
    anchors=ANCHORS_YOLOV3,
    anchor_mask=ANCHORS_MASK,
    num_classes=80,
    center_region=0.6,
    valid_region=0.6,
    label_smooth=False,
    obj_ignore_threshold=0.7,
    weight=[1, 1, 1, 1, 1, 20, 20],
    scales_weight=[1, 1, 1],
)

orienmask_yolo_coco_544_anchor4_loss = construct_config(
    orienmask_yolo_coco_544_loss, update=dict(anchors=ANCHORS_YOLOV4)
)


# --------------------------------------------------------------------------------------
# postprocess blocks (reference config/base.py:219-236)
# --------------------------------------------------------------------------------------

orienmask_yolo_coco_544_postprocess = dict(
    type="OrienMaskYOLOPostProcess",
    grid_size=[[17, 17], [34, 34], [68, 68]],
    image_size=[544, 544],
    anchors=ANCHORS_YOLOV3,
    anchor_mask=ANCHORS_MASK,
    num_classes=80,
    conf_thresh=0.005,
    nms=dict(type="batched_nms", threshold=0.5),
    nms_pre=400,
    nms_post=100,
    orien_thresh=0.3,
    # Exact top-nms_pre (det, class) selection: zero known divergence vs the
    # reference's nonzero+topk (eval/orienmask_yolo_postprocess.py:102-110).
    # The "twostage" mode (per-det max prefilter) is equal except at exact
    # score ties but ~20% faster at bs=1 on chip (309 vs 245 FPS measured:
    # top_k over the full 18207x80 pair grid is the cost). Test/val AP paths
    # inherit "exact" from here; the speed-headline infer configs override to
    # "twostage" (config_infer.py).
    topk_mode="exact",
)

orienmask_yolo_coco_544_anchor4_postprocess = construct_config(
    orienmask_yolo_coco_544_postprocess, update=dict(anchors=ANCHORS_YOLOV4)
)

# 736x736 streaming/video variant (second compiled static-shape program;
# BASELINE.json stretch config)
transform_infer_736 = construct_config(
    transform_infer_544,
    update=dict(pipeline=[
        dict(type="Resize", size=(736, 736), interpolation="bilinear", align_corners=False),
        dict(type="Normalize", mean=(0, 0, 0), std=(255, 255, 255)),
    ]),
)

orienmask_yolo_coco_736_anchor4_postprocess = construct_config(
    orienmask_yolo_coco_544_anchor4_postprocess,
    update=dict(grid_size=[[23, 23], [46, 46], [92, 92]], image_size=[736, 736]),
)


# --------------------------------------------------------------------------------------
# optimizer / LR schedule blocks (reference config/base.py:240-256)
# --------------------------------------------------------------------------------------

base_sgd = dict(
    type="SGD",
    lr=1e-3,
    momentum=0.9,
    weight_decay=5e-4,
)

# Milestones are optimizer *iterations*, not epochs; the schedule steps once per
# accumulate-window exactly like the reference (trainer/trainer.py:54).
step_lr_warmup_coco_e100 = dict(
    type="StepWarmUpLR",
    warmup_type="linear",
    warmup_iter=1000,
    warmup_ratio=0.1,
    milestones=[520000, 660000],
    gamma=0.1,
)


# --------------------------------------------------------------------------------------
# visualizer block (reference config/base.py:260-267)
# --------------------------------------------------------------------------------------

coco_visualizer = dict(
    type="InferenceVisualizer",
    dataset="COCO",
    with_mask=True,
    conf_thresh=0.3,
    alpha=0.6,
    line_thickness=1,
)
