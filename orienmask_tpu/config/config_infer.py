"""Named inference configs (reference config/config_infer.py)."""

from .base import (
    construct_config,
    transform_infer_544,
    transform_infer_736,
    orienmask_yolo_coco_736_anchor4_postprocess,
    coco_visualizer,
)
from .config_train import (
    orienmask_yolo_coco_544,
    orienmask_yolo_coco_544_anchor4,
    orienmask_yolo_coco_544_anchor4_fpn_plus,
)

orienmask_yolo_coco_544_anchor4_fpn_plus_infer = dict(
    n_device=1,
    compute_dtype="bfloat16",  # inference default: bf16 convs / fp32 accumulation
    model=orienmask_yolo_coco_544_anchor4_fpn_plus["model"],
    transform=transform_infer_544,
    # twostage candidate selection: identical to "exact" except at exact score
    # ties, ~20% faster at bs=1 (see config/base.py). AP-parity paths
    # (test/val) keep the exact default.
    postprocess=dict(orienmask_yolo_coco_544_anchor4_fpn_plus["postprocess"],
                     topk_mode="twostage"),
    visualizer=coco_visualizer,
)

orienmask_yolo_coco_544_anchor4_infer = construct_config(
    orienmask_yolo_coco_544_anchor4_fpn_plus_infer,
    update=dict(model=orienmask_yolo_coco_544_anchor4["model"]),
)

orienmask_yolo_coco_544_infer = construct_config(
    orienmask_yolo_coco_544_anchor4_infer,
    update=dict(postprocess=dict(orienmask_yolo_coco_544["postprocess"],
                                 topk_mode="twostage")),
)

# streaming/video config at 736x736 (double-buffered pipeline, orienmask_tpu.stream)
orienmask_yolo_coco_736_anchor4_fpn_plus_infer = construct_config(
    orienmask_yolo_coco_544_anchor4_fpn_plus_infer,
    update=dict(
        transform=transform_infer_736,
        postprocess=dict(orienmask_yolo_coco_736_anchor4_postprocess,
                         topk_mode="twostage"),
        stream_depth=2,
    ),
)
