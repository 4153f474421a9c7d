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
    postprocess=orienmask_yolo_coco_544_anchor4_fpn_plus["postprocess"],
    visualizer=coco_visualizer,
)

orienmask_yolo_coco_544_anchor4_infer = construct_config(
    orienmask_yolo_coco_544_anchor4_fpn_plus_infer,
    update=dict(model=orienmask_yolo_coco_544_anchor4["model"]),
)

orienmask_yolo_coco_544_infer = construct_config(
    orienmask_yolo_coco_544_anchor4_infer,
    update=dict(postprocess=orienmask_yolo_coco_544["postprocess"]),
)

# streaming/video config at 736x736 (double-buffered pipeline, orienmask_tpu.stream)
orienmask_yolo_coco_736_anchor4_fpn_plus_infer = construct_config(
    orienmask_yolo_coco_544_anchor4_fpn_plus_infer,
    update=dict(
        transform=transform_infer_736,
        postprocess=orienmask_yolo_coco_736_anchor4_postprocess,
        stream_depth=2,
    ),
)
