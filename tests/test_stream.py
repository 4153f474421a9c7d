"""Streaming pipeline: depth-K in-flight ordering and the 736 config."""

import numpy as np
import pytest

import jax

from orienmask_tpu.config import orienmask_yolo_coco_736_anchor4_fpn_plus_infer as cfg736
from orienmask_tpu.stream import StreamingPipeline


def test_736_config_shapes():
    pp = cfg736["postprocess"]
    assert pp["image_size"] == [736, 736]
    assert pp["grid_size"] == [[23, 23], [46, 46], [92, 92]]
    assert cfg736["transform"]["pipeline"][0]["size"] == (736, 736)
    assert cfg736["stream_depth"] == 2


def test_streaming_order_and_depth(monkeypatch):
    """StreamingPipeline preserves frame order and keeps <= depth+1 in flight."""

    class FakePipe:
        class PP:
            @staticmethod
            def to_host_list(out):
                return [{"frame": out}]

        postprocess = PP()

        def run_device(self, image):
            return int(image[0, 0, 0, 0])

    sp = StreamingPipeline(FakePipe(), depth=2)
    frames = [np.full((1, 2, 2, 3), i, np.uint8) for i in range(7)]
    results = [r[0]["frame"] for r in sp(frames)]
    assert results == list(range(7))


def test_streaming_tiny_model_cpu(monkeypatch):
    """End-to-end streaming over a tiny model on CPU."""
    from orienmask_tpu.models.darknet import DarkNet53

    monkeypatch.setattr(DarkNet53, "STAGE_BLOCKS", (1, 1, 1, 1, 1))
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess
    from orienmask_tpu.data.transform import FastCOCOTransform
    from orienmask_tpu.pipeline import InferencePipeline
    from orienmask_tpu.config.base import ANCHORS_YOLOV4, ANCHORS_MASK

    size = 96
    model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    variables = model.init_variables(jax.random.PRNGKey(0))
    transform = FastCOCOTransform([
        dict(type="Resize", size=(size, size)),
        dict(type="Normalize", mean=(0, 0, 0), std=(255, 255, 255)),
    ])
    pp = OrienMaskYOLOPostProcess(
        grid_size=[[size // 32] * 2, [size // 16] * 2, [size // 8] * 2],
        image_size=[size, size], anchors=ANCHORS_YOLOV4, anchor_mask=ANCHORS_MASK,
        num_classes=80, conf_thresh=0.005, nms=dict(threshold=0.5),
        nms_pre=50, nms_post=10, orien_thresh=0.3,
    )
    pipe = InferencePipeline(model, variables, transform, pp, "float32")
    sp = StreamingPipeline(pipe, depth=2)

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (1, 120, 160, 3), np.uint8) for _ in range(5)]
    results = list(sp(frames))
    assert len(results) == 5
    for dets in results:
        assert "bbox" in dets[0] and dets[0]["mask"].shape[1:] == (size, size)
