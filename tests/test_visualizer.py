"""Host-side visualizer: draws boxes/masks without error and blends correctly."""

import numpy as np

from orienmask_tpu.utils.visualizer import InferenceVisualizer


def _dets(n, h, w):
    rng = np.random.default_rng(0)
    bbox = np.stack([
        rng.uniform(0.3, 0.7, n), rng.uniform(0.3, 0.7, n),
        rng.uniform(0.1, 0.3, n), rng.uniform(0.1, 0.3, n),
        rng.uniform(0.5, 1.0, n),
    ], axis=1).astype(np.float32)
    masks = rng.random((n, h, w)) > 0.7
    cls = rng.integers(0, 80, n)
    return {"bbox": bbox, "mask": masks, "cls": cls}


def test_visualizer_draws():
    h, w = 96, 128
    vis = InferenceVisualizer("COCO", with_mask=True, conf_thresh=0.3)
    image = np.full((240, 320, 3), 128, np.float32)
    out = vis(_dets(5, h, w), image, (0, 0, 0, 0, h, w))
    assert out.shape == (240, 320, 3)
    assert out.dtype == np.uint8
    assert not np.all(out == 128)  # something was drawn


def test_visualizer_threshold_filters_all():
    h, w = 96, 128
    vis = InferenceVisualizer("COCO", with_mask=True, conf_thresh=2.0)
    image = np.full((100, 100, 3), 50, np.float32)
    out = vis(_dets(3, h, w), image, (0, 0, 0, 0, h, w))
    assert np.all(out == 50)  # nothing above threshold -> untouched


def test_visualizer_empty_detections():
    vis = InferenceVisualizer("COCO", with_mask=True)
    image = np.zeros((64, 64, 3), np.float32)
    empty = {"bbox": np.zeros((0, 5), np.float32),
             "mask": np.zeros((0, 32, 32), bool),
             "cls": np.zeros((0,), np.int64)}
    out = vis(empty, image, (0, 0, 0, 0, 32, 32))
    assert out.shape == (64, 64, 3)
