"""RLE codec + lite COCOeval + COCOMetrics inverse-mapping tests."""

import numpy as np

from orienmask_tpu.eval import rle
from orienmask_tpu.eval.coco_eval import COCOMetrics
from orienmask_tpu.eval.lite_cocoeval import COCOGroundTruth, LiteCOCOeval


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(7, 5), (32, 32), (544, 544), (1, 1)]:
        mask = (rng.random(shape) > 0.6).astype(np.uint8)
        enc = rle.encode(mask)
        assert isinstance(enc["counts"], str)
        dec = rle.decode(enc)
        np.testing.assert_array_equal(dec, mask)
        assert rle.area(enc) == int(mask.sum())


def test_rle_known_values():
    # all-zero 2x2 -> one run of 4 zeros -> "4"; all-one -> "04"
    assert rle.encode(np.zeros((2, 2), np.uint8))["counts"] == "4"
    assert rle.encode(np.ones((2, 2), np.uint8))["counts"] == "04"
    # column-major: mask[1,0]=1 in 2x2 -> runs [1,1,2]
    m = np.zeros((2, 2), np.uint8)
    m[1, 0] = 1
    enc = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(enc), m)


def test_rle_uncompressed_counts():
    m = rle.decode({"size": [3, 3], "counts": [1, 2, 6]})
    # Fortran order: first pixel 0, next two 1s
    expect = np.zeros((3, 3), np.uint8)
    expect[1, 0] = expect[2, 0] = 1
    np.testing.assert_array_equal(m, expect)


def test_polygon_mask():
    # pycocotools frPoly semantics: an axis-aligned square [1,1]..[6,6] fills
    # exactly the half-open pixel block [1:6, 1:6] (area 25, matching the
    # COCO ann['area'] convention) — NOT the inclusive fill cv2.fillPoly does.
    m = rle.polygons_to_mask([[1, 1, 6, 1, 6, 6, 1, 6]], 8, 8)
    assert m.sum() == 25
    expect = np.zeros((8, 8), np.uint8)
    expect[1:6, 1:6] = 1
    np.testing.assert_array_equal(m, expect)


def _toy_gt():
    images = [{"id": 1, "height": 100, "width": 100},
              {"id": 2, "height": 100, "width": 100}]
    cats = [{"id": 7, "name": "thing"}, {"id": 9, "name": "other"}]
    anns = [
        {"id": 1, "image_id": 1, "category_id": 7, "bbox": [10, 10, 20, 20],
         "area": 400, "iscrowd": 0, "segmentation": [[10, 10, 30, 10, 30, 30, 10, 30]]},
        {"id": 2, "image_id": 1, "category_id": 7, "bbox": [50, 50, 40, 40],
         "area": 1600, "iscrowd": 0, "segmentation": [[50, 50, 90, 50, 90, 90, 50, 90]]},
        {"id": 3, "image_id": 2, "category_id": 9, "bbox": [0, 0, 50, 30],
         "area": 1500, "iscrowd": 0, "segmentation": [[0, 0, 50, 0, 50, 30, 0, 30]]},
    ]
    return {"images": images, "categories": cats, "annotations": anns}


def test_lite_cocoeval_perfect_predictions():
    gt = COCOGroundTruth(_toy_gt())
    results = [
        {"image_id": 1, "category_id": 7, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 7, "bbox": [50, 50, 40, 40], "score": 0.8},
        {"image_id": 2, "category_id": 9, "bbox": [0, 0, 50, 30], "score": 0.95},
    ]
    stats = LiteCOCOeval(gt, results, "bbox").summarize()
    assert stats[0] == 1.0 and stats[1] == 1.0 and stats[2] == 1.0  # AP, AP50, AP75
    assert stats[8] == 1.0  # AR100


def test_lite_cocoeval_false_positive_lowers_ap():
    gt = COCOGroundTruth(_toy_gt())
    results = [
        {"image_id": 1, "category_id": 7, "bbox": [10, 10, 20, 20], "score": 0.9},
        # high-scoring FP
        {"image_id": 1, "category_id": 7, "bbox": [0, 70, 10, 10], "score": 0.99},
        {"image_id": 1, "category_id": 7, "bbox": [50, 50, 40, 40], "score": 0.8},
        {"image_id": 2, "category_id": 9, "bbox": [0, 0, 50, 30], "score": 0.95},
    ]
    stats = LiteCOCOeval(gt, results, "bbox").summarize()
    assert 0.3 < stats[0] < 1.0


def test_lite_cocoeval_localization_quality():
    gt = COCOGroundTruth(_toy_gt())
    # ~0.58-IoU box: matches at t=0.5/0.55 only
    results = [
        {"image_id": 1, "category_id": 7, "bbox": [13, 13, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 7, "bbox": [50, 50, 40, 40], "score": 0.8},
        {"image_id": 2, "category_id": 9, "bbox": [0, 0, 50, 30], "score": 0.95},
    ]
    stats = LiteCOCOeval(gt, results, "bbox").summarize()
    assert stats[1] == 1.0  # AP50 still perfect
    assert stats[2] < 1.0  # AP75 degraded
    assert stats[0] < 1.0


def test_lite_cocoeval_segm():
    gt = COCOGroundTruth(_toy_gt())

    def box_mask(x, y, w, h):
        m = np.zeros((100, 100), np.uint8)
        m[y:y + h, x:x + w] = 1
        return rle.encode(m)

    results = [
        {"image_id": 1, "category_id": 7, "segmentation": box_mask(10, 10, 21, 21), "score": 0.9},
        {"image_id": 1, "category_id": 7, "segmentation": box_mask(50, 50, 41, 41), "score": 0.8},
        {"image_id": 2, "category_id": 9, "segmentation": box_mask(0, 0, 51, 31), "score": 0.95},
    ]
    stats = LiteCOCOeval(gt, results, "segm").summarize()
    assert stats[0] > 0.9  # near-perfect masks (cv2 polygon fill is inclusive)


def test_recover_shape_bbox_inverse():
    """Letterbox inverse: a padded-resized box maps back to original pixels."""
    info = {"id": 1, "height": 480, "width": 640,
            "pad": (32, 32, 0, 0, 544, 544)}  # top, down, left, right, h, w
    # original box center (320, 240), size (100, 60) -> normalized in padded 544
    # forward mapping: nw=544, nh=480 scaled into 544x544 with 32px top/bottom pad
    bx = 320 / 640
    by = (240 / 480 * 480 + 32) / 544
    bw = 100 / 640 * 544 / 544
    bh = 60 / 480 * 480 / 544
    out = COCOMetrics._recover_shape_bbox(
        np.array([[bx, by, bw, bh]], np.float32), info
    )
    np.testing.assert_allclose(out[0], [320 - 50, 240 - 30, 100, 60], atol=1e-3)


def test_recover_shape_flip_inverts_before_pad():
    """The forward pipeline pads (inside Resize) THEN flips, so the inverse
    must unflip BEFORE unpadding; with asymmetric padding the orders differ
    by (right-left)/nw per box (regression: reference order unpads first)."""
    oh, ow = 100, 200
    left, right = 30, 14  # asymmetric horizontal pad inside a 544-wide canvas
    w = h = 544
    nw, nh = w - left - right, h
    info = {"id": 1, "height": oh, "width": ow,
            "pad": (0, 0, left, right, h, w), "hflip": True}
    # original box center (60, 50), size (40, 30): forward = scale into the
    # (nw, nh) content, shift by the pad offset, then mirror in the canvas
    bx = 1.0 - (60 / ow * nw + left) / w
    by = 50 / oh
    bw, bh = 40 / ow * nw / w, 30 / oh * nh / h
    out = COCOMetrics._recover_shape_bbox(
        np.array([[bx, by, bw, bh]], np.float32), info
    )
    np.testing.assert_allclose(out[0], [60 - 20, 50 - 15, 40, 30], atol=1e-3)

    # mask leg: a content block must land centered on the same original pixel
    # (a block, not one pixel — the 544->200 bilinear downscale would wash
    # out a single marker below the 0.5 rounding threshold)
    mask = np.zeros((1, h, w), bool)
    # original (x=60, y=50) -> content x = 60/ow*nw + left, then mirrored
    fx = int(round(60 / ow * nw)) + left
    fy = int(round(50 / oh * nh))
    mask[0, fy - 10:fy + 11, w - 1 - fx - 10:w - fx + 10] = True
    rec = COCOMetrics._recover_shape_segm(mask, info)
    ys, xs = np.nonzero(rec[0])
    assert xs.size and abs(xs.mean() - 60) <= 2 and abs(ys.mean() - 50) <= 2


def test_coco_shard_merge(tmp_path):
    """Multi-host COCO result sharding: save/merge through json files
    (reference trainer/trainer.py:175-181 protocol)."""
    m1 = COCOMetrics(gt_file=None, cat2label=[1, 2], with_mask=True,
                     save_dir=str(tmp_path))
    m2 = COCOMetrics(gt_file=None, cat2label=[1, 2], with_mask=True,
                     save_dir=str(tmp_path))
    det = {"bbox": np.array([[0.5, 0.5, 0.2, 0.2, 0.9]], np.float32),
           "mask": np.ones((1, 32, 32), bool),
           "cls": np.array([0])}
    info = [{"id": 7, "height": 64, "width": 64}]
    m1.update_results(m1.to_coco_format(info, [det]))
    info2 = [{"id": 8, "height": 64, "width": 64}]
    m2.update_results(m2.to_coco_format(info2, [det]))

    shard = str(tmp_path / "shard.json")
    m2.save_as_json(shard)
    m1.update_from_json(shard)
    assert len(m1.bbox_results) == 2
    assert {r["image_id"] for r in m1.bbox_results} == {7, 8}
    assert len(m1.segm_results) == 2


def test_pad_skip_in_to_coco_format():
    m = COCOMetrics(gt_file=None, cat2label=[1], with_mask=False, save_dir=".")
    det = {"bbox": np.array([[0.5, 0.5, 0.2, 0.2, 0.9]], np.float32),
           "cls": np.array([0])}
    infos = [{"id": 1, "height": 64, "width": 64},
             {"id": 1, "height": 64, "width": 64, "_pad": True}]
    out = m.to_coco_format(infos, [det, det])
    assert len(out["bbox"]) == 1  # padded eval sample skipped
