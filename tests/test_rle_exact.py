"""pycocotools-exact mask primitive tests (VERDICT r1 item 3).

Two independent implementations of the crossing-based polygon rasterizer
(rleFrPoly), run-sweep merge and RLE-space IoU — numpy (eval/rle.py) and C++
(native/src/omtpu.cc) — are cross-checked on adversarial inputs (thin
triangles, shared edges, out-of-bounds vertices, degenerate polygons), and
checked against hand-derived pycocotools ground truth on axis-aligned shapes
(where frPoly's output is the documented half-open pixel block whose area
matches the COCO ann['area'] convention).

Reference behavior: pycocotools GT decode at reference data/dataset.py:87-100
and RLE ops at reference eval/coco_eval.py:108-127.
"""

import numpy as np
import pytest

from orienmask_tpu import native
from orienmask_tpu.eval import rle


def _numpy_poly_counts(polys, h, w):
    return rle.merge_counts(
        [rle.poly_to_rle_counts(p, h, w) for p in polys], h, w)


def _rect_poly(x0, y0, x1, y1):
    return [x0, y0, x1, y0, x1, y1, x0, y1]


# ------------------------------------------------------- ground-truth shapes

def test_axis_aligned_rect_is_half_open_block():
    # frPoly of [x0,y0]..[x1,y1] fills [y0:y1, x0:x1] — area (x1-x0)*(y1-y0)
    m = rle.polygons_to_mask([_rect_poly(2, 1, 7, 4)], 10, 12)
    expect = np.zeros((10, 12), np.uint8)
    expect[1:4, 2:7] = 1
    np.testing.assert_array_equal(m, expect)


def test_full_image_rect():
    m = rle.polygons_to_mask([_rect_poly(0, 0, 6, 5)], 5, 6)
    np.testing.assert_array_equal(m, np.ones((5, 6), np.uint8))


def test_rect_clipped_to_image():
    # vertices far outside the canvas: fill clamps to the image
    m = rle.polygons_to_mask([_rect_poly(-10, -10, 100, 100)], 7, 9)
    np.testing.assert_array_equal(m, np.ones((7, 9), np.uint8))


def test_shared_edge_rectangles_tile_exactly():
    # [0..4] and [4..8]: the shared edge x=4 belongs to exactly one side —
    # together they tile [0:8] with no gap and no double-count
    a = rle.polygons_to_mask([_rect_poly(0, 0, 4, 6)], 6, 8)
    b = rle.polygons_to_mask([_rect_poly(4, 0, 8, 6)], 6, 8)
    assert int(a.sum()) == 24 and int(b.sum()) == 24
    np.testing.assert_array_equal(a | b, np.ones((6, 8), np.uint8))
    assert not np.any(a & b)


def test_thin_triangle_nonempty_and_bounded():
    # a 1-pixel-high sliver: crossing-based fill keeps it within its bbox
    m = rle.polygons_to_mask([[0, 0, 20, 0, 20, 1.2]], 8, 24)
    assert m.sum() > 0
    ys, xs = np.nonzero(m)
    assert ys.max() <= 1 and xs.max() <= 20


def test_degenerate_polygons_empty():
    # < 3 distinct points: crossings cancel -> empty mask
    assert rle.polygons_to_mask([[3, 3, 3, 3, 3, 3]], 8, 8).sum() == 0
    assert rle.polygons_to_mask([], 8, 8).sum() == 0


def test_multi_polygon_union():
    m = rle.polygons_to_mask(
        [_rect_poly(0, 0, 3, 3), _rect_poly(2, 2, 5, 5)], 6, 6)
    expect = np.zeros((6, 6), np.uint8)
    expect[0:3, 0:3] = 1
    expect[2:5, 2:5] = 1
    np.testing.assert_array_equal(m, expect)


# --------------------------------------------- native == numpy property test

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fr_poly_native_matches_numpy_fuzz(seed):
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(seed)
    for _ in range(120):
        h, w = int(rng.integers(3, 48)), int(rng.integers(3, 48))
        n_polys = int(rng.integers(1, 4))
        polys = []
        for _ in range(n_polys):
            k = int(rng.integers(3, 10))
            polys.append(rng.uniform(-3, max(h, w) + 3, 2 * k).tolist())
        c_np = _numpy_poly_counts(polys, h, w)
        c_cc = native.poly_merge_counts(polys, h, w)
        np.testing.assert_array_equal(c_np, c_cc)
        # counts are a valid RLE: non-negative alternating runs summing <= h*w
        assert (c_np >= 0).all() and int(c_np.sum()) <= h * w


def test_thin_adversarial_slivers_native_matches_numpy():
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    cases = [
        [0, 0, 30, 0.4, 0, 0.8],                 # near-horizontal sliver
        [0.5, 0, 0.9, 30, 0.1, 30],              # near-vertical sliver
        [0, 0, 10, 10, 0, 10, 10, 0],            # self-intersecting bowtie
        [5.4999, 5.4999, 5.5001, 5.4999, 5.5001, 5.5001],  # sub-pixel
        [2, 2, 2, 2, 8, 8],                      # repeated vertex
    ]
    for poly in cases:
        for h, w in [(16, 16), (33, 17)]:
            np.testing.assert_array_equal(
                _numpy_poly_counts([poly], h, w),
                native.poly_merge_counts([poly], h, w))


# ----------------------------------------------------------- RLE-space ops

def test_iou_rle_space_matches_decoded(seed=3):
    rng = np.random.default_rng(seed)
    for _ in range(25):
        h, w = int(rng.integers(4, 40)), int(rng.integers(4, 40))
        na, nb = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        ra = [rle.encode((rng.random((h, w)) < rng.uniform(0.05, 0.7)).astype(np.uint8))
              for _ in range(na)]
        rb = [rle.encode((rng.random((h, w)) < rng.uniform(0.05, 0.7)).astype(np.uint8))
              for _ in range(nb)]
        crowd = rng.integers(0, 2, nb).tolist()
        got = rle.iou(ra, rb, crowd)
        ma = [rle.decode(r).astype(bool) for r in ra]
        mb = [rle.decode(r).astype(bool) for r in rb]
        exp = np.zeros((na, nb))
        for i in range(na):
            for j in range(nb):
                inter = int((ma[i] & mb[j]).sum())
                uni = int(ma[i].sum()) if crowd[j] else \
                    int(ma[i].sum()) + int(mb[j].sum()) - inter
                exp[i, j] = inter / uni if uni else 0.0
        np.testing.assert_allclose(got, exp, atol=1e-12)


def test_iou_numpy_fallback_matches_native(monkeypatch):
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    h = w = 24
    ra = [rle.encode((rng.random((h, w)) < 0.3).astype(np.uint8)) for _ in range(3)]
    rb = [rle.encode((rng.random((h, w)) < 0.3).astype(np.uint8)) for _ in range(4)]
    got_native = rle.iou(ra, rb, [0, 1, 0, 1])
    monkeypatch.setattr(native, "rle_iou", lambda *a, **k: None)
    got_numpy = rle.iou(ra, rb, [0, 1, 0, 1])
    np.testing.assert_allclose(got_native, got_numpy, atol=1e-12)


def test_to_bbox_rle_space():
    m = np.zeros((10, 12), np.uint8)
    m[2:7, 3:9] = 1
    bb = rle.to_bbox(rle.encode(m))
    np.testing.assert_array_equal(bb, [3, 2, 6, 5])
    # multi-column run forces full y extent (pycocotools rleToBbox quirk)
    assert rle.to_bbox(rle.encode(np.ones((4, 4), np.uint8)))[3] == 4
    np.testing.assert_array_equal(rle.to_bbox(rle.encode(np.zeros((4, 4), np.uint8))),
                                  np.zeros(4))


def test_merge_intersect():
    a = rle.polygons_to_mask([_rect_poly(0, 0, 4, 4)], 6, 6)
    b = rle.polygons_to_mask([_rect_poly(2, 2, 6, 6)], 6, 6)
    ca = rle.merge_counts([rle._mask_to_counts(a)], 6, 6)
    cb = rle.merge_counts([rle._mask_to_counts(b)], 6, 6)
    inter = rle.merge_counts([ca, cb], 6, 6, intersect=True)
    np.testing.assert_array_equal(rle._counts_to_mask(inter, 6, 6), a & b)


def test_area_consistency_with_coco_convention():
    # ann['area'] in COCO json equals the frPoly mask area
    poly = _rect_poly(10, 10, 30, 30)
    r = rle.polygons_to_rle([poly], 100, 100)
    assert rle.area(r) == 400
