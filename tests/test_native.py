"""Native C++ kernels vs python/numpy references."""

import numpy as np
import pytest

from orienmask_tpu import native
from orienmask_tpu.eval import rle


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_rle_matches_python(lib):
    rng = np.random.default_rng(0)
    for shape in [(5, 7), (64, 64), (544, 544)]:
        mask = (rng.random(shape) > 0.5).astype(np.uint8)
        got = native.rle_encode(mask)
        expect = rle._counts_to_string(rle._mask_to_counts(mask))
        assert got == expect
        np.testing.assert_array_equal(
            rle.decode({"size": list(shape), "counts": got}), mask
        )


def test_native_rle_batch(lib):
    rng = np.random.default_rng(1)
    masks = (rng.random((6, 32, 48)) > 0.7).astype(np.uint8)
    rles = rle.encode_batch(masks)
    assert len(rles) == 6
    for r, m in zip(rles, masks):
        np.testing.assert_array_equal(rle.decode(r), m)


def test_native_nms_matches_numpy(lib):
    rng = np.random.default_rng(2)
    n = 128
    dets = np.stack([
        rng.uniform(0, 1, n), rng.uniform(0, 1, n),
        rng.uniform(0.05, 0.4, n), rng.uniform(0.05, 0.4, n),
        rng.uniform(0, 1, n),
    ], axis=1).astype(np.float32)
    got = native.nms(dets, 0.5)
    expect = native._np_nms(dets, 0.5)
    np.testing.assert_array_equal(got, expect)


def test_native_resize_matches_cv2(lib):
    import cv2

    rng = np.random.default_rng(3)
    img = rng.random((37, 53, 3)).astype(np.float32)
    got = native.resize_bilinear(img, 96, 128)
    expect = cv2.resize(img, (128, 96), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_native_coco_match_parity(lib):
    """om_coco_match vs an independent Python transcription of the COCOeval
    greedy matching spec (the same loop lite_cocoeval falls back to),
    on randomized IoU grids with ties, crowds, and ignored gts."""
    rng = np.random.default_rng(7)
    thrs = np.linspace(0.5, 0.95, 10)
    for trial in range(40):
        nd = int(rng.integers(1, 12))
        ng = int(rng.integers(1, 10))
        # quantized IoUs force exact-tie code paths
        ious = rng.integers(0, 8, (nd, ng)).astype(np.float64) / 7.0
        iscrowd = (rng.random(ng) < 0.25).astype(np.uint8)
        g_ignore = (rng.random(ng) < 0.3) | iscrowd.astype(bool)
        g_order = np.argsort(g_ignore, kind="stable")
        gi = g_ignore[g_order]

        got = native.coco_match(ious, g_order, gi, iscrowd, thrs)
        assert got is not None
        got_m, got_ig = got

        nt = len(thrs)
        dt_m = -np.ones((nt, nd), np.int64)
        gt_m = -np.ones((nt, ng), np.int64)
        dt_ig = np.zeros((nt, nd), bool)
        for ti, t in enumerate(thrs):
            for di in range(nd):
                best = min(t, 1 - 1e-10)
                m = -1
                for sj in range(ng):
                    gj = g_order[sj]
                    if gt_m[ti, sj] >= 0 and not iscrowd[gj]:
                        continue
                    if m > -1 and not gi[m] and gi[sj]:
                        break
                    if ious[di, gj] < best:
                        continue
                    best = ious[di, gj]
                    m = sj
                if m == -1:
                    continue
                dt_ig[ti, di] = gi[m]
                dt_m[ti, di] = m
                gt_m[ti, m] = di

        np.testing.assert_array_equal(got_m, dt_m)
        np.testing.assert_array_equal(got_ig, dt_ig)
