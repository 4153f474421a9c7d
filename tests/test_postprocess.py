"""Static-shape XLA postprocess vs the sequential numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from orienmask_tpu.config.base import ANCHORS_YOLOV4, ANCHORS_MASK
from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess
from orienmask_tpu.ops.nms import nms_keep_mask

from numpy_ref import reference_postprocess, greedy_nms

# Small geometry for test speed: 160x160 image, grids 5/10/20.
IMAGE = (160, 160)
GRIDS = [[5, 5], [10, 10], [20, 20]]
NUM_CLASSES = 12


def _random_predictions(seed, sharpen=2.0):
    """Raw NHWC model outputs for one image: 3x (bbox, orien)."""
    rng = np.random.default_rng(seed)
    preds = []
    for (nh, nw), mask in zip(GRIDS, ANCHORS_MASK):
        na = len(mask)
        bbox = rng.standard_normal((nh, nw, na * (5 + NUM_CLASSES))).astype(np.float32)
        # push obj/cls logits up a bit so a realistic number pass conf_thresh
        bbox = bbox * sharpen
        orien = rng.standard_normal((IMAGE[0] // 4, IMAGE[1] // 4, na * 2)).astype(np.float32)
        preds.append((bbox, orien))
    return preds


def _make_pp(topk_mode="exact", conf_thresh=0.2):
    return OrienMaskYOLOPostProcess(
        grid_size=GRIDS,
        image_size=list(IMAGE),
        anchors=ANCHORS_YOLOV4,
        anchor_mask=ANCHORS_MASK,
        num_classes=NUM_CLASSES,
        conf_thresh=conf_thresh,
        nms=dict(type="batched_nms", threshold=0.5),
        nms_pre=50,
        nms_post=20,
        orien_thresh=0.3,
        topk_mode=topk_mode,
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("topk_mode", ["exact", "twostage"])
def test_postprocess_matches_oracle(seed, topk_mode):
    preds = _random_predictions(seed)
    pp = _make_pp(topk_mode)
    batch = [(jnp.asarray(b)[None], jnp.asarray(o)[None]) for b, o in preds]
    got = pp(batch)[0]

    ref = reference_postprocess(
        preds, GRIDS, IMAGE, ANCHORS_YOLOV4, ANCHORS_MASK, NUM_CLASSES,
        conf_thresh=0.2, nms_thresh=0.5, nms_pre=50, nms_post=20, orien_thresh=0.3,
    )

    assert got["bbox"].shape[0] == ref["bbox"].shape[0], "detection count mismatch"
    np.testing.assert_allclose(got["bbox"], ref["bbox"], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got["cls"], ref["cls"])
    # Masks: allow a handful of boundary pixels to differ (float assoc. in upsample)
    if ref["mask"].shape[0]:
        diff = got["mask"] ^ ref["mask"]
        frac = diff.mean()
        assert frac < 1e-4, f"mask pixel mismatch fraction {frac}"


def test_no_detections():
    preds = _random_predictions(3, sharpen=1.0)
    # suppress everything: huge negative obj logits
    preds = [((b - 100.0), o) for b, o in preds]
    pp = _make_pp()
    batch = [(jnp.asarray(b)[None], jnp.asarray(o)[None]) for b, o in preds]
    got = pp(batch)[0]
    assert got["bbox"].shape[0] == 0
    assert got["mask"].shape[0] == 0


def test_full_nms_keep_mask_matches_sequential():
    rng = np.random.default_rng(7)
    n = 64
    boxes = np.stack([
        rng.uniform(0, 1, n), rng.uniform(0, 1, n),
        rng.uniform(0.05, 0.4, n), rng.uniform(0.05, 0.4, n),
    ], axis=1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    keep_ref = greedy_nms(boxes.astype(np.float64), scores.astype(np.float64), 0.5)
    keep_got = np.flatnonzero(np.asarray(
        nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5)
    ))
    np.testing.assert_array_equal(keep_got, keep_ref)


def test_packed_masks_roundtrip():
    preds = _random_predictions(0)
    pp_plain = _make_pp()
    pp_packed = _make_pp()
    pp_packed.pack_masks = True
    import jax
    pp_packed._apply_batch = jax.jit(pp_packed._run_batch)  # retrace with flag set
    batch = [(jnp.asarray(b)[None], jnp.asarray(o)[None]) for b, o in preds]
    got_plain = pp_plain(batch)[0]
    got_packed = pp_packed(batch)[0]
    np.testing.assert_array_equal(got_packed["mask"], got_plain["mask"])


def test_fixpoint_equals_sequential_select():
    """Fixpoint NMS must match the sequential greedy selection exactly."""
    from orienmask_tpu.ops.nms import (
        NEG_INF, greedy_nms_fixpoint, greedy_nms_select,
    )

    rng = np.random.default_rng(11)
    for trial in range(5):
        n = 200
        boxes = np.stack([
            rng.uniform(0, 1, n), rng.uniform(0, 1, n),
            rng.uniform(0.02, 0.5, n), rng.uniform(0.02, 0.5, n),
        ], axis=1).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        scores[rng.random(n) < 0.2] = NEG_INF  # some invalid
        a_idx, a_valid = greedy_nms_select(
            jnp.asarray(boxes), jnp.asarray(scores), 50, 0.5)
        b_idx, b_valid = greedy_nms_fixpoint(
            jnp.asarray(boxes), jnp.asarray(scores), 50, 0.5)
        np.testing.assert_array_equal(np.asarray(a_valid), np.asarray(b_valid))
        nv = int(np.asarray(a_valid).sum())
        np.testing.assert_array_equal(
            np.asarray(a_idx)[:nv], np.asarray(b_idx)[:nv], err_msg=f"trial {trial}")


def test_fixpoint_presorted_identity():
    """presorted=True on descending scores must equal the general path
    bit-for-bit, ties included (argsort is stable -> identity on sorted
    input).  This is the contract _detect_image relies on: its NMS input is
    the output of a top-k (descending), with the invalid tail at NEG_INF."""
    from orienmask_tpu.ops.nms import NEG_INF, greedy_nms_fixpoint

    rng = np.random.default_rng(13)
    for trial in range(3):
        n = 150
        boxes = np.stack([
            rng.uniform(0, 1, n), rng.uniform(0, 1, n),
            rng.uniform(0.02, 0.5, n), rng.uniform(0.02, 0.5, n),
        ], axis=1).astype(np.float32)
        # descending with heavy ties and a NEG_INF tail, like the detect feed
        scores = np.sort(rng.choice([0.9, 0.5, 0.5, 0.1], n))[::-1].copy()
        scores[-30:] = NEG_INF
        scores = scores.astype(np.float32)
        a_idx, a_valid = greedy_nms_fixpoint(
            jnp.asarray(boxes), jnp.asarray(scores), 50, 0.5)
        b_idx, b_valid = greedy_nms_fixpoint(
            jnp.asarray(boxes), jnp.asarray(scores), 50, 0.5, presorted=True)
        np.testing.assert_array_equal(np.asarray(a_valid), np.asarray(b_valid))
        np.testing.assert_array_equal(np.asarray(a_idx), np.asarray(b_idx),
                                      err_msg=f"trial {trial}")


def test_topk_split_bitexact_with_ties():
    """_topk_split must equal lax.top_k bit-for-bit — values AND indices —
    including heavy-tie inputs (quantized scores) and every nsplit/odd-length
    combination both selection stages use (stage-1 18207-element det scores,
    stage-2 32000-element pair scores)."""
    import jax

    rng = np.random.default_rng(5)
    for n, k, nsplit in [(18207, 400, 2), (32000, 400, 2), (1001, 400, 3),
                         (4096, 128, 4), (401, 400, 2)]:
        for tie in (False, True):
            x = rng.standard_normal(n).astype(np.float32)
            if tie:
                x = np.round(x * 4) / 4  # many exact duplicates
            xv = jnp.asarray(x)
            ref_v, ref_i = jax.lax.top_k(xv, k)
            v, i = OrienMaskYOLOPostProcess._topk_split(xv, k, nsplit=nsplit)
            np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(v))
            np.testing.assert_array_equal(
                np.asarray(ref_i), np.asarray(i),
                err_msg=f"n={n} k={k} nsplit={nsplit} tie={tie}")


def test_native_gather_detect_bitexact_vs_flat_buffer():
    """The twostage ``_detect_image`` path (native-layout score reduction +
    ``_gather_rows``, no transposed (P, 5+C) buffer) must be BIT-identical to
    the flat-buffer formulation (``_flat_head`` + ``_select_candidates`` +
    ``flat[det_idx]`` decode) — same elements, same op order, same flatten
    order for tie-breaks."""
    import jax

    pp = _make_pp("twostage")
    for seed in (0, 1, 7):
        preds = _random_predictions(seed)
        pred_bboxes = [jnp.asarray(b) for b, _ in preds]

        got = jax.jit(pp._detect_image)(pred_bboxes)

        def flat_path(pbs):
            flat = pp._flat_head(pbs)
            det_idx, cls_idx, scores, valid = pp._select_candidates(flat)
            from orienmask_tpu.ops.nms import NEG_INF, batched_class_nms
            cand_boxes = pp._decode_rows(flat[det_idx], det_idx)
            cand_anchor = jnp.asarray(pp.det_anchor_idx)[det_idx]
            nms_scores = jnp.where(valid, scores, NEG_INF)
            keep_idx, keep_valid = batched_class_nms(
                cand_boxes, nms_scores, cls_idx, pp.nms_post, pp.nms_threshold)
            boxes = cand_boxes[keep_idx]
            out_scores = jnp.where(keep_valid, scores[keep_idx], 0.0)
            return {
                "bbox": jnp.concatenate([boxes, out_scores[:, None]], axis=1),
                "cls": cls_idx[keep_idx].astype(jnp.int32),
                "anchor": cand_anchor[keep_idx],
                "valid": keep_valid,
            }

        ref = jax.jit(flat_path)(pred_bboxes)
        for key in ("bbox", "cls", "anchor", "valid"):
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(ref[key]),
                err_msg=f"seed={seed} key={key}")
