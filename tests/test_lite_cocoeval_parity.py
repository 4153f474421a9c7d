"""LiteCOCOeval adversarial parity suite (VERDICT r1 item 4, r2 task 4).

``eval/lite_cocoeval.py`` is the instrument every reported AP is measured
with, so it is cross-checked here against a from-scratch oracle implemented
directly from the COCOeval specification (pycocotools cocoeval.py semantics:
greedy score-ordered matching per (image, category, areaRng) at 10 IoU
thresholds, crowd may match many dets, ignored-gt tail break, unmatched dets
outside the area range ignored, 101-point interpolated precision, stable
mergesorts). The oracle shares NO code with the evaluated module: masks are
generated as explicit dense bitmaps which the oracle consumes directly; the
module under test receives them as list-form RLE produced by the test's own
independent column-major encoder (the module's polygon rasterizer is
exercised separately in tests/test_rle_exact.py, numpy-vs-C++, and is
deliberately kept OUT of this oracle's input path).

Corpus: randomized images with crowd anns, area-boundary sizes (straddling
the 32^2 / 96^2 thresholds), duplicate detections, exact score ties,
cross-category noise, >MAX_DETS detections per (image, category) (the
truncation boundary at lite_cocoeval MAX_DETS), and list-form RLE GT whose
counts sum short of h*w (implicit trailing zero run).
"""

import numpy as np
import pytest

from orienmask_tpu.eval import rle
from orienmask_tpu.eval.lite_cocoeval import (
    AREA_KEYS, AREA_RNG, IOU_THRS, MAX_DETS, REC_THRS,
    COCOGroundTruth, LiteCOCOeval,
)

H, W = 160, 200


# ----------------------------------------------- independent RLE codec
# (test-local, shares nothing with orienmask_tpu.eval.rle)

def _indep_encode(mask, drop_trailing_zero=False):
    """Dense bool mask -> COCO list-form counts (column-major, starts with
    the zero run).  ``drop_trailing_zero`` omits a final zero run: valid
    COCO RLE (counts may sum short of h*w, remainder implicitly zero)."""
    flat = np.asarray(mask, np.uint8).ravel(order="F")
    change = np.flatnonzero(np.diff(flat)) + 1
    idx = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(idx).astype(int).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    if drop_trailing_zero and len(counts) % 2 == 1 and len(counts) > 1:
        counts = counts[:-1]  # odd length => last run is zeros
    return counts


def _indep_decode(seg, h, w):
    """COCO list-form RLE -> dense bool mask, zero-filling short counts."""
    counts = np.asarray(seg["counts"], np.int64)
    vals = (np.arange(len(counts)) % 2).astype(np.uint8)
    flat = np.repeat(vals, counts)
    if flat.size < h * w:
        flat = np.concatenate([flat, np.zeros(h * w - flat.size, np.uint8)])
    return flat.reshape((h, w), order="F").astype(bool)


# --------------------------------------------------------------- the oracle

def _oracle_eval(gt_data, results, iou_type):
    """Naive reference COCOeval: dense masks, explicit loops everywhere."""
    images = {im["id"]: im for im in gt_data["images"]}
    cat_ids = sorted(c["id"] for c in gt_data["categories"])
    nt, nr = len(IOU_THRS), len(REC_THRS)
    nk, na, nm = len(cat_ids), len(AREA_KEYS), len(MAX_DETS)
    precision = -np.ones((nt, nr, nk, na, nm))
    recall = -np.ones((nt, nk, na, nm))

    def ann_mask(ann):
        if "_dense" in ann:  # corpus keeps the generating bitmap
            return ann["_dense"]
        im = images[ann["image_id"]]
        return _indep_decode(ann["segmentation"], im["height"], im["width"])

    def det_mask(det):
        if "_dense" in det:
            return det["_dense"]
        im = images[det["image_id"]]
        return _indep_decode(det["segmentation"], im["height"], im["width"])

    def box_iou(d, g, crowd):
        dx0, dy0, dw, dh = d
        gx0, gy0, gw, gh = g
        iw = min(dx0 + dw, gx0 + gw) - max(dx0, gx0)
        ih = min(dy0 + dh, gy0 + gh) - max(dy0, gy0)
        if iw <= 0 or ih <= 0:
            return 0.0
        inter = iw * ih
        union = dw * dh if crowd else dw * dh + gw * gh - inter
        return inter / union if union > 0 else 0.0

    def mask_iou(dm, gm, crowd):
        inter = np.logical_and(dm, gm).sum()
        union = dm.sum() if crowd else dm.sum() + gm.sum() - inter
        return inter / union if union > 0 else 0.0

    for ki, cat in enumerate(cat_ids):
        # per-(image, areaRng): match, then accumulate across images
        per_area = {ak: {"scores": [], "tp": [], "ig": []} for ak in AREA_KEYS}
        npig = {ak: 0 for ak in AREA_KEYS}
        for im in gt_data["images"]:
            img = im["id"]
            gts = [a for a in gt_data["annotations"]
                   if a["image_id"] == img and a["category_id"] == cat]
            dts = [d for d in results
                   if d["image_id"] == img and d["category_id"] == cat]
            if not gts and not dts:
                continue
            order = sorted(range(len(dts)), key=lambda i: -dts[i]["score"])
            order = order[: MAX_DETS[-1]]
            dts = [dts[i] for i in order]
            if iou_type == "bbox":
                dgeo = [d["bbox"] for d in dts]
                ggeo = [g["bbox"] for g in gts]
                dareas = [d["bbox"][2] * d["bbox"][3] for d in dts]
                iou_fn = box_iou
            else:
                dgeo = [det_mask(d) for d in dts]
                ggeo = [ann_mask(g) for g in gts]
                dareas = [int(m.sum()) for m in dgeo]
                iou_fn = mask_iou
            for ak in AREA_KEYS:
                lo, hi = AREA_RNG[ak]
                gig = [bool(g.get("iscrowd", 0)) or not (lo <= g["area"] <= hi)
                       for g in gts]
                gorder = sorted(range(len(gts)), key=lambda i: gig[i])
                npig[ak] += sum(1 for x in gig if not x)
                tp = np.zeros((nt, len(dts)), bool)
                ig = np.zeros((nt, len(dts)), bool)
                for ti, t in enumerate(IOU_THRS):
                    gmatched = [False] * len(gts)
                    for di in range(len(dts)):
                        best = min(t, 1 - 1e-10)
                        m = -1
                        for gj in gorder:
                            if gmatched[gj] and not gts[gj].get("iscrowd", 0):
                                continue
                            if m > -1 and not gig[m] and gig[gj]:
                                break
                            iou = iou_fn(dgeo[di], ggeo[gj],
                                         gts[gj].get("iscrowd", 0))
                            if iou < best:
                                continue
                            best = iou
                            m = gj
                        if m == -1:
                            if dareas[di] < lo or dareas[di] > hi:
                                ig[ti, di] = True
                            continue
                        gmatched[m] = True
                        tp[ti, di] = not gig[m]
                        ig[ti, di] = gig[m]
                per_area[ak]["scores"].append(
                    np.array([d["score"] for d in dts]))
                per_area[ak]["tp"].append(tp)
                per_area[ak]["ig"].append(ig)
        for ai, ak in enumerate(AREA_KEYS):
            if npig[ak] == 0:
                continue
            for mi, md in enumerate(MAX_DETS):
                scores = np.concatenate(
                    [s[:md] for s in per_area[ak]["scores"]]
                ) if per_area[ak]["scores"] else np.zeros(0)
                tps = np.concatenate(
                    [t[:, :md] for t in per_area[ak]["tp"]], axis=1
                ) if per_area[ak]["tp"] else np.zeros((nt, 0), bool)
                igs = np.concatenate(
                    [g[:, :md] for g in per_area[ak]["ig"]], axis=1
                ) if per_area[ak]["ig"] else np.zeros((nt, 0), bool)
                srt = np.argsort(-scores, kind="mergesort")
                tps, igs = tps[:, srt], igs[:, srt]
                for ti in range(nt):
                    keep = ~igs[ti]
                    tp = np.cumsum(tps[ti][keep]).astype(float)
                    fp = np.cumsum((~tps[ti])[keep]).astype(float)
                    nd = len(tp)
                    rc = tp / npig[ak]
                    pr = tp / np.maximum(tp + fp, np.finfo(float).eps)
                    recall[ti, ki, ai, mi] = rc[-1] if nd else 0.0
                    prl = list(pr)
                    for i in range(nd - 1, 0, -1):
                        prl[i - 1] = max(prl[i - 1], prl[i])
                    q = np.zeros(nr)
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds):
                        if pi < nd:
                            q[ri] = prl[pi]
                    precision[ti, :, ki, ai, mi] = q
    return precision, recall


def _stats_from(precision, recall):
    def ap(iou=None, area="all", md=100):
        ai, mi = AREA_KEYS.index(area), MAX_DETS.index(md)
        s = precision[:, :, :, ai, mi]
        if iou is not None:
            s = s[[int(round((iou - 0.5) / 0.05))]]
        s = s[s > -1]
        return float(s.mean()) if s.size else -1.0

    def ar(area="all", md=100):
        ai, mi = AREA_KEYS.index(area), MAX_DETS.index(md)
        s = recall[:, :, ai, mi]
        s = s[s > -1]
        return float(s.mean()) if s.size else -1.0

    return np.array([
        ap(), ap(iou=0.5), ap(iou=0.75), ap(area="small"), ap(area="medium"),
        ap(area="large"), ar(md=1), ar(md=10), ar(md=100), ar(area="small"),
        ar(area="medium"), ar(area="large"),
    ])


# ------------------------------------------------------------- corpus maker

def _blob_mask(rng, x0, y0, bw, bh):
    """Dense bitmap inside box (x0,y0,bw,bh): rectangle or ellipse, the
    independent generating geometry kept for the oracle."""
    m = np.zeros((H, W), bool)
    if rng.random() < 0.5:
        m[int(y0):int(y0 + bh), int(x0):int(x0 + bw)] = True
    else:
        ys, xs = np.mgrid[0:H, 0:W]
        cx, cy = x0 + bw / 2, y0 + bh / 2
        m = ((xs - cx) / max(bw / 2, 1)) ** 2 + \
            ((ys - cy) / max(bh / 2, 1)) ** 2 <= 1.0
    return m


def _attach_seg(rng, d, mask):
    """Give the module list-form RLE from the independent encoder (sometimes
    with the trailing zero run dropped: counts sum short of h*w), keep the
    dense bitmap for the oracle."""
    short = bool(rng.random() < 0.3)
    d["segmentation"] = {"size": [H, W],
                         "counts": _indep_encode(mask, drop_trailing_zero=short)}
    d["_dense"] = mask


def _make_corpus(rng, n_images, n_cats, segm, flood_dets=0):
    """``flood_dets``: additionally emit that many detections for (image 0,
    category 1) — exercises the MAX_DETS=100 truncation boundary when >100."""
    images, anns, results = [], [], []
    aid = 1
    # adversarial size set straddling the 32^2 and 96^2 area boundaries
    sizes = [20, 31, 32, 33, 50, 95, 96, 97, 120]
    for img in range(n_images):
        images.append({"id": img, "height": H, "width": W})
        for _ in range(int(rng.integers(1, 6))):
            s = float(sizes[rng.integers(0, len(sizes))])
            bw = s * float(rng.uniform(0.8, 1.25))
            bh = s * s / bw  # keep area ~s^2
            x0 = float(rng.uniform(0, W - bw))
            y0 = float(rng.uniform(0, H - bh))
            cat = int(rng.integers(1, n_cats + 1))
            crowd = int(rng.random() < 0.12)
            ann = {"id": aid, "image_id": img, "category_id": cat,
                   "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": crowd}
            m = _blob_mask(rng, x0, y0, bw, bh)
            _attach_seg(rng, ann, m)
            if not crowd:
                ann["area"] = float(m.sum())
            anns.append(ann)
            aid += 1
            n_det = int(rng.integers(0, 4))
            tie_score = round(float(rng.uniform(0.3, 0.9)), 1)  # forces ties
            for d in range(n_det):
                jx = rng.normal(0, 3 + 6 * d, 4)
                dx0 = float(np.clip(x0 + jx[0], 0, W - 5))
                dy0 = float(np.clip(y0 + jx[1], 0, H - 5))
                dw = float(np.clip(bw + jx[2], 4, W - dx0))
                dh = float(np.clip(bh + jx[3], 4, H - dy0))
                score = tie_score if rng.random() < 0.5 else \
                    float(np.clip(rng.normal(0.6, 0.25), 0.01, 1.0))
                dcat = cat if rng.random() > 0.08 else int(rng.integers(1, n_cats + 1))
                det = {"image_id": img, "category_id": dcat, "score": score}
                det["bbox"] = [dx0, dy0, dw, dh]
                if segm:
                    _attach_seg(rng, det,
                                _blob_mask(rng, dx0, dy0, dw, dh))
                results.append(det)
    for d in range(flood_dets):
        dw = float(rng.uniform(8, 60))
        dh = float(rng.uniform(8, 60))
        dx0 = float(rng.uniform(0, W - dw))
        dy0 = float(rng.uniform(0, H - dh))
        # heavy exact-score ties across the truncation boundary
        score = round(float(rng.uniform(0.05, 0.95)), 1)
        det = {"image_id": 0, "category_id": 1, "score": score,
               "bbox": [dx0, dy0, dw, dh]}
        if segm:
            _attach_seg(rng, det, _blob_mask(rng, dx0, dy0, dw, dh))
        results.append(det)
    gt_data = {"images": images,
               "categories": [{"id": i + 1} for i in range(n_cats)],
               "annotations": anns}
    return gt_data, results


@pytest.mark.parametrize("iou_type,seed,n_images,flood", [
    ("bbox", 0, 150, 0), ("bbox", 1, 60, 0), ("segm", 2, 60, 0),
    # >MAX_DETS (100) detections for one (image, category): exercises the
    # score-sorted truncation boundary (lite_cocoeval.py dts[:max(MAX_DETS)])
    # with exact score ties straddling position 100
    ("bbox", 3, 20, 130), ("segm", 4, 12, 130),
])
def test_lite_cocoeval_matches_independent_oracle(iou_type, seed, n_images,
                                                  flood):
    rng = np.random.default_rng(seed)
    gt_data, results = _make_corpus(rng, n_images, n_cats=5,
                                    segm=(iou_type == "segm"),
                                    flood_dets=flood)
    if flood:
        n01 = sum(1 for d in results
                  if d["image_id"] == 0 and d["category_id"] == 1)
        assert n01 > max(MAX_DETS), "flood case must exceed MAX_DETS"
    ev = LiteCOCOeval(COCOGroundTruth(gt_data), results, iou_type)
    got = ev.summarize()

    precision, recall = _oracle_eval(gt_data, results, iou_type)
    expect = _stats_from(precision, recall)
    np.testing.assert_allclose(got, expect, atol=1e-12,
                               err_msg=f"{iou_type} 12-stat mismatch")
    # full precision/recall tensors agree too, not just the summary
    np.testing.assert_allclose(ev.eval["precision"], precision, atol=1e-12)
    np.testing.assert_allclose(ev.eval["recall"], recall, atol=1e-12)


def test_crowd_absorbs_duplicates():
    """Multiple dets overlapping a crowd region: crowds may match repeatedly
    and matched-to-crowd dets are ignored (neither TP nor FP)."""
    m = np.zeros((H, W), np.uint8)
    m[10:100, 10:180] = 1
    gt_data = {
        "images": [{"id": 0, "height": H, "width": W}],
        "categories": [{"id": 1}],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 1, "iscrowd": 1,
             "bbox": [10, 10, 170, 90], "area": 170 * 90,
             "segmentation": rle.encode(m)},
            {"id": 2, "image_id": 0, "category_id": 1, "iscrowd": 0,
             "bbox": [120, 110, 40, 40], "area": 1600,
             "segmentation": [[120, 110, 160, 110, 160, 150, 120, 150]]},
        ],
    }
    results = [
        # three dets inside the crowd: all ignored
        {"image_id": 0, "category_id": 1, "score": 0.9,
         "bbox": [12, 12, 60, 60]},
        {"image_id": 0, "category_id": 1, "score": 0.8,
         "bbox": [80, 12, 60, 60]},
        {"image_id": 0, "category_id": 1, "score": 0.7,
         "bbox": [12, 40, 80, 50]},
        # one det on the real gt: TP at every threshold (IoU == 1)
        {"image_id": 0, "category_id": 1, "score": 0.6,
         "bbox": [120, 110, 40, 40]},
    ]
    stats = LiteCOCOeval(COCOGroundTruth(gt_data), results, "bbox").summarize()
    assert stats[0] == pytest.approx(1.0)   # AP: the only real gt is found
    assert stats[8] == pytest.approx(1.0)   # AR100


def test_area_range_ignore_on_unmatched_dets():
    """An unmatched det whose area falls outside the range must be ignored
    (not an FP) for that range."""
    gt_data = {
        "images": [{"id": 0, "height": H, "width": W}],
        "categories": [{"id": 1}],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 1, "iscrowd": 0,
             "bbox": [10, 10, 100, 100], "area": 10000,  # large
             "segmentation": [[10, 10, 110, 10, 110, 110, 10, 110]]},
        ],
    }
    results = [
        {"image_id": 0, "category_id": 1, "score": 0.9,
         "bbox": [10, 10, 100, 100]},                      # perfect large TP
        {"image_id": 0, "category_id": 1, "score": 0.8,
         "bbox": [150, 130, 10, 10]},                      # tiny unmatched det
    ]
    ev = LiteCOCOeval(COCOGroundTruth(gt_data), results, "bbox")
    stats = ev.summarize()
    # 'large' range: tiny det is ignored there -> precision stays perfect
    p = ev.eval["precision"]
    ai = AREA_KEYS.index("large")
    assert p[0, :, 0, ai, -1].max() == pytest.approx(1.0)
    # 'all' range: the tiny det is a real FP -> AP < 1 is NOT required
    # (precision at recall below 1.0 stays 1.0; envelope keeps AP == 1), but
    # AR is unaffected either way
    assert stats[8] == pytest.approx(1.0)
