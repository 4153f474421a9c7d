"""Multi-scale loss vs a numpy re-computation using the oracle targets."""

import numpy as np

import jax.numpy as jnp

from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss

from numpy_ref import np_bilinear_up4, reference_build_targets, sigmoid
from test_targets import ANCHORS, GRID, IMAGE, MASKS, NUM_CLASSES, N_MAX, _pad_gt, _random_gt

GRIDS = [(8, 8), (8, 8), (8, 8)]  # same grid per scale for this small geometry


def _np_bce(p, t):
    p = np.clip(p, 1e-12, 1 - 1e-12)
    return -(t * np.log(p) + (1 - t) * np.log(1 - p))


def _np_smooth_l1(x, t):
    d = np.abs(x - t)
    return np.where(d < 1, 0.5 * d * d, d - 0.5)


def _np_scale_loss(pred_bbox, pred_orien, targets, nb=1):
    (pos, neg, pos_scale, txy, twh, tiou, tcls, opos, oneg, torien) = targets
    nA = 3
    nH, nW = GRID
    pb = pred_bbox.reshape(nH, nW, nA, 5 + NUM_CLASSES).transpose(2, 0, 1, 3)[None]
    po = np_bilinear_up4(pred_orien)  # (H, W, A*2)
    po = po.reshape(*IMAGE, nA, 2).transpose(2, 0, 1, 3)[None]

    pxy = sigmoid(pb[..., 0:2])
    pwh = pb[..., 2:4]
    pobj = sigmoid(pb[..., 4])
    pcls = sigmoid(pb[..., 5:])

    loss_xy = (_np_bce(pxy, txy[None]) * pos_scale[None, ..., None]).sum() / nb
    loss_wh = ((pwh - twh[None]) ** 2 * pos_scale[None, ..., None]).sum() / 2 / nb
    obj_all = _np_bce(pobj, pos[None])
    loss_obj = (obj_all * pos[None]).sum() / nb
    loss_noobj = (obj_all * neg[None]).sum() / nb
    loss_cls = (_np_bce(pcls, tcls[None]) * pos[None][..., None]).sum() / nb
    n_op, n_on = opos.sum(), oneg.sum()
    o_all = _np_smooth_l1(po, torien[None])
    loss_op = (o_all * opos[None][..., None]).sum() / n_op * pos.sum() / nb if n_op > 0 else 0.0
    loss_on = (o_all * oneg[None][..., None]).sum() / n_on * pos.sum() / nb if n_on > 0 else 0.0
    return np.array([loss_xy, loss_wh, loss_obj, loss_noobj, loss_cls, loss_op, loss_on])


def test_multiscale_loss_matches_numpy():
    rng = np.random.default_rng(0)
    bbox, cls, masks = _random_gt(rng, 6)
    pb, pc, pm, pv = _pad_gt(bbox, cls, masks)
    target = {
        "bbox": jnp.asarray(pb)[None],
        "cls": jnp.asarray(pc)[None],
        "mask": jnp.asarray(pm)[None],
        "valid": jnp.asarray(pv)[None],
    }

    weight = [1, 1, 1, 1, 1, 20, 20]
    loss = OrienMaskYOLOMultiScaleLoss(
        grid_size=[list(g) for g in GRIDS], image_size=list(IMAGE), anchors=ANCHORS,
        anchor_mask=MASKS, num_classes=NUM_CLASSES, center_region=0.6,
        valid_region=0.6, label_smooth=False, obj_ignore_threshold=0.6,
        weight=weight, scales_weight=[1, 1, 1], target_chunk=4,
    )

    predict, predict_np = [], []
    for s in range(3):
        nh, nw = GRIDS[s]
        b = rng.standard_normal((nh, nw, 3 * (5 + NUM_CLASSES))).astype(np.float32)
        o = rng.standard_normal((IMAGE[0] // 4, IMAGE[1] // 4, 6)).astype(np.float32)
        predict.append((jnp.asarray(b)[None], jnp.asarray(o)[None]))
        predict_np.append((b.astype(np.float64), o.astype(np.float64)))

    loss_sum, loss_log, metric_log = loss(predict, target, training=False)

    # numpy recomputation per scale
    expected_sum = 0.0
    for s in range(3):
        nA = 3
        nH, nW = GRIDS[s]
        pbx = predict_np[s][0].reshape(nH, nW, nA, 5 + NUM_CLASSES).transpose(2, 0, 1, 3)
        gx, gy = np.meshgrid(np.arange(nW), np.arange(nH))
        grid_all = np.asarray(ANCHORS, np.float64) / np.array([IMAGE[1], IMAGE[0]]) * np.array([nW, nH])
        pxy = sigmoid(pbx[..., 0:2])
        pwh = np.exp(pbx[..., 2:4]) * grid_all[MASKS[s]][:, None, None, :]
        pred_boxes = np.concatenate([
            pxy + np.stack([gx, gy], -1)[None], pwh], -1).reshape(-1, 4)
        targets = reference_build_targets(
            bbox.astype(np.float64), cls, masks.astype(np.float64), pred_boxes,
            GRIDS[s], IMAGE, ANCHORS, MASKS[s], NUM_CLASSES,
            center_region=0.6, valid_region=0.6, ignore_thresh=0.6,
        )
        items = _np_scale_loss(*predict_np[s], targets)
        expected_sum += (items * np.asarray(weight, np.float64)).sum()
        got_items = np.array([
            float(loss_log[f"S{['32','16','08'][s]}_{k}"]) for k in (
                "loss_xy", "loss_wh", "loss_obj", "loss_noobj", "loss_cls",
                "loss_orien_pos", "loss_orien_neg")
        ])
        np.testing.assert_allclose(got_items, items * np.asarray(weight), rtol=2e-3, atol=1e-4)

    np.testing.assert_allclose(float(loss_sum), expected_sum, rtol=2e-3)
    # metrics exist and are finite (sum, count) pairs
    v = metric_log["cross_scale_avg_iou"]
    assert np.isfinite(float(v[0])) and float(v[1]) > 0


def test_scales_weight_applied_once():
    """Reference semantics (eval/base.py:117-119): scales_weight multiplies
    each scale's aggregate ONCE; per-scale logged items carry only the item
    weights (regression: it was pre-multiplied into item weights AND applied
    at aggregation, scaling loss_sum by scales_weight squared)."""
    rng = np.random.default_rng(7)
    bbox, cls, masks = _random_gt(rng, 5)
    pb, pc, pm, pv = _pad_gt(bbox, cls, masks)
    target = {
        "bbox": jnp.asarray(pb)[None], "cls": jnp.asarray(pc)[None],
        "mask": jnp.asarray(pm)[None], "valid": jnp.asarray(pv)[None],
    }
    predict = []
    for s in range(3):
        nh, nw = GRIDS[s]
        b = rng.standard_normal((nh, nw, 3 * (5 + NUM_CLASSES))).astype(np.float32)
        o = rng.standard_normal((IMAGE[0] // 4, IMAGE[1] // 4, 6)).astype(np.float32)
        predict.append((jnp.asarray(b)[None], jnp.asarray(o)[None]))

    def make(sw):
        return OrienMaskYOLOMultiScaleLoss(
            grid_size=[list(g) for g in GRIDS], image_size=list(IMAGE),
            anchors=ANCHORS, anchor_mask=MASKS, num_classes=NUM_CLASSES,
            center_region=0.6, valid_region=0.6, label_smooth=False,
            obj_ignore_threshold=0.6, weight=[1, 1, 1, 1, 1, 20, 20],
            scales_weight=sw, target_chunk=4,
        )

    sw = [2.0, 0.5, 1.5]
    sum_u, log_u, _ = make([1, 1, 1])(predict, target, training=False)
    sum_w, log_w, _ = make(sw)(predict, target, training=False)

    prefixes = ["S32", "S16", "S08"]
    for p in prefixes:  # per-scale logs must not carry scales_weight
        for k in ("loss_xy", "loss_obj", "loss_sum"):
            np.testing.assert_allclose(
                float(log_w[f"{p}_{k}"]), float(log_u[f"{p}_{k}"]), rtol=1e-6)
    want_sum = sum(sw[i] * float(log_w[f"{prefixes[i]}_loss_sum"])
                   for i in range(3))
    np.testing.assert_allclose(float(sum_w), want_sum, rtol=1e-5)
    want_xy = sum(sw[i] * float(log_w[f"{prefixes[i]}_loss_xy"])
                  for i in range(3))
    np.testing.assert_allclose(
        float(log_w["cross_scale_loss_xy"]), want_xy, rtol=1e-5)


def test_shared_painting_equals_standalone():
    """Multi-scale loss (one shared OrientationPainter pass) must equal the
    per-scale standalone path (each scale painting its own targets)."""
    rng = np.random.default_rng(3)
    bbox, cls, masks = _random_gt(rng, 9)
    pb, pc, pm, pv = _pad_gt(bbox, cls, masks)
    target = {
        "bbox": jnp.asarray(pb)[None], "cls": jnp.asarray(pc)[None],
        "mask": jnp.asarray(pm)[None], "valid": jnp.asarray(pv)[None],
    }
    loss = OrienMaskYOLOMultiScaleLoss(
        grid_size=[list(g) for g in GRIDS], image_size=list(IMAGE),
        anchors=ANCHORS, anchor_mask=MASKS, num_classes=NUM_CLASSES,
        center_region=0.6, valid_region=0.6, label_smooth=False,
        obj_ignore_threshold=0.6, weight=[1, 1, 1, 1, 1, 20, 20],
        scales_weight=[1, 1, 1], target_chunk=4,
    )
    predict = []
    for s in range(3):
        nh, nw = GRIDS[s]
        b = rng.standard_normal((nh, nw, 3 * (5 + NUM_CLASSES))).astype(np.float32)
        o = rng.standard_normal((IMAGE[0] // 4, IMAGE[1] // 4, 6)).astype(np.float32)
        predict.append((jnp.asarray(b)[None], jnp.asarray(o)[None]))

    shared_sum, shared_log, shared_metrics = loss(predict, target, training=False)

    # standalone: each scale loss called directly (orien=None -> own painting)
    for s, sl in enumerate(loss.scale_losses):
        s_loss, s_log, s_metrics = sl(predict[s], target, training=False)
        for k, v in s_log.items():
            np.testing.assert_allclose(float(shared_log[k]), float(v),
                                       rtol=1e-6, err_msg=k)
        for k, v in s_metrics.items():
            np.testing.assert_allclose(float(shared_metrics[k][0]), float(v[0]),
                                       rtol=1e-6, err_msg=k)


def test_pallas_painter_loss_wiring_sharded():
    """Full multi-scale loss with painter_impl='pallas' (interpret-mode
    kernel) under the 8-device mesh — the exact wiring make_train_step uses
    on multi-chip TPU — must equal the XLA-painter loss."""
    import jax

    from orienmask_tpu.parallel.mesh import data_mesh

    rng = np.random.default_rng(11)
    B = 8
    samples = [_pad_gt(*_random_gt(rng, int(rng.integers(1, 8)))) for _ in range(B)]
    target = {
        "bbox": jnp.asarray(np.stack([s[0] for s in samples])),
        "cls": jnp.asarray(np.stack([s[1] for s in samples])),
        "mask": jnp.asarray(np.stack([s[2] for s in samples])),
        "valid": jnp.asarray(np.stack([s[3] for s in samples])),
    }
    kw = dict(
        grid_size=[list(g) for g in GRIDS], image_size=list(IMAGE),
        anchors=ANCHORS, anchor_mask=MASKS, num_classes=NUM_CLASSES,
        center_region=0.6, valid_region=0.6, label_smooth=False,
        obj_ignore_threshold=0.6, weight=[1, 1, 1, 1, 1, 20, 20],
        scales_weight=[1, 1, 1], target_chunk=4,
    )
    loss_pallas = OrienMaskYOLOMultiScaleLoss(
        painter_impl="pallas", painter_interpret=True, **kw)
    loss_pallas.set_paint_mesh(data_mesh())
    loss_xla = OrienMaskYOLOMultiScaleLoss(painter_impl="xla", **kw)

    predict = []
    for s in range(3):
        nh, nw = GRIDS[s]
        b = rng.standard_normal((B, nh, nw, 3 * (5 + NUM_CLASSES))).astype(np.float32)
        o = rng.standard_normal((B, IMAGE[0] // 4, IMAGE[1] // 4, 6)).astype(np.float32)
        predict.append((jnp.asarray(b), jnp.asarray(o)))

    sum_p, log_p, _ = loss_pallas(predict, target, training=True)
    sum_x, log_x, _ = loss_xla(predict, target, training=True)
    np.testing.assert_allclose(float(sum_p), float(sum_x), rtol=1e-5)
    for k in log_x:
        np.testing.assert_allclose(float(log_p[k]), float(log_x[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_sample_weight_excludes_padded():
    """Eval batches wrap-padded to static shapes carry sample_weight=0 for
    duplicates; losses and (sum,count) metrics must equal the unpadded batch
    exactly (reference evaluates a short last batch)."""
    rng = np.random.default_rng(7)
    ms_loss = OrienMaskYOLOMultiScaleLoss(
        grid_size=[list(g) for g in GRIDS], image_size=list(IMAGE),
        anchors=ANCHORS, anchor_mask=MASKS, num_classes=NUM_CLASSES,
        center_region=0.6, valid_region=0.6, label_smooth=False,
        obj_ignore_threshold=0.6, weight=[1, 1, 1, 1, 1, 20, 20],
        scales_weight=[1, 1, 1], target_chunk=4,
    )
    samples = [_pad_gt(*_random_gt(rng, k)) for k in (5, 3)]
    target = {
        "bbox": jnp.asarray(np.stack([s[0] for s in samples])),
        "cls": jnp.asarray(np.stack([s[1] for s in samples])),
        "mask": jnp.asarray(np.stack([s[2] for s in samples])),
        "valid": jnp.asarray(np.stack([s[3] for s in samples])),
    }
    predict = []
    for sidx in range(3):
        nh, nw = GRIDS[sidx]
        b = rng.standard_normal((2, nh, nw, 3 * (5 + NUM_CLASSES))).astype(np.float32)
        o = rng.standard_normal((2, IMAGE[0] // 4, IMAGE[1] // 4, 6)).astype(np.float32)
        predict.append((jnp.asarray(b), jnp.asarray(o)))

    # padded: duplicate sample 0 at the end with weight 0
    def pad(x):
        return jnp.concatenate([x, x[:1]], axis=0)

    predict_p = [(pad(pb), pad(po)) for pb, po in predict]
    target_p = {k: pad(v) for k, v in target.items()}
    b = target["bbox"].shape[0]
    target_p["sample_weight"] = jnp.concatenate(
        [jnp.ones((b,), jnp.float32), jnp.zeros((1,), jnp.float32)])

    ref_sum, ref_log, ref_metric = ms_loss(predict, target, training=False)
    pad_sum, pad_log, pad_metric = ms_loss(predict_p, target_p, training=False)
    np.testing.assert_allclose(float(pad_sum), float(ref_sum), rtol=1e-6)
    for k in ref_log:
        np.testing.assert_allclose(float(pad_log[k]), float(ref_log[k]),
                                   rtol=1e-6, err_msg=k)
    for k in ref_metric:
        np.testing.assert_allclose(np.asarray(pad_metric[k], np.float64),
                                   np.asarray(ref_metric[k], np.float64),
                                   rtol=1e-6, err_msg=k)
