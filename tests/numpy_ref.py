"""Plain-numpy oracle for the OrienMask postprocess & target-builder semantics.

Sequential, dynamic-shape re-statement of the reference algorithms
(eval/orienmask_yolo_postprocess.py, eval/src/nms_cpu.cpp, eval/orienmask_yolo_loss.py)
used to verify the static-shape XLA implementations.
"""

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_bilinear_up4(x):
    """x: (h, w, c) -> (4h, 4w, c), align_corners=False."""
    h, w, _ = x.shape
    out_h, out_w = h * 4, w * 4

    def mat(out_n, in_n):
        m = np.zeros((out_n, in_n), np.float64)
        src = np.clip((np.arange(out_n) + 0.5) / 4 - 0.5, 0, in_n - 1)
        lo = np.floor(src).astype(int)
        hi = np.minimum(lo + 1, in_n - 1)
        fr = src - lo
        m[np.arange(out_n), lo] += 1 - fr
        m[np.arange(out_n), hi] += fr
        return m

    mh, mw = mat(out_h, h), mat(out_w, w)
    return np.einsum("Hh,hwc->Hwc", mh, np.einsum("Ww,hwc->hWc", mw, x))


def greedy_nms(boxes, scores, thresh):
    """Sequential greedy NMS on cxcywh boxes; returns keep indices in input order."""
    x1 = boxes[:, 0] - boxes[:, 2] / 2
    y1 = boxes[:, 1] - boxes[:, 3] / 2
    x2 = boxes[:, 0] + boxes[:, 2] / 2
    y2 = boxes[:, 1] + boxes[:, 3] / 2
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou >= thresh
        suppressed[i] = True
    return np.array(sorted(keep), dtype=np.int64)


def reference_postprocess(predict_np, grid_hw, image_hw, anchors, anchor_mask,
                          num_classes, conf_thresh, nms_thresh, nms_pre, nms_post,
                          orien_thresh):
    """predict_np: list of (bbox (H,W,A*(5+C)), orien (H/4img... stride4 map, (h4,w4,A*2)))
    for one image (no batch dim), NHWC layout. Returns dict like the reference."""
    img_h, img_w = image_hw
    anchors = np.asarray(anchors, np.float64)
    norm_anchors = anchors / np.array([img_w, img_h])

    all_coords, all_conf, all_anchor = [], [], []
    orien_up = {}
    for s, (bbox, orien) in enumerate(predict_np):
        nh, nw = grid_hw[s]
        mask = anchor_mask[s]
        na = len(mask)
        b = bbox.astype(np.float64).reshape(nh, nw, na, 5 + num_classes).transpose(2, 0, 1, 3)
        gx = np.arange(nw)[None, None, :]
        gy = np.arange(nh)[None, :, None]
        x = (sigmoid(b[..., 0]) + gx) / nw
        y = (sigmoid(b[..., 1]) + gy) / nh
        w = np.exp(b[..., 2]) * norm_anchors[mask][:, 0][:, None, None]
        h = np.exp(b[..., 3]) * norm_anchors[mask][:, 1][:, None, None]
        conf = sigmoid(b[..., 5:]) * sigmoid(b[..., 4])[..., None]
        all_coords.append(np.stack([x, y, w, h], -1).reshape(-1, 4))
        all_conf.append(conf.reshape(-1, num_classes))
        all_anchor.append(np.repeat(np.asarray(mask), nh * nw))
        # upsample orientation to image res; channels anchor-major (A, 2)
        up = np_bilinear_up4(orien.astype(np.float64))  # (img_h, img_w, A*2)
        for j, a in enumerate(mask):
            orien_up[a] = up[..., 2 * j:2 * j + 2]

    coords = np.concatenate(all_coords)
    conf = np.concatenate(all_conf)
    det_anchor = np.concatenate(all_anchor)

    det_idx, cls_idx = np.nonzero(conf > conf_thresh)
    scores = conf[det_idx, cls_idx]
    if len(det_idx) > nms_pre:
        top = np.argsort(-scores, kind="stable")[:nms_pre]
        det_idx, cls_idx, scores = det_idx[top], cls_idx[top], scores[top]

    boxes = coords[det_idx]
    offset_boxes = boxes.copy()
    offset_boxes[:, 0:2] += cls_idx[:, None] * 2.0
    keep = greedy_nms(offset_boxes, scores, nms_thresh)
    if len(keep) > nms_post:
        top = np.argsort(-scores[keep], kind="stable")[:nms_post]
        keep = keep[top]
    else:
        keep = keep[np.argsort(-scores[keep], kind="stable")]

    fboxes = boxes[keep]
    fscores = scores[keep]
    fcls = cls_idx[keep]
    fanchor = det_anchor[det_idx][keep]

    mesh_x = np.arange(img_w)[None, :] / img_w
    mesh_y = np.arange(img_h)[:, None] / img_h
    masks = []
    for d in range(len(keep)):
        a = fanchor[d]
        fx = orien_up[a][..., 0] * norm_anchors[a, 0] / 2 + mesh_x
        fy = orien_up[a][..., 1] * norm_anchors[a, 1] / 2 + mesh_y
        m = (np.abs(fx - fboxes[d, 0]) < orien_thresh * fboxes[d, 2]) & (
            np.abs(fy - fboxes[d, 1]) < orien_thresh * fboxes[d, 3]
        )
        masks.append(m)
    masks = np.stack(masks) if masks else np.zeros((0, img_h, img_w), bool)

    return {
        "bbox": np.concatenate([fboxes, fscores[:, None]], axis=1),
        "cls": fcls,
        "mask": masks,
    }


def reference_build_targets(gt_bbox, gt_cls, gt_mask, pred_boxes, grid_hw, image_hw,
                            anchors, anchor_mask, num_classes, center_region=0.6,
                            valid_region=0.6, label_smooth=0.0, ignore_thresh=0.5):
    """Sequential per-instance oracle for one sample (dynamic-count GT arrays).

    gt_bbox: (n, 4) normalized cxcywh; gt_mask: (n, H, W) {0,1}; pred_boxes:
    (A*nH*nW, 4) grid units.  Mirrors eval/orienmask_yolo_loss.py:156-286 semantics.
    """
    nH, nW = grid_hw
    H, W = image_hw
    mask_ids = list(anchor_mask)
    nA = len(mask_ids)
    anchors = np.asarray(anchors, np.float64)
    scale_wh = np.array([W / nW, H / nH])
    grid_all_anchors = anchors / np.array([W, H]) * np.array([nW, nH])
    grid_anchors = grid_all_anchors[mask_ids]
    pixel_anchors = anchors[mask_ids]

    pos_mask = np.zeros((nA, nH, nW))
    neg_mask = np.ones((nA, nH, nW))
    pos_scale = np.zeros((nA, nH, nW))
    txy = np.zeros((nA, nH, nW, 2))
    twh = np.zeros((nA, nH, nW, 2))
    tiou = np.zeros((nA, nH, nW))
    tcls = np.full((nA, nH, nW, num_classes), label_smooth)
    orien_mask = np.zeros((nA, H, W), np.int64)
    torien = np.zeros((nA, H, W, 2))

    g = gt_bbox * np.array([nW, nH, nW, nH])
    n = len(g)
    if n:
        # ignore via pred-gt IoU
        from numpy_ref import _np_bbox_ious
        iou_pg = _np_bbox_ious(pred_boxes, g)
        ignore = (iou_pg > ignore_thresh).any(1)
        neg_mask.reshape(-1)[ignore] = 0

        inter = np.minimum(g[:, None, 2], grid_all_anchors[None, :, 0]) * \
            np.minimum(g[:, None, 3], grid_all_anchors[None, :, 1])
        union = g[:, 2:3] * g[:, 3:4] + grid_all_anchors[:, 0] * grid_all_anchors[:, 1] - inter
        aiou = inter / union
        match_index = aiou.argmax(1)

        mesh_y, mesh_x = np.meshgrid(np.arange(H, dtype=np.float64),
                                     np.arange(W, dtype=np.float64), indexing="ij")
        mesh_xy = np.stack([mesh_x, mesh_y], -1)

        for k in range(n):
            if match_index[k] not in mask_ids:
                continue
            a = mask_ids.index(match_index[k])
            gx = int(np.clip(np.floor(g[k, 0]), 0, nW - 1))
            gy = int(np.clip(np.floor(g[k, 1]), 0, nH - 1))
            pos_mask[a, gy, gx] = 1
            neg_mask[a, gy, gx] = 0
            pos_scale[a, gy, gx] = 2 - g[k, 2] * g[k, 3] / (nW * nH)
            txy[a, gy, gx] = g[k, 0:2] - np.floor(g[k, 0:2])
            twh[a, gy, gx] = np.log(g[k, 2:4] / grid_anchors[a])
            tcls[a, gy, gx, int(gt_cls[k])] = 1 - label_smooth
            cell = (a * nH + gy) * nW + gx
            tiou[a, gy, gx] = iou_pg[cell, k]

            # orientation painting
            px, py = g[k, 0] * scale_wh[0], g[k, 1] * scale_wh[1]
            vw = (g[k, 2] * valid_region + 0.5) * scale_wh[0]
            vh = (g[k, 3] * valid_region + 0.5) * scale_wh[1]
            cwh = np.array([vw, vh]) / valid_region * center_region
            x1 = np.round(np.clip(px - vw, 0, W - 1))
            x2 = np.round(np.clip(px + vw, 0, W - 1)) + 1
            y1 = np.round(np.clip(py - vh, 0, H - 1))
            y2 = np.round(np.clip(py + vh, 0, H - 1)) + 1
            roi = (mesh_x >= x1) & (mesh_x < x2) & (mesh_y >= y1) & (mesh_y < y2)
            offset = mesh_xy - np.array([px, py])

            om = orien_mask[a].copy()
            to = torien[a].copy()
            is_inst = roi & (gt_mask[k] > 0)
            om[is_inst] = -1
            to = np.where(is_inst[..., None], offset, to)
            not_inst = roi & (gt_mask[k] == 0) & (om >= 0)
            om += not_inst.astype(np.int64)
            offlen = np.maximum(np.abs(offset), 1e-8)
            sneg = np.clip(cwh / offlen, 1, None).min(-1) - 1
            negoff = sneg[..., None] * np.sign(offset) * offlen
            to = np.where(not_inst[..., None], to + negoff, to)
            orien_mask[a] = om
            torien[a] = to

    orien_pos = (orien_mask < 0).astype(np.float64)
    orien_neg = (orien_mask > 0).astype(np.float64)
    torien = torien / (pixel_anchors[:, None, None, :] / 2)
    denom = np.where(orien_mask == 0, 1000, orien_mask)
    torien = torien / denom[..., None]

    return (pos_mask, neg_mask, pos_scale, txy, twh, tiou, tcls,
            orien_pos, orien_neg, torien)


def _np_bbox_ious(b1, b2):
    b1lo = b1[:, None, 0:2] - b1[:, None, 2:4] / 2
    b1hi = b1[:, None, 0:2] + b1[:, None, 2:4] / 2
    b2lo = b2[None, :, 0:2] - b2[None, :, 2:4] / 2
    b2hi = b2[None, :, 0:2] + b2[None, :, 2:4] / 2
    d = np.clip(np.minimum(b1hi, b2hi) - np.maximum(b1lo, b2lo), 0, None)
    inter = d[..., 0] * d[..., 1]
    a1 = (b1[:, 2] * b1[:, 3])[:, None]
    a2 = (b2[:, 2] * b2[:, 3])[None, :]
    return inter / (a1 + a2 - inter)
