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
