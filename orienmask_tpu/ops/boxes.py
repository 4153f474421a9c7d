"""Box IoU primitives on cxcywh boxes (reference eval/function.py:6-52)."""

import jax.numpy as jnp


def bbox_ious(bbox1, bbox2):
    """Pairwise IoU of (..., n1, 4) vs (..., n2, 4) cxcywh boxes -> (..., n1, n2)."""
    b1xy, b1wh = bbox1[..., 0:2], bbox1[..., 2:4]
    b2xy, b2wh = bbox2[..., 0:2], bbox2[..., 2:4]
    b1lo = (b1xy - b1wh / 2)[..., :, None, :]
    b1hi = (b1xy + b1wh / 2)[..., :, None, :]
    b2lo = (b2xy - b2wh / 2)[..., None, :, :]
    b2hi = (b2xy + b2wh / 2)[..., None, :, :]
    d = jnp.clip(jnp.minimum(b1hi, b2hi) - jnp.maximum(b1lo, b2lo), 0, None)
    inter = d[..., 0] * d[..., 1]
    area1 = (b1wh[..., 0] * b1wh[..., 1])[..., :, None]
    area2 = (b2wh[..., 0] * b2wh[..., 1])[..., None, :]
    return inter / (area1 + area2 - inter)


def anchor_ious(wh1, wh2):
    """IoU of width/height-only boxes anchored at a shared corner: (n1,2)x(n2,2)->(n1,n2)."""
    inter = jnp.minimum(wh1[:, None, 0], wh2[None, :, 0]) * jnp.minimum(
        wh1[:, None, 1], wh2[None, :, 1]
    )
    area1 = (wh1[:, 0] * wh1[:, 1])[:, None]
    area2 = (wh2[:, 0] * wh2[:, 1])[None, :]
    return inter / (area1 + area2 - inter)


def iou_one_vs_many(box, boxes):
    """IoU of one cxcywh box (4,) against (n, 4) -> (n,)."""
    lo1, hi1 = box[0:2] - box[2:4] / 2, box[0:2] + box[2:4] / 2
    lo2, hi2 = boxes[:, 0:2] - boxes[:, 2:4] / 2, boxes[:, 0:2] + boxes[:, 2:4] / 2
    d = jnp.clip(jnp.minimum(hi1, hi2) - jnp.maximum(lo1, lo2), 0, None)
    inter = d[:, 0] * d[:, 1]
    area1 = box[2] * box[3]
    area2 = boxes[:, 2] * boxes[:, 3]
    return inter / (area1 + area2 - inter)
