"""COCO run-length-encoding codec, pure numpy (+cv2 for polygons).

Implements the exact pycocotools ``maskApi`` wire format so our segmentation
results json interoperates with the official toolchain (and their annotation
files decode identically):

  * masks are scanned in column-major (Fortran) order;
  * ``counts`` alternates runs of 0s and 1s, starting with zeros;
  * the compressed string stores each count as a base-32 varint (5 bits/char,
    offset by 48, bit 0x20 = continuation) with delta coding against
    ``counts[i-2]`` from the third element on.

The hot path (mask->RLE for thousands of detections during eval) is also
available through the C++ native library when built (orienmask_tpu.native).
"""

import cv2
import numpy as np


def _mask_to_counts(mask):
    """HxW {0,1} -> run lengths in Fortran order, starting with a zero-run."""
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    n = flat.size
    if n == 0:
        return np.zeros(0, np.int64)
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    runs = np.diff(np.concatenate([[0], change, [n]]))
    if flat[0] == 1:  # counts must start with the zero-run
        runs = np.concatenate([[0], runs])
    return runs.astype(np.int64)


def _counts_to_mask(counts, h, w):
    n = h * w
    flat = np.zeros(n, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        c = int(c)
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape(w, h).T  # Fortran order


def _counts_to_string(counts):
    out = []
    m = len(counts)
    for i in range(m):
        x = int(counts[i])
        if i > 2:
            x -= int(counts[i - 2])
        while True:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
            if not more:
                break
    return "".join(out)


def _string_to_counts(s):
    counts = []
    p = 0
    ln = len(s)
    while p < ln:
        x = 0
        k = 0
        while True:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            p += 1
            k += 1
            if not (c & 0x20):
                if c & 0x10:
                    x |= -1 << (5 * k)
                break
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


def encode(mask):
    """HxW {0,1} uint8/bool -> {'size': [h, w], 'counts': str} (compressed RLE).

    Uses the C++ native encoder when built (orienmask_tpu.native) — this is the
    eval-time hot op (thousands of 544x544 masks per COCO run)."""
    h, w = mask.shape
    from .. import native

    counts = native.rle_encode(np.asarray(mask, np.uint8))
    if counts is None:
        counts = _counts_to_string(_mask_to_counts(mask))
    return {"size": [int(h), int(w)], "counts": counts}


def encode_batch(masks):
    """(n, h, w) masks -> list of RLE dicts (native batch path when available)."""
    n, h, w = masks.shape
    from .. import native

    counts_list = native.rle_encode_batch(np.asarray(masks, np.uint8))
    if counts_list is None:
        counts_list = [_counts_to_string(_mask_to_counts(m)) for m in masks]
    return [{"size": [int(h), int(w)], "counts": c} for c in counts_list]


def decode(rle):
    """{'size': [h, w], 'counts': str|list} -> HxW uint8 mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = _string_to_counts(counts)
    elif isinstance(counts, bytes):
        counts = _string_to_counts(counts.decode())
    return _counts_to_mask(np.asarray(counts, np.int64), h, w)


def area(rle):
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = _string_to_counts(counts if isinstance(counts, str) else counts.decode())
    return int(np.asarray(counts[1::2], np.int64).sum())


def to_bbox(rle):
    """RLE -> xywh bbox (pixels)."""
    m = decode(rle)
    ys, xs = np.nonzero(m)
    if xs.size == 0:
        return np.zeros(4, np.float64)
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    return np.array([x0, y0, x1 - x0 + 1, y1 - y0 + 1], np.float64)


def polygons_to_mask(polygons, height, width):
    """COCO polygon list [[x0, y0, x1, y1, ...], ...] -> HxW uint8 mask."""
    mask = np.zeros((height, width), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
           for p in polygons if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def iou(rles_a, rles_b, iscrowd=None):
    """Pairwise mask IoU of two RLE lists -> (len_a, len_b) float64.

    ``iscrowd[j]`` true makes the union just area(a) (COCO crowd semantics).
    """
    masks_a = [decode(r).astype(bool) for r in rles_a]
    masks_b = [decode(r).astype(bool) for r in rles_b]
    out = np.zeros((len(masks_a), len(masks_b)))
    for i, ma in enumerate(masks_a):
        sa = ma.sum()
        for j, mb in enumerate(masks_b):
            inter = np.logical_and(ma, mb).sum()
            if iscrowd is not None and iscrowd[j]:
                union = sa
            else:
                union = sa + mb.sum() - inter
            out[i, j] = inter / union if union else 0.0
    return out
