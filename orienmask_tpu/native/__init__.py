"""ctypes binding + lazy build of the native host kernels (src/omtpu.cc).

Compiled with g++ on first use into ``build/libomtpu.so`` (cached; rebuilt when
the source is newer).  Every entry point has a numpy fallback, so the package
works without a toolchain — the native path just makes host-side eval hot loops
(RLE encode of thousands of masks) fast.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "omtpu.cc")
_SO = os.path.join(_DIR, "build", "libomtpu.so")

_lib = None
_tried = False


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Returns the loaded ctypes library or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.om_nms.restype = ctypes.c_int
        lib.om_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.om_rle_encode.restype = ctypes.c_int
        lib.om_rle_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.om_rle_decode.restype = ctypes.c_int64
        lib.om_rle_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.om_rle_encode_batch.restype = ctypes.c_int
        lib.om_rle_encode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.om_resize_bilinear.restype = None
        lib.om_resize_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        _i64p = ctypes.POINTER(ctypes.c_int64)
        lib.om_poly_merge.restype = ctypes.c_int
        lib.om_poly_merge.argtypes = [
            ctypes.POINTER(ctypes.c_double), _i64p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, _i64p, ctypes.c_int,
        ]
        lib.om_coco_match.restype = None
        lib.om_coco_match.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            _i64p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            _i64p, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.om_rle_iou.restype = None
        lib.om_rle_iou.argtypes = [
            _i64p, _i64p, ctypes.c_int, _i64p, _i64p, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except Exception as e:  # toolchain missing / build failure: numpy fallback
        print(f"[orienmask_tpu.native] native build unavailable ({e}); "
              f"falling back to numpy")
        _lib = None
    return _lib


def nms(dets, threshold=0.5):
    """Greedy NMS on (n, 5) cxcywh+score float32; returns keep indices
    (ascending input order, matching the reference CPU extension)."""
    lib = get_lib()
    dets = np.ascontiguousarray(dets, np.float32)
    n = dets.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    if lib is None:
        return _np_nms(dets, threshold)
    keep = np.empty(n, np.int64)
    m = lib.om_nms(dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
                   threshold, keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:m]


def _np_nms(dets, threshold):
    x1 = dets[:, 0] - dets[:, 2] / 2
    y1 = dets[:, 1] - dets[:, 3] / 2
    x2 = dets[:, 0] + dets[:, 2] / 2
    y2 = dets[:, 1] + dets[:, 3] / 2
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(-dets[:, 4], kind="stable")
    suppressed = np.zeros(len(dets), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        inter = (np.clip(np.minimum(x2[i], x2) - np.maximum(x1[i], x1), 0, None)
                 * np.clip(np.minimum(y2[i], y2) - np.maximum(y1[i], y1), 0, None))
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou >= threshold
        suppressed[i] = True
    return np.array(sorted(keep), np.int64)


def rle_encode(mask):
    """HxW uint8 -> compressed counts string, or None when native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    cap = 2 * h * w + 64
    # np.empty, NOT create_string_buffer: the latter zero-fills the whole
    # worst-case capacity (a ~600 KB memset per call on 544^2 masks).
    buf = np.empty(cap, np.uint8)
    ln = lib.om_rle_encode(mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           h, w,
                           buf.ctypes.data_as(ctypes.c_char_p), cap)
    if ln < 0:
        return None
    return buf[:ln].tobytes().decode()


def rle_decode_counts(s):
    """Compressed counts string -> raw int64 counts, or None when unavailable.

    Inverse of rle_encode's varint writer; each count is at least one char so
    len(s) bounds the output."""
    lib = get_lib()
    if lib is None:
        return None
    raw = s.encode() if isinstance(s, str) else s
    cap = max(1, len(raw))
    out = np.empty(cap, np.int64)
    m = lib.om_rle_decode(raw, len(raw),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                          cap)
    if m < 0:
        return None
    return out[:m].copy()


def rle_encode_batch(masks):
    """(n, h, w) uint8 -> list of counts strings, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    masks = np.ascontiguousarray(masks, np.uint8)
    n, h, w = masks.shape
    if n == 0:
        return []
    cap = n * (2 * h * w + 64)
    # np.empty, NOT create_string_buffer: zero-filling the worst-case
    # capacity (~60 MB at 100x544^2) made the batch path SLOWER than n
    # single encodes.
    buf = np.empty(cap, np.uint8)
    lens = np.empty(n, np.int32)
    total = lib.om_rle_encode_batch(
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        buf.ctypes.data_as(ctypes.c_char_p), cap,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if total < 0:
        return None
    raw = buf[:total].tobytes()
    out, p = [], 0
    for ln in lens:
        out.append(raw[p:p + int(ln)].decode())
        p += int(ln)
    return out


def poly_merge_counts(polygons, h, w):
    """COCO polygon list -> merged raw RLE counts (int64 array), pycocotools
    frPoly+merge semantics. Returns None when native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    polys = [np.ascontiguousarray(np.asarray(p, np.float64).ravel())
             for p in polygons]
    flat = (np.concatenate(polys) if polys
            else np.zeros(0, np.float64))
    n_verts = np.array([p.size // 2 for p in polys], np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_verts)]).astype(np.int64)
    cap = h * w + 2
    out = np.empty(cap, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    m = lib.om_poly_merge(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(i64p), len(polys), h, w,
        out.ctypes.data_as(i64p), cap)
    if m < 0:
        return None
    return out[:m].copy()


def coco_match(ious, g_order, gi, iscrowd, thrs):
    """COCOeval greedy matching for one (image, category, area) cell.

    Returns (dt_m, dt_ig) with shapes (nt, nd) — dt_m holds sorted-gt
    indices or -1 — or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ious = np.ascontiguousarray(ious, np.float64)
    nd, ng = ious.shape
    thrs = np.ascontiguousarray(thrs, np.float64)
    nt = len(thrs)
    g_order = np.ascontiguousarray(g_order, np.int64)
    gi = np.ascontiguousarray(gi, np.uint8)
    crowd = np.ascontiguousarray(iscrowd, np.uint8)
    dt_m = np.empty((nt, nd), np.int64)
    dt_ig = np.zeros((nt, nd), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.om_coco_match(
        ious.ctypes.data_as(f64p), nd, ng,
        g_order.ctypes.data_as(i64p), gi.ctypes.data_as(u8p),
        crowd.ctypes.data_as(u8p), thrs.ctypes.data_as(f64p), nt,
        dt_m.ctypes.data_as(i64p), dt_ig.ctypes.data_as(u8p))
    return dt_m, dt_ig.astype(bool)


def rle_iou(rles_a, rles_b, iscrowd=None):
    """Pairwise RLE IoU on lists of RLE dicts (compressed or raw counts)
    without decoding. Returns (len_a, len_b) float64, or None when native
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..eval.rle import _raw_counts

    n_a, n_b = len(rles_a), len(rles_b)
    out = np.zeros((n_a, n_b), np.float64)
    if n_a == 0 or n_b == 0:
        return out
    ca = [_raw_counts(r) for r in rles_a]
    cb = [_raw_counts(r) for r in rles_b]
    h = int(rles_a[0]["size"][0]) if isinstance(rles_a[0], dict) else None
    if h is None:
        return None
    flat_a = np.ascontiguousarray(np.concatenate(ca), np.int64)
    flat_b = np.ascontiguousarray(np.concatenate(cb), np.int64)
    off_a = np.concatenate([[0], np.cumsum([len(c) for c in ca])]).astype(np.int64)
    off_b = np.concatenate([[0], np.cumsum([len(c) for c in cb])]).astype(np.int64)
    crowd = np.zeros(n_b, np.uint8)
    if iscrowd is not None:
        crowd = np.asarray(iscrowd, np.uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.om_rle_iou(
        flat_a.ctypes.data_as(i64p), off_a.ctypes.data_as(i64p), n_a,
        flat_b.ctypes.data_as(i64p), off_b.ctypes.data_as(i64p), n_b,
        h, crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def resize_bilinear(src, dh, dw, align_corners=False):
    """float32 HWC resize; returns None when native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    if src.ndim == 2:
        src = src[..., None]
        squeeze = True
    else:
        squeeze = False
    sh, sw, c = src.shape
    dst = np.empty((dh, dw, c), np.float32)
    lib.om_resize_bilinear(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sh, sw, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        int(align_corners))
    return dst[..., 0] if squeeze else dst
