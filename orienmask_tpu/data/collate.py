"""Static-shape batch collation.

The reference concatenates variable-count instances with a cumsum index vector
(data/collate.py:13-30) — a dynamic shape per batch that would force an XLA
recompile every step.  Here every sample is padded to ``max_instances`` with a
validity mask, so one compiled train step serves the whole epoch.  GT instance
masks are optionally bit-packed (8 pixels/byte) to cut host->device transfer 8x;
the loss unpacks them on-device.
"""

import logging
import math

import numpy as np

_logger = logging.getLogger("orienmask_tpu.data.collate")

# Cumulative truncation tally for THIS process (dataloader workers each have
# their own; every drop is also logged, which crosses the process boundary).
TRUNCATION_STATS = {"samples": 0, "instances_dropped": 0}


def naive_collate(batch, **kw):
    return batch


def collate(batch, max_instances=100, pack_masks=False, image_transport="float32",
            strict_instances=False):
    """List of transformed samples -> batch dict of stacked numpy arrays:
    ``{'image': (B,H,W,3) f32, 'bbox': (B,N,4) f32, 'cls': (B,N) i32,
    'mask': (B,N,H,W) bool | (B,N,H,ceil(W/8)) u8, 'valid': (B,N) bool}``
    plus ``'info'``: list of per-sample info dicts when present.

    ``image_transport='uint8'`` sends images as ``round(x*255)`` uint8 — 4x
    less host->device traffic; the jitted train/eval step divides by 255 on
    device.  Valid when the transform's Normalize is mean 0 / std 255 (the
    shipped configs); costs at most 0.5/255 per pixel vs float transport.

    Samples with more than ``max_instances`` GT instances are truncated to
    the ``max_instances`` LARGEST-AREA instances (deterministic; original
    relative order preserved so the painter's last-wins overlap semantics
    are unaffected for the kept set), with a loud RuntimeWarning counting
    the drop — the reference's cumsum collate keeps all instances
    (reference data/collate.py:13-30), at the cost of a dynamic shape per
    batch.  ``strict_instances=True`` raises instead.  See the
    ``max_instances`` note in config/base.py for the COCO sizing rationale."""
    bsz = len(batch)
    image = np.stack([s["image"] for s in batch])
    if image_transport == "uint8":
        image = np.clip(np.round(image * 255.0), 0, 255).astype(np.uint8)
    h, w = image.shape[1:3]
    n = max_instances

    bbox = np.zeros((bsz, n, 4), np.float32)
    cls = np.zeros((bsz, n), np.int32)
    valid = np.zeros((bsz, n), bool)
    with_mask = "mask" in batch[0]
    if with_mask:
        masks = np.zeros((bsz, n, h, w), bool)
    for i, s in enumerate(batch):
        k_all = s["bbox"].shape[0]
        if k_all > n:
            if strict_instances:
                raise ValueError(
                    f"collate: sample has {k_all} GT instances > "
                    f"max_instances={n} (strict_instances=True)")
            # keep the n largest-area instances, original order preserved
            area = s["bbox"][:, 2] * s["bbox"][:, 3]
            keep = np.sort(np.argsort(-area, kind="stable")[:n])
            # logging, not warnings.warn: the default warnings filter emits
            # once per call site, silencing every drop after the first —
            # and collate runs inside dataloader worker processes, so a
            # counter alone would be invisible to the training process.
            TRUNCATION_STATS["samples"] += 1
            TRUNCATION_STATS["instances_dropped"] += k_all - n
            _logger.warning(
                "collate: truncated a sample from %d to %d GT instances "
                "(kept the %d largest by area; %d dropped; process totals: "
                "%d samples / %d instances). Raise max_instances in the "
                "loader config to keep all (the reference keeps every "
                "instance).", k_all, n, n, k_all - n,
                TRUNCATION_STATS["samples"],
                TRUNCATION_STATS["instances_dropped"])
            bbox[i] = s["bbox"][keep]
            cls[i] = s["cls"][keep]
            valid[i] = True
            if with_mask:
                masks[i] = s["mask"][keep]
            continue
        k = k_all
        bbox[i, :k] = s["bbox"][:k]
        cls[i, :k] = s["cls"][:k]
        valid[i, :k] = True
        if with_mask and k:
            masks[i, :k] = s["mask"][:k]

    out = {"image": image, "bbox": bbox, "cls": cls, "valid": valid}
    if with_mask:
        if pack_masks:
            out["mask"] = np.packbits(masks, axis=-1)
        else:
            out["mask"] = masks
    if "info" in batch[0]:
        out["info"] = [s["info"] for s in batch]
    return out


def collate_plus(batch, max_instances=100, pack_masks=False, size_divisor=32,
                 pad_value=0.0):
    """Pads all images in the batch to a common /size_divisor shape first,
    adjusting normalized boxes and recording ``info['collate_pad']``
    (reference collate_plus, data/collate.py:33-59)."""
    max_h = max(s["image"].shape[0] for s in batch)
    max_w = max(s["image"].shape[1] for s in batch)
    max_h = int(math.ceil(max_h / size_divisor) * size_divisor)
    max_w = int(math.ceil(max_w / size_divisor) * size_divisor)

    for s in batch:
        h, w = s["image"].shape[:2]
        left, top = (max_w - w) // 2, (max_h - h) // 2
        right, down = max_w - w - left, max_h - h - top
        s["image"] = np.pad(s["image"], ((top, down), (left, right), (0, 0)),
                            constant_values=pad_value)
        bb = s["bbox"]
        if bb.shape[0]:
            bb[:, 0] = (bb[:, 0] * w + left) / max_w
            bb[:, 1] = (bb[:, 1] * h + top) / max_h
            bb[:, 2] = bb[:, 2] * w / max_w
            bb[:, 3] = bb[:, 3] * h / max_h
        if "mask" in s and len(s["mask"]):
            s["mask"] = np.pad(s["mask"], ((0, 0), (top, down), (left, right)))
        if "info" in s:
            s["info"]["collate_pad"] = (left, right, top, down, max_h, max_w)
    return collate(batch, max_instances, pack_masks)
