"""Vectorized OrienMask target assignment.

Reference ``build_targets`` (eval/orienmask_yolo_loss.py:156-286) is a python
per-sample loop with an inner per-instance loop painting orientation targets — the
worst serialization in the reference (SURVEY.md §3.1).  Here the same semantics are
re-derived as static-shape tensor programs over a padded ``(N_max,)`` instance axis:

  * grid-cell assignment: the reference's sequential writes are last-instance-wins;
    reproduced with a scatter-max of the instance index per cell and a gather.
  * ``tcls`` keeps the reference's multi-hot quirk: *every* matched instance writes
    its class bit at its cell (advanced indexing writes all (cell, cls) pairs).
  * orientation painting: the sequential per-instance loop reduces to a closed form —
    a pixel covered by any instance (within its ROI) takes the offset of the *last*
    covering instance and mask=-1; otherwise it accumulates background push-to-border
    offsets from every ROI it falls in, averaged by count.  Realized as a chunked
    ``lax.while_loop`` with a *dynamic* trip count (only chunks containing
    matched instances run; chunk members vectorized per step, later chunk wins).

Painting runs at image resolution and dominates target cost.  Because each GT's
anchor argmax selects exactly ONE of the 9 global anchors, the three per-scale
paints partition the GT set — ``OrientationPainter`` exploits that to paint all
scales in a single chunked pass over a (9, H, W) canvas (one read of the chunk
fields instead of three), which `OrienMaskYOLOMultiScaleLoss` slices per scale.

All constants are precomputed in numpy at builder-construction time.
"""


import jax
import jax.numpy as jnp
import numpy as np

from .boxes import anchor_ious, bbox_ious


def _paint_bounds(centers, vwh, image_h, image_w):
    """Valid-region ROI pixel bounds (N, 4) = [x1, x2, y1, y2) (reference
    orienmask_yolo_loss.py:244-249 rounding semantics)."""
    x1 = jnp.round(jnp.clip(centers[:, 0] - vwh[:, 0], 0, image_w - 1))
    x2 = jnp.round(jnp.clip(centers[:, 0] + vwh[:, 0], 0, image_w - 1)) + 1
    y1 = jnp.round(jnp.clip(centers[:, 1] - vwh[:, 1], 0, image_h - 1))
    y2 = jnp.round(jnp.clip(centers[:, 1] + vwh[:, 1], 0, image_h - 1)) + 1
    return jnp.stack([x1, x2, y1, y2], axis=1)


def _paint_chunk_loop(centers, cwh, bounds, a_onehot, act, gt_mask,
                      pixel_anchors, chunk, image_h, image_w):
    """Shared chunked orientation-painting loop over an (A,)-anchor canvas.

    Args (one sample, static shapes):
      centers: (N, 2) instance centers in pixels; cwh: (N, 2) center-region
      half-extent in pixels; bounds: (N, 4) ROI [x1, x2, y1, y2);
      a_onehot: (N, A) bool — GT n paints anchor canvas a; act: (N,) bool;
      gt_mask: (N, H, W) bool; pixel_anchors: (A, 2) anchor sizes in pixels.

    Returns orien_pos (A, H, W), orien_neg (A, H, W), torien (A, H, W, 2)
    with the reference's overlap-count/-1/1000 denominator semantics
    (orienmask_yolo_loss.py:251-283).
    """
    nA = a_onehot.shape[1]
    h, w = image_h, image_w
    n = centers.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    n_pad = n + pad
    steps = n_pad // chunk

    def pad_to(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    pk = jax.tree_util.tree_map(pad_to, {
        "centers": centers, "cwh": cwh, "bounds": bounds,
        "aoh": a_onehot, "act": act, "mask": gt_mask.astype(bool),
    })
    chunked = jax.tree_util.tree_map(
        lambda x: x.reshape(steps, chunk, *x.shape[1:]), pk
    )

    mesh_x = jnp.arange(w, dtype=jnp.float32)[None, :]  # (1, W)
    mesh_y = jnp.arange(h, dtype=jnp.float32)[:, None]  # (H, 1)
    mesh_xy = jnp.stack(
        [jnp.broadcast_to(mesh_x, (h, w)), jnp.broadcast_to(mesh_y, (h, w))], axis=-1
    )  # (H, W, 2)

    # Dynamic trip count: only chunks containing matched instances do work.
    # GT is front-packed by the collate, so the last matched index bounds the
    # needed chunks — COCO averages ~8 instances/image, so this typically
    # runs 1-2 chunks instead of ceil(N_max/chunk) (the reference's python
    # loop had the same data-dependent early exit for free).
    last_matched = jnp.max(jnp.where(act, jnp.arange(1, n + 1), 0))
    steps_dyn = (last_matched + chunk - 1) // chunk

    def step(carry, data):
        inst_any, win_center, bg_cnt, bg_sum = carry
        cen, cw, bnd = data["centers"], data["cwh"], data["bounds"]
        a_oh = (data["aoh"] & data["act"][:, None]).astype(jnp.float32)  # (C, A)

        roi = (
            (mesh_x >= bnd[:, 0, None, None]) & (mesh_x < bnd[:, 1, None, None])
            & (mesh_y >= bnd[:, 2, None, None]) & (mesh_y < bnd[:, 3, None, None])
        )  # (C, H, W)
        inst = roi & data["mask"] & data["act"][:, None, None]
        bg = roi & (~data["mask"]) & data["act"][:, None, None]

        offset = mesh_xy[None] - cen[:, None, None, :]  # (C, H, W, 2)
        offlen = jnp.maximum(jnp.abs(offset), 1e-8)
        sneg = jnp.min(jnp.maximum(cw[:, None, None, :] / offlen, 1.0), axis=-1) - 1.0
        negoff = sneg[..., None] * jnp.sign(offset) * offlen  # (C, H, W, 2)

        instf = inst.astype(jnp.float32)
        bgf = bg.astype(jnp.float32)
        # scatter chunk fields to anchors: (C,H,W) x (C,A) -> (A,H,W)
        inst_any_c = jnp.einsum("khw,ka->ahw", instf, a_oh) > 0
        bg_cnt_c = jnp.einsum("khw,ka->ahw", bgf, a_oh)
        bg_sum_c = jnp.einsum("khwc,ka->ahwc", negoff * bgf[..., None], a_oh)
        # within-chunk last-wins winner per anchor/pixel (cross-chunk: the
        # carry merge below lets the later chunk win, preserving global order).
        # The winner's center is selected with a one-hot contraction instead
        # of a gather — TPU gathers serialize, matmuls ride the MXU (and a
        # broadcast+reduce formulation measured ~30% slower: XLA materializes
        # the (C, A, H, W, 2) operand instead of fusing it).
        rank = jnp.arange(1, chunk + 1, dtype=jnp.float32)
        pres = instf[:, None, :, :] * a_oh[:, :, None, None]  # (C, A, H, W)
        ranked = pres * rank[:, None, None, None]
        wlast = jnp.max(ranked, axis=0)  # (A, H, W)
        oh_last = ((ranked == wlast[None]) & (wlast[None] > 0)).astype(jnp.float32)
        wcen = jnp.einsum("kahw,kc->ahwc", oh_last, cen)  # (A, H, W, 2)

        new_inst_any = inst_any | inst_any_c
        win_center = jnp.where(inst_any_c[..., None], wcen, win_center)
        bg_cnt = bg_cnt + bg_cnt_c
        bg_sum = bg_sum + bg_sum_c
        return new_inst_any, win_center, bg_cnt, bg_sum

    init = (
        jnp.zeros((nA, h, w), bool),
        jnp.zeros((nA, h, w, 2), jnp.float32),
        jnp.zeros((nA, h, w), jnp.float32),
        jnp.zeros((nA, h, w, 2), jnp.float32),
    )

    def while_cond(state):
        return state[0] < steps_dyn

    def while_body(state):
        i, carry = state
        data = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
            chunked,
        )
        return i + 1, step(carry, data)

    _, (inst_any, win_center, bg_cnt, bg_sum) = jax.lax.while_loop(
        while_cond, while_body, (jnp.zeros((), jnp.int32), init)
    )

    torien_inst = mesh_xy[None] - win_center  # offset to last covering instance
    has_bg = (bg_cnt > 0) & (~inst_any)
    orien_pos = inst_any.astype(jnp.float32)
    orien_neg = has_bg.astype(jnp.float32)

    raw = jnp.where(inst_any[..., None], torien_inst,
                    jnp.where(has_bg[..., None], bg_sum, 0.0))
    half_anchor = jnp.asarray(pixel_anchors)[:, None, None, :] / 2.0
    denom = jnp.where(inst_any, -1.0, jnp.where(has_bg, bg_cnt, 1000.0))
    torien = raw / half_anchor / denom[..., None]
    return orien_pos, orien_neg, torien


class TargetBuilder:
    """Per-scale target builder. Call with one sample's GT + predicted boxes."""

    def __init__(self, grid_size, image_size, anchors, anchor_mask, num_classes,
                 center_region=0.6, valid_region=0.6, label_smooth=False,
                 obj_ignore_threshold=0.5, chunk=8):
        self.grid_h, self.grid_w = (grid_size, grid_size) if isinstance(grid_size, int) else tuple(grid_size)
        self.image_h, self.image_w = (image_size, image_size) if isinstance(image_size, int) else tuple(image_size)
        self.anchor_mask = list(anchor_mask)
        self.num_anchors = len(self.anchor_mask)
        self.num_classes = num_classes
        self.center_region = center_region
        self.valid_region = valid_region
        self.label_smooth = 1.0 / max(num_classes, 40) if label_smooth else 0.0
        self.obj_ignore_threshold = obj_ignore_threshold
        self.chunk = chunk

        image_wh = np.array([self.image_w, self.image_h], np.float32)
        grid_wh = np.array([self.grid_w, self.grid_h], np.float32)
        self.scale_wh = image_wh / grid_wh  # pixels per grid cell
        all_anchors = np.asarray(anchors, np.float32)
        self.grid_all_anchors = all_anchors / self.scale_wh  # (9, 2) grid units
        self.pixel_anchors = all_anchors[self.anchor_mask]  # (A, 2) pixels
        self.grid_anchors = self.grid_all_anchors[self.anchor_mask]  # (A, 2)

        # global anchor id -> local index in this scale's mask (or -1)
        lookup = np.full(len(all_anchors), -1, np.int32)
        for i, a in enumerate(self.anchor_mask):
            lookup[a] = i
        self.local_anchor = lookup

    # ------------------------------------------------------------------ public

    def __call__(self, gt_bbox, gt_cls, gt_mask, gt_valid, pred_boxes):
        """Args (one sample, static shapes):
          gt_bbox: (N, 4) normalized cxcywh; gt_cls: (N,) int32;
          gt_mask: (N, H, W) bool; gt_valid: (N,) bool;
          pred_boxes: (A*nH*nW, 4) cxcywh in grid units (detached).
        Returns the 10-tuple of reference build_targets outputs, NHWC-free layout
        (A, nH, nW, ...) / (A, H, W, ...)."""
        bbox_t, (gxy, gwh, ma, matched) = self._bbox_targets(
            gt_bbox, gt_cls, gt_valid, pred_boxes
        )
        if gt_mask.shape[-1] != self.image_w:  # bit-packed transport
            gt_mask = jnp.unpackbits(gt_mask, axis=-1, count=self.image_w)
        orien = self._orientation_targets(gxy, gwh, ma, matched, gt_mask)
        return (*bbox_t, *orien)

    def bbox_targets(self, gt_bbox, gt_cls, gt_valid, pred_boxes):
        """The 7 bbox-side targets only (orientation painted elsewhere — see
        OrientationPainter for the shared multi-scale pass)."""
        return self._bbox_targets(gt_bbox, gt_cls, gt_valid, pred_boxes)[0]

    def match(self, gt_bbox, gt_valid):
        """Anchor assignment (reference orienmask_yolo_loss.py:197-202):
        returns (local_index (N,), matched (N,)) for this scale."""
        g = gt_bbox * jnp.array([self.grid_w, self.grid_h,
                                 self.grid_w, self.grid_h], jnp.float32)
        gwh = g[:, 2:4]
        gwh_safe = jnp.where(gt_valid[:, None], gwh, 1.0)
        aiou = anchor_ious(gwh_safe, jnp.asarray(self.grid_all_anchors))  # (N, 9)
        match_index = jnp.argmax(aiou, axis=-1)
        local = jnp.asarray(self.local_anchor)[match_index]  # (N,)
        matched = gt_valid & (local >= 0)
        return local, matched

    # ---------------------------------------------------------------- internal

    def _bbox_targets(self, gt_bbox, gt_cls, gt_valid, pred_boxes):
        nA, nH, nW = self.num_anchors, self.grid_h, self.grid_w
        ncell = nA * nH * nW
        n = gt_bbox.shape[0]
        c = self.num_classes

        g = gt_bbox * jnp.array([nW, nH, nW, nH], jnp.float32)
        gxy, gwh = g[:, 0:2], g[:, 2:4]
        gwh_safe = jnp.where(gt_valid[:, None], gwh, 1.0)

        # ---- ignore mask: any GT overlapping a prediction strongly enough
        iou_pg = bbox_ious(pred_boxes, g)  # (P, N)
        iou_pg = jnp.where(gt_valid[None, :], iou_pg, 0.0)
        ignore = jnp.any(iou_pg > self.obj_ignore_threshold, axis=-1)  # (P,)

        # ---- anchor matching (argmax wh-IoU over all 9 anchors, filtered to scale)
        local, matched = self.match(gt_bbox, gt_valid)
        ma = jnp.maximum(local, 0)

        gx = jnp.clip(jnp.floor(gxy[:, 0]), 0, nW - 1).astype(jnp.int32)
        gy = jnp.clip(jnp.floor(gxy[:, 1]), 0, nH - 1).astype(jnp.int32)
        cell = (ma * nH + gy) * nW + gx
        cell_s = jnp.where(matched, cell, ncell)  # dummy slot for unmatched

        karange = jnp.arange(n, dtype=jnp.int32)
        winner = jnp.full((ncell + 1,), -1, jnp.int32).at[cell_s].max(karange)[:ncell]
        has_pos = winner >= 0
        wi = jnp.maximum(winner, 0)

        pos_f = has_pos.astype(jnp.float32)
        bbox_pos_mask = pos_f.reshape(nA, nH, nW)
        bbox_neg_mask = ((~ignore) & (~has_pos)).astype(jnp.float32).reshape(nA, nH, nW)

        pos_scale_k = 2.0 - gwh[:, 0] * gwh[:, 1] / (nW * nH)
        txy_k = gxy - jnp.floor(gxy)
        twh_k = jnp.log(gwh_safe / jnp.asarray(self.grid_anchors)[ma])

        # One (ncell, 5) gather from a concatenated per-GT table instead of
        # three separate gathers (TPU gathers are scalar-unit work; fewer,
        # wider rows amortize it).
        table = jnp.concatenate(
            [pos_scale_k[:, None], txy_k, twh_k], axis=1)  # (n, 5)
        picked = table[wi] * pos_f[:, None]  # (ncell, 5)
        bbox_pos_scale = picked[:, 0].reshape(nA, nH, nW)
        txy = picked[:, 1:3].reshape(nA, nH, nW, 2)
        twh = picked[:, 3:5].reshape(nA, nH, nW, 2)
        # Diagonal gather iou_pg[arange(ncell), wi] as an exact one-hot masked
        # reduction (the select fuses into the sum; W rows have <=1 nonzero).
        onehot_w = (winner[:, None] == karange[None, :])  # (ncell, n)
        tiou = jnp.where(onehot_w, iou_pg, 0.0).sum(axis=1).reshape(nA, nH, nW)

        # multi-hot tcls (reference quirk: every matched instance sets its class bit)
        cls_idx = jnp.where(matched, cell * c + gt_cls.astype(jnp.int32), ncell * c)
        hot = jnp.zeros((ncell * c + 1,), jnp.float32).at[cls_idx].max(1.0)[:ncell * c]
        ls = self.label_smooth
        tcls = (ls + hot * (1.0 - 2.0 * ls)).reshape(nA, nH, nW, c)

        bbox_t = (bbox_pos_mask, bbox_neg_mask, bbox_pos_scale, txy, twh, tiou, tcls)
        return bbox_t, (gxy, gwh, ma, matched)

    # -------------------------------------------------------------- orientation

    def _orientation_targets(self, gxy, gwh, ma, matched, gt_mask):
        sw, sh = float(self.scale_wh[0]), float(self.scale_wh[1])
        centers = gxy * jnp.array([sw, sh])  # (N, 2) pixel centers
        vwh = (gwh * self.valid_region + 0.5) * jnp.array([sw, sh])  # (N, 2)
        cwh = vwh / self.valid_region * self.center_region  # (N, 2)
        bounds = _paint_bounds(centers, vwh, self.image_h, self.image_w)
        a_onehot = (jnp.arange(self.num_anchors)[None, :] == ma[:, None]) \
            & matched[:, None]
        return _paint_chunk_loop(
            centers, cwh, bounds, a_onehot, matched, gt_mask,
            self.pixel_anchors, self.chunk, self.image_h, self.image_w,
        )


class OrientationPainter:
    """Paints orientation targets for ALL scales in one image-resolution pass.

    Each GT's anchor argmax selects exactly one of the 9 global anchors, so the
    reference's three per-scale painting loops (orienmask_yolo_loss.py:241-275,
    one per scale) partition the GT set.  Painting on a (9, H, W) canvas does
    the same total canvas traffic but computes the per-chunk ROI/offset fields
    ONCE instead of once per scale, and runs one dynamic-trip loop instead of
    three — ~3x less painting work per train step.

    Per-GT geometry (centers/margins) is computed with the owning scale's
    grid constants gathered per GT, replicating TargetBuilder's op sequence
    exactly (bit-identical outputs; see test_unified_painter_matches_per_scale).
    """

    def __init__(self, image_size, anchors, anchor_mask, grid_size,
                 center_region=0.6, valid_region=0.6, chunk=8):
        self.image_h, self.image_w = (image_size, image_size) \
            if isinstance(image_size, int) else tuple(image_size)
        self.center_region = center_region
        self.valid_region = valid_region
        self.chunk = chunk
        self.pixel_anchors = np.asarray(anchors, np.float32)  # (A_all, 2)
        n_all = len(self.pixel_anchors)
        self.num_anchors = n_all
        self.anchor_masks = [list(m) for m in anchor_mask]

        image_wh = np.array([self.image_w, self.image_h], np.float32)
        # per global anchor: owning scale's grid (nW, nH) and pixels-per-cell
        self.anchor_grid_wh = np.ones((n_all, 2), np.float32)
        self.anchor_scale_wh = np.ones((n_all, 2), np.float32)
        for s, mask in enumerate(self.anchor_masks):
            gh, gw = (grid_size[s], grid_size[s]) \
                if isinstance(grid_size[s], int) else tuple(grid_size[s])
            grid_wh = np.array([gw, gh], np.float32)
            for a in mask:
                self.anchor_grid_wh[a] = grid_wh
                self.anchor_scale_wh[a] = image_wh / grid_wh

    def _geometry(self, gt_bbox, global_anchor):
        """Per-GT pixel geometry: centers, center-region extent, ROI bounds.
        Identical op sequence to TargetBuilder (ULP-exact equality).
        Works on (..., N, ·) batched or unbatched inputs."""
        ga = jnp.maximum(global_anchor, 0)
        grid_wh = jnp.asarray(self.anchor_grid_wh)[ga]    # (..., N, 2) [nW, nH]
        swh = jnp.asarray(self.anchor_scale_wh)[ga]       # (..., N, 2) [sw, sh]
        g = gt_bbox * jnp.concatenate([grid_wh, grid_wh], axis=-1)
        gxy, gwh = g[..., 0:2], g[..., 2:4]
        centers = gxy * swh
        vwh = (gwh * self.valid_region + 0.5) * swh
        cwh = vwh / self.valid_region * self.center_region
        w, h = self.image_w, self.image_h
        x1 = jnp.round(jnp.clip(centers[..., 0] - vwh[..., 0], 0, w - 1))
        x2 = jnp.round(jnp.clip(centers[..., 0] + vwh[..., 0], 0, w - 1)) + 1
        y1 = jnp.round(jnp.clip(centers[..., 1] - vwh[..., 1], 0, h - 1))
        y2 = jnp.round(jnp.clip(centers[..., 1] + vwh[..., 1], 0, h - 1)) + 1
        return centers, cwh, jnp.stack([x1, x2, y1, y2], axis=-1)

    def kernel_inputs(self, gt_bbox, global_anchor, matched):
        """Batched geometry for the fused Pallas kernel
        (ops/pallas_paint.py::paint_orientation): (B, N, 10) geom rows
        [cx, cy, cwx, cwy, x1, x2, y1, y2, anchor, active] + (B,) trip counts."""
        centers, cwh, bounds = self._geometry(gt_bbox, global_anchor)
        geom = jnp.concatenate([
            centers, cwh, bounds,
            jnp.maximum(global_anchor, 0).astype(jnp.float32)[..., None],
            matched.astype(jnp.float32)[..., None],
        ], axis=-1)
        n = gt_bbox.shape[-2]
        n_last = jnp.max(
            jnp.where(matched, jnp.arange(1, n + 1, dtype=jnp.int32), 0), axis=-1
        )
        return geom, n_last

    def __call__(self, gt_bbox, global_anchor, matched, gt_mask):
        """Args (one sample): gt_bbox (N, 4) normalized cxcywh; global_anchor
        (N,) int32 in [0, A_all) (anything for unmatched rows); matched (N,)
        bool; gt_mask (N, H, W) bool.
        Returns orien_pos/orien_neg (A_all, H, W), torien (A_all, H, W, 2)."""
        centers, cwh, bounds = self._geometry(gt_bbox, global_anchor)
        ga = jnp.maximum(global_anchor, 0)
        a_onehot = (jnp.arange(self.num_anchors)[None, :] == ga[:, None]) \
            & matched[:, None]
        return _paint_chunk_loop(
            centers, cwh, bounds, a_onehot, matched, gt_mask,
            self.pixel_anchors, self.chunk, self.image_h, self.image_w,
        )
