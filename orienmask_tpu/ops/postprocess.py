"""OrienMask postprocess as one static-shape XLA program.

Reference: eval/orienmask_yolo_postprocess.py + the eval/src CUDA NMS extension.
The reference loops over images in Python, filters with dynamic-shape ``nonzero``,
calls a CUDA NMS kernel (device->host sync for the suppression mask) and assembles
masks per image.  Here the entire batch path — decode, confidence filter, top-k,
class-offset greedy NMS, orientation->mask assembly — is a single jitted function:

  * dynamic ``nonzero`` -> score-masked ``top_k`` to ``nms_pre`` (same selected set:
    both keep the top 400 above-threshold (det, class) pairs);
  * CUDA NMS -> exact greedy NMS as a suppression-closure fixpoint (ops/nms.py);
  * per-detection orientation mask via the normalized-coordinate identity
    ``|up * anchor_norm/2 + mesh_norm - center| < orien_thresh * wh`` which folds the
    reference's per-scale ``base_xy`` grids (postprocess.py:38-61,141-164) into one
    resolution-independent form;
  * the three stride-4 orientation maps are upsampled x4 (bilinear,
    align_corners=False) with MXU matmuls in one shot.

Flatten order is scale-major then anchor-major, matching the reference concatenation
(postprocess.py:59-63) for tie-breaking parity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import bilinear_resize
from .nms import NEG_INF, batched_class_nms


def _pair(x):
    return (x, x) if isinstance(x, int) else tuple(x)


class OrienMaskYOLOPostProcess:
    def __init__(self, grid_size, image_size, anchors, anchor_mask, num_classes,
                 conf_thresh=0.05, nms=None, nms_pre=400, nms_post=100,
                 orien_thresh=0.3, topk_mode="twostage", pack_masks=False,
                 use_pallas_masks="auto", topk_nsplit=None,
                 use_pallas_topk="auto"):
        self.grid_hw = [tuple(g) for g in grid_size]
        self.image_h, self.image_w = _pair(image_size)
        self.anchor_mask = [list(m) for m in anchor_mask]
        self.num_anchors_total = len(anchors)
        self.num_classes = num_classes
        self.conf_thresh = float(conf_thresh)
        nms = nms or {}
        self.nms_threshold = float(nms.get("threshold", 0.5))
        self.nms_pre = int(nms_pre)
        self.nms_post = int(nms_post)
        self.orien_thresh = float(orien_thresh)
        # ORIENMASK_TOPK_MODE overrides the configured candidate-selection
        # formulation ("twostage" native-layout vs "exact" flat-buffer — both
        # bit-identical outputs, tests/test_postprocess.py) for on-chip A/Bs
        # without editing configs
        import os as _os

        self.topk_mode = _os.environ.get("ORIENMASK_TOPK_MODE", topk_mode)
        # split factor for the big candidate top-k (exact, see _topk_split);
        # tunable because the optimum depends on head size P vs nms_pre —
        # ORIENMASK_TOPK_NSPLIT overrides for on-chip sweeps
        if topk_nsplit is None:
            topk_nsplit = int(_os.environ.get("ORIENMASK_TOPK_NSPLIT", "2"))
        self.topk_nsplit = int(topk_nsplit)
        self.pack_masks = pack_masks
        if use_pallas_masks == "auto":
            # TPU-only kernel (pltpu grid specs): gate on the platform like the
            # painter's auto check, not on "any non-CPU backend" — a CUDA
            # default backend must take the XLA path.
            from ..utils.envs import is_tpu_platform

            use_pallas_masks = is_tpu_platform()
        self.use_pallas_masks = bool(use_pallas_masks)
        # Pallas radix-select for the two twostage selection top-ks
        # (ops/pallas_topk.py — bit-identical to lax.top_k).  TPU-only kernel;
        # ORIENMASK_PALLAS_TOPK=0/1 overrides for on-chip A/Bs.
        env_topk = _os.environ.get("ORIENMASK_PALLAS_TOPK")
        if env_topk is not None:
            use_pallas_topk = env_topk not in ("0", "")
        if use_pallas_topk == "auto":
            from ..utils.envs import is_tpu_platform

            use_pallas_topk = is_tpu_platform()
        self.use_pallas_topk = bool(use_pallas_topk)

        anchors = np.asarray(anchors, np.float32)
        self.norm_anchors = anchors / np.array([self.image_w, self.image_h], np.float32)

        # Global anchor index of every flattened prediction (scale-major, anchor-major).
        det_anchor = []
        for (nh, nw), mask in zip(self.grid_hw, self.anchor_mask):
            det_anchor.append(np.repeat(np.asarray(mask, np.int32), nh * nw))
        self.det_anchor_idx = np.concatenate(det_anchor)
        self.num_preds = int(self.det_anchor_idx.shape[0])

        # Per-flat-prediction decode constants (grid cell, grid size): decoding
        # happens AFTER candidate selection on the nms_pre gathered rows only,
        # so these are gathered alongside (the round-1 design decoded all P
        # predictions and materialized (P, C) conf twice — ~0.3 ms/frame of
        # HBM traffic + badly-laid-out reductions at 544^2).
        gx, gy, gnw, gnh = [], [], [], []
        for (nh, nw), mask in zip(self.grid_hw, self.anchor_mask):
            na = len(mask)
            gy_s, gx_s = np.mgrid[0:nh, 0:nw]
            gx.append(np.tile(gx_s.ravel(), na))
            gy.append(np.tile(gy_s.ravel(), na))
            gnw.append(np.full(na * nh * nw, nw, np.float32))
            gnh.append(np.full(na * nh * nw, nh, np.float32))
        self.det_grid_x = np.concatenate(gx).astype(np.float32)
        self.det_grid_y = np.concatenate(gy).astype(np.float32)
        self.det_grid_nw = np.concatenate(gnw)
        self.det_grid_nh = np.concatenate(gnh)

        # Channel permutation taking scale-major orientation channels to global
        # anchor order: upsampled channel layout is [scale0 anchors, scale1, scale2],
        # each anchor contributing (x, y).
        perm = np.zeros(self.num_anchors_total * 2, np.int64)
        c = 0
        for mask in self.anchor_mask:
            for a in mask:
                perm[2 * a] = c
                perm[2 * a + 1] = c + 1
                c += 2
        self.orien_channel_perm = perm

        # Normalized pixel-center mesh (reference base_xy collapsed, see module doc).
        ys = (np.arange(self.image_h, dtype=np.float32)) / self.image_h
        xs = (np.arange(self.image_w, dtype=np.float32)) / self.image_w
        self.mesh_x = xs[None, :]  # (1, W)
        self.mesh_y = ys[:, None]  # (H, 1)

        self._apply_batch = jax.jit(self._run_batch)

    # ------------------------------------------------------------------ decode

    def _flat_head(self, pred_bboxes):
        """3x (H, W, A*(5+C)) -> (P, 5+C) f32 raw head rows, scale-major then
        anchor-major — the ONE materialized buffer candidate selection and
        post-selection decode both read (flatten order matches the reference
        concatenation, postprocess.py:59-63, for tie-breaking parity)."""
        c = self.num_classes
        rows = []
        for i, bbox in enumerate(pred_bboxes):
            nh, nw = self.grid_hw[i]
            na = len(self.anchor_mask[i])
            rows.append(
                bbox.reshape(nh, nw, na, 5 + c)
                .transpose(2, 0, 1, 3)
                .reshape(-1, 5 + c)
            )
        return jnp.concatenate(rows, axis=0)

    def _decode_rows(self, rows, det_idx):
        """Decode ``nms_pre`` gathered head rows -> (n, 4) normalized cxcywh.

        Same arithmetic as the reference decode (sigmoid(xy)+grid)/n,
        exp(wh)*anchor (eval/orienmask_yolo_postprocess.py:133-136), applied
        only to the selected candidates."""
        gx = jnp.asarray(self.det_grid_x)[det_idx]
        gy = jnp.asarray(self.det_grid_y)[det_idx]
        nw = jnp.asarray(self.det_grid_nw)[det_idx]
        nh = jnp.asarray(self.det_grid_nh)[det_idx]
        awh = jnp.asarray(self.norm_anchors)[jnp.asarray(self.det_anchor_idx)[det_idx]]
        x = (jax.nn.sigmoid(rows[:, 0]) + gx) / nw
        y = (jax.nn.sigmoid(rows[:, 1]) + gy) / nh
        w = jnp.exp(rows[:, 2]) * awh[:, 0]
        h = jnp.exp(rows[:, 3]) * awh[:, 1]
        return jnp.stack([x, y, w, h], axis=-1)

    # ----------------------------------------------------------- candidate sel

    @staticmethod
    def _topk_split(x, k, nsplit=2):
        """Exact top-k via per-half top-k + merge.

        Any partition of x preserves the global top-k multiset (every global
        top-k element is in its own part's top-k), so two smaller sorts + an
        (nsplit*k,) merge replace one large sort.  Tie-breaking: parts are
        contiguous ranges and lax.top_k breaks ties by lower index, so the
        merged (value, part-local lower index) order equals the global
        lower-index order — bit-identical results to lax.top_k(x, k)."""
        n = x.shape[0]
        bound = -(-n // nsplit)
        vs, is_ = [], []
        for s in range(nsplit):
            lo = s * bound
            hi = min(n, lo + bound)
            v, i = jax.lax.top_k(x[lo:hi], min(k, hi - lo))
            vs.append(v)
            is_.append(i + lo)
        v2, j = jax.lax.top_k(jnp.concatenate(vs), k)
        return v2, jnp.concatenate(is_)[j]

    def _topk(self, x, k):
        """Selection top-k for the twostage path: Pallas radix-select on TPU
        (ops/pallas_topk.py), split-merge ``lax.top_k`` elsewhere — both
        bit-identical to ``jax.lax.top_k(x, k)``."""
        if self.use_pallas_topk:
            from .pallas_topk import exact_topk

            return exact_topk(x, k)
        return self._topk_split(x, k, nsplit=self.topk_nsplit)

    def _flat_scores(self, pred_bboxes):
        """Per-detection max score vector in flat order WITHOUT materializing
        the (P, 5+C) buffer: the cls-max + sigmoid run in each scale's native
        (H, W, A, 5+C) layout (fusable with the head conv's output), and only
        the tiny (P,) score vector is transposed into scale-major anchor-major
        order.  Bit-identical to ``_select_candidates``'s per-det max on the
        flat buffer: same elements, same ops, same flatten order."""
        c = self.num_classes
        scores = []
        for i, bbox in enumerate(pred_bboxes):
            nh, nw = self.grid_hw[i]
            na = len(self.anchor_mask[i])
            x = bbox.reshape(nh, nw, na, 5 + c)
            s = jax.nn.sigmoid(jnp.max(x[..., 5:], axis=-1)) \
                * jax.nn.sigmoid(x[..., 4])
            scores.append(s.transpose(2, 0, 1).reshape(-1))
        return jnp.concatenate(scores)

    def _gather_rows(self, pred_bboxes, det_idx):
        """Gather ``det_idx`` (flat scale-major anchor-major indices) head rows
        directly from the per-scale native-layout tensors — the index
        arithmetic (a, y, x) -> native (y, x, a) replaces the big transposed
        buffer ``_flat_head`` materializes ((B, P, 5+C) f32: 6.2 MB/image at
        544², ~100 MB at batch-16 — the round-3 batch-16 regression suspect).
        Returns (n, 5+C) rows, bit-identical to ``flat[det_idx]``."""
        c = self.num_classes
        out = None
        off = 0
        for i, bbox in enumerate(pred_bboxes):
            nh, nw = self.grid_hw[i]
            na = len(self.anchor_mask[i])
            size = na * nh * nw
            local = det_idx - off
            inside = (local >= 0) & (local < size)
            lc = jnp.clip(local, 0, size - 1)
            a = lc // (nh * nw)
            cell = lc % (nh * nw)
            native = bbox.reshape(nh * nw * na, 5 + c)
            rows = native[cell * na + a]
            out = rows if out is None else jnp.where(inside[:, None], rows, out)
            off += size
        return out

    def _select_candidates(self, flat):
        """Top ``nms_pre`` above-threshold (det, class) pairs from the (P, 5+C)
        raw head buffer. Score = sigmoid(cls) * sigmoid(obj)."""
        c = self.num_classes
        if self.topk_mode == "exact":
            conf = jax.nn.sigmoid(flat[:, 5:]) * jax.nn.sigmoid(flat[:, 4:5])
            masked = jnp.where(conf > self.conf_thresh, conf, -1.0)
            v, idx = jax.lax.top_k(masked.reshape(-1), self.nms_pre)
            det_idx = idx // c
            cls_idx = idx % c
        else:
            # Two-stage: top nms_pre detections by per-det max, then top
            # nms_pre pairs within. Equal to exact selection except at exact
            # score ties. The per-det max is computed WITHOUT materializing
            # (P, C) scores: sigmoid is monotone and sigmoid(obj) >= 0, so
            # max_c sigmoid(cls_c)*sigmoid(obj) == sigmoid(max_c cls_c)*
            # sigmoid(obj) bit-for-bit (same final multiply).
            det_max = jax.nn.sigmoid(jnp.max(flat[:, 5:], axis=1)) \
                * jax.nn.sigmoid(flat[:, 4])
            det_max = jnp.where(det_max > self.conf_thresh, det_max, -1.0)
            # _topk: Pallas radix-select on TPU, split-merge lax.top_k
            # elsewhere (18207 elements sit just above the top-k size cliff:
            # one top_k 0.84 ms vs split2 0.48 ms standalone vs ~µs-scale
            # radix select, tools/bench_sel_stem.py, bench_detect.py) — all
            # bit-identical by the shared lax.top_k tie-break contract.
            _, top_det = self._topk(det_max, self.nms_pre)
            sub_rows = flat[top_det]  # (nms_pre, 5+C)
            sub = jax.nn.sigmoid(sub_rows[:, 5:]) \
                * jax.nn.sigmoid(sub_rows[:, 4:5])
            sub = jnp.where(sub > self.conf_thresh, sub, -1.0)
            v, idx = self._topk(sub.reshape(-1), self.nms_pre)
            det_idx = top_det[idx // c]
            cls_idx = idx % c
        valid = v > self.conf_thresh
        return det_idx, cls_idx, v, valid

    # ------------------------------------------------------------------- masks

    def _assemble_masks(self, orien_field, anchor_idx, boxes):
        """orien_field: (H, W, A_total, 2) upsampled raw orientation predictions.
        boxes: (K, 4) normalized cxcywh.  Returns (K, H, W) bool masks."""
        na = jnp.asarray(self.norm_anchors)  # (At, 2)
        mesh_x = jnp.asarray(self.mesh_x)
        mesh_y = jnp.asarray(self.mesh_y)

        def one(a, box):
            fx = orien_field[:, :, a, 0] * (na[a, 0] * 0.5) + mesh_x
            fy = orien_field[:, :, a, 1] * (na[a, 1] * 0.5) + mesh_y
            mx = jnp.abs(fx - box[0]) < self.orien_thresh * box[2]
            my = jnp.abs(fy - box[1]) < self.orien_thresh * box[3]
            return mx & my

        return jax.vmap(one)(anchor_idx, boxes)

    # ----------------------------------------------------------------- runners

    def _detect_image(self, pred_bboxes):
        """Candidate selection + per-candidate decode + NMS for one image
        (no masks). Box decode runs only on the nms_pre selected rows.

        The default (twostage) path never materializes the transposed
        (P, 5+C) buffer ``_flat_head`` builds: per-det max scores are reduced
        in each scale's native (H, W, A, 5+C) layout (``_flat_scores`` —
        fusable with the head convs' output), and only the nms_pre selected
        rows are gathered, with native-layout index arithmetic
        (``_gather_rows``).  At batch 16 / 544² the transposed buffer was
        ~100 MB of HBM writes+reads per step — the round-3 batch-16 > batch-8
        regression suspect.  Bit-identical outputs: same elements, same ops,
        same flatten order for tie-breaking (asserted against the flat-buffer
        path in tests/test_postprocess.py)."""
        c = self.num_classes
        if self.topk_mode != "twostage":
            flat = self._flat_head(pred_bboxes)
            det_idx, cls_idx, scores, valid = self._select_candidates(flat)
            cand_rows = flat[det_idx]
        else:
            det_max = self._flat_scores(pred_bboxes)
            det_max = jnp.where(det_max > self.conf_thresh, det_max, -1.0)
            _, top_det = self._topk(det_max, self.nms_pre)
            sub_rows = self._gather_rows(pred_bboxes, top_det)
            sub = jax.nn.sigmoid(sub_rows[:, 5:]) \
                * jax.nn.sigmoid(sub_rows[:, 4:5])
            sub = jnp.where(sub > self.conf_thresh, sub, -1.0)
            scores, idx = self._topk(sub.reshape(-1), self.nms_pre)
            det_idx = top_det[idx // c]
            cls_idx = idx % c
            valid = scores > self.conf_thresh
            cand_rows = sub_rows[idx // c]
        cand_boxes = self._decode_rows(cand_rows, det_idx)
        cand_anchor = jnp.asarray(self.det_anchor_idx)[det_idx]
        # scores is a top-k output (descending; the invalid tail maps to
        # NEG_INF and was already the suffix), so the NMS can skip its
        # argsort+gathers — bit-identical (stable argsort == identity here,
        # tests/test_postprocess.py::test_fixpoint_presorted_identity).
        nms_scores = jnp.where(valid, scores, NEG_INF)
        keep_idx, keep_valid = batched_class_nms(
            cand_boxes, nms_scores, cls_idx, self.nms_post, self.nms_threshold,
            presorted=True,
        )

        boxes = cand_boxes[keep_idx]
        out_scores = jnp.where(keep_valid, scores[keep_idx], 0.0)
        bbox_out = jnp.concatenate([boxes, out_scores[:, None]], axis=1)
        return {
            "bbox": bbox_out,
            "cls": cls_idx[keep_idx].astype(jnp.int32),
            "anchor": cand_anchor[keep_idx],
            "valid": keep_valid,
        }

    def _run_image(self, pred_bboxes, orien_field):
        det = self._detect_image(pred_bboxes)
        masks = self._assemble_masks(orien_field, det["anchor"], det["bbox"][:, :4])
        masks = masks & det["valid"][:, None, None]
        return {"bbox": det["bbox"], "cls": det["cls"], "mask": masks,
                "valid": det["valid"]}

    def _upsample_orientation(self, pred_oriens):
        """3x (B, H/4, W/4, A*2) -> (B, H, W, A_total, 2) in global anchor order.

        The scale-major -> global-anchor channel permutation runs BEFORE the
        x4 upsample: bilinear resize is channelwise, so the gather commutes
        bit-identically and touches 16x less data (the post-upsample gather
        measured ~1.5 ms/call at B=8 544^2, tools/profile_infer.py --batch 8)."""
        x = jnp.concatenate(pred_oriens, axis=-1)  # (B, H/4, W/4, 6A)
        x = x[..., jnp.asarray(self.orien_channel_perm)]
        up = bilinear_resize(x, self.image_h, self.image_w)
        b = up.shape[0]
        return up.reshape(b, self.image_h, self.image_w, self.num_anchors_total, 2)

    def _run_batch(self, predict):
        pred_bboxes = [p[0] for p in predict]
        pred_oriens = [p[1] for p in predict]
        orien_field = self._upsample_orientation(pred_oriens)

        if self.pack_masks and self.use_pallas_masks:
            # TPU path: fused Pallas mask assembly writing bit-packed bytes,
            # per-detection anchor slice DMA'd via scalar prefetch.
            # Static per-image unroll, deliberately: a single batched
            # pallas_call (grid (B, K, rows)) measured ~8% SLOWER at B=16
            # (43.3 vs 40.1 ms/batch) — separate calls let XLA overlap each
            # image's kernel with the surrounding decode/pack ops.
            from .pallas_masks import assemble_masks_packed

            dets = jax.vmap(self._detect_image)(pred_bboxes)
            field_t = orien_field.transpose(0, 3, 4, 1, 2)  # (B, A, 2, H, W)
            na = jnp.asarray(self.norm_anchors)
            b = field_t.shape[0]
            packed = []
            for i in range(b):
                anchor_i = dets["anchor"][i]
                packed.append(assemble_masks_packed(
                    field_t[i], dets["bbox"][i, :, :4], na[anchor_i], anchor_i,
                    orien_thresh=self.orien_thresh,
                    block_h=self._pallas_block_h(),
                ))
            masks = jnp.stack(packed)
            masks = masks * dets["valid"][..., None, None].astype(jnp.uint8)
            return {"bbox": dets["bbox"], "cls": dets["cls"], "mask": masks,
                    "valid": dets["valid"]}

        out = jax.vmap(self._run_image)(pred_bboxes, orien_field)
        if self.pack_masks:
            from .maskops import pack_bits
            out["mask"] = pack_bits(out["mask"])
        return out

    def _pallas_block_h(self):
        for bh in (136, 128, 64, 32, 16, 8):
            if self.image_h % bh == 0:
                return bh
        return self.image_h

    def apply_device(self, predict):
        """Jit-compiled batch postprocess; returns device arrays
        {'bbox': (B,K,5), 'cls': (B,K), 'mask': (B,K,H,W[/8]), 'valid': (B,K)}."""
        return self._apply_batch(tuple(tuple(p) for p in predict))

    def __call__(self, predict):
        """Reference-compatible API: list (len B) of per-image dicts with arrays
        trimmed to the valid detection count (host numpy)."""
        return self.to_host_list(self.apply_device(predict))

    def to_host_list(self, device_out):
        """Padded device output dict -> per-image trimmed numpy dicts."""
        out = jax.device_get(device_out)
        results = []
        for b in range(out["bbox"].shape[0]):
            n = int(out["valid"][b].sum())
            masks = out["mask"][b, :n]
            if self.pack_masks:
                # unpack AFTER the trim: the padded (K, H, W/8) buffer is
                # mostly invalid rows; K=100 x 544^2 bool per image would
                # materialize ~30 MB each for a handful of detections.
                from .maskops import unpack_bits_np
                masks = unpack_bits_np(masks, self.image_w)
            results.append({
                "bbox": out["bbox"][b, :n],
                "mask": masks,
                "cls": out["cls"][b, :n],
            })
        return results
