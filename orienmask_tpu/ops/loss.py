"""OrienMask multi-scale loss (reference eval/base.py + eval/orienmask_yolo_loss.py).

Fully traceable: the whole loss (including target building) runs inside the jitted
train step; per-item logs are returned as device scalars and only converted to python
floats at the logging boundary.  BCE terms are computed from logits (numerically
stable softplus form — identical in exact math to the reference's sigmoid+BCELoss).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import bilinear_resize
from .targets import OrientationPainter, TargetBuilder


def _pair(x):
    return (x, x) if isinstance(x, int) else tuple(x)


def bce_with_logits(logits, targets):
    """Elementwise binary cross entropy from logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def smooth_l1(pred, target):
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


class OrienMaskYOLOLoss:
    """Single-scale loss; see reference OrienMaskYOLOLoss._get_loss (loss.py:63-153)."""

    def __init__(self, grid_size, image_size, anchors, anchor_mask, num_classes,
                 loss_id, loss_sum_id, metric_id, center_region=0.6, valid_region=0.6,
                 label_smooth=False, obj_ignore_threshold=0.5, weight=None,
                 target_chunk=8):
        self.grid_h, self.grid_w = _pair(grid_size)
        self.image_h, self.image_w = _pair(image_size)
        self.anchor_mask = list(anchor_mask)
        self.num_anchors = len(self.anchor_mask)
        self.num_classes = num_classes
        self.loss_id = loss_id
        self.loss_sum_id = loss_sum_id
        self.metric_id = metric_id or tuple()
        self.weight = np.asarray(
            weight if weight is not None else np.ones(len(loss_id)), np.float32
        )

        image_wh = np.array([self.image_w, self.image_h], np.float32)
        grid_wh = np.array([self.grid_w, self.grid_h], np.float32)
        all_anchors = np.asarray(anchors, np.float32)
        self.grid_anchors = (all_anchors / (image_wh / grid_wh))[self.anchor_mask]

        self.target_builder = TargetBuilder(
            grid_size, image_size, anchors, anchor_mask, num_classes,
            center_region, valid_region, label_smooth, obj_ignore_threshold,
            chunk=target_chunk,
        )

    def __call__(self, predict, target, training=True, orien=None):
        loss_items, metric_items = self._get_loss(predict, target, training, orien)
        w = jnp.asarray(self.weight)
        loss_cat = jnp.stack(loss_items) * w
        loss_log = {k: v for k, v in zip(self.loss_id, loss_cat)}
        metric_log = {k: v for k, v in zip(self.metric_id, metric_items)}
        loss_sum = loss_cat.sum()
        loss_log[self.loss_sum_id] = loss_sum
        return loss_sum, loss_log, metric_log

    def _get_loss(self, predict, target, training=True, orien=None):
        pred_bbox, pred_orien = predict  # NHWC
        nb = pred_bbox.shape[0]
        na, nh, nw = self.num_anchors, self.grid_h, self.grid_w
        h, w = self.image_h, self.image_w

        # (B, nH, nW, A*(5+C)) -> (B, A, nH, nW, 5+C)
        pb = pred_bbox.reshape(nb, nh, nw, na, 5 + self.num_classes).transpose(0, 3, 1, 2, 4)
        # (B, h4, w4, A*2) -> upsample x4 -> (B, A, H, W, 2)
        po = bilinear_resize(pred_orien, h, w)
        po = po.reshape(nb, h, w, na, 2).transpose(0, 3, 1, 2, 4)

        xy_logit = pb[..., 0:2]
        pred_xy = jax.nn.sigmoid(xy_logit)
        pred_wh = pb[..., 2:4]
        obj_logit = pb[..., 4]
        cls_logit = pb[..., 5:]

        # decoded boxes for the ignore-IoU test (grid units, gradient-detached)
        mesh_x = jnp.arange(nw, dtype=jnp.float32)[None, None, None, :]
        mesh_y = jnp.arange(nh, dtype=jnp.float32)[None, None, :, None]
        bx = jax.lax.stop_gradient(pred_xy[..., 0]) + mesh_x
        by = jax.lax.stop_gradient(pred_xy[..., 1]) + mesh_y
        ganch = jnp.asarray(self.grid_anchors)
        bw = jnp.exp(jax.lax.stop_gradient(pred_wh[..., 0])) * ganch[:, 0][None, :, None, None]
        bh = jnp.exp(jax.lax.stop_gradient(pred_wh[..., 1])) * ganch[:, 1][None, :, None, None]
        pred_boxes = jnp.stack([bx, by, bw, bh], axis=-1).reshape(nb, -1, 4)

        # Targets are constants w.r.t. params (reference detaches pred boxes);
        # stop_gradient keeps AD from building a transpose of the painting scan.
        if orien is None:
            # standalone path: this scale paints its own orientation targets
            (bbox_pos_mask, bbox_neg_mask, bbox_pos_scale, txy, twh, tiou, tcls,
             orien_pos_mask, orien_neg_mask, torien) = jax.lax.stop_gradient(
                jax.vmap(self.target_builder)(
                    target["bbox"], target["cls"], target["mask"],
                    target["valid"], pred_boxes,
                )
            )
        else:
            # shared path: orientation targets painted once for all scales by
            # OrienMaskYOLOMultiScaleLoss's OrientationPainter and sliced here
            (bbox_pos_mask, bbox_neg_mask, bbox_pos_scale, txy, twh, tiou,
             tcls) = jax.lax.stop_gradient(
                jax.vmap(self.target_builder.bbox_targets)(
                    target["bbox"], target["cls"], target["valid"], pred_boxes,
                )
            )
            orien_pos_mask, orien_neg_mask, torien = orien

        # Optional per-sample weights (val batches wrap-padded to a static
        # shape carry 0 for duplicated samples — reference evaluates a short
        # last batch instead, so sums and the batch divisor must exclude
        # pads exactly).  Weights scale the SELECTOR masks only, never BCE
        # targets; with no padding this reduces to the reference formulas.
        w = target.get("sample_weight")
        if w is not None:
            wb = w[:, None, None, None]
            div = jnp.maximum(w.sum(), 1.0)
            pos_sel = bbox_pos_mask * wb
            neg_sel = bbox_neg_mask * wb
            pos_scale_sel = bbox_pos_scale * wb
            orien_pos_sel = orien_pos_mask * wb
            orien_neg_sel = orien_neg_mask * wb
        else:
            div = nb
            pos_sel = bbox_pos_mask
            neg_sel = bbox_neg_mask
            pos_scale_sel = bbox_pos_scale
            orien_pos_sel = orien_pos_mask
            orien_neg_sel = orien_neg_mask

        loss_xy = (bce_with_logits(xy_logit, txy) * pos_scale_sel[..., None]).sum() / div
        loss_wh = (jnp.square(pred_wh - twh) * pos_scale_sel[..., None]).sum() / 2 / div
        loss_obj_all = bce_with_logits(obj_logit, bbox_pos_mask)
        loss_obj_pos = (loss_obj_all * pos_sel).sum() / div
        loss_obj_neg = (loss_obj_all * neg_sel).sum() / div
        loss_cls = (bce_with_logits(cls_logit, tcls) * pos_sel[..., None]).sum() / div

        num_orien_pos = orien_pos_sel.sum()
        num_orien_neg = orien_neg_sel.sum()
        bbox_pos_count = pos_sel.sum()
        loss_orien_all = smooth_l1(po, torien)
        loss_orien_pos = jnp.where(
            num_orien_pos > 0,
            (loss_orien_all * orien_pos_sel[..., None]).sum()
            / jnp.maximum(num_orien_pos, 1) * bbox_pos_count / div,
            0.0,
        )
        loss_orien_neg = jnp.where(
            num_orien_neg > 0,
            (loss_orien_all * orien_neg_sel[..., None]).sum()
            / jnp.maximum(num_orien_neg, 1) * bbox_pos_count / div,
            0.0,
        )

        loss_items = (loss_xy, loss_wh, loss_obj_pos, loss_obj_neg,
                      loss_cls, loss_orien_pos, loss_orien_neg)

        metric_items = ()
        if not training:
            pred_obj = jax.nn.sigmoid(obj_logit)
            pred_cls = jax.nn.sigmoid(cls_logit)
            bbox_neg_count = neg_sel.sum()
            orien_delta = jnp.abs(po - torien)
            metric_items = (
                ((pred_cls * (tcls > 0.5) * pos_sel[..., None]).sum(),
                 bbox_pos_count),                                            # cls_conf
                ((pred_obj * pos_sel).sum(), bbox_pos_count),                # obj_pos
                ((pred_obj * neg_sel).sum(), bbox_neg_count),                # obj_neg
                ((tiou * pos_sel).sum(), bbox_pos_count),                    # avg_iou
                (((tiou > 0.5) * pos_sel).sum(), bbox_pos_count),            # recall50
                (((tiou > 0.75) * pos_sel).sum(), bbox_pos_count),           # recall75
                (((orien_delta < 0.5) * orien_pos_sel[..., None]).sum(),
                 num_orien_pos * 2),                                         # orien_pos_acc
                (((orien_delta < 0.5) * orien_neg_sel[..., None]).sum(),
                 num_orien_neg * 2),                                         # orien_neg_acc
            )

        return loss_items, metric_items


class OrienMaskYOLOMultiScaleLoss:
    """Composes one per-scale loss per grid size; aggregates with scales_weight
    (reference eval/base.py:44-142, eval/orienmask_yolo_loss.py:289-325)."""

    def __init__(self, grid_size, image_size, anchors, anchor_mask, num_classes,
                 loss_id=("loss_xy", "loss_wh", "loss_obj", "loss_noobj",
                          "loss_cls", "loss_orien_pos", "loss_orien_neg"),
                 loss_sum_id="loss_sum", scales_id=("S32", "S16", "S08"),
                 metric_id=("cls_conf", "obj_pos", "obj_neg", "avg_iou",
                            "recall50", "recall75", "orien_pos_acc", "orien_neg_acc"),
                 # NOTE: valid_region defaults to 0.7 here but 0.6 in the
                 # per-scale OrienMaskYOLOLoss — a reference quirk preserved
                 # verbatim (orienmask_yolo_loss.py:12 vs :296); every shipped
                 # config passes 0.6 explicitly.
                 center_region=0.6, valid_region=0.7, label_smooth=False,
                 obj_ignore_threshold=0.5, weight=None, scales_weight=None,
                 target_chunk=8, painter_impl="auto", painter_interpret=False):
        assert len(grid_size) == len(anchor_mask) == len(scales_id)
        self.num_scales = len(scales_id)
        self.loss_suffix = list(loss_id) + [loss_sum_id]
        self.metric_suffix = list(metric_id)
        self.scales_prefix = list(scales_id)
        self.loss_sum_id = loss_sum_id
        self.scales_weight = np.asarray(
            scales_weight if scales_weight is not None else np.ones(self.num_scales),
            np.float32,
        )

        self.loss_id, self.metric_id = [], []
        self.scales_loss_id, self.scales_loss_sum_id, self.scales_metric_id = [], [], []
        self.scale_losses = []
        for i in range(self.num_scales):
            sid = scales_id[i]
            s_loss_id = [f"{sid}_{x}" for x in loss_id]
            s_sum_id = f"{sid}_{loss_sum_id}"
            s_metric_id = [f"{sid}_{x}" for x in metric_id]
            self.loss_id += s_loss_id + [s_sum_id]
            self.metric_id += s_metric_id
            self.scales_loss_id.append(s_loss_id)
            self.scales_loss_sum_id.append(s_sum_id)
            self.scales_metric_id.append(s_metric_id)
            # scales_weight is applied ONCE, at aggregation below (reference
            # eval/base.py:117-119) — per-scale item weights must not carry it
            # or loss_sum would scale by scales_weight squared.
            self.scale_losses.append(OrienMaskYOLOLoss(
                grid_size[i], image_size, anchors, anchor_mask[i], num_classes,
                s_loss_id, s_sum_id, s_metric_id, center_region, valid_region,
                label_smooth, obj_ignore_threshold, weight, target_chunk,
            ))
        self.cross_scale_loss_id = [f"cross_scale_{x}" for x in self.loss_suffix]
        self.loss_id += self.cross_scale_loss_id
        self.cross_scale_metric_id = [f"cross_scale_{x}" for x in self.metric_suffix]
        self.metric_id += self.cross_scale_metric_id

        # One image-resolution painting pass shared by all scales (each GT's
        # anchor argmax lands on exactly one scale — see OrientationPainter).
        self.painter = OrientationPainter(
            image_size, anchors, anchor_mask, grid_size,
            center_region, valid_region, chunk=target_chunk,
        )
        # 'pallas' = fused TPU kernel (ops/pallas_paint.py), 'xla' = chunked
        # while_loop (ops/targets.py). 'auto' = pallas on TPU backends.
        # Under a multi-device mesh the kernel must run through shard_map
        # (GSPMD has no partitioning rule for pallas_call and would replicate
        # it) — make_train_step/make_eval_step call set_paint_mesh for that.
        if painter_impl == "auto":
            from ..utils.envs import is_tpu_platform

            painter_impl = "pallas" if is_tpu_platform() else "xla"
        self.painter_impl = painter_impl
        self.painter_interpret = painter_interpret  # tests: kernel on CPU
        self.paint_mesh = None

    def set_paint_mesh(self, mesh, axis=None):
        """Tell the painter about the batch-sharded mesh so the Pallas kernel
        runs per-shard via shard_map (each device paints its local batch)."""
        from ..parallel.mesh import DATA_AXIS

        self.paint_mesh = mesh
        self.paint_axis = axis or DATA_AXIS

    def _global_anchor(self, gt_bbox, gt_valid):
        """One sample: global anchor per GT from the per-scale matchers (so
        the painted set agrees exactly with each scale's bbox-side
        assignment); -1 where unmatched."""
        ga = jnp.full(gt_bbox.shape[:1], -1, jnp.int32)
        for sl in self.scale_losses:
            tb = sl.target_builder
            local, matched = tb.match(gt_bbox, gt_valid)
            cand = jnp.asarray(np.asarray(tb.anchor_mask, np.int32))[
                jnp.maximum(local, 0)]
            ga = jnp.where(matched & (ga < 0), cand, ga)
        return ga

    def _paint_shared_batch(self, gt_bbox, gt_valid, gt_mask):
        ga = jax.vmap(self._global_anchor)(gt_bbox, gt_valid)
        matched = ga >= 0
        if self.painter_impl != "pallas" and gt_mask.shape[-1] != self.painter.image_w:
            # XLA painter consumes unpacked masks; the Pallas kernel takes
            # bit-packed masks directly (8x less DMA traffic).
            gt_mask = jnp.unpackbits(gt_mask, axis=-1, count=self.painter.image_w)
        if self.painter_impl == "pallas":
            from .pallas_paint import paint_orientation

            geom, n_last = self.painter.kernel_inputs(gt_bbox, ga, matched)
            paint = functools.partial(
                paint_orientation,
                pixel_anchors=self.painter.pixel_anchors,
                image_size=(self.painter.image_h, self.painter.image_w),
                interpret=self.painter_interpret,
            )
            if self.paint_mesh is not None and self.paint_mesh.size > 1:
                from jax.sharding import PartitionSpec as P

                spec = P(self.paint_axis)
                # check_vma=False: pallas_call out_shapes carry no vma info
                paint = jax.shard_map(
                    paint, mesh=self.paint_mesh,
                    in_specs=(spec, spec, spec), out_specs=(spec, spec, spec),
                    check_vma=False,
                )
            return paint(geom, n_last, gt_mask)
        return jax.vmap(self.painter)(gt_bbox, ga, matched, gt_mask)

    def __call__(self, predict, target, training=True):
        pos9, neg9, tor9 = jax.lax.stop_gradient(self._paint_shared_batch(
            target["bbox"], target["valid"], target["mask"]
        ))

        loss_list, loss_log, metric_log = [], {}, {}
        for i in range(self.num_scales):
            idx = np.asarray(self.scale_losses[i].target_builder.anchor_mask)
            if np.array_equal(idx, np.arange(idx[0], idx[0] + idx.size)):
                # anchor masks are contiguous runs ([6,7,8],[3,4,5],[0,1,2]):
                # a static slice beats the gather jnp.take would emit.
                lo, hi = int(idx[0]), int(idx[0] + idx.size)
                sel = lambda a: jax.lax.slice_in_dim(a, lo, hi, axis=1)
            else:
                sel = lambda a: jnp.take(a, idx, axis=1)
            orien_i = (sel(pos9), sel(neg9), sel(tor9))
            s_loss, s_loss_log, s_metric_log = self.scale_losses[i](
                predict[i], target, training, orien=orien_i
            )
            loss_list.append(s_loss)
            loss_log.update(s_loss_log)
            metric_log.update(s_metric_log)

        sw = jnp.asarray(self.scales_weight)
        loss_sum = (jnp.stack(loss_list) * sw).sum()
        loss_log[self.loss_sum_id] = loss_sum

        # cross-scale aggregates (device scalars)
        for j, suffix in enumerate(self.loss_suffix):
            total = 0.0
            for i in range(self.num_scales):
                key = f"{self.scales_prefix[i]}_{suffix}"
                total = total + loss_log[key] * sw[i]
            loss_log[f"cross_scale_{suffix}"] = total
        if metric_log:
            for suffix in self.metric_suffix:
                num = 0.0
                den = 0.0
                for i in range(self.num_scales):
                    v = metric_log[f"{self.scales_prefix[i]}_{suffix}"]
                    num = num + v[0]
                    den = den + v[1]
                metric_log[f"cross_scale_{suffix}"] = (num, den)

        return loss_sum, loss_log, metric_log
