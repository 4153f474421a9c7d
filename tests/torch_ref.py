"""Independent PyTorch implementation of the OrienMask architecture, used only as a
numerical oracle in golden tests (the reference's published architecture, written
from its paper-level description — conv/BN/leaky stacks with the documented wiring).

This also doubles as a producer of reference-format state_dicts to exercise the
torch->jax weight converter.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchCBL(nn.Module):
    """Matches the reference state_dict layout: ``conv_block.{0,1,2}``."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=False),
            nn.BatchNorm2d(cout),
            nn.LeakyReLU(0.1),
        )

    def forward(self, x):
        return self.conv_block(x)


class TorchDarkBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Sequential(
            TorchCBL(c * 2, c, 1),
            TorchCBL(c, c * 2, 3, padding=1),
        )

    def forward(self, x):
        return x + self.conv(x)


class TorchDarkNet53(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TorchCBL(3, 32, 3, padding=1)
        for i, (c, n) in enumerate(zip((32, 64, 128, 256, 512), (1, 2, 8, 8, 4)), start=2):
            layers = [TorchCBL(c, c * 2, 3, stride=2, padding=1)]
            layers += [TorchDarkBlock(c) for _ in range(n)]
            setattr(self, f"conv{i}", nn.Sequential(*layers))

    def forward(self, x):
        x = self.conv1(x)
        x = self.conv2(x)
        x4 = self.conv3(x)
        x8 = self.conv4(x4)
        x16 = self.conv5(x8)
        x32 = self.conv6(x16)
        return x32, x16, x8, x4


def t_neck(cin, cout):
    return nn.Sequential(
        TorchCBL(cin, cout, 1),
        TorchCBL(cout, cout * 2, 3, padding=1),
        TorchCBL(cout * 2, cout, 1),
        TorchCBL(cout, cout * 2, 3, padding=1),
        TorchCBL(cout * 2, cout, 1),
    )


def t_route(cin, cout, up):
    return nn.Sequential(TorchCBL(cin, cout, 1), nn.Upsample(scale_factor=up, mode="nearest"))


def t_bbox_head(cin, cout):
    return nn.Sequential(TorchCBL(cin, cin * 2, 3, padding=1), nn.Conv2d(cin * 2, cout, 1))


def t_orien_head(cin, cout):
    return nn.Sequential(
        TorchCBL(cin, cin * 2, 3, padding=1),
        TorchCBL(cin * 2, cin, 1),
        TorchCBL(cin, cin * 2, 3, padding=1),
        TorchCBL(cin * 2, cin, 1),
        TorchCBL(cin, cin * 2, 3, padding=1),
        nn.Conv2d(cin * 2, cout, 1),
    )


class TorchOrienMaskFPNPlus(nn.Module):
    def __init__(self, num_anchors=3, num_classes=80):
        super().__init__()
        self.num_anchors = num_anchors
        a = num_anchors
        bbox_dim = a * (5 + num_classes)
        self.backbone = TorchDarkNet53()
        self.neck32 = t_neck(1024, 512)
        self.neck16 = t_neck(768, 256)
        self.neck8 = t_neck(384, 128)
        self.neck4 = t_neck(256, 128)
        self.route32 = t_route(512, 256, 2)
        self.route16 = t_route(256, 128, 2)
        self.bbox_head8 = t_bbox_head(128, bbox_dim)
        self.bbox_head16 = t_bbox_head(256, bbox_dim)
        self.bbox_head32 = t_bbox_head(512, bbox_dim)
        self.skip32 = t_route(512, 64, 8)
        self.skip16 = t_route(256, 64, 4)
        self.skip8 = t_route(128, 64, 2)
        self.skip4 = TorchCBL(128, 64, 1)
        self.orien_head = t_orien_head(128, a * 6)

    def forward(self, x):
        x32, x16, x8, x4 = self.backbone(x)
        neck32 = self.neck32(x32)
        neck16 = self.neck16(torch.cat([self.route32(neck32), x16], dim=1))
        neck8 = self.neck8(torch.cat([self.route16(neck16), x8], dim=1))
        bbox32 = self.bbox_head32(neck32)
        bbox16 = self.bbox_head16(neck16)
        bbox8 = self.bbox_head8(neck8)
        oriens = self.neck4(torch.cat(
            [self.skip32(neck32), self.skip16(neck16), self.skip8(neck8), self.skip4(x4)], dim=1))
        oriens = self.orien_head(oriens)
        a2 = self.num_anchors * 2
        return (
            (bbox32, oriens[:, :a2]),
            (bbox16, oriens[:, a2:2 * a2]),
            (bbox8, oriens[:, 2 * a2:]),
        )


def upsample4_bilinear(x):
    return F.interpolate(x, scale_factor=4, mode="bilinear", align_corners=False)


class TorchBasicBlock(nn.Module):
    """torchvision-layout BasicBlock (conv1/bn1/conv2/bn2/downsample)."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(idt + y)


class TorchResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        for i, (planes, n) in enumerate(zip((64, 128, 256, 512), (2, 2, 2, 2))):
            stride = 1 if i == 0 else 2
            cin = 64 if i == 0 else planes // 2
            blocks = [TorchBasicBlock(cin, planes, stride)]
            blocks += [TorchBasicBlock(planes, planes) for _ in range(n - 1)]
            setattr(self, f"layer{i+1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x4 = self.layer1(x)
        x8 = self.layer2(x4)
        x16 = self.layer3(x8)
        x32 = self.layer4(x16)
        return x32, x16, x8, x4


class TorchOrienMaskBase(nn.Module):
    """The base (non-FPNPlus) variant: orientation path = route8(neck8) + x4."""

    def __init__(self, num_anchors=3, num_classes=80):
        super().__init__()
        self.num_anchors = num_anchors
        a = num_anchors
        bbox_dim = a * (5 + num_classes)
        self.backbone = TorchDarkNet53()
        self.neck32 = t_neck(1024, 512)
        self.neck16 = t_neck(768, 256)
        self.neck8 = t_neck(384, 128)
        self.neck4 = t_neck(192, 128)
        self.route32 = t_route(512, 256, 2)
        self.route16 = t_route(256, 128, 2)
        self.route8 = t_route(128, 64, 2)
        self.bbox_head8 = t_bbox_head(128, bbox_dim)
        self.bbox_head16 = t_bbox_head(256, bbox_dim)
        self.bbox_head32 = t_bbox_head(512, bbox_dim)
        self.orien_head = t_orien_head(128, a * 6)

    def forward(self, x):
        x32, x16, x8, x4 = self.backbone(x)
        neck32 = self.neck32(x32)
        neck16 = self.neck16(torch.cat([self.route32(neck32), x16], dim=1))
        neck8 = self.neck8(torch.cat([self.route16(neck16), x8], dim=1))
        bbox32 = self.bbox_head32(neck32)
        bbox16 = self.bbox_head16(neck16)
        bbox8 = self.bbox_head8(neck8)
        oriens = self.orien_head(self.neck4(torch.cat([self.route8(neck8), x4], dim=1)))
        a2 = self.num_anchors * 2
        return (
            (bbox32, oriens[:, :a2]),
            (bbox16, oriens[:, a2:2 * a2]),
            (bbox8, oriens[:, 2 * a2:]),
        )


# ---------------------------------------------------------------------------
# Loss oracle
# ---------------------------------------------------------------------------
#
# An independent torch implementation of the reference loss *semantics*
# (reference eval/orienmask_yolo_loss.py:63-286, eval/base.py:27-38,107-119),
# written for use as an AUTOGRAD oracle: it runs in float64 and keeps torch's
# autograd graph intact, so tests can compare jax.grad of the rebuilt loss
# against torch.autograd end to end (VERDICT r2 task 1).  It takes per-sample
# GT lists rather than the reference's cumsum-collated cat format.


def t_bbox_ious(b1, b2):
    """Pairwise IoU of cxcywh boxes: (N,4) x (M,4) -> (N,M)."""
    lo1, hi1 = b1[:, None, :2] - b1[:, None, 2:] / 2, b1[:, None, :2] + b1[:, None, 2:] / 2
    lo2, hi2 = b2[None, :, :2] - b2[None, :, 2:] / 2, b2[None, :, :2] + b2[None, :, 2:] / 2
    inter = (torch.minimum(hi1, hi2) - torch.maximum(lo1, lo2)).clamp(min=0).prod(-1)
    a1 = b1[:, 2:].prod(-1)[:, None]
    a2 = b2[:, 2:].prod(-1)[None, :]
    return inter / (a1 + a2 - inter)


def t_anchor_ious(wh1, wh2):
    """wh-only IoU (boxes share a corner): (N,2) x (M,2) -> (N,M)."""
    inter = torch.minimum(wh1[:, None, :], wh2[None, :, :]).prod(-1)
    return inter / (wh1.prod(-1)[:, None] + wh2.prod(-1)[None, :] - inter)


class TorchOrienMaskScaleLoss(nn.Module):
    """One scale of the reference loss (eval/orienmask_yolo_loss.py:10-286)."""

    def __init__(self, grid_size, image_size, anchors, anchor_mask, num_classes,
                 center_region=0.6, valid_region=0.6, label_smooth=False,
                 obj_ignore_threshold=0.5, dtype=torch.float64):
        super().__init__()
        self.dtype = dtype
        self.grid_h, self.grid_w = grid_size
        self.image_h, self.image_w = image_size
        self.anchor_mask = list(anchor_mask)
        self.num_anchors = len(self.anchor_mask)
        self.num_classes = num_classes
        self.center_region = center_region
        self.valid_region = valid_region
        self.label_smooth = 1.0 / max(num_classes, 40) if label_smooth else 0.0
        self.ignore_thresh = obj_ignore_threshold

        image_wh = torch.tensor([self.image_w, self.image_h], dtype=dtype)
        grid_wh = torch.tensor([self.grid_w, self.grid_h], dtype=dtype)
        self.scale_wh = image_wh / grid_wh
        all_anchors = torch.as_tensor(anchors, dtype=dtype)
        self.grid_all_anchors = all_anchors / self.scale_wh
        self.grid_anchors = self.grid_all_anchors[self.anchor_mask]
        self.pixel_anchors = all_anchors[self.anchor_mask]
        my, mx = torch.meshgrid(
            torch.arange(self.grid_h, dtype=dtype),
            torch.arange(self.grid_w, dtype=dtype), indexing="ij")
        self.grid_mesh_xy = torch.stack([mx, my], dim=-1)
        py, px = torch.meshgrid(
            torch.arange(self.image_h, dtype=dtype),
            torch.arange(self.image_w, dtype=dtype), indexing="ij")
        self.pixel_mesh_xy = torch.stack([px, py], dim=-1)

    def forward(self, predict, gt_bboxes, gt_clses, gt_masks):
        """predict = (pred_bbox NCHW, pred_orien NCHW at stride 4); GT args are
        length-B lists of per-sample tensors.  Returns the 7 unweighted loss
        items (reference _get_loss, orienmask_yolo_loss.py:103-122)."""
        pred_bbox, pred_orien = predict
        nb = pred_bbox.shape[0]
        na, nh, nw = self.num_anchors, self.grid_h, self.grid_w

        pb = pred_bbox.view(nb, na, 5 + self.num_classes, nh, nw).permute(0, 1, 3, 4, 2)
        po = F.interpolate(pred_orien, scale_factor=4, mode="bilinear", align_corners=False)
        po = po.view(nb, na, 2, self.image_h, self.image_w).permute(0, 1, 3, 4, 2)

        pred_xy = pb[..., 0:2].sigmoid()
        pred_wh = pb[..., 2:4]
        pred_obj = pb[..., 4].sigmoid()
        pred_cls = pb[..., 5:].sigmoid()

        # decoded boxes for target assignment are DETACHED — the reference
        # builds targets from .detach()'d activations (loss.py:90-91), so no
        # gradient may flow through the ignore-IoU test or tiou.
        box_xy = pred_xy.detach() + self.grid_mesh_xy
        box_wh = pred_wh.detach().exp() * self.grid_anchors.view(1, na, 1, 1, 2)
        pred_boxes = torch.cat([box_xy, box_wh], dim=-1).view(nb, -1, 4)

        with torch.no_grad():
            tgt = self.build_targets(pred_boxes, gt_bboxes, gt_clses, gt_masks)
        pos, neg, pos_scale, txy, twh, tiou, tcls, opos, oneg, torien = tgt

        bce = F.binary_cross_entropy
        loss_xy = (bce(pred_xy, txy, reduction="none") * pos_scale[..., None]).sum() / nb
        loss_wh = ((pred_wh - twh).square() * pos_scale[..., None]).sum() / 2 / nb
        obj_all = bce(pred_obj, pos, reduction="none")
        loss_obj = (obj_all * pos).sum() / nb
        loss_noobj = (obj_all * neg).sum() / nb
        loss_cls = (bce(pred_cls, tcls, reduction="none") * pos[..., None]).sum() / nb

        n_opos, n_oneg = opos.sum(), oneg.sum()
        o_all = F.smooth_l1_loss(po, torien, reduction="none")
        zero = pred_orien.new_zeros([])
        loss_opos = (o_all * opos[..., None]).sum() / n_opos * pos.sum() / nb \
            if n_opos > 0 else zero
        loss_oneg = (o_all * oneg[..., None]).sum() / n_oneg * pos.sum() / nb \
            if n_oneg > 0 else zero
        return (loss_xy, loss_wh, loss_obj, loss_noobj, loss_cls, loss_opos, loss_oneg)

    def build_targets(self, pred_boxes, gt_bboxes, gt_clses, gt_masks):
        """Reference build_targets (loss.py:156-286): per-sample ignore IoU +
        anchor argmax assignment, then sequential per-instance orientation
        painting with overlap counting."""
        nb = len(gt_bboxes)
        na, nh, nw = self.num_anchors, self.grid_h, self.grid_w
        h, w = self.image_h, self.image_w
        dt = self.dtype

        pos = torch.zeros(nb, na, nh, nw, dtype=dt)
        neg = torch.ones(nb, na, nh, nw, dtype=dt)
        pos_scale = torch.zeros(nb, na, nh, nw, dtype=dt)
        txy = torch.zeros(nb, na, nh, nw, 2, dtype=dt)
        twh = torch.zeros(nb, na, nh, nw, 2, dtype=dt)
        tiou = torch.zeros(nb, na, nh, nw, dtype=dt)
        tcls = torch.full((nb, na, nh, nw, self.num_classes), self.label_smooth, dtype=dt)
        omask = torch.zeros(nb, na, h, w, dtype=torch.long)
        torien = torch.zeros(nb, na, h, w, 2, dtype=dt)

        grid_units = torch.tensor([nw, nh, nw, nh], dtype=dt)
        for b in range(nb):
            if len(gt_bboxes[b]) == 0:
                continue
            gt = gt_bboxes[b].to(dt) * grid_units
            iou_pg = t_bbox_ious(pred_boxes[b], gt)
            ignore = (iou_pg > self.ignore_thresh).any(dim=1).view(na, nh, nw)
            neg[b][ignore] = 0

            match9 = t_anchor_ious(gt[:, 2:], self.grid_all_anchors).argmax(dim=1)
            keep = torch.tensor([int(m) in self.anchor_mask for m in match9])
            if not keep.any():
                continue
            local = torch.tensor([self.anchor_mask.index(int(m)) for m in match9[keep]])
            gt_xy, gt_wh = gt[keep, :2], gt[keep, 2:]
            gx = gt_xy[:, 0].floor().clamp(0, nw - 1).long()
            gy = gt_xy[:, 1].floor().clamp(0, nh - 1).long()

            pos[b, local, gy, gx] = 1
            neg[b, local, gy, gx] = 0
            pos_scale[b, local, gy, gx] = 2 - gt_wh.prod(-1) / (nw * nh)
            txy[b, local, gy, gx] = gt_xy - torch.stack([gx, gy], dim=-1).to(dt)
            twh[b, local, gy, gx] = (gt_wh / self.grid_anchors[local]).log()
            tcls[b, local, gy, gx, gt_clses[b][keep]] = 1 - self.label_smooth
            kept_idx = torch.arange(len(gt))[keep]
            tiou[b, local, gy, gx] = iou_pg.view(na, nh, nw, -1)[local, gy, gx, kept_idx]

            # orientation painting (loss.py:226-275), sequential per instance
            cx = gt_xy[:, 0] * self.scale_wh[0]
            cy = gt_xy[:, 1] * self.scale_wh[1]
            vw = (gt_wh[:, 0] * self.valid_region + 0.5) * self.scale_wh[0]
            vh = (gt_wh[:, 1] * self.valid_region + 0.5) * self.scale_wh[1]
            cwh = torch.stack([vw, vh], dim=-1) / self.valid_region * self.center_region
            x1 = (cx - vw).clamp(0, w - 1).round().long()
            x2 = (cx + vw).clamp(0, w - 1).round().long() + 1
            y1 = (cy - vh).clamp(0, h - 1).round().long()
            y2 = (cy + vh).clamp(0, h - 1).round().long() + 1

            masks = gt_masks[b][keep]
            px = self.pixel_mesh_xy[..., 0]
            py = self.pixel_mesh_xy[..., 1]
            for i in range(len(local)):
                a = local[i]
                offset = self.pixel_mesh_xy - torch.stack([cx[i], cy[i]])
                roi = (px >= x1[i]) & (px < x2[i]) & (py >= y1[i]) & (py < y2[i])
                inst = masks[i] > 0
                om = omask[b, a].clone()
                tor = torien[b, a].clone()
                is_inst = roi & inst
                om[is_inst] = -1
                tor = torch.where(is_inst[..., None], offset, tor)
                # counts only accumulate on pixels not claimed by ANY instance
                not_inst = roi & ~inst & (om >= 0)
                om = om + not_inst.long()
                length = offset.abs().clamp(min=1e-8)
                push = (cwh[i] / length).clamp(min=1).min(dim=-1).values - 1
                neg_off = push[..., None] * offset.sign() * length
                tor = torch.where(not_inst[..., None], tor + neg_off, tor)
                omask[b, a] = om
                torien[b, a] = tor

        opos = (omask < 0).to(dt)
        oneg = (omask > 0).to(dt)
        torien = torien / (self.pixel_anchors.view(1, na, 1, 1, 2) / 2)
        omask = omask.masked_fill(omask == 0, 1000)
        torien = torien / omask[..., None].to(dt)
        return pos, neg, pos_scale, txy, twh, tiou, tcls, opos, oneg, torien


class TorchOrienMaskMultiScaleLoss(nn.Module):
    """Reference multi-scale composition (eval/base.py:107-119 with the
    per-scale item weights from eval/orienmask_yolo_loss.py:312-325).

    NOTE the reference applies scales_weight TWICE: once inside each scale's
    item weights (loss.py:315) and again at aggregation (base.py:119).  The
    rebuild deliberately applies it once (ops/loss.py:236-238); parity tests
    therefore run with scales_weight=None (ones), where both agree — which is
    also what every shipped config does.
    """

    def __init__(self, grid_size, image_size, anchors, anchor_mask, num_classes,
                 center_region=0.6, valid_region=0.6, label_smooth=False,
                 obj_ignore_threshold=0.5, weight=None, scales_weight=None,
                 dtype=torch.float64):
        super().__init__()
        self.num_scales = len(grid_size)
        self.weight = torch.as_tensor(
            weight if weight is not None else [1.0] * 7, dtype=dtype)
        self.scales_weight = torch.as_tensor(
            scales_weight if scales_weight is not None else [1.0] * self.num_scales,
            dtype=dtype)
        self.scales = nn.ModuleList([
            TorchOrienMaskScaleLoss(
                grid_size[i], image_size, anchors, anchor_mask[i], num_classes,
                center_region, valid_region, label_smooth, obj_ignore_threshold,
                dtype=dtype)
            for i in range(self.num_scales)
        ])

    def forward(self, predict, gt_bboxes, gt_clses, gt_masks):
        """Returns (loss_sum, per-scale weighted item matrix (S, 7))."""
        items = []
        for i, scale in enumerate(self.scales):
            raw = torch.stack(list(scale(predict[i], gt_bboxes, gt_clses, gt_masks)))
            items.append(raw * self.weight * self.scales_weight[i])
        items = torch.stack(items)
        loss_sum = (items.sum(dim=1) * self.scales_weight).sum()
        return loss_sum, items
