"""Inference visualizer (reference utils/visualizer.py) — host-side numpy + cv2.

Draws alpha-composited instance masks (area-sorted, cumulative-product blending)
and labeled boxes on the original-resolution image; boxes/masks are mapped back
through the letterbox ``pad_info``.
"""

import random

import cv2
import numpy as np

PALETTE = np.array([
    (244, 67, 54), (233, 30, 99), (156, 39, 176), (103, 58, 183), (63, 81, 181),
    (33, 150, 243), (3, 169, 244), (0, 188, 212), (0, 150, 136), (76, 175, 80),
    (139, 195, 74), (205, 220, 57), (255, 235, 59), (255, 193, 7), (255, 152, 0),
    (255, 87, 34), (121, 85, 72), (158, 158, 158), (96, 125, 139),
], np.float32)


class InferenceVisualizer:
    def __init__(self, dataset, with_mask=True, conf_thresh=0.3, alpha=0.5,
                 line_thickness=1, device=None):
        from ..data import dataset as dataset_module

        ds = getattr(dataset_module, dataset + "Dataset")
        self.classes = ds.CLASSES
        self.with_mask = with_mask
        self.conf_thresh = conf_thresh
        self.alpha = alpha
        self.line_thickness = line_thickness

    def __call__(self, detections, image, pad_info):
        """detections: per-image dict (numpy); image: HxWx3 float RGB original;
        pad_info: (left, right, top, down, h, w) of the network-input letterbox."""
        show = np.asarray(image, np.float32).copy()
        height, width = show.shape[:2]

        bbox = np.asarray(detections["bbox"]).reshape(-1, 5)
        cls = np.asarray(detections["cls"]).reshape(-1)
        keep = bbox[:, -1] > self.conf_thresh
        bbox, cls = bbox[keep], cls[keep]
        masks = np.asarray(detections["mask"])[keep] if self.with_mask else None

        if bbox.shape[0] == 0:
            return np.clip(np.round(show), 0, 255).astype(np.uint8)

        xyxy = self._recover_shape_bbox(bbox[:, :4], width, height, pad_info)
        colors_idx = np.arange(bbox.shape[0]) * 5 + random.randint(1, len(PALETTE))
        colors = PALETTE[colors_idx % len(PALETTE)]

        if self.with_mask:
            all_mask = self._recover_shape_segm(masks, width, height, pad_info)
            order = np.argsort(all_mask.sum(axis=(1, 2)))
            all_mask = all_mask[order]
            self._plot_all_mask(all_mask, show, colors[order])

        show = np.clip(np.round(show), 0, 255).astype(np.uint8)
        for box, score, c, color in zip(xyxy, bbox[:, -1], cls, colors):
            text = "%s %.2f" % (self.classes[int(c)], score)
            self._plot_one_box(box, text, show, color.tolist())
        return show

    def _plot_one_box(self, box, text, image, color):
        x1, y1, x2, y2 = [int(v) for v in box]
        cv2.rectangle(image, (x1, y1), (x2, y2), color, thickness=self.line_thickness)
        font = cv2.FONT_HERSHEY_DUPLEX
        tw, th = cv2.getTextSize(text, font, 0.4, 1)[0]
        cv2.rectangle(image, (x1, y1), (x1 + tw, y1 - th - 4), color, -1)
        cv2.putText(image, text, (x1, y1 - 3), font, 0.4, (255, 255, 255), 1, cv2.LINE_AA)

    def _plot_all_mask(self, masks, image, colors):
        """Cumulative-product alpha blending, back-to-front (reference
        visualizer.py:95-100)."""
        a = self.alpha
        n = masks.shape[0]
        alpha_cum = np.cumprod(1 - a * masks, axis=0)[..., None]
        color_mask = masks[..., None] * colors[:, None, None, :] * a
        image *= alpha_cum[-1]
        image += color_mask[0]
        if n > 1:
            image += (color_mask[1:] * alpha_cum[:-1]).sum(axis=0)

    @staticmethod
    def _recover_shape_bbox(bbox, width, height, pad_info):
        bx, by, bw, bh = [bbox[:, i].astype(np.float64) for i in range(4)]
        left, right, top, down, h, w = pad_info
        nh, nw = h - top - down, w - left - right
        bx = (bx * w - left) / nw
        by = (by * h - top) / nh
        bw, bh = bw * w / nw, bh * h / nh
        return np.round(np.stack([
            (bx - bw / 2) * width, (by - bh / 2) * height,
            (bx + bw / 2) * width, (by + bh / 2) * height,
        ], axis=1)).astype(np.int64)

    @staticmethod
    def _recover_shape_segm(masks, width, height, pad_info):
        left, right, top, down = pad_info[:4]
        m = masks[:, top:masks.shape[1] - down or None,
                  left:masks.shape[2] - right or None]
        out = np.zeros((m.shape[0], height, width), np.float32)
        for i in range(m.shape[0]):
            out[i] = cv2.resize(m[i].astype(np.float32), (width, height),
                                interpolation=cv2.INTER_LINEAR)
        return out
