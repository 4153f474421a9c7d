"""OrienMaskYOLO — the base model variant (reference model/orienmask_yolo.py).

Same bbox path as FPNPlus; the orientation path upsamples neck8 once (route8 x2) and
concatenates only with x4 before the shared orientation head.
"""

import jax.numpy as jnp

from .layers import ConvBNLeaky, NearestUpsample, Sequential
from .orienmask_yolo_fpnplus import (
    _BaseOrienMask,
    build_bbox_head,
    build_neck,
    build_orien_head,
)


def build_half_route(channels):
    return Sequential(ConvBNLeaky(channels, channels // 2, 1), NearestUpsample(2))


class OrienMaskYOLO(_BaseOrienMask):
    def _build_heads(self):
        a, c = self.num_anchors, self.num_classes
        bbox_dim = a * (5 + c)
        self.neck32 = build_neck(1024, 512)
        self.neck16 = build_neck(768, 256)
        self.neck8 = build_neck(384, 128)
        self.neck4 = build_neck(192, 128)
        self.route32 = build_half_route(512)
        self.route16 = build_half_route(256)
        self.route8 = build_half_route(128)
        self.bbox_head8 = build_bbox_head(128, bbox_dim)
        self.bbox_head16 = build_bbox_head(256, bbox_dim)
        self.bbox_head32 = build_bbox_head(512, bbox_dim)
        self.orien_head = build_orien_head(128, a * 6)

    def _head_names(self):
        return [
            "neck32", "neck16", "neck8", "neck4", "route32", "route16", "route8",
            "bbox_head8", "bbox_head16", "bbox_head32", "orien_head",
        ]

    def apply(self, params, stats, x, ctx):
        new_stats = {}

        def run(name, inp):
            y, ns = getattr(self, name).apply(params[name], stats[name], inp, ctx)
            new_stats[name] = ns
            return y

        (x32, x16, x8, x4), new_stats["backbone"] = self.backbone.apply(
            params["backbone"], stats["backbone"], x, ctx
        )
        neck32 = run("neck32", x32)
        neck16 = run("neck16", jnp.concatenate([run("route32", neck32), x16], axis=-1))
        neck8 = run("neck8", jnp.concatenate([run("route16", neck16), x8], axis=-1))

        bbox32 = run("bbox_head32", neck32)
        bbox16 = run("bbox_head16", neck16)
        bbox8 = run("bbox_head8", neck8)

        oriens = run("neck4", jnp.concatenate([run("route8", neck8), x4], axis=-1))
        oriens = run("orien_head", oriens)
        a2 = self.num_anchors * 2
        orien32, orien16, orien8 = (
            oriens[..., :a2], oriens[..., a2:2 * a2], oriens[..., 2 * a2:]
        )
        return ((bbox32, orien32), (bbox16, orien16), (bbox8, orien8)), new_stats

    def apply_folded(self, folded, x, ctx, phase_hw=None):
        x32, x16, x8, x4 = self.backbone.apply_folded(
            folded["backbone"], x, ctx, phase_hw=phase_hw)

        def run(name, inp):
            return getattr(self, name).apply_folded(folded[name], inp, ctx)

        neck32 = run("neck32", x32)
        neck16 = run("neck16", jnp.concatenate([run("route32", neck32), x16], axis=-1))
        neck8 = run("neck8", jnp.concatenate([run("route16", neck16), x8], axis=-1))
        bbox32 = run("bbox_head32", neck32)
        bbox16 = run("bbox_head16", neck16)
        bbox8 = run("bbox_head8", neck8)
        oriens = run("neck4", jnp.concatenate([run("route8", neck8), x4], axis=-1))
        oriens = run("orien_head", oriens)
        a2 = self.num_anchors * 2
        return (
            (bbox32, oriens[..., :a2]),
            (bbox16, oriens[..., a2:2 * a2]),
            (bbox8, oriens[..., 2 * a2:]),
        )
