"""OrienMaskYOLOFPNPlus — the published model variant.

Reference: model/orienmask_yolo_fpnplus.py.  YOLOv3-style bbox path over three scales
plus an orientation path that gathers skip connections from *all* scales (skip32 x8-up,
skip16 x4-up, skip8 x2-up, skip4) into a stride-4 neck feeding a shared orientation
head.  Outputs three (bbox_s, orien_s) NHWC tuples at strides 32/16/8; orientation maps
live at stride 4 with 2 (x, y) channels per anchor.
"""

from contextlib import nullcontext as _nullcontext

import jax
import jax.numpy as jnp

from .darknet import DarkNet53
from .layers import Conv, ConvBNLeaky, Module, NearestUpsample, Sequential, default_ctx


def build_neck(cin, cout):
    """5x alternating 1x1 / 3x3 conv_bn_leaky (reference fpnplus.py:40-48)."""
    return Sequential(
        ConvBNLeaky(cin, cout, 1),
        ConvBNLeaky(cout, cout * 2, 3, padding=1),
        ConvBNLeaky(cout * 2, cout, 1),
        ConvBNLeaky(cout, cout * 2, 3, padding=1),
        ConvBNLeaky(cout * 2, cout, 1),
    )


def build_route(cin, cout, upsample):
    return Sequential(ConvBNLeaky(cin, cout, 1), NearestUpsample(upsample))


def build_bbox_head(cin, cout):
    return Sequential(ConvBNLeaky(cin, cin * 2, 3, padding=1), Conv(cin * 2, cout, 1))


def build_orien_head(cin, cout):
    return Sequential(
        ConvBNLeaky(cin, cin * 2, 3, padding=1),
        ConvBNLeaky(cin * 2, cin, 1),
        ConvBNLeaky(cin, cin * 2, 3, padding=1),
        ConvBNLeaky(cin * 2, cin, 1),
        ConvBNLeaky(cin, cin * 2, 3, padding=1),
        Conv(cin * 2, cout, 1),
    )


class _BaseOrienMask(Module):
    """Shared init/apply plumbing for the two OrienMask variants."""

    def __init__(self, num_anchors, num_classes, pretrained=None,
                 freeze_backbone=False, backbone_batchnorm_eval=False,
                 backbone_stage_blocks=None):
        self.num_anchors = num_anchors
        self.num_classes = num_classes
        self.pretrained = pretrained
        # backbone_stage_blocks: optional depth variant (e.g. (1,1,1,1,1) for
        # slim CI/e2e configs); default = full DarkNet53 (1,2,8,8,4)
        self.backbone = DarkNet53(freeze_backbone, backbone_batchnorm_eval,
                                  stage_blocks=backbone_stage_blocks)
        self._build_heads()

    def _build_heads(self):
        raise NotImplementedError

    def _head_names(self):
        raise NotImplementedError

    def _module_names(self):
        return ["backbone"] + self._head_names()

    def init(self, key):
        names = self._module_names()
        keys = jax.random.split(key, len(names))
        params, stats = {}, {}
        for k, name in zip(keys, names):
            params[name], stats[name] = getattr(self, name).init(k)
        return params, stats

    def init_variables(self, key):
        # Init on the host CPU backend: eagerly dispatching ~600 tiny init ops
        # to a (possibly remote) TPU is minutes of round-trips.  local_devices,
        # not devices: under jax.distributed the global cpu list starts with
        # process 0's devices, and staging onto another process's device makes
        # the arrays non-addressable here (device_put then raises).
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
        ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
        with ctx:
            params, stats = self.init(key)
        if self.pretrained:
            from .convert import load_pretrained_backbone
            params, stats = load_pretrained_backbone(self, params, stats, self.pretrained)
        # Un-commit from the CPU backend: arrays built under default_device(cpu)
        # are pinned there and would drag every downstream jit onto the CPU.
        # local_devices, not devices: under jax.distributed the global list
        # starts with process 0's devices, and device_put to another process's
        # device raises on every other rank.
        default = jax.local_devices()[0]
        params = jax.device_put(params, default)
        stats = jax.device_put(stats, default)
        return {"params": params, "batch_stats": stats}

    def forward(self, variables, x, train=False, dtype=jnp.float32):
        ctx = default_ctx(train=train, dtype=dtype)
        out, new_stats = self.apply(variables["params"], variables["batch_stats"], x, ctx)
        return out, new_stats

    def fold(self, variables):
        """Fold all BN layers into conv kernels for the fused inference path.
        Runs on the host CPU backend (same remote-dispatch concern as init)."""
        p, s = variables["params"], variables["batch_stats"]
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
        ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
        with ctx:
            folded = {n: getattr(self, n).fold(p[n], s[n]) for n in self._module_names()}
        return jax.device_put(folded, jax.local_devices()[0])

    def precompute_stem_folded(self, folded):
        """Hoist the backbone's phase-stem kernel derivations out of the
        per-frame program (darknet.precompute_stem_folded).  No-op for
        backbones without a space-to-depth stem."""
        pre = getattr(self.backbone, "precompute_stem_folded", None)
        if pre is not None:
            folded["backbone"] = pre(folded["backbone"])
        return folded

    def named_modules(self, torch_prefix=""):
        for name in self._module_names():
            prefix = f"{torch_prefix}.{name}" if torch_prefix else name
            yield from getattr(self, name).named_modules(prefix)

    def frozen_param_paths(self):
        return [("backbone", s) for s in self.backbone.frozen_stages()]


class OrienMaskYOLOFPNPlus(_BaseOrienMask):
    def _build_heads(self):
        a, c = self.num_anchors, self.num_classes
        bbox_dim = a * (5 + c)
        self.neck32 = build_neck(1024, 512)
        self.neck16 = build_neck(768, 256)
        self.neck8 = build_neck(384, 128)
        self.neck4 = build_neck(256, 128)
        self.route32 = build_route(512, 256, 2)
        self.route16 = build_route(256, 128, 2)
        self.bbox_head8 = build_bbox_head(128, bbox_dim)
        self.bbox_head16 = build_bbox_head(256, bbox_dim)
        self.bbox_head32 = build_bbox_head(512, bbox_dim)
        self.skip32 = build_route(512, 64, 8)
        self.skip16 = build_route(256, 64, 4)
        self.skip8 = build_route(128, 64, 2)
        self.skip4 = ConvBNLeaky(128, 64, 1)
        self.orien_head = build_orien_head(128, a * 6)

    def _head_names(self):
        return [
            "neck32", "neck16", "neck8", "neck4", "route32", "route16",
            "bbox_head8", "bbox_head16", "bbox_head32",
            "skip32", "skip16", "skip8", "skip4", "orien_head",
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

        oriens = run("neck4", jnp.concatenate(
            [run("skip32", neck32), run("skip16", neck16), run("skip8", neck8),
             run("skip4", x4)], axis=-1))
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
        oriens = run("neck4", jnp.concatenate(
            [run("skip32", neck32), run("skip16", neck16), run("skip8", neck8),
             run("skip4", x4)], axis=-1))
        oriens = run("orien_head", oriens)
        a2 = self.num_anchors * 2
        return (
            (bbox32, oriens[..., :a2]),
            (bbox16, oriens[..., a2:2 * a2]),
            (bbox8, oriens[..., 2 * a2:]),
        )
