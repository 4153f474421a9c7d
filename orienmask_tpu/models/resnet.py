"""ResNet backbone family (reference model/backbone/resnet.py).

torchvision-compatible ResNet/ResNeXt/WideResNet backbones adapted to return the
(x32, x16, x8, x4) feature pyramid.  Registered for config use like the reference
(model/backbone/__init__.py:4) though no shipped config selects them.  State-dict
layout matches torchvision so ImageNet-pretrained ``.pth`` files convert directly
(``resnet_from_torch``).

Freezing follows the reference semantics (FrozenBatchNorm over frozen stages,
resnet.py:181-194): realized functionally as eval-mode BN + a zero-gradient
optimizer mask over ``frozen_stages``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .layers import BN_EPS, Module, _conv_init


def _maxpool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class ConvBN(Module):
    """conv (no bias) + BN with torchvision-style separate conv/bn naming."""

    def __init__(self, cin, cout, ksize, stride=1, padding=0, groups=1):
        self.cin, self.cout, self.ksize = cin, cout, ksize
        self.stride, self.padding, self.groups = stride, padding, groups

    def init(self, key):
        params = _conv_init(key, self.ksize, self.cin // self.groups, self.cout,
                            with_bias=False)
        params["scale"] = jnp.ones((self.cout,), jnp.float32)
        params["bias"] = jnp.zeros((self.cout,), jnp.float32)
        stats = {"mean": jnp.zeros((self.cout,), jnp.float32),
                 "var": jnp.ones((self.cout,), jnp.float32)}
        return params, stats

    def apply(self, params, stats, x, ctx):
        pad = ((self.padding, self.padding),) * 2
        y = jax.lax.conv_general_dilated(
            x.astype(ctx["dtype"]), params["kernel"].astype(ctx["dtype"]),
            (self.stride, self.stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        ).astype(jnp.float32)
        if ctx["train"]:
            mean = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(y), axis=(0, 1, 2)) - jnp.square(mean)
            count = y.shape[0] * y.shape[1] * y.shape[2]
            new_stats = {
                "mean": 0.9 * stats["mean"] + 0.1 * mean,
                "var": 0.9 * stats["var"] + 0.1 * var * (count / max(count - 1, 1)),
            }
        else:
            mean, var = stats["mean"], stats["var"]
            new_stats = stats
        inv = params["scale"] * jax.lax.rsqrt(var + BN_EPS)
        return y * inv + (params["bias"] - mean * inv), new_stats


class BasicBlock(Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1, downsample=False, groups=1,
                 base_width=64):
        assert groups == 1 and base_width == 64, \
            "BasicBlock only supports groups=1, base_width=64"
        self.conv1 = ConvBN(cin, planes, 3, stride=stride, padding=1)
        self.conv2 = ConvBN(planes, planes, 3, padding=1)
        self.downsample = ConvBN(cin, planes, 1, stride=stride) if downsample else None

    def init(self, key):
        keys = jax.random.split(key, 3)
        params, stats = {}, {}
        params["conv1"], stats["conv1"] = self.conv1.init(keys[0])
        params["conv2"], stats["conv2"] = self.conv2.init(keys[1])
        if self.downsample:
            params["downsample"], stats["downsample"] = self.downsample.init(keys[2])
        return params, stats

    def apply(self, params, stats, x, ctx):
        ns = {}
        y, ns["conv1"] = self.conv1.apply(params["conv1"], stats["conv1"], x, ctx)
        y = jnp.maximum(y, 0)
        y, ns["conv2"] = self.conv2.apply(params["conv2"], stats["conv2"], y, ctx)
        if self.downsample:
            x, ns["downsample"] = self.downsample.apply(
                params["downsample"], stats["downsample"], x, ctx)
        return jnp.maximum(x + y, 0), ns


class Bottleneck(Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=False, groups=1,
                 base_width=64):
        width = int(planes * (base_width / 64.0)) * groups
        cout = planes * self.expansion
        self.conv1 = ConvBN(cin, width, 1)
        self.conv2 = ConvBN(width, width, 3, stride=stride, padding=1, groups=groups)
        self.conv3 = ConvBN(width, cout, 1)
        self.downsample = ConvBN(cin, cout, 1, stride=stride) if downsample else None

    def init(self, key):
        keys = jax.random.split(key, 4)
        params, stats = {}, {}
        for i, name in enumerate(["conv1", "conv2", "conv3"]):
            params[name], stats[name] = getattr(self, name).init(keys[i])
        if self.downsample:
            params["downsample"], stats["downsample"] = self.downsample.init(keys[3])
        return params, stats

    def apply(self, params, stats, x, ctx):
        ns = {}
        y, ns["conv1"] = self.conv1.apply(params["conv1"], stats["conv1"], x, ctx)
        y = jnp.maximum(y, 0)
        y, ns["conv2"] = self.conv2.apply(params["conv2"], stats["conv2"], y, ctx)
        y = jnp.maximum(y, 0)
        y, ns["conv3"] = self.conv3.apply(params["conv3"], stats["conv3"], y, ctx)
        if self.downsample:
            x, ns["downsample"] = self.downsample.apply(
                params["downsample"], stats["downsample"], x, ctx)
        return jnp.maximum(x + y, 0), ns


class ResNet(Module):
    """Backbone returning (x32, x16, x8, x4) with (512, 256, 128, 64)*expansion
    channels (reference resnet.py:219-231)."""

    def __init__(self, block, layers, groups=1, width_per_group=64,
                 pretrained=None, frozen_stages=0, batchnorm_eval=False):
        self.block = block
        self.layers_cfg = layers
        self.groups = groups
        self.base_width = width_per_group
        self.pretrained = pretrained
        self.n_frozen_stages = int(frozen_stages or 0)
        self.batchnorm_eval = batchnorm_eval

        self.stem = ConvBN(3, 64, 7, stride=2, padding=3)
        self.stages = []
        cin = 64
        for i, n in enumerate(layers):
            planes = 64 * 2 ** i
            stride = 1 if i == 0 else 2
            blocks = []
            for j in range(n):
                ds = j == 0 and (stride != 1 or cin != planes * block.expansion)
                blocks.append(block(cin, planes, stride if j == 0 else 1, ds,
                                    groups, width_per_group))
                cin = planes * block.expansion
            self.stages.append(blocks)
        self.out_channels = tuple(64 * 2 ** i * block.expansion
                                  for i in reversed(range(4)))

    def init(self, key):
        keys = jax.random.split(key, 1 + sum(self.layers_cfg))
        params = {"stem": None}
        stats = {"stem": None}
        params["stem"], stats["stem"] = self.stem.init(keys[0])
        k = 1
        for i, blocks in enumerate(self.stages):
            bp, bs = [], []
            for blk in blocks:
                p, s = blk.init(keys[k])
                bp.append(p)
                bs.append(s)
                k += 1
            params[f"layer{i + 1}"] = bp
            stats[f"layer{i + 1}"] = bs
        return params, stats

    def init_variables(self, key):
        params, stats = self.init(key)
        if self.pretrained:
            import os
            if os.path.exists(self.pretrained):
                import torch
                sd = torch.load(self.pretrained, map_location="cpu", weights_only=False)
                sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
                params, stats = resnet_from_torch(self, sd)
            else:
                print(f"[ResNet] pretrained file not found, skipping: {self.pretrained}")
        return {"params": params, "batch_stats": stats}

    def _stage_ctx(self, name, bctx):
        from .layers import frozen_stage_ctx

        return frozen_stage_ctx(bctx, name, self.frozen_stages())

    def apply(self, params, stats, x, ctx):
        bctx = dict(ctx, train=False) if (self.batchnorm_eval and ctx["train"]) else ctx
        ns = {}
        y, ns["stem"] = self.stem.apply(
            params["stem"], stats["stem"], x, self._stage_ctx("stem", bctx))
        y = jnp.maximum(y, 0)
        y = _maxpool_3x3_s2(y)
        feats = []
        for i, blocks in enumerate(self.stages):
            name = f"layer{i + 1}"
            sctx = self._stage_ctx(name, bctx)
            bns = []
            for j, blk in enumerate(blocks):
                y, s = blk.apply(params[name][j], stats[name][j], y, sctx)
                bns.append(s)
            ns[name] = bns
            feats.append(y)
        x4, x8, x16, x32 = feats
        return (x32, x16, x8, x4), ns

    def get_output_channels(self):
        return self.out_channels

    def frozen_stages(self):
        """Stage names whose params are frozen — the backbone freeze protocol
        consumed by OrienMask models' frozen_param_paths() and the optimizer's
        zero-gradient mask (same method name as DarkNet53.frozen_stages)."""
        names = []
        if self.n_frozen_stages >= 1:
            names.append("stem")
        for i in range(2, self.n_frozen_stages + 1):
            names.append(f"layer{i - 1}")
        return names


def _np_t(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _convbn_from_torch(sd, conv_key, bn_key):
    return (
        {"kernel": np.ascontiguousarray(_np_t(sd[f"{conv_key}.weight"]).transpose(2, 3, 1, 0)),
         "scale": _np_t(sd[f"{bn_key}.weight"]),
         "bias": _np_t(sd[f"{bn_key}.bias"])},
        {"mean": _np_t(sd[f"{bn_key}.running_mean"]),
         "var": _np_t(sd[f"{bn_key}.running_var"])},
    )


def resnet_from_torch(model, sd):
    """torchvision ResNet state_dict -> (params, stats) for ``model``."""
    params, stats = {}, {}
    params["stem"], stats["stem"] = _convbn_from_torch(sd, "conv1", "bn1")
    for i, blocks in enumerate(model.stages):
        name = f"layer{i + 1}"
        bp, bs = [], []
        for j, blk in enumerate(blocks):
            prefix = f"{name}.{j}"
            p, s = {}, {}
            n_convs = 3 if isinstance(blk, Bottleneck) else 2
            for k in range(1, n_convs + 1):
                p[f"conv{k}"], s[f"conv{k}"] = _convbn_from_torch(
                    sd, f"{prefix}.conv{k}", f"{prefix}.bn{k}")
            if blk.downsample:
                p["downsample"], s["downsample"] = _convbn_from_torch(
                    sd, f"{prefix}.downsample.0", f"{prefix}.downsample.1")
            bp.append(p)
            bs.append(s)
        params[name] = bp
        stats[name] = bs
    return params, stats


def _factory(block, layers, **defaults):
    def make(**kwargs):
        merged = dict(defaults)
        merged.update(kwargs)
        return ResNet(block, layers, **merged)
    return make


resnet18 = _factory(BasicBlock, [2, 2, 2, 2])
resnet34 = _factory(BasicBlock, [3, 4, 6, 3])
resnet50 = _factory(Bottleneck, [3, 4, 6, 3])
resnet101 = _factory(Bottleneck, [3, 4, 23, 3])
resnet152 = _factory(Bottleneck, [3, 8, 36, 3])
resnext50_32x4d = _factory(Bottleneck, [3, 4, 6, 3], groups=32, width_per_group=4)
resnext101_32x8d = _factory(Bottleneck, [3, 4, 23, 3], groups=32, width_per_group=8)
wide_resnet50_2 = _factory(Bottleneck, [3, 4, 6, 3], width_per_group=128)
wide_resnet101_2 = _factory(Bottleneck, [3, 4, 23, 3], width_per_group=128)
