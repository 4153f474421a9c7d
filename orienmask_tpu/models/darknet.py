"""DarkNet-53 backbone (reference model/backbone/darknet.py).

Stem conv + 5 stride-2 stages with (1, 2, 8, 8, 4) residual blocks; returns the
(x32, x16, x8, x4) feature pyramid with (1024, 512, 256, 128) channels.
"""

import jax

from .layers import ConvBNLeaky, Module, Sequential


class DarkNetBlock(Module):
    """Residual 1x1 -> 3x3 block (reference darknet.py:6-15)."""

    def __init__(self, channels):
        self.conv = Sequential(
            ConvBNLeaky(channels * 2, channels, 1),
            ConvBNLeaky(channels, channels * 2, 3, padding=1),
        )

    def init(self, key):
        return self.conv.init(key)

    def apply(self, params, stats, x, ctx):
        y, new_stats = self.conv.apply(params, stats, x, ctx)
        return x + y, new_stats

    def fold(self, params, stats):
        return self.conv.fold(params, stats)

    def apply_folded(self, folded, x, ctx):
        return x + self.conv.apply_folded(folded, x, ctx)

    def named_modules(self, torch_prefix=""):
        yield from self.conv.named_modules(f"{torch_prefix}.conv")


class DarkNet53(Module):
    """Backbone; ``freeze_backbone`` is an int level (stages 1..N frozen), matching
    the reference semantics at darknet.py:31-38 (with its `_freeze_module` bug fixed:
    freezing is realized as a zero-gradient optimizer mask + eval-mode BN, see
    trainer/builder.py in this repo).
    """

    STAGE_BLOCKS = (1, 2, 8, 8, 4)
    STAGE_CHANNELS = (32, 64, 128, 256, 512)

    def __init__(self, freeze_backbone=False, batchnorm_eval=False):
        self.freeze_backbone = int(freeze_backbone or 0)
        self.batchnorm_eval = batchnorm_eval
        self.conv1 = ConvBNLeaky(3, 32, 3, padding=1)
        for i, (c, n) in enumerate(zip(self.STAGE_CHANNELS, self.STAGE_BLOCKS), start=2):
            setattr(self, f"conv{i}", self._build_stage(c, n))
        self.stage_names = [f"conv{i}" for i in range(1, 7)]

    @staticmethod
    def _build_stage(channels, n_blocks):
        layers = [ConvBNLeaky(channels, channels * 2, 3, stride=2, padding=1)]
        layers += [DarkNetBlock(channels) for _ in range(n_blocks)]
        return Sequential(*layers)

    def init(self, key):
        keys = jax.random.split(key, 6)
        params, stats = {}, {}
        for k, name in zip(keys, self.stage_names):
            params[name], stats[name] = getattr(self, name).init(k)
        return params, stats

    def apply(self, params, stats, x, ctx):
        # batchnorm_eval: backbone BN uses running stats even in training
        # (reference model/base.py:71-77).
        bctx = dict(ctx, train=False) if (self.batchnorm_eval and ctx["train"]) else ctx
        new_stats = {}
        feats = {}
        for name in self.stage_names:
            x, new_stats[name] = getattr(self, name).apply(params[name], stats[name], x, bctx)
            feats[name] = x
        return (feats["conv6"], feats["conv5"], feats["conv4"], feats["conv3"]), new_stats

    def fold(self, params, stats):
        return {n: getattr(self, n).fold(params[n], stats[n]) for n in self.stage_names}

    def apply_folded(self, folded, x, ctx):
        feats = {}
        for name in self.stage_names:
            x = getattr(self, name).apply_folded(folded[name], x, ctx)
            feats[name] = x
        return feats["conv6"], feats["conv5"], feats["conv4"], feats["conv3"]

    def named_modules(self, torch_prefix=""):
        for name in self.stage_names:
            prefix = f"{torch_prefix}.{name}" if torch_prefix else name
            yield from getattr(self, name).named_modules(prefix)

    def frozen_stages(self):
        """Stage names whose params are frozen (zero-gradient in the optimizer)."""
        if not self.freeze_backbone:
            return []
        return [f"conv{i}" for i in range(1, 7) if self.freeze_backbone >= i]

    def get_output_channels(self):
        return 1024, 512, 256, 128
