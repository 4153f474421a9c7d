"""Functional NHWC conv/BN/leaky building blocks.

A tiny explicit-pytree module system: every module is a *description* object whose
``init(key)`` returns ``(params, batch_stats)`` pytrees and whose ``apply(params,
stats, x, ctx)`` is a pure function returning ``(y, new_stats)``.  No framework
state — everything jit/vmap/grad-friendly.

Design notes (TPU-first):
  * NHWC activations / HWIO kernels — the native XLA TPU conv layout.
  * ``ctx['dtype']`` selects the conv compute dtype (bf16 rides the MXU, whose
    internal accumulation is f32); BatchNorm statistics and affine run in f32.
  * BatchNorm in training uses the *global* batch statistics: under a batch-sharded
    jit, ``jnp.mean`` over the batch axis compiles to an XLA all-reduce over ICI, so
    cross-device SyncBatchNorm (reference trainer/builder.py:86) falls out for free.
  * ``fold_batchnorm`` folds BN affine+stats into conv kernel/bias for the inference
    path — one fused conv per layer, zero BN memory traffic.

Numerics match torch defaults so converted reference weights reproduce activations:
eps=1e-5, momentum=0.1, biased batch variance for normalization, unbiased for the
running-var update, LeakyReLU slope 0.1, kaiming-uniform(a=sqrt(5)) conv init.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.1
LEAKY_SLOPE = 0.1

# Armed by models.quantize.calibrate_folded during its eager CPU pass:
# {id(folded kernel): running input absmax}.  None in normal operation.
_CALIB_OBSERVER = None


def default_ctx(train=False, dtype=jnp.float32, remat=False):
    """``remat``: rematerialize the backbone stages in the backward pass
    (jax.checkpoint per stage) — trades ~1/3 more forward FLOPs for not
    holding every stage's activations between forward and backward, raising
    the max trainable batch/resolution per chip (config key ``remat``)."""
    return {"train": train, "dtype": dtype, "remat": remat}


def frozen_stage_ctx(bctx, name, frozen_names):
    """Per-stage module ctx: frozen stages run eval-mode BN (running stats,
    held) even in training — the reference converts frozen stages to
    FrozenBatchNorm2d (darknet.py:31-38); their params are additionally
    zero-grad-masked by the optimizer (trainer/builder.py _freeze_mask)."""
    if bctx["train"] and name in frozen_names:
        return dict(bctx, train=False)
    return bctx


def _conv_init(key, ksize, cin, cout, with_bias):
    """torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) => U(+-1/sqrt(fan_in))."""
    fan_in = cin * ksize * ksize
    bound = 1.0 / math.sqrt(fan_in)
    k_key, b_key = jax.random.split(key)
    kernel = jax.random.uniform(
        k_key, (ksize, ksize, cin, cout), jnp.float32, -bound, bound
    )
    params = {"kernel": kernel}
    if with_bias:
        params["bias"] = jax.random.uniform(b_key, (cout,), jnp.float32, -bound, bound)
    return params


def conv2d(x, kernel, stride=1, padding=0, dtype=jnp.float32, preferred=None):
    """NHWC conv with torch-style symmetric integer padding.

    Inputs are cast to the compute ``dtype`` (bf16 rides the MXU, which
    accumulates in f32 internally regardless); the output keeps the compute
    dtype so AD transposes stay dtype-uniform — callers upcast where f32
    arithmetic matters (BatchNorm).  ``preferred`` (e.g. jnp.int32 for int8
    operands) skips the dtype casts and sets the accumulator type instead."""
    pad = ((padding, padding), (padding, padding))
    if preferred is None:
        x, kernel = x.astype(dtype), kernel.astype(dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def quantize_i8(x, in_inv):
    """Symmetric per-tensor int8 quantization of an activation tensor
    (models/quantize.py calibrated scale; fuses into the preceding conv's
    epilogue under XLA)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * in_inv),
                    -127, 127).astype(jnp.int8)


def calib_observe(kernel, x):
    """Record a conv input's absmax during the eager calibration pass
    (models/quantize.py) — no-op under tracing or when disarmed."""
    if _CALIB_OBSERVER is not None and not isinstance(x, jax.core.Tracer):
        a = float(jnp.max(jnp.abs(x)))
        _CALIB_OBSERVER[id(kernel)] = max(_CALIB_OBSERVER.get(id(kernel), 0.0), a)


def leaky_relu(x):
    return jnp.where(x > 0, x, LEAKY_SLOPE * x)


class Module:
    """Base description object. Subclasses define init/apply."""

    def init(self, key):
        raise NotImplementedError

    def apply(self, params, stats, x, ctx):
        raise NotImplementedError

    def named_modules(self, torch_prefix=""):
        """Yield (torch_state_dict_prefix, module) for leaf layers — used by the
        PyTorch weight converter (models/convert.py)."""
        yield torch_prefix, self


class ConvBNLeaky(Module):
    """conv (no bias) + BatchNorm + LeakyReLU(0.1).

    Mirrors reference ``conv_bn_leaky`` (model/base.py:104-137,278-279).
    torch state_dict layout: ``{prefix}.conv_block.0`` (conv), ``{prefix}.conv_block.1`` (bn).
    """

    def __init__(self, cin, cout, ksize, stride=1, padding=0, activation="leaky"):
        self.cin, self.cout, self.ksize = cin, cout, ksize
        self.stride, self.padding = stride, padding
        self.activation = activation

    def init(self, key):
        params = _conv_init(key, self.ksize, self.cin, self.cout, with_bias=False)
        params["scale"] = jnp.ones((self.cout,), jnp.float32)
        params["bias"] = jnp.zeros((self.cout,), jnp.float32)
        stats = {
            "mean": jnp.zeros((self.cout,), jnp.float32),
            "var": jnp.ones((self.cout,), jnp.float32),
        }
        return params, stats

    def apply(self, params, stats, x, ctx):
        y = conv2d(x, params["kernel"], self.stride, self.padding, ctx["dtype"])
        return self.bn_act(y, params, stats, ctx)

    def bn_act(self, y, params, stats, ctx, phase_groups=1):
        """BatchNorm + activation on a precomputed conv output.

        BN statistics and affine coefficients are f32; the activation tensor
        itself stays in the compute dtype.  The f32 converts below fuse into
        the reductions, so under bf16 the (B,H,W,C) activation never
        round-trips through an f32 HBM copy (2x bandwidth on every BN in
        forward AND backward).  Under f32 compute this is numerically
        identical to an all-f32 BN.

        ``phase_groups=g``: y's channel dim holds g space-to-depth phases of
        the logical (cout,)-channel tensor (see models/darknet.py stem).
        Statistics reduce over the phase axis as well, so the running stats
        and normalization exactly match the master full-resolution BatchNorm.
        """
        g = phase_groups
        yg = y.reshape(y.shape[:-1] + (g, self.cout)) if g > 1 else y
        axes = tuple(range(yg.ndim - 1))
        if ctx["train"]:
            # Global (cross-device under sharded jit) batch statistics.
            yf = yg.astype(jnp.float32)
            mean = jnp.mean(yf, axis=axes)
            mean_sq = jnp.mean(jnp.square(yf), axis=axes)
            var = mean_sq - jnp.square(mean)  # biased, used for normalization
            count = 1
            for a in axes:
                count *= yg.shape[a]
            unbiased = var * (count / max(count - 1, 1))
            m = BN_MOMENTUM
            new_stats = {
                "mean": (1 - m) * stats["mean"] + m * mean,
                "var": (1 - m) * stats["var"] + m * unbiased,
            }
        else:
            mean, var = stats["mean"], stats["var"]
            new_stats = stats
        inv = params["scale"] * jax.lax.rsqrt(var + BN_EPS)
        shift = params["bias"] - mean * inv
        yg = yg * inv.astype(yg.dtype) + shift.astype(yg.dtype)
        if self.activation == "leaky":
            yg = leaky_relu(yg)
        return yg.reshape(y.shape), new_stats

    def fold(self, params, stats):
        """Fold BN into the conv: returns Conv-style params for apply_folded."""
        inv = params["scale"] * jax.lax.rsqrt(stats["var"] + BN_EPS)
        kernel = params["kernel"] * inv[None, None, None, :]
        bias = params["bias"] - stats["mean"] * inv
        return {"kernel": kernel, "bias": bias}

    def apply_folded(self, folded, x, ctx):
        # int8 leaf (models/quantize.py): symmetric per-tensor input quant +
        # per-channel weight quant; the conv contracts int8xint8->int32 on
        # the MXU's double-rate int8 path, and the quant/dequant elementwise
        # ops fuse into the conv epilogues.
        if "qkernel" in folded:
            y = conv2d(quantize_i8(x, folded["in_inv"]), folded["qkernel"],
                       self.stride, self.padding, preferred=jnp.int32)
            y = y.astype(jnp.float32) * folded["oscale"] + folded["bias"]
            if self.activation == "leaky":
                y = leaky_relu(y)
            return y.astype(ctx["dtype"])
        calib_observe(folded["kernel"], x)
        # Stay in the compute dtype between folded convs: every conv input is
        # truncated to it anyway, so upcasting in between only costs HBM
        # bandwidth. Prediction heads (plain Conv) still emit f32.
        y = conv2d(x, folded["kernel"], self.stride, self.padding, ctx["dtype"])
        y = y + folded["bias"].astype(y.dtype)
        if self.activation == "leaky":
            y = leaky_relu(y)
        return y


class Conv(Module):
    """Plain conv with bias, no norm/activation (prediction heads).

    torch layout: ``{prefix}.weight`` / ``{prefix}.bias``.
    """

    def __init__(self, cin, cout, ksize, stride=1, padding=0):
        self.cin, self.cout, self.ksize = cin, cout, ksize
        self.stride, self.padding = stride, padding

    def init(self, key):
        return _conv_init(key, self.ksize, self.cin, self.cout, with_bias=True), {}

    def apply(self, params, stats, x, ctx):
        y = conv2d(x, params["kernel"], self.stride, self.padding, ctx["dtype"])
        return y.astype(jnp.float32) + params["bias"], stats

    def fold(self, params, stats):
        return params

    def apply_folded(self, folded, x, ctx):
        y, _ = self.apply(folded, {}, x, ctx)
        return y


class NearestUpsample(Module):
    """Nearest-neighbor x``scale`` upsample (reference model/base.py:95-101)."""

    def __init__(self, scale_factor):
        self.scale = int(scale_factor)

    def init(self, key):
        return {}, {}

    def apply(self, params, stats, x, ctx):
        b, h, w, c = x.shape
        s = self.scale
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, s, w, s, c))
        return y.reshape(b, h * s, w * s, c), stats

    def apply_folded(self, folded, x, ctx):
        y, _ = self.apply({}, {}, x, ctx)
        return y

    def fold(self, params, stats):
        return {}


class Sequential(Module):
    def __init__(self, *modules):
        self.modules = list(modules)

    def __getitem__(self, i):
        return self.modules[i]

    def init(self, key):
        keys = jax.random.split(key, max(len(self.modules), 1))
        params, stats = [], []
        for k, m in zip(keys, self.modules):
            p, s = m.init(k)
            params.append(p)
            stats.append(s)
        return params, stats

    def apply(self, params, stats, x, ctx):
        new_stats = []
        for m, p, s in zip(self.modules, params, stats):
            x, ns = m.apply(p, s, x, ctx)
            new_stats.append(ns)
        return x, new_stats

    def fold(self, params, stats):
        return [m.fold(p, s) for m, p, s in zip(self.modules, params, stats)]

    def apply_folded(self, folded, x, ctx):
        for m, f in zip(self.modules, folded):
            x = m.apply_folded(f, x, ctx)
        return x

    def named_modules(self, torch_prefix=""):
        for i, m in enumerate(self.modules):
            yield from m.named_modules(f"{torch_prefix}.{i}" if torch_prefix else str(i))


def upsample_matrix(out_size, in_size, align_corners=False):
    """Dense 1-D bilinear interpolation matrix (out_size, in_size), matching
    torch ``F.interpolate(mode='bilinear', align_corners=False)`` source-coordinate
    semantics (reference eval/orienmask_yolo_postprocess.py:70).

    Applying along H then W as two matmuls puts the upsample on the MXU instead of
    a gather — the TPU-friendly formulation.
    """
    m = np.zeros((out_size, in_size), np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.clip(src, 0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    m[np.arange(out_size), lo] += 1 - frac
    m[np.arange(out_size), hi] += frac
    return m


def phase_resize(x, out_h, out_w, align_corners=False, pad_mult=4):
    """Bilinear-resize NHWC ``x`` to (out_h, out_w) AND space-to-depth the
    result (with the stride-2 conv's pad-1 halo) in the same two MXU matmuls.

    Returns z of shape (B, Hp, Wp, 4C) with channel order (a, b, c) where
    z[:, P, Q, (a, b, c)] = pad1(resize(x))[2P + a, 2Q + b, c] for
    P < out_h//2 + 1, zero beyond (spatial dims padded up to a multiple of
    ``pad_mult`` — odd 273² tiles ~70% slower than 276² on a v5e, see
    tools/bench_stemconv2.py).  A stride-2 pad-1 conv over the resized image
    == a 2x2 VALID conv over z (darknet.py ``_phase_kernel_im_z``), so the
    phase split costs no layout pass at all: each phase's rows/cols are just
    a row slice of the resize matrices, the total matmul work is identical to
    the plain resize.  Zero rows stand in for the conv padding, which is
    exact when normalization happens BEFORE this call (bilinear rows sum to
    1, so per-channel affine commutes with the resize).
    """
    in_h, in_w = x.shape[1], x.shape[2]
    ph, pw = out_h // 2 + 1, out_w // 2 + 1
    hp = -(-ph // pad_mult) * pad_mult
    wp = -(-pw // pad_mult) * pad_mult

    def phase_mats(out_size, in_size, n, npad):
        m = np.pad(upsample_matrix(out_size, in_size, align_corners),
                   ((1, 1), (0, 0)))
        stacked = np.zeros((2, npad, in_size), np.float32)
        stacked[0, :n] = m[0::2]
        stacked[1, :n] = m[1::2]
        return jnp.asarray(stacked)

    mh = phase_mats(out_h, in_h, ph, hp)   # (2, Hp, in_h)
    mw = phase_mats(out_w, in_w, pw, wp)   # (2, Wp, in_w)
    t = jnp.einsum("aPh,bhwc->baPwc", mh, x,
                   preferred_element_type=jnp.float32)
    z = jnp.einsum("BQw,baPwc->baPBQc", mw, t,
                   preferred_element_type=jnp.float32)
    b, c = x.shape[0], x.shape[3]
    # (b, a, P, B, Q, c) -> (b, P, Q, a, B, c) -> (b, P, Q, 4c)
    return z.transpose(0, 2, 4, 1, 3, 5).reshape(b, hp, wp, 4 * c)


def bilinear_resize(x, out_h, out_w, align_corners=False):
    """Bilinear resize of NHWC ``x`` to (out_h, out_w) via two MXU matmuls."""
    in_h, in_w = x.shape[1], x.shape[2]
    mh = jnp.asarray(upsample_matrix(out_h, in_h, align_corners))
    mw = jnp.asarray(upsample_matrix(out_w, in_w, align_corners))
    x = jnp.einsum("Hh,bhwc->bHwc", mh, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("Ww,bhwc->bhWc", mw, x, preferred_element_type=jnp.float32)
    return x


class Upsample(Module):
    """Bilinear (or nearest) x``scale`` upsample module (reference model/base.py:83-92)."""

    def __init__(self, scale_factor, mode="bilinear", align_corners=False):
        self.scale = scale_factor
        self.mode = mode
        self.align_corners = align_corners

    def init(self, key):
        return {}, {}

    def apply(self, params, stats, x, ctx):
        h, w = x.shape[1] * self.scale, x.shape[2] * self.scale
        if self.mode == "nearest":
            y, _ = NearestUpsample(self.scale).apply({}, {}, x, ctx)
            return y, stats
        return bilinear_resize(x, int(h), int(w), self.align_corners), stats

    def fold(self, params, stats):
        return {}

    def apply_folded(self, folded, x, ctx):
        y, _ = self.apply({}, {}, x, ctx)
        return y


class Scale(Module):
    """Learnable scalar multiplier (reference model/base.py:269-275)."""

    def __init__(self, init_value=1.0, learnable=True):
        self.init_value = init_value
        self.learnable = learnable

    def init(self, key):
        return {"scale": jnp.full((1,), self.init_value, jnp.float32)}, {}

    def apply(self, params, stats, x, ctx):
        s = params["scale"] if self.learnable else jax.lax.stop_gradient(params["scale"])
        return x * s, stats


class SPP(Module):
    """Spatial pyramid pooling: concat of same-size max-pools + 1x1 conv.

    The reference's SPP (model/base.py:197-207) is dead-on-arrival code:
    ``nn.MaxPool2d(k)`` defaults to stride=k so the pyramid levels shrink and
    ``torch.cat`` raises, and its 1x1 conv expects ``channels * len(kernel)``
    inputs while the pyramid has ``len(kernel) + 1`` members (no config
    instantiates it). This implements the evident intent — YOLOv3-SPP:
    stride-1 SAME max-pools keep every level at the input size."""

    def __init__(self, kernel_size, channels, activation="leaky"):
        self.kernel_size = list(kernel_size)
        self.conv = ConvBNLeaky(channels * (len(kernel_size) + 1), channels, 1,
                                activation=activation)

    def init(self, key):
        return self.conv.init(key)

    def apply(self, params, stats, x, ctx):
        pyramid = [x]
        for k in self.kernel_size:
            pyramid.append(jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                window_dimensions=(1, k, k, 1),
                window_strides=(1, 1, 1, 1),
                padding=((0, 0), ((k - 1) // 2, k // 2),
                         ((k - 1) // 2, k // 2), (0, 0)),
            ))
        y = jnp.concatenate(pyramid, axis=-1)
        return self.conv.apply(params, stats, y, ctx)


class FPN(Module):
    """Feature pyramid with lateral + output convs and optional extra stride-2
    levels (reference model/base.py:140-194).  ``x`` ordered top-down (smallest
    resolution first), like the reference."""

    def __init__(self, in_channels, out_channels, extra_levels=0,
                 activation="none"):
        self.in_channels = list(in_channels)
        self.out_channels = out_channels
        self.extra_levels = extra_levels
        self.lateral_convs = Sequential(*[
            ConvBNLeaky(c, out_channels, 1, activation=activation)
            for c in self.in_channels
        ])
        self.output_convs = Sequential(*[
            ConvBNLeaky(out_channels, out_channels, 3, padding=1, activation=activation)
            for _ in self.in_channels
        ])
        extra = []
        if extra_levels > 0:
            extra.append(ConvBNLeaky(self.in_channels[0], out_channels, 3,
                                     stride=2, padding=1, activation=activation))
            for _ in range(extra_levels - 1):
                extra.append(ConvBNLeaky(out_channels, out_channels, 3,
                                         stride=2, padding=1, activation=activation))
        self.extra_convs = Sequential(*extra)
        self.upsample = NearestUpsample(2)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        params, stats = {}, {}
        params["lateral"], stats["lateral"] = self.lateral_convs.init(k1)
        params["output"], stats["output"] = self.output_convs.init(k2)
        params["extra"], stats["extra"] = self.extra_convs.init(k3)
        return params, stats

    def apply(self, params, stats, x, ctx):
        ns = {"lateral": list(stats["lateral"]), "output": list(stats["output"]),
              "extra": list(stats["extra"])}
        outputs = []
        prev, ns["lateral"][0] = self.lateral_convs[0].apply(
            params["lateral"][0], stats["lateral"][0], x[0], ctx)
        y, ns["output"][0] = self.output_convs[0].apply(
            params["output"][0], stats["output"][0], prev, ctx)
        outputs.append(y)
        for i in range(1, len(x)):
            lat, ns["lateral"][i] = self.lateral_convs[i].apply(
                params["lateral"][i], stats["lateral"][i], x[i], ctx)
            up, _ = self.upsample.apply({}, {}, prev, ctx)
            prev = lat + up
            y, ns["output"][i] = self.output_convs[i].apply(
                params["output"][i], stats["output"][i], prev, ctx)
            outputs.append(y)
        feat = x[0]
        for i in range(self.extra_levels):
            feat, ns["extra"][i] = self.extra_convs[i].apply(
                params["extra"][i], stats["extra"][i], feat, ctx)
            outputs.insert(0, feat)
        return outputs, ns
