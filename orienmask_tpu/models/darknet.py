"""DarkNet-53 backbone (reference model/backbone/darknet.py).

Stem conv + 5 stride-2 stages with (1, 2, 8, 8, 4) residual blocks; returns the
(x32, x16, x8, x4) feature pyramid with (1024, 512, 256, 128) channels.

TPU space-to-depth stem
-----------------------
The sub-128-channel convs at the network front (3x3 s1 3->32 at full res,
3x3 s2 32->64, block1's 1x1 64->32 / 3x3 32->64, conv3's 3x3 s2 64->128)
are the worst MXU citizens in the network: 3..64-channel contractions leave
most of the 128-lane systolic array idle while touching the largest spatial
extents, and their weight-gradient convolutions (tiny output tiles, huge
contraction) run at ~2-25 TFLOP/s.  We evaluate the exact same math at
reduced resolution in *phase space*: space-to-depth folds each 2x2 pixel
block into 4 channel phases, so conv1 becomes a 3x3 conv 12->128 at 272^2
whose output channels are the 4 output phases; conv2 (stride 2) consumes
those phases and emits the 4 phases of the 136^2 grid directly (3x3 s2
128->256, `_phase_kernel_s2_phase_out`); block1 runs residually in 136^2
phase space (1x1 -> block-diagonal 128->128, 3x3 -> 128->256 phase conv);
and conv3's stride-2 layer consumes the phases and lands on the true 136^2
grid (2x2 256->128, `_phase_kernel_s2_exit`).  All phase kernels are
*derived from the master kernels inside the step* via static slice/stack
ops (gather-free, so the AD transpose is cheap slice-adds): parameters,
gradients, checkpoints, and the torch weight converter are untouched.
BatchNorm statistics reduce over the phase axis too (layers.py bn_act
phase_groups), making the reformulation numerically the master computation
up to fp reassociation.  Net effect: the train step's conv time drops ~25%
at B=8/544^2 with bit-compatible eval-mode outputs (~1e-4 abs).
"""

import jax
import jax.numpy as jnp

from .layers import ConvBNLeaky, Module, Sequential, conv2d, leaky_relu


def _phase_kernel_s1(k):
    """Master (3,3,cin,cout) stride-1 kernel -> (3,3,4cin,4cout) phase kernel
    (phases in AND out).

    Output phase (p,q) at half-res position i reads full-res rows
    s = p + u - 1 = 2*du + a  =>  u = 2*du + a + 1 - p (tap zero otherwise).
    Built from static slices + stack + reshape — no gather, so the AD
    transpose is slice/pad adds instead of TPU-hostile scatter-adds.
    """
    cin, cout = k.shape[2], k.shape[3]
    z = jnp.zeros_like(k[0, 0])

    def tap(u, v):
        return k[u, v] if 0 <= u <= 2 and 0 <= v <= 2 else z

    # order (dui, dvi, a, b, p, q, c, o)
    blocks = jnp.stack([
        jnp.stack([
            tap(2 * (dui - 1) + a + 1 - p, 2 * (dvi - 1) + b + 1 - q)
            for a in range(2) for b in range(2)
            for p in range(2) for q in range(2)
        ]).reshape(2, 2, 2, 2, cin, cout)
        for dui in range(3) for dvi in range(3)
    ]).reshape(3, 3, 2, 2, 2, 2, cin, cout)
    # -> (dui, dvi, a, b, c, p, q, o)
    return blocks.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(
        3, 3, 4 * cin, 4 * cout)


def _phase_kernel_s2_exit(k):
    """Master (3,3,cin,cout) stride-2 kernel -> (2,2,4cin,cout) phase-consuming
    kernel producing true half-res output.

    Output position I reads full-res rows s = u - 1 = 2*du + a
    => u = 2*du + a + 1 with du in {-1, 0} (conv pads low 1, high 0).
    """
    cin, cout = k.shape[2], k.shape[3]
    z = jnp.zeros_like(k[0, 0])

    def tap(u, v):
        return k[u, v] if 0 <= u <= 2 and 0 <= v <= 2 else z

    blocks = jnp.stack([
        tap(2 * (dui - 1) + a + 1, 2 * (dvi - 1) + b + 1)
        for dui in range(2) for dvi in range(2)
        for a in range(2) for b in range(2)
    ])  # (dui, dvi, a, b) flat, each (cin, cout)
    return blocks.reshape(2, 2, 4 * cin, cout)


def _phase_kernel_s2_phase_out(k):
    """Master (3,3,cin,cout) stride-2 kernel -> (3,3,4cin,4cout) phase-in
    phase-OUT kernel: consumes half-res phases and emits quarter-res phases
    directly (stride 2 over the half-res grid, padding ((1,0),(1,0))),
    skipping the intermediate true-res tensor and its space-to-depth
    transpose.

    Output phase (p,q) at quarter-res position I is the full-res row
    2*(2I+p)+u-1 = 4I + t with t = 2p+u-1; half-res tap dm = floor(t/2),
    input phase a = t mod 2  =>  u = 2*dm + a + 1 - 2*p (tap zero otherwise).
    """
    cin, cout = k.shape[2], k.shape[3]
    z = jnp.zeros_like(k[0, 0])

    def tap(u, v):
        return k[u, v] if 0 <= u <= 2 and 0 <= v <= 2 else z

    blocks = jnp.stack([
        jnp.stack([
            tap(2 * (dmi - 1) + a + 1 - 2 * p, 2 * (dni - 1) + b + 1 - 2 * q)
            for a in range(2) for b in range(2)
            for p in range(2) for q in range(2)
        ]).reshape(2, 2, 2, 2, cin, cout)
        for dmi in range(3) for dni in range(3)
    ]).reshape(3, 3, 2, 2, 2, 2, cin, cout)
    return blocks.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(
        3, 3, 4 * cin, 4 * cout)


def _phase_kernel_im(k):
    """Master (3,3,cin,cout) stride-1 kernel -> (4,4,cin,4cout) stride-2 conv
    applied DIRECTLY to the full-res input, emitting half-res phases
    (output channel (p*2+q)*cout + o); conv padding ((1,1),(1,1)).

    This folds the input space-to-depth transpose into the conv's own im2col:
    out position I, tap row si reads full-res row 2I + si - 1 = 2I + p + u - 1
    => u = si - p (tap zero otherwise).  Identical padded-MXU cost to the
    12->128 phase conv (both contractions pad to 128 lanes), but no explicit
    S2D layout op on the largest tensor in the network.
    """
    cin, cout = k.shape[2], k.shape[3]
    z = jnp.zeros_like(k[0, 0])

    def tap(u, v):
        return k[u, v] if 0 <= u <= 2 and 0 <= v <= 2 else z

    blocks = jnp.stack([
        jnp.stack([
            tap(si - p, ti - q)
            for p in range(2) for q in range(2)
        ]).reshape(2, 2, cin, cout)
        for si in range(4) for ti in range(4)
    ]).reshape(4, 4, 2, 2, cin, cout)
    # (si, ti, p, q, c, o) -> (si, ti, c, p, q, o)
    return blocks.transpose(0, 1, 4, 2, 3, 5).reshape(4, 4, cin, 4 * cout)


def _phase_kernel_im_z(k):
    """Master (3,3,cin,cout) stride-1 kernel -> (2,2,4cin,4cout) kernel over a
    pre-phased input z (layers.phase_resize: z[P,Q,(a,b,c)] = pad1(x)[2P+a,
    2Q+b, c]).  Tap (A,B) of the 2x2 VALID conv reads z row P=I+A, i.e. the
    (si,ti)=(2A+a, 2B+b) tap of the folded image kernel `_phase_kernel_im`:
    a pure index repack, identical arithmetic.  Used by the fused inference
    pipeline, which gets z for free out of the resize matmuls."""
    k1p = _phase_kernel_im(k)                       # (4, 4, cin, 4cout)
    cin, cout4 = k1p.shape[2], k1p.shape[3]
    return k1p.reshape(2, 2, 2, 2, cin, cout4) \
        .transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * cin, cout4)


def _phase_kernel_1x1(k):
    """Master (1,1,cin,cout) kernel -> (1,1,4cin,4cout) block-diagonal phase
    kernel (1x1 convs mix no space: each phase maps to itself)."""
    cin, cout = k.shape[2], k.shape[3]
    z = jnp.zeros_like(k[0, 0])
    blocks = jnp.stack([
        k[0, 0] if (a, b) == (p, q) else z
        for a in range(2) for b in range(2)
        for p in range(2) for q in range(2)
    ]).reshape(2, 2, 2, 2, cin, cout)
    return blocks.transpose(0, 1, 4, 2, 3, 5).reshape(
        1, 1, 4 * cin, 4 * cout)


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

    def __init__(self, freeze_backbone=False, batchnorm_eval=False, s2d_stem=True,
                 stage_blocks=None):
        self.freeze_backbone = int(freeze_backbone or 0)
        self.batchnorm_eval = batchnorm_eval
        self.s2d_stem = bool(s2d_stem)
        if stage_blocks is not None:  # depth variant (e.g. slim CI configs)
            self.STAGE_BLOCKS = tuple(int(n) for n in stage_blocks)
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

    def _use_s2d(self, x):
        # two phase levels (272^2 and 136^2 for a 544^2 input) => /4 divisible
        return self.s2d_stem and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0

    @staticmethod
    def _conv_phase_exit(x, kernel_phase, dtype, preferred=None):
        """2x2 phase-consuming conv landing on the true half-res grid."""
        if preferred is None:
            x, kernel_phase = x.astype(dtype), kernel_phase.astype(dtype)
        return jax.lax.conv_general_dilated(
            x, kernel_phase, window_strides=(1, 1),
            padding=((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred,
        )

    @staticmethod
    def _conv_phase_down(x, kernel_phase, dtype, preferred=None):
        """3x3 stride-2 phase-in/phase-out conv: half-res phases in,
        quarter-res phases out."""
        if preferred is None:
            x, kernel_phase = x.astype(dtype), kernel_phase.astype(dtype)
        return jax.lax.conv_general_dilated(
            x, kernel_phase, window_strides=(2, 2),
            padding=((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred,
        )

    def _stage_ctx(self, name, bctx):
        from .layers import frozen_stage_ctx

        return frozen_stage_ctx(bctx, name, self.frozen_stages())

    def _stem_phase(self, params, stats, x, bctx):
        """conv1 .. conv3[0] evaluated in space-to-depth phase space (see
        module docstring).  Covers every sub-128-channel conv: conv1 + conv2[0]
        at 272^2 phase space, then block1 + conv3[0] at 136^2 phase space.
        Returns (136^2 x 128ch tensor, {'conv1','conv2'} stats, conv3[0] stats)."""
        ctx1 = self._stage_ctx("conv1", bctx)
        ctx2 = self._stage_ctx("conv2", bctx)
        ctx3 = self._stage_ctx("conv3", bctx)
        dtype = bctx["dtype"]
        new_stats = {}
        c2first = self.conv2.modules[0]
        k1p = _phase_kernel_im(params["conv1"]["kernel"])
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), k1p.astype(dtype), window_strides=(2, 2),
            padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y, new_stats["conv1"] = self.conv1.bn_act(
            y, params["conv1"], stats["conv1"], ctx1, phase_groups=4)

        # conv2[0] (s2) consumes 272^2 phases and emits 136^2 phases
        # directly — no intermediate true-res tensor, no second
        # space-to-depth transpose (and none of its AD-transpose twin).
        k2p = _phase_kernel_s2_phase_out(params["conv2"][0]["kernel"])
        zp = self._conv_phase_down(y, k2p, dtype)
        zp, ns2_first = c2first.bn_act(zp, params["conv2"][0], stats["conv2"][0],
                                       ctx2, phase_groups=4)

        # block1 (residual 1x1 64->32, 3x3 32->64) in 136^2 phase space
        b1 = self.conv2.modules[1]
        sub = b1.conv.modules
        p1x1, p3x3 = params["conv2"][1]
        s1x1, s3x3 = stats["conv2"][1]
        k1x1p = _phase_kernel_1x1(p1x1["kernel"])
        h = conv2d(zp, k1x1p, stride=1, padding=0, dtype=dtype)
        h, ns_1x1 = sub[0].bn_act(h, p1x1, s1x1, ctx2, phase_groups=4)
        kb1p = _phase_kernel_s1(p3x3["kernel"])
        h = conv2d(h, kb1p, stride=1, padding=1, dtype=dtype)
        h, ns_3x3 = sub[1].bn_act(h, p3x3, s3x3, ctx2, phase_groups=4)
        zp = zp + h  # phase layout is a permutation: residual commutes
        new_stats["conv2"] = [ns2_first, [ns_1x1, ns_3x3]]

        # conv3[0] (3x3 s2 64->128) consumes phases, exits at true 136^2
        c3first = self.conv3.modules[0]
        k3p = _phase_kernel_s2_exit(params["conv3"][0]["kernel"])
        w = self._conv_phase_exit(zp, k3p, dtype)
        w, ns3_first = c3first.bn_act(w, params["conv3"][0], stats["conv3"][0], ctx3)
        return w, new_stats, ns3_first

    def apply(self, params, stats, x, ctx):
        # batchnorm_eval: backbone BN uses running stats even in training
        # (reference model/base.py:71-77).
        bctx = dict(ctx, train=False) if (self.batchnorm_eval and ctx["train"]) else ctx
        new_stats = {}
        feats = {}
        names = list(self.stage_names)
        # Stage-granular rematerialization (ctx['remat']): each stage's
        # activations are recomputed during its backward instead of living
        # from forward to backward — peak HBM drops to (stage boundaries +
        # one stage's interior) at ~1/3 extra forward FLOPs.  Stage blocks
        # are the natural cut: boundaries are the FPN taps anyway.
        remat = bool(bctx.get("remat")) and bctx["train"]

        def _stage_fn(fn):
            return jax.checkpoint(fn) if remat else fn

        if self._use_s2d(x):
            def stem_all(stem_p, stem_s, x):
                x, stem_stats, ns3_first = self._stem_phase(stem_p, stem_s, x, bctx)
                ns3 = [ns3_first]
                ctx3 = self._stage_ctx("conv3", bctx)
                for m, p, s in zip(self.conv3.modules[1:], stem_p["conv3"][1:],
                                   stem_s["conv3"][1:]):
                    x, ns = m.apply(p, s, x, ctx3)
                    ns3.append(ns)
                return x, dict(stem_stats, conv3=ns3)

            x, stem_ns = _stage_fn(stem_all)(params, stats, x)
            new_stats.update(stem_ns)
            feats["conv3"] = x
            names = names[3:]
        for name in names:
            stage, sctx = getattr(self, name), self._stage_ctx(name, bctx)
            x, new_stats[name] = _stage_fn(
                lambda p, s, x, _m=stage, _c=sctx: _m.apply(p, s, x, _c)
            )(params[name], stats[name], x)
            feats[name] = x
        return (feats["conv6"], feats["conv5"], feats["conv4"], feats["conv3"]), new_stats

    def fold(self, params, stats):
        return {n: getattr(self, n).fold(params[n], stats[n]) for n in self.stage_names}

    def precompute_stem_folded(self, folded):
        """Pre-derive the phase-stem kernels into the folded tree.

        The derivations are pure dtype-preserving repacks (slice/stack) of
        static folded weights, but left in-graph they cost ~0.11 ms/frame of
        layout ops at 544² bs=1 (round-5 `tools/profile_infer.py`: the
        `slice: darknet.py` row alone was 5.3% of device time).  Inference
        weights never change per frame, so ``apply_folded`` consumes the
        ``*_phase*`` leaves added here when present; master kernels stay in
        place (int8 calibration reads them, and training AD still derives
        in-graph).  Call again after ``quantize_folded`` — quantized leaves
        are rebuilt without phase keys (and a ``stem=True`` quantization
        then pre-derives from the int8 masters, keeping them int8).
        """
        if not self.s2d_stem:
            return folded
        sites = [
            (folded["conv1"], "_z", _phase_kernel_im_z),
            (folded["conv1"], "_im", _phase_kernel_im),
            (folded["conv2"][0], "", _phase_kernel_s2_phase_out),
            (folded["conv2"][1][0], "", _phase_kernel_1x1),
            (folded["conv2"][1][1], "", _phase_kernel_s1),
            (folded["conv3"][0], "", _phase_kernel_s2_exit),
        ]
        masters = [leaf["qkernel" if "qkernel" in leaf else "kernel"]
                   for leaf, _, _ in sites]
        derived = jax.jit(lambda ks: [
            d(k) for k, (_, _, d) in zip(ks, sites)])(masters)
        for (leaf, suffix, _), k in zip(sites, derived):
            src = "qkernel" if "qkernel" in leaf else "kernel"
            leaf[f"{src}_phase{suffix}"] = k
        return folded

    def apply_folded(self, folded, x, ctx, phase_hw=None):
        """``phase_hw=(h2, w2)`` marks ``x`` as a pre-phased input z from
        layers.phase_resize (4*3=12 channels, spatial padded), where (h2, w2)
        is the half-resolution grid (e.g. (272, 272) for a 544² network):
        conv1 then runs as a 2x2 VALID conv (`_phase_kernel_im_z`) and the
        rest of the phase stem is unchanged."""
        feats = {}
        names = list(self.stage_names)
        if phase_hw is not None or self._use_s2d(x):
            from .layers import calib_observe, quantize_i8

            dtype = ctx["dtype"]

            def stem_conv(leaf, x, derive, conv, n_tile, suffix=""):
                """One stem conv from its master folded leaf: derive the
                phase kernel (a dtype-preserving slice/stack repack, so an
                int8 master stays int8), conv, dequant + bias + leaky.  The
                per-out-channel dequant scale and bias tile x``n_tile`` for
                phase-emitting kernels (out layout is phase-major (p,q,o),
                matching the kernel derivations above).  When the leaf
                carries a pre-derived ``*_phase<suffix>`` kernel
                (``precompute_stem_folded``), the in-graph derive is skipped
                — same bits, hoisted out of the per-frame program."""
                q8 = "qkernel" in leaf
                if q8:
                    kq = leaf.get("qkernel_phase" + suffix)
                    y = conv(quantize_i8(x, leaf["in_inv"]),
                             kq if kq is not None else derive(leaf["qkernel"]),
                             jnp.int32)
                    scale = (leaf["oscale"] if n_tile == 1
                             else jnp.tile(leaf["oscale"], n_tile))
                    y = y.astype(jnp.float32) * scale
                else:
                    calib_observe(leaf["kernel"], x)
                    kf = leaf.get("kernel_phase" + suffix)
                    kf = (kf if kf is not None
                          else derive(leaf["kernel"])).astype(dtype)
                    y = conv(x.astype(dtype), kf, None)
                bias = (leaf["bias"] if n_tile == 1
                        else jnp.tile(leaf["bias"], n_tile))
                y = leaky_relu(y + bias.astype(y.dtype))
                return y.astype(dtype) if q8 else y

            dn = ("NHWC", "HWIO", "NHWC")
            if phase_hw is not None:
                h2, w2 = phase_hw
                y = stem_conv(
                    folded["conv1"], x, _phase_kernel_im_z,
                    lambda q, k, pe: jax.lax.conv_general_dilated(
                        q, k, (1, 1), "VALID", dimension_numbers=dn,
                        preferred_element_type=pe)[:, :h2, :w2],
                    n_tile=4, suffix="_z")
            else:
                y = stem_conv(
                    folded["conv1"], x, _phase_kernel_im,
                    lambda q, k, pe: jax.lax.conv_general_dilated(
                        q, k, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn,
                        preferred_element_type=pe),
                    n_tile=4, suffix="_im")
            zp = stem_conv(folded["conv2"][0], y, _phase_kernel_s2_phase_out,
                           lambda q, k, pe: self._conv_phase_down(q, k, dtype, pe),
                           n_tile=4)
            f1x1, f3x3 = folded["conv2"][1]
            h = stem_conv(f1x1, zp, _phase_kernel_1x1,
                          lambda q, k, pe: conv2d(q, k, 1, 0, dtype, pe),
                          n_tile=4)
            h = stem_conv(f3x3, h, _phase_kernel_s1,
                          lambda q, k, pe: conv2d(q, k, 1, 1, dtype, pe),
                          n_tile=4)
            zp = zp + h
            x = stem_conv(folded["conv3"][0], zp, _phase_kernel_s2_exit,
                          lambda q, k, pe: self._conv_phase_exit(q, k, dtype, pe),
                          n_tile=1)
            for m, f in zip(self.conv3.modules[1:], folded["conv3"][1:]):
                x = m.apply_folded(f, x, ctx)
            feats["conv3"] = x
            names = names[3:]
        for name in names:
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
