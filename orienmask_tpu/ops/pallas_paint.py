"""Pallas TPU kernel: fused orientation-target painting (all scales, one pass).

The XLA painting path (ops/targets.py::_paint_chunk_loop) vectorizes the
reference's sequential per-instance loop (eval/orienmask_yolo_loss.py:241-275)
into chunked einsums, but the winner-selection contraction materializes
(chunk, anchor, H, W) operands in HBM every step — measured ~21 ms of a 78 ms
train step.  This kernel is the speed-of-light version: one pass over the
image per (batch, row-block) grid cell, a *sequential* fori_loop over the
sample's instances (the loop order IS the reference's last-wins semantics, so
the winner machinery disappears), VPU-only field math, and output blocks that
double as accumulators (rank/center/count live in the pos/tx/ty/neg outputs
until the finalize step rewrites them in place).

Layout: spatial (block_h, W) row blocks like ops/pallas_masks.py; per-instance
geometry rides in SMEM; the per-anchor accumulate is a 9-way predicated
dispatch on the instance's anchor id (scalar branches, ~one active per
instance).  Outputs: orien_pos/orien_neg (B, A, H, W) f32 and torien as
tx/ty (B, A, H, W) f32 — exactly the tensors the loss consumes.

The painting is constant w.r.t. parameters (targets are stop_gradient'd), so
no custom VJP is needed.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_GEOM = 10  # cx, cy, cwx, cwy, x1, x2, y1, y2, anchor, active


def _paint_kernel(nlast_ref, geom_ref, mask_ref,
                  pos_ref, neg_ref, tx_ref, ty_ref,
                  bgsx_ref, bgsy_ref, *,
                  block_h, image_h, image_w, n_anchors, half_anchors):
    # pixel coordinate fields for this row block (f32-exact integers)
    row0 = pl.program_id(1) * block_h
    yf = (jax.lax.broadcasted_iota(jnp.int32, (block_h, image_w), 0)
          + row0).astype(jnp.float32)
    xf = jax.lax.broadcasted_iota(jnp.int32, (block_h, image_w), 1).astype(
        jnp.float32)

    # Bit-unpack machinery for packed masks (mask_ref is (1, N, block_h, W/8)
    # uint8, big-endian bit order as np.packbits).  Mosaic cannot split the
    # lane dimension, so the W/8 -> W byte replication rides the MXU instead:
    # rep = bytes @ S with S[j, x] = [x//8 == j], then pixel x extracts bit
    # (7 - x%8) via exact power-of-two float shifts (bytes <= 255 are exact
    # in f32, products with 2^-k are exact, floor is exact).
    w8 = image_w // 8
    jrow = jax.lax.broadcasted_iota(jnp.int32, (w8, image_w), 0)
    xcol = jax.lax.broadcasted_iota(jnp.int32, (w8, image_w), 1)
    rep_mat = (jrow == xcol // 8).astype(jnp.float32)  # (W/8, W)
    xmod = jax.lax.broadcasted_iota(jnp.int32, (1, image_w), 1) % 8
    shift = jnp.full((1, image_w), 1.0 / 128.0, jnp.float32)  # 2^-(7-x%8)
    for kbit in range(1, 8):
        shift = jnp.where(xmod == kbit, jnp.float32(2.0 ** (kbit - 7)), shift)

    zeros = jnp.zeros((block_h, image_w), jnp.float32)
    for a in range(n_anchors):
        pos_ref[0, a] = zeros   # winner rank accumulator
        neg_ref[0, a] = zeros   # background count accumulator
        tx_ref[0, a] = zeros    # winner center x accumulator
        ty_ref[0, a] = zeros    # winner center y accumulator
        bgsx_ref[a] = zeros
        bgsy_ref[a] = zeros

    def body(n, _):
        active = geom_ref[0, n, 9]

        @pl.when(active > 0.0)
        def _():
            cx = geom_ref[0, n, 0]
            cy = geom_ref[0, n, 1]
            cwx = geom_ref[0, n, 2]
            cwy = geom_ref[0, n, 3]
            x1 = geom_ref[0, n, 4]
            x2 = geom_ref[0, n, 5]
            y1 = geom_ref[0, n, 6]
            y2 = geom_ref[0, n, 7]
            anc = geom_ref[0, n, 8].astype(jnp.int32)

            roi = (xf >= x1) & (xf < x2) & (yf >= y1) & (yf < y2)
            # Mosaic has no direct u8->f32 vector cast; widen via i32
            packed = mask_ref[0, n].astype(jnp.int32).astype(jnp.float32)
            rep = jax.lax.dot(packed, rep_mat,
                              preferred_element_type=jnp.float32)
            t = jnp.floor(rep * shift)
            bit = t - 2.0 * jnp.floor(t * 0.5)
            m = bit > 0.5
            inst = roi & m
            bg = roi & (~m)
            bgf = bg.astype(jnp.float32)

            # push-to-border background offsets
            # (reference orienmask_yolo_loss.py:265-271)
            offx = xf - cx
            offy = yf - cy
            olx = jnp.maximum(jnp.abs(offx), 1e-8)
            oly = jnp.maximum(jnp.abs(offy), 1e-8)
            # exact reciprocals: Mosaic's vector divide is approximate and
            # costs ~1e-3 relative error on these large ratios
            sneg = jnp.minimum(
                jnp.maximum(cwx * pl.reciprocal(olx, approx=False), 1.0),
                jnp.maximum(cwy * pl.reciprocal(oly, approx=False), 1.0),
            ) - 1.0
            nox = sneg * jnp.sign(offx) * olx * bgf
            noy = sneg * jnp.sign(offy) * oly * bgf

            rnk = (n + 1).astype(jnp.float32)

            # per-anchor accumulate: scalar-predicated 9-way dispatch
            # (exactly one branch runs per instance)
            for a in range(n_anchors):
                @pl.when(anc == a)
                def _(a=a):
                    pos_ref[0, a] = jnp.where(inst, rnk, pos_ref[0, a])
                    tx_ref[0, a] = jnp.where(inst, cx, tx_ref[0, a])
                    ty_ref[0, a] = jnp.where(inst, cy, ty_ref[0, a])
                    neg_ref[0, a] = neg_ref[0, a] + bgf
                    bgsx_ref[a] = bgsx_ref[a] + nox
                    bgsy_ref[a] = bgsy_ref[a] + noy

    jax.lax.fori_loop(0, nlast_ref[0, 0, 0], body, None)

    # finalize: reference denominators (-1 inside instances, bg count for
    # in-box background, 1000 don't-care) + anchor normalization
    # (orienmask_yolo_loss.py:277-283)
    for a in range(n_anchors):
        rank = pos_ref[0, a]
        pos = rank > 0
        bgcnt = neg_ref[0, a]
        hasbg = (bgcnt > 0) & (~pos)
        den = jnp.where(pos, -1.0, jnp.where(hasbg, bgcnt, 1000.0))
        hax, hay = half_anchors[a]
        rawx = jnp.where(pos, xf - tx_ref[0, a],
                         jnp.where(hasbg, bgsx_ref[a], 0.0))
        rawy = jnp.where(pos, yf - ty_ref[0, a],
                         jnp.where(hasbg, bgsy_ref[a], 0.0))
        rden = pl.reciprocal(den, approx=False)
        tx_ref[0, a] = rawx * (1.0 / hax) * rden
        ty_ref[0, a] = rawy * (1.0 / hay) * rden
        pos_ref[0, a] = pos.astype(jnp.float32)
        neg_ref[0, a] = hasbg.astype(jnp.float32)


def paint_orientation(geom, n_last, gt_mask, pixel_anchors, image_size,
                      block_h=32, interpret=False):
    """Paint orientation targets for a batch in one fused kernel.

    Args:
      geom: (B, N, 10) f32 — per instance [cx, cy, cwx, cwy, x1, x2, y1, y2,
        anchor, active] in pixels (bounds as half-open [x1, x2)).
      n_last: (B,) int32 — 1 + index of each sample's last active instance
        (the fori_loop bound; 0 means nothing to paint).
      gt_mask: (B, N, H, W) bool/uint8 instance masks, or (B, N, H, W/8)
        bit-packed uint8 (np.packbits order) — packed is the fast path (8x
        less DMA; in-kernel exact unpack via MXU byte replication).
      pixel_anchors: (A, 2) anchor sizes in pixels (static numpy).
      image_size: (H, W).
    Returns (orien_pos, orien_neg, torien): (B, A, H, W) f32 x2 and
      (B, A, H, W, 2) f32.
    """
    h, w = image_size
    b, n = geom.shape[0], geom.shape[1]
    n_anchors = len(pixel_anchors)
    assert w % 8 == 0, w
    w8 = w // 8
    if gt_mask.shape[-1] == w:
        # unpacked input (tests / direct callers): pack for the kernel; the
        # train step ships masks packed so this branch is off the hot path.
        from .maskops import pack_bits
        gt_mask = pack_bits(gt_mask.astype(bool))
    assert gt_mask.shape[-1] == w8, (gt_mask.shape, w)
    # VMEM budget: packed mask block (n rows u8, lanes pad to 128) + 4
    # double-buffered f32 outputs + 2 f32 scratch canvases over (block_h,
    # lanes-padded w). Shrink the row block until it fits (~12MB leaves
    # headroom of the ~16MB/core VMEM).
    w_pad = -(-w // 128) * 128
    w8_pad = -(-w8 // 128) * 128
    while block_h > 8:
        est = block_h * (2 * n * w8_pad + w_pad * (4 * 2 + 2) * n_anchors * 4)
        if est <= 12 * 1024 * 1024 and h % block_h == 0:
            break
        block_h //= 2
    assert h % block_h == 0, (h, block_h)
    half = [(float(pa[0]) / 2.0, float(pa[1]) / 2.0) for pa in
            np.asarray(pixel_anchors, np.float32)]

    grid = (b, h // block_h)
    out_sds = jax.ShapeDtypeStruct((b, n_anchors, h, w), jnp.float32)
    out_spec = pl.BlockSpec((1, n_anchors, block_h, w),
                            lambda bi, hi: (bi, 0, hi, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _paint_kernel, block_h=block_h, image_h=h, image_w=w,
        n_anchors=n_anchors, half_anchors=half,
    )
    pos, neg, tx, ty = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, N_GEOM), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, block_h, w8), lambda bi, hi: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(out_sds, out_sds, out_sds, out_sds),
        scratch_shapes=[
            pltpu.VMEM((n_anchors, block_h, w), jnp.float32),
            pltpu.VMEM((n_anchors, block_h, w), jnp.float32),
        ],
        interpret=interpret,
    )(n_last.astype(jnp.int32).reshape(b, 1, 1), geom, gt_mask)
    torien = jnp.stack([tx, ty], axis=-1)
    return pos, neg, torien
