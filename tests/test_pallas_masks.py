"""Pallas mask-assembly kernel vs the jnp formulation (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from orienmask_tpu.ops.maskops import unpack_bits_np
from orienmask_tpu.ops.pallas_masks import (
    assemble_masks_anchor_resident,
    assemble_masks_packed,
)


def _jnp_reference(field, boxes, anchor_wh, anchor_idx, thresh):
    a, _, h, w = field.shape
    mesh_x = np.arange(w)[None, :] / w
    mesh_y = np.arange(h)[:, None] / h
    out = []
    for d in range(boxes.shape[0]):
        ai = int(anchor_idx[d])
        fx = field[ai, 0] * anchor_wh[d, 0] / 2 + mesh_x
        fy = field[ai, 1] * anchor_wh[d, 1] / 2 + mesh_y
        m = (np.abs(fx - boxes[d, 0]) < thresh * boxes[d, 2]) & (
            np.abs(fy - boxes[d, 1]) < thresh * boxes[d, 3])
        out.append(m)
    return np.stack(out)


def test_pallas_masks_match_reference():
    rng = np.random.default_rng(0)
    a, h, w, k = 9, 64, 64, 12
    field = rng.standard_normal((a, 2, h, w)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(0.2, 0.8, k), rng.uniform(0.2, 0.8, k),
        rng.uniform(0.1, 0.6, k), rng.uniform(0.1, 0.6, k),
    ], axis=1).astype(np.float32)
    anchor_idx = rng.integers(0, a, k).astype(np.int32)
    anchor_wh = rng.uniform(0.05, 0.7, (k, 2)).astype(np.float32)

    packed = assemble_masks_packed(
        jnp.asarray(field), jnp.asarray(boxes), jnp.asarray(anchor_wh),
        jnp.asarray(anchor_idx), orien_thresh=0.3, block_h=32, interpret=True,
    )
    got = unpack_bits_np(np.asarray(packed), w)
    ref = _jnp_reference(field, boxes, anchor_wh, anchor_idx, 0.3)
    np.testing.assert_array_equal(got, ref)


def test_anchor_resident_kernel_matches_reference():
    """The anchor-resident kernel requires anchor_wh[k] == table[anchor_idx[k]]
    (true for all real callers — sizes come from norm_anchors[anchor_idx]).
    Parity-check it in interpret mode against the per-detection formulation,
    including duplicate anchors, unused anchors, and zero-size padded dets."""
    rng = np.random.default_rng(1)
    a, h, w, k = 9, 64, 64, 16
    field = rng.standard_normal((a, 2, h, w)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(0.2, 0.8, k), rng.uniform(0.2, 0.8, k),
        rng.uniform(0.1, 0.6, k), rng.uniform(0.1, 0.6, k),
    ], axis=1).astype(np.float32)
    boxes[-3:] = 0.0  # padded detections: zero box -> empty mask
    anchor_idx = rng.integers(0, a - 2, k).astype(np.int32)  # leave anchors unused
    anchor_idx[:4] = 3  # force duplicates on one anchor
    table = rng.uniform(0.05, 0.7, (a, 2)).astype(np.float32)
    anchor_wh = table[anchor_idx]

    packed = assemble_masks_anchor_resident(
        jnp.asarray(field), jnp.asarray(boxes), jnp.asarray(anchor_wh),
        jnp.asarray(anchor_idx), orien_thresh=0.3, block_h=32, interpret=True,
    )
    got = unpack_bits_np(np.asarray(packed), w)
    ref = _jnp_reference(field, boxes, anchor_wh, anchor_idx, 0.3)
    np.testing.assert_array_equal(got, ref)


def test_anchor_resident_row0_shards_match_whole_image():
    """Spatial row-sharding contract (parallel/spatial.py): evaluating the
    kernel on a row block with ``coord_h`` = global H and ``row0`` = the
    block's first global row must be BIT-identical to the corresponding rows
    of the whole-image call — row0 enters the row iota as an integer before
    the 1/H scale, so the arithmetic is literally the same."""
    rng = np.random.default_rng(2)
    a, h, w, k = 6, 64, 64, 10
    n_shards, hs = 4, 16
    field = rng.standard_normal((a, 2, h, w)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(0.2, 0.8, k), rng.uniform(0.2, 0.8, k),
        rng.uniform(0.1, 0.6, k), rng.uniform(0.1, 0.6, k),
    ], axis=1).astype(np.float32)
    anchor_idx = rng.integers(0, a, k).astype(np.int32)
    table = rng.uniform(0.05, 0.7, (a, 2)).astype(np.float32)
    anchor_wh = table[anchor_idx]

    whole = np.asarray(assemble_masks_anchor_resident(
        jnp.asarray(field), jnp.asarray(boxes), jnp.asarray(anchor_wh),
        jnp.asarray(anchor_idx), orien_thresh=0.3, block_h=16, interpret=True,
    ))
    for s in range(n_shards):
        r0 = s * hs
        shard = np.asarray(assemble_masks_anchor_resident(
            jnp.asarray(field[:, :, r0:r0 + hs]), jnp.asarray(boxes),
            jnp.asarray(anchor_wh), jnp.asarray(anchor_idx),
            orien_thresh=0.3, block_h=16, interpret=True,
            coord_h=h, row0=r0,
        ))
        np.testing.assert_array_equal(shard, whole[:, r0:r0 + hs])
