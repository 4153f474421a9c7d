"""TargetBuilder (chunked-scan, static shapes) vs the sequential numpy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orienmask_tpu.ops.targets import TargetBuilder

from numpy_ref import reference_build_targets

IMAGE = (64, 64)
GRID = (8, 8)
ANCHORS = [
    [4, 6], [8, 10], [12, 8],
    [10, 20], [20, 16], [18, 36],
    [36, 28], [48, 60], [60, 50],
]
MASKS = [[6, 7, 8], [3, 4, 5], [0, 1, 2]]
NUM_CLASSES = 5
N_MAX = 16


def _random_gt(rng, n_inst):
    """Random normalized boxes with blobby instance masks inside them."""
    h, w = IMAGE
    bbox, cls, masks = [], [], []
    for _ in range(n_inst):
        bw = rng.uniform(0.1, 0.7)
        bh = rng.uniform(0.1, 0.7)
        cx = rng.uniform(bw / 2, 1 - bw / 2)
        cy = rng.uniform(bh / 2, 1 - bh / 2)
        bbox.append([cx, cy, bw, bh])
        cls.append(rng.integers(0, NUM_CLASSES))
        ys, xs = np.mgrid[0:h, 0:w]
        ell = ((xs / w - cx) / (bw / 2)) ** 2 + ((ys / h - cy) / (bh / 2)) ** 2 <= rng.uniform(0.5, 1.2)
        masks.append(ell)
    return (np.array(bbox, np.float32).reshape(-1, 4),
            np.array(cls, np.int64),
            np.array(masks, bool).reshape(-1, h, w))


def _pad_gt(bbox, cls, masks):
    n = len(bbox)
    pb = np.zeros((N_MAX, 4), np.float32)
    pc = np.zeros((N_MAX,), np.int32)
    pm = np.zeros((N_MAX, *IMAGE), bool)
    pv = np.zeros((N_MAX,), bool)
    pb[:n], pc[:n], pm[:n], pv[:n] = bbox, cls, masks, True
    return pb, pc, pm, pv


@pytest.mark.parametrize("seed,n_inst", [(0, 4), (1, 9), (2, 1), (3, 0), (4, 13)])
@pytest.mark.parametrize("scale", [0, 1, 2])
@pytest.mark.parametrize("chunk", [4])  # chunk=1/16 covered by the fuzz test below
def test_targets_match_oracle(seed, n_inst, scale, chunk):
    rng = np.random.default_rng(seed)
    bbox, cls, masks = _random_gt(rng, n_inst)
    npred = 3 * GRID[0] * GRID[1]
    pred_boxes = np.stack([
        rng.uniform(0, GRID[1], npred), rng.uniform(0, GRID[0], npred),
        rng.uniform(0.3, 4.0, npred), rng.uniform(0.3, 4.0, npred),
    ], axis=1).astype(np.float32)

    builder = TargetBuilder(
        GRID, IMAGE, ANCHORS, MASKS[scale], NUM_CLASSES,
        center_region=0.6, valid_region=0.6, label_smooth=False,
        obj_ignore_threshold=0.6, chunk=chunk,
    )
    pb, pc, pm, pv = _pad_gt(bbox, cls, masks)
    got = builder(jnp.asarray(pb), jnp.asarray(pc), jnp.asarray(pm),
                  jnp.asarray(pv), jnp.asarray(pred_boxes))

    ref = reference_build_targets(
        bbox.astype(np.float64), cls, masks.astype(np.float64),
        pred_boxes.astype(np.float64), GRID, IMAGE, ANCHORS, MASKS[scale],
        NUM_CLASSES, center_region=0.6, valid_region=0.6, label_smooth=0.0,
        ignore_thresh=0.6,
    )

    names = ["pos_mask", "neg_mask", "pos_scale", "txy", "twh", "tiou", "tcls",
             "orien_pos", "orien_neg", "torien"]
    for name, g, r in zip(names, got, ref):
        g = np.asarray(g, np.float64)
        assert g.shape == r.shape, (name, g.shape, r.shape)
        np.testing.assert_allclose(g, r, rtol=1e-4, atol=1e-5, err_msg=name)


def test_targets_empty_sample():
    builder = TargetBuilder(GRID, IMAGE, ANCHORS, MASKS[0], NUM_CLASSES, chunk=4)
    pb = np.zeros((N_MAX, 4), np.float32)
    pv = np.zeros((N_MAX,), bool)
    pred = np.ones((3 * 64, 4), np.float32)
    out = builder(jnp.asarray(pb), jnp.zeros(N_MAX, jnp.int32),
                  jnp.zeros((N_MAX, *IMAGE), bool), jnp.asarray(pv), jnp.asarray(pred))
    assert float(np.asarray(out[0]).sum()) == 0  # no positives
    assert float(np.asarray(out[1]).min()) == 1  # all negative
    assert float(np.abs(np.asarray(out[9])).sum()) == 0  # no orientation targets


@pytest.mark.parametrize("seed", [7, 8])
def test_unified_painter_matches_per_scale(seed):
    """OrientationPainter (one 9-anchor pass) must reproduce the three
    per-scale painting loops exactly — including per-GT margins from each
    scale's own grid geometry (different grids per scale here)."""
    from orienmask_tpu.ops.targets import OrientationPainter

    grids = [(2, 2), (4, 4), (8, 8)]
    rng = np.random.default_rng(seed)
    bbox, cls, masks = _random_gt(rng, 11)
    pb, pc, pm, pv = _pad_gt(bbox, cls, masks)
    pb_j, pv_j, pm_j = jnp.asarray(pb), jnp.asarray(pv), jnp.asarray(pm)

    builders = [
        TargetBuilder(grids[s], IMAGE, ANCHORS, MASKS[s], NUM_CLASSES,
                      center_region=0.6, valid_region=0.6, chunk=4)
        for s in range(3)
    ]
    painter = OrientationPainter(IMAGE, ANCHORS, MASKS, grids,
                                 center_region=0.6, valid_region=0.6, chunk=4)

    # global anchor per GT, first-matching-scale wins (loss _paint_shared)
    ga = jnp.full((N_MAX,), -1, jnp.int32)
    for tb in builders:
        local, matched = tb.match(pb_j, pv_j)
        cand = jnp.asarray(np.asarray(tb.anchor_mask, np.int32))[jnp.maximum(local, 0)]
        ga = jnp.where(matched & (ga < 0), cand, ga)
    pos9, neg9, tor9 = painter(pb_j, ga, ga >= 0, pm_j)

    painted_any = False
    for s, tb in enumerate(builders):
        g = pb * np.array([tb.grid_w, tb.grid_h, tb.grid_w, tb.grid_h], np.float32)
        local, matched = tb.match(pb_j, pv_j)
        ref = tb._orientation_targets(
            jnp.asarray(g[:, :2]), jnp.asarray(g[:, 2:]),
            jnp.maximum(local, 0), matched, pm_j,
        )
        idx = np.asarray(tb.anchor_mask)
        got = (np.asarray(pos9)[idx], np.asarray(neg9)[idx], np.asarray(tor9)[idx])
        for name, gv, rv in zip(("pos", "neg", "torien"), got, ref):
            np.testing.assert_array_equal(gv, np.asarray(rv),
                                          err_msg=f"scale{s} {name}")
        painted_any = painted_any or np.asarray(ref[0]).sum() > 0
    assert painted_any  # the data must actually exercise painting


@pytest.mark.parametrize("seed", [100, 101, 102, 103])
def test_targets_fuzz_chunk_sizes(seed):
    """Edge chunk sizes (1 and 16) against the oracle on random instances."""
    rng = np.random.default_rng(seed)
    n_inst = int(rng.integers(0, 15))
    bbox, cls, masks = _random_gt(rng, n_inst)
    npred = 3 * GRID[0] * GRID[1]
    pred_boxes = np.stack([
        rng.uniform(0, GRID[1], npred), rng.uniform(0, GRID[0], npred),
        rng.uniform(0.3, 4.0, npred), rng.uniform(0.3, 4.0, npred),
    ], axis=1).astype(np.float32)
    pb, pc, pm, pv = _pad_gt(bbox, cls, masks)
    ref = reference_build_targets(
        bbox.astype(np.float64), cls, masks.astype(np.float64),
        pred_boxes.astype(np.float64), GRID, IMAGE, ANCHORS, MASKS[seed % 3],
        NUM_CLASSES, ignore_thresh=0.6)
    for chunk in (1, 16):
        builder = TargetBuilder(GRID, IMAGE, ANCHORS, MASKS[seed % 3], NUM_CLASSES,
                                obj_ignore_threshold=0.6, chunk=chunk)
        got = builder(jnp.asarray(pb), jnp.asarray(pc), jnp.asarray(pm),
                      jnp.asarray(pv), jnp.asarray(pred_boxes))
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g, np.float64), r,
                                       rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [21, 22])
def test_pallas_paint_matches_xla_painter(seed):
    """Fused Pallas painting kernel (interpret mode) vs the XLA chunked
    painter, batched, GT spread over all scales (bg-sum accumulation order
    differs, hence allclose rather than exact)."""
    from orienmask_tpu.ops.pallas_paint import paint_orientation
    from orienmask_tpu.ops.targets import OrientationPainter

    grids = [(2, 2), (4, 4), (8, 8)]
    builders = [
        TargetBuilder(grids[s], IMAGE, ANCHORS, MASKS[s], NUM_CLASSES,
                      center_region=0.6, valid_region=0.6, chunk=4)
        for s in range(3)
    ]
    painter = OrientationPainter(IMAGE, ANCHORS, MASKS, grids,
                                 center_region=0.6, valid_region=0.6, chunk=4)

    rng = np.random.default_rng(seed)
    B = 3
    bbox_b, mask_b, valid_b = [], [], []
    for bi in range(B):
        n_inst = int(rng.integers(0, 12))
        bbox, cls, masks = _random_gt(rng, n_inst)
        pb, pc, pm, pv = _pad_gt(bbox, cls, masks)
        bbox_b.append(pb); mask_b.append(pm); valid_b.append(pv)
    bbox_b = jnp.asarray(np.stack(bbox_b))
    mask_b = jnp.asarray(np.stack(mask_b))
    valid_b = jnp.asarray(np.stack(valid_b))

    def global_anchor(bb, vv):
        ga = jnp.full((N_MAX,), -1, jnp.int32)
        for tb in builders:
            local, matched = tb.match(bb, vv)
            cand = jnp.asarray(np.asarray(tb.anchor_mask, np.int32))[
                jnp.maximum(local, 0)]
            ga = jnp.where(matched & (ga < 0), cand, ga)
        return ga

    ga = jax.vmap(global_anchor)(bbox_b, valid_b)
    matched = ga >= 0

    ref = jax.vmap(painter)(bbox_b, ga, matched, mask_b)
    geom, n_last = painter.kernel_inputs(bbox_b, ga, matched)
    got = paint_orientation(geom, n_last, mask_b, painter.pixel_anchors,
                            IMAGE, block_h=16, interpret=True)

    assert float(np.asarray(ref[0]).sum()) > 0  # data must exercise painting
    for name, g, r in zip(("pos", "neg", "torien"), got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_pallas_paint_under_shard_map():
    """The kernel must run per-shard over a multi-device batch mesh (the path
    make_train_step wires up on multi-chip TPU) — validated with the
    interpret-mode kernel on the 8-device CPU mesh."""
    import functools

    from jax.sharding import PartitionSpec as P

    from orienmask_tpu.ops.pallas_paint import paint_orientation
    from orienmask_tpu.ops.targets import OrientationPainter
    from orienmask_tpu.parallel.mesh import DATA_AXIS, data_mesh, shard_batch

    grids = [(2, 2), (4, 4), (8, 8)]
    builders = [
        TargetBuilder(grids[s], IMAGE, ANCHORS, MASKS[s], NUM_CLASSES,
                      center_region=0.6, valid_region=0.6, chunk=4)
        for s in range(3)
    ]
    painter = OrientationPainter(IMAGE, ANCHORS, MASKS, grids,
                                 center_region=0.6, valid_region=0.6, chunk=4)
    rng = np.random.default_rng(5)
    B = 8
    bbox_b, mask_b, valid_b = [], [], []
    for _ in range(B):
        bbox, cls, masks = _random_gt(rng, int(rng.integers(1, 8)))
        pb, pc, pm, pv = _pad_gt(bbox, cls, masks)
        bbox_b.append(pb); mask_b.append(pm); valid_b.append(pv)
    bbox_b, mask_b, valid_b = (jnp.asarray(np.stack(x))
                               for x in (bbox_b, mask_b, valid_b))

    def global_anchor(bb, vv):
        ga = jnp.full((N_MAX,), -1, jnp.int32)
        for tb in builders:
            local, matched = tb.match(bb, vv)
            cand = jnp.asarray(np.asarray(tb.anchor_mask, np.int32))[
                jnp.maximum(local, 0)]
            ga = jnp.where(matched & (ga < 0), cand, ga)
        return ga

    ga = jax.vmap(global_anchor)(bbox_b, valid_b)
    matched = ga >= 0
    geom, n_last = painter.kernel_inputs(bbox_b, ga, matched)
    ref = jax.vmap(painter)(bbox_b, ga, matched, mask_b)

    mesh = data_mesh()
    assert mesh.size == 8
    paint = functools.partial(
        paint_orientation, pixel_anchors=painter.pixel_anchors,
        image_size=IMAGE, block_h=16, interpret=True,
    )
    spec = P(DATA_AXIS)
    sharded_paint = jax.shard_map(paint, mesh=mesh,
                                  in_specs=(spec, spec, spec),
                                  out_specs=(spec, spec, spec),
                                  check_vma=False)
    sb = shard_batch({"geom": geom, "n_last": n_last, "mask": mask_b}, mesh)
    got = sharded_paint(sb["geom"], sb["n_last"], sb["mask"])

    for name, g, r in zip(("pos", "neg", "torien"), got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
