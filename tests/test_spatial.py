"""Spatial partitioning (parallel/spatial.py): image rows sharded over a mesh.

Beyond-reference capability (the reference is DP-only, SURVEY.md §2.12): GSPMD
partitions every conv spatially with halo exchanges. Asserts the row-sharded
forward is numerically equal to the single-device forward, and the fused
inference pipeline runs under (data, space) sharding end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture()
def tiny_model(monkeypatch):
    from orienmask_tpu.models.darknet import DarkNet53

    monkeypatch.setattr(DarkNet53, "STAGE_BLOCKS", (1, 1, 1, 1, 1))
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus

    model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def test_spatial_forward_matches_single_device(tiny_model):
    from orienmask_tpu.parallel import spatial_forward, spatial_mesh

    model, variables = tiny_model
    size = 128
    mesh = spatial_mesh(n_space=2, n_data=2)
    assert mesh.devices.shape == (2, 2)

    x = jax.random.normal(jax.random.PRNGKey(3), (2, size, size, 3), jnp.float32)

    ref, _ = model.forward(variables, x, train=False)
    fn = spatial_forward(model, mesh)
    out = fn(variables, x)

    for s, ((rb, ro), (ob, oo)) in enumerate(zip(ref, out)):
        np.testing.assert_allclose(
            np.asarray(ob), np.asarray(rb), rtol=2e-5, atol=2e-5,
            err_msg=f"bbox head scale {s}")
        np.testing.assert_allclose(
            np.asarray(oo), np.asarray(ro), rtol=2e-5, atol=2e-5,
            err_msg=f"orien head scale {s}")


def test_spatial_pipeline_end_to_end(tiny_model):
    from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
    from orienmask_tpu.data.transform import FastCOCOTransform
    from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess
    from orienmask_tpu.parallel import spatial_mesh
    from orienmask_tpu.pipeline import InferencePipeline

    model, variables = tiny_model
    size = 96
    transform = FastCOCOTransform([
        dict(type="Resize", size=(size, size)),
        dict(type="Normalize", mean=(0, 0, 0), std=(255, 255, 255)),
    ])
    pp = OrienMaskYOLOPostProcess(
        grid_size=[[size // 32] * 2, [size // 16] * 2, [size // 8] * 2],
        image_size=[size, size], anchors=ANCHORS_YOLOV4, anchor_mask=ANCHORS_MASK,
        num_classes=80, conf_thresh=0.005, nms=dict(threshold=0.5),
        nms_pre=50, nms_post=10, orien_thresh=0.3,
    )
    mesh = spatial_mesh(n_space=4, n_data=1)
    sp_pipe = InferencePipeline(model, variables, transform, pp, "float32",
                                mesh=mesh)

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (1, 120, 160, 3), np.uint8)
    out = sp_pipe.run_device(image)
    # Same contract as the unsharded pipeline: padded device arrays,
    # replicated. (No detection-by-detection comparison against the unsharded
    # program: with random weights all scores collapse to within float noise,
    # so post-NMS ordering between two compilations is meaningless; numerical
    # equality of the sharded compute is covered by the forward test above.)
    ref = InferencePipeline(model, variables, transform, pp,
                            "float32").run_device(image)
    assert out["bbox"].shape == ref["bbox"].shape
    assert out["mask"].shape == ref["mask"].shape
    assert np.isfinite(np.asarray(out["bbox"])).all()


def test_spatial_train_step_matches_dp(tiny_model):
    """ONE full training step (fwd + loss/targets + bwd + SGD + BN stats)
    with image rows sharded over the space axis must equal the DP-only step
    on the same global batch — the training-side extension of the sharded
    forward equality above."""
    from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss
    from orienmask_tpu.optim import SGD
    from orienmask_tpu.parallel import spatial_mesh
    from orienmask_tpu.parallel.mesh import data_mesh, shard_batch
    from orienmask_tpu.parallel.spatial import (
        shard_spatial_batch, spatial_train_step)
    from orienmask_tpu.trainer.train_state import make_train_step

    model, variables = tiny_model
    size = 128
    grids = [[size // 32] * 2, [size // 16] * 2, [size // 8] * 2]
    anchors = [[4, 6], [8, 10], [12, 8], [10, 20], [20, 16], [18, 36],
               [36, 28], [48, 60], [60, 50]]
    loss = OrienMaskYOLOMultiScaleLoss(
        grid_size=grids, image_size=[size, size], anchors=anchors,
        anchor_mask=[[6, 7, 8], [3, 4, 5], [0, 1, 2]], num_classes=80,
        center_region=0.6, valid_region=0.6, label_smooth=False,
        obj_ignore_threshold=0.7, weight=[1, 1, 1, 1, 1, 20, 20],
        scales_weight=[1, 1, 1], target_chunk=4,
    )
    optimizer = SGD(lr=1e-3, momentum=0.9, weight_decay=5e-4)

    rng = np.random.default_rng(0)
    b, n_inst = 2, 4
    masks = np.zeros((b, n_inst, size, size), bool)
    masks[:, :, 32:96, 24:104] = True
    batch = {
        "image": rng.standard_normal((b, size, size, 3)).astype(np.float32),
        "bbox": np.tile(np.array([[0.5, 0.5, 0.5, 0.55]], np.float32),
                        (b, n_inst, 1)),
        "cls": np.zeros((b, n_inst), np.int32),
        "mask": masks,
        "valid": np.tile(np.array([True, True, False, False]), (b, 1)),
    }

    dmesh = data_mesh(devices=jax.devices()[:2])
    step_dp, init_dp = make_train_step(model, loss, optimizer, dmesh)
    st_dp = init_dp(variables)
    st_dp, logs_dp = step_dp(st_dp, shard_batch(batch, dmesh), 1e-3, True)

    smesh = spatial_mesh(n_space=2, n_data=2)
    assert smesh.devices.shape == (2, 2)
    step_sp, init_sp = spatial_train_step(model, loss, optimizer, smesh)
    st_sp = init_sp(variables)
    st_sp, logs_sp = step_sp(st_sp, shard_spatial_batch(batch, smesh),
                             1e-3, True)

    np.testing.assert_allclose(float(logs_sp["loss"]), float(logs_dp["loss"]),
                               rtol=1e-5)
    for key in ("params", "batch_stats"):
        a_leaves = jax.tree_util.tree_flatten_with_path(
            jax.device_get(st_dp[key]))[0]
        b_leaves = jax.tree_util.tree_flatten_with_path(
            jax.device_get(st_sp[key]))[0]
        for (pa, la), (pb, lb) in zip(a_leaves, b_leaves):
            assert pa == pb
            # Tolerance calibrated against the DP-only baseline: a 1-device
            # vs 2-device DP step of this exact model/batch already differs
            # by max-abs ~5e-4 (f32 reduction-order noise through BN +
            # backward at loss ~800); the spatial step sits in the same
            # envelope, so anything <= 2e-3 is partitioning noise, not a
            # semantic divergence.
            np.testing.assert_allclose(
                lb, la, rtol=0, atol=2e-3,
                err_msg=f"{key}{jax.tree_util.keystr(pa)}")


@pytest.mark.parametrize("pack", [False, True])
def test_run_batch_spatial_matches_replicated(pack):
    """The row-sharded postprocess tail (VERDICT r3 task 9): detect stays
    replicated, upsample+mask assembly run under shard_map with each device
    producing its own row block. On the CPU mesh (XLA path) the outputs must
    be BIT-identical to the single-program _run_batch — the local row mesh is
    a slice of the same precomputed array and detect is the same code."""
    from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
    from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess
    from orienmask_tpu.parallel.spatial import run_batch_spatial, spatial_mesh

    size, b, n_anchors, n_cls = 96, 2, 3, 80
    pp = OrienMaskYOLOPostProcess(
        grid_size=[[size // 32] * 2, [size // 16] * 2, [size // 8] * 2],
        image_size=[size, size], anchors=ANCHORS_YOLOV4,
        anchor_mask=ANCHORS_MASK, num_classes=n_cls, conf_thresh=0.005,
        nms=dict(threshold=0.5), nms_pre=40, nms_post=12, orien_thresh=0.3,
        pack_masks=pack, use_pallas_masks=False,
    )
    rng = np.random.default_rng(5)
    predict = []
    for g in (size // 32, size // 16, size // 8):
        bbox = rng.standard_normal(
            (b, g, g, n_anchors * (5 + n_cls))).astype(np.float32)
        orien = rng.standard_normal(
            (b, size // 4, size // 4, n_anchors * 2)).astype(np.float32)
        predict.append((jnp.asarray(bbox), jnp.asarray(orien)))

    ref = jax.jit(pp._run_batch)(predict)

    mesh = spatial_mesh(n_space=4, n_data=2)
    sp = jax.jit(lambda p: run_batch_spatial(pp, mesh, p))(predict)

    np.testing.assert_array_equal(np.asarray(sp["bbox"]), np.asarray(ref["bbox"]))
    np.testing.assert_array_equal(np.asarray(sp["cls"]), np.asarray(ref["cls"]))
    np.testing.assert_array_equal(np.asarray(sp["valid"]), np.asarray(ref["valid"]))
    np.testing.assert_array_equal(np.asarray(sp["mask"]), np.asarray(ref["mask"]))
    assert sp["mask"].dtype == ref["mask"].dtype
