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
