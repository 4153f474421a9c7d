"""AOT serving artifacts: export -> deserialize -> bit-exact vs the live pipeline."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def tiny_pipeline():
    from orienmask_tpu.models.darknet import DarkNet53

    orig = DarkNet53.STAGE_BLOCKS
    DarkNet53.STAGE_BLOCKS = (1, 1, 1, 1, 1)
    try:
        from orienmask_tpu.models import OrienMaskYOLOFPNPlus
        from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess
        from orienmask_tpu.data.transform import FastCOCOTransform
        from orienmask_tpu.pipeline import InferencePipeline
        from orienmask_tpu.config.base import ANCHORS_YOLOV4, ANCHORS_MASK

        size = 96
        model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
        variables = model.init_variables(jax.random.PRNGKey(0))
        transform = FastCOCOTransform([
            dict(type="Resize", size=(size, size)),
            dict(type="Normalize", mean=(0, 0, 0), std=(255, 255, 255)),
        ])
        pp = OrienMaskYOLOPostProcess(
            grid_size=[[size // 32] * 2, [size // 16] * 2, [size // 8] * 2],
            image_size=[size, size], anchors=ANCHORS_YOLOV4,
            anchor_mask=ANCHORS_MASK, num_classes=80, conf_thresh=0.005,
            nms=dict(threshold=0.5), nms_pre=50, nms_post=10, orien_thresh=0.3,
        )
        yield InferencePipeline(model, variables, transform, pp, "float32")
    finally:
        DarkNet53.STAGE_BLOCKS = orig


def test_export_load_bit_exact(tiny_pipeline, tmp_path):
    from orienmask_tpu.serving import export_pipeline, load_serving

    shapes = [(1, 120, 160, 3), (2, 96, 96, 3)]
    manifest = export_pipeline(tiny_pipeline, shapes, tmp_path)
    assert manifest["n_weights"] > 0 and len(manifest["programs"]) == 2

    served = load_serving(tmp_path)
    assert served.input_shapes == sorted(shapes)
    assert served.pad_info == tiny_pipeline.pad_info

    rng = np.random.default_rng(7)
    for shape in shapes:
        img = rng.integers(0, 255, shape, np.uint8)
        want = jax.device_get(tiny_pipeline.run_device(img))
        got = jax.device_get(served.run_device(img))
        assert sorted(want) == sorted(got)
        for k in want:
            np.testing.assert_array_equal(np.asarray(want[k]),
                                          np.asarray(got[k]), err_msg=k)

    # __call__ mirrors the pipeline's (trimmed host dicts, pad_info) contract
    img = rng.integers(0, 255, shapes[0], np.uint8)
    live, live_pad = tiny_pipeline(img)
    srv, srv_pad = served(img)
    assert live_pad == srv_pad and len(live) == len(srv)
    for lw, sv in zip(live, srv):
        for k in lw:
            np.testing.assert_array_equal(lw[k], sv[k], err_msg=k)


def test_unknown_shape_raises(tiny_pipeline, tmp_path):
    from orienmask_tpu.serving import export_pipeline, load_serving

    export_pipeline(tiny_pipeline, [(1, 96, 96, 3)], tmp_path)
    served = load_serving(tmp_path)
    with pytest.raises(KeyError, match="no exported program"):
        served.run_device(np.zeros((1, 64, 64, 3), np.uint8))


def test_weight_swap_without_reexport(tiny_pipeline, tmp_path):
    """A new checkpoint (same architecture) swaps in via update_weights —
    programs untouched, digests refreshed."""
    from orienmask_tpu.serving import (export_pipeline, load_serving,
                                       update_weights)

    shape = (1, 96, 96, 3)
    export_pipeline(tiny_pipeline, [shape], tmp_path)

    flat, treedef = jax.tree_util.tree_flatten(tiny_pipeline.folded)
    rng = np.random.default_rng(3)
    bumped = [np.asarray(w) + rng.normal(0, 0.01, w.shape).astype(w.dtype)
              for w in flat]
    update_weights(tmp_path, jax.tree_util.tree_unflatten(treedef, bumped))

    served = load_serving(tmp_path)
    img = rng.integers(0, 255, shape, np.uint8)
    out = jax.device_get(served.run_device(img))
    assert np.isfinite(out["bbox"]).all()
    # and the program really consumed the NEW weights: scores differ from the
    # original pipeline's on the same image
    want = jax.device_get(tiny_pipeline.run_device(img))
    assert not np.array_equal(np.asarray(want["bbox"]), out["bbox"])

    # a variant with a different leaf SHAPE is refused by update_weights
    wrong = list(bumped)
    wrong[0] = np.zeros(np.asarray(wrong[0]).shape[:-1] + (7,),
                        np.asarray(wrong[0]).dtype)
    with pytest.raises(ValueError, match="different[ \n]+model variant"):
        update_weights(tmp_path, jax.tree_util.tree_unflatten(treedef, wrong))


def test_artifact_integrity_checks(tiny_pipeline, tmp_path):
    """Manifest hardening (VERDICT r3 task 7): a raw weights.npz overwrite
    (no digest refresh), a truncated blob set, and a wrong input dtype all
    fail loudly instead of loading/casting silently."""
    from orienmask_tpu.serving import export_pipeline, load_serving, WEIGHTS

    shape = (1, 96, 96, 3)
    manifest = export_pipeline(tiny_pipeline, [shape], tmp_path)
    assert manifest["format_version"] >= 2
    assert len(manifest["weight_digests"]) == manifest["n_weights"]
    assert len(manifest["arch_fingerprint"]) == 64

    blob = dict(np.load(tmp_path / WEIGHTS))

    # (1) tampered bytes in one blob -> checksum mismatch
    tampered = dict(blob)
    k0 = "w%05d" % 0
    t = tampered[k0].copy()
    t.flat[0] += 1
    tampered[k0] = t
    np.savez(tmp_path / WEIGHTS, **tampered)
    with pytest.raises(ValueError, match="checksum mismatch"):
        load_serving(tmp_path)

    # (2) wrong blob count -> refused before any deserialization
    np.savez(tmp_path / WEIGHTS, **{k0: blob[k0]})
    with pytest.raises(ValueError, match="does not belong"):
        load_serving(tmp_path)

    # restore and confirm it loads again
    np.savez(tmp_path / WEIGHTS, **blob)
    served = load_serving(tmp_path)

    # (3) non-uint8 input refused (a silent cast truncated [0,1] floats to 0)
    with pytest.raises(TypeError, match="uint8"):
        served.run_device(np.zeros(shape, np.float32))
