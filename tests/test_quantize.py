"""int8 PTQ of the folded inference path (models/quantize.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_int8_conv_exact_on_representable_inputs():
    """When input and kernel are exactly representable on the int8 grids, the
    quantized conv must reproduce the float conv bit-for-bit (it computes the
    same integer contraction)."""
    from orienmask_tpu.models.layers import ConvBNLeaky

    m = ConvBNLeaky(8, 16, 3, padding=1)
    rng = np.random.default_rng(0)
    in_scale = 0.03
    wscale = rng.uniform(0.005, 0.02, 16).astype(np.float32)
    k_int = rng.integers(-127, 128, (3, 3, 8, 16))
    x_int = rng.integers(-127, 128, (1, 12, 12, 8))
    kernel = (k_int * wscale).astype(np.float32)
    x = jnp.asarray((x_int * in_scale).astype(np.float32))
    bias = rng.normal(0, 0.1, 16).astype(np.float32)

    ctx = {"train": False, "dtype": jnp.float32}
    y_float = m.apply_folded(
        {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}, x, ctx)
    y_int8 = m.apply_folded({
        "qkernel": jnp.asarray(k_int, jnp.int8),
        "in_inv": jnp.float32(1.0 / in_scale),
        "oscale": jnp.asarray(in_scale * wscale),
        "bias": jnp.asarray(bias),
    }, x, ctx)
    # not bit-equal: the float conv rounds per f32 accumulation step while
    # the int8 conv's integer accumulation is exact before one dequant round
    np.testing.assert_allclose(np.asarray(y_float), np.asarray(y_int8),
                               rtol=2e-4, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_quantized():
    from orienmask_tpu.models.darknet import DarkNet53

    orig = DarkNet53.STAGE_BLOCKS
    DarkNet53.STAGE_BLOCKS = (1, 1, 1, 1, 1)
    try:
        from orienmask_tpu.models import OrienMaskYOLOFPNPlus
        from orienmask_tpu.models.quantize import (calibrate_folded,
                                                   quantize_folded)

        model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=4)
        variables = model.init_variables(jax.random.PRNGKey(0))
        folded = model.fold(variables)
        rng = np.random.default_rng(1)
        calib = rng.integers(0, 255, (2, 96, 96, 3), np.uint8) / 255.0
        scales = calibrate_folded(model, folded, calib)
        qfolded = quantize_folded(model, folded, scales)
        yield model, folded, qfolded, scales
    finally:
        DarkNet53.STAGE_BLOCKS = orig


def test_quantized_tree_structure(tiny_quantized):
    model, folded, qfolded, scales = tiny_quantized
    # the phase stem quantizes (int8 masters -> int8 derived phase kernels)
    assert "qkernel" in qfolded["backbone"]["conv1"]
    assert "qkernel" in qfolded["backbone"]["conv2"][0]
    assert "qkernel" in qfolded["backbone"]["conv3"][0]
    # deep backbone + neck convs are quantized
    assert "qkernel" in qfolded["backbone"]["conv4"][0]
    assert qfolded["backbone"]["conv4"][0]["qkernel"].dtype == jnp.int8
    assert "qkernel" in qfolded["neck32"][0]
    # head logit convs (plain Conv) are untouched
    assert "kernel" in qfolded["bbox_head32"][1]
    assert "kernel" in qfolded["orien_head"][5]
    # ConvBNLeaky inside the heads IS quantized
    assert "qkernel" in qfolded["bbox_head32"][0]
    # per-channel weight scale shape
    assert qfolded["backbone"]["conv4"][0]["oscale"].shape == (256,)
    # exclude_stem=True keeps the stem float
    from orienmask_tpu.models.quantize import quantize_folded

    q2 = quantize_folded(model, folded, scales, exclude_stem=True)
    assert "kernel" in q2["backbone"]["conv1"]
    assert "kernel" in q2["backbone"]["conv2"][0]
    assert "kernel" in q2["backbone"]["conv3"][0]
    assert "qkernel" in q2["backbone"]["conv4"][0]


def test_quantized_outputs_close(tiny_quantized):
    """int8 logits track the float logits within PTQ error on data inside the
    calibrated range."""
    model, folded, qfolded, _ = tiny_quantized
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 255, (1, 96, 96, 3)) / 255.0, jnp.float32)
    ctx = {"train": False, "dtype": jnp.float32}
    out_f = model.apply_folded(folded, x, ctx)
    out_q = model.apply_folded(qfolded, x, ctx)
    for (bf, of), (bq, oq) in zip(out_f, out_q):
        scale = float(jnp.abs(bf).max())
        assert float(jnp.abs(bf - bq).max()) < 0.05 * scale + 0.05
        scale = float(jnp.abs(of).max())
        assert float(jnp.abs(of - oq).max()) < 0.05 * scale + 0.05


def test_pipeline_quantize_int8_smoke(tiny_quantized):
    """pipeline.quantize_int8: programs rebuild, contract unchanged, and the
    quantized leaves survive a serving export round-trip."""
    from orienmask_tpu.models.darknet import DarkNet53

    assert DarkNet53.STAGE_BLOCKS == (1, 1, 1, 1, 1)
    from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
    from orienmask_tpu.data.transform import FastCOCOTransform
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess
    from orienmask_tpu.pipeline import InferencePipeline

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
    pipe = InferencePipeline(model, variables, transform, pp, "float32")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (1, 96, 96, 3), np.uint8)
    dets_f, _ = pipe(img)

    pipe.quantize_int8(rng.integers(0, 255, (2, 120, 160, 3), np.uint8))
    assert not pipe._fns  # program cache dropped
    dets_q, pad = pipe(img)
    assert pad == pipe.pad_info and len(dets_q) == 1
    assert dets_q[0]["bbox"].shape[1] == 5
    assert np.isfinite(dets_q[0]["bbox"]).all()
    assert dets_q[0]["mask"].shape[1:] == dets_f[0]["mask"].shape[1:]


def test_streaming_over_quantized_pipeline(tiny_quantized):
    """int8 + --video composition, actually streamed (ADVICE r4): frames run
    through StreamingPipeline wrapping a quantize_int8'd InferencePipeline
    must equal the same quantized pipeline's direct run_device outputs —
    the submit/retrieve queue adds pipelining, not arithmetic."""
    from orienmask_tpu.models.darknet import DarkNet53

    assert DarkNet53.STAGE_BLOCKS == (1, 1, 1, 1, 1)
    from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
    from orienmask_tpu.data.transform import FastCOCOTransform
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess
    from orienmask_tpu.pipeline import InferencePipeline
    from orienmask_tpu.stream import StreamingPipeline

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
    pipe = InferencePipeline(model, variables, transform, pp, "float32")
    rng = np.random.default_rng(11)
    pipe.quantize_int8(rng.integers(0, 255, (1, 96, 96, 3), np.uint8))

    frames = [rng.integers(0, 255, (1, 128, 160, 3), np.uint8)
              for _ in range(4)]
    streamed = list(StreamingPipeline(pipe, depth=2)(frames))
    assert len(streamed) == len(frames)
    for frame, got in zip(frames, streamed):
        want = pp.to_host_list(pipe.run_device(frame))
        assert len(got) == len(want) == 1
        for k in ("bbox", "cls", "mask"):
            np.testing.assert_array_equal(want[0][k], got[0][k], err_msg=k)


def test_quantized_serving_roundtrip(tmp_path):
    """A quantized pipeline exports/loads through the AOT serving path with
    int8 weights riding the shared npz, bit-identical to the live program."""
    from orienmask_tpu.models.darknet import DarkNet53

    orig = DarkNet53.STAGE_BLOCKS
    DarkNet53.STAGE_BLOCKS = (1, 1, 1, 1, 1)
    try:
        from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
        from orienmask_tpu.data.transform import FastCOCOTransform
        from orienmask_tpu.models import OrienMaskYOLOFPNPlus
        from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess
        from orienmask_tpu.pipeline import InferencePipeline
        from orienmask_tpu.serving import export_pipeline, load_serving

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
        pipe = InferencePipeline(model, variables, transform, pp, "float32")
        rng = np.random.default_rng(5)
        pipe.quantize_int8(rng.integers(0, 255, (1, 96, 96, 3), np.uint8))

        shape = (1, 96, 96, 3)
        export_pipeline(pipe, [shape], tmp_path)
        served = load_serving(tmp_path)
        img = rng.integers(0, 255, shape, np.uint8)
        want = jax.device_get(pipe.run_device(img))
        got = jax.device_get(served.run_device(img))
        for k in want:
            np.testing.assert_array_equal(np.asarray(want[k]),
                                          np.asarray(got[k]), err_msg=k)
    finally:
        DarkNet53.STAGE_BLOCKS = orig


def test_int8_spatial_forward_matches_single_device():
    """int8 + spatial composition (VERDICT r3 task 5): the QUANTIZED folded
    forward under a row-sharded (data, space) mesh must equal the same
    quantized program on one device.  GSPMD partitions the int8 convs exactly
    like the float ones (halo exchange is dtype-agnostic), so equality here is
    the composition statement PERFORMANCE.md's int8 section cites."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.models.darknet import DarkNet53
    from orienmask_tpu.models.layers import default_ctx
    from orienmask_tpu.models.quantize import calibrate_folded, quantize_folded
    from orienmask_tpu.parallel.spatial import image_sharding, spatial_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    old = DarkNet53.STAGE_BLOCKS
    DarkNet53.STAGE_BLOCKS = (1, 1, 1, 1, 1)
    try:
        model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
        variables = model.init_variables(jax.random.PRNGKey(0))
        folded = model.fold(variables)
        rng = np.random.default_rng(1)
        calib = rng.integers(0, 255, (2, 128, 128, 3), np.uint8) / 255.0
        scales = calibrate_folded(model, folded, calib)
        qfolded = quantize_folded(model, folded, scales)

        x = jax.random.normal(jax.random.PRNGKey(3), (2, 128, 128, 3),
                              jnp.float32)
        ctx = default_ctx(train=False, dtype=jnp.float32)

        def fwd(f, im):
            return model.apply_folded(f, im, ctx)

        ref = jax.jit(fwd)(qfolded, x)

        mesh = spatial_mesh(n_space=2, n_data=2)
        rep = NamedSharding(mesh, P())
        sp = jax.jit(fwd, in_shardings=(rep, image_sharding(mesh)),
                     out_shardings=rep)(jax.device_put(qfolded, rep),
                                        jax.device_put(x, image_sharding(mesh)))
        for (rb, ro), (sb, so) in zip(ref, sp):
            np.testing.assert_allclose(np.asarray(rb), np.asarray(sb),
                                       atol=2e-5, rtol=2e-5)
            np.testing.assert_allclose(np.asarray(ro), np.asarray(so),
                                       atol=2e-5, rtol=2e-5)
    finally:
        DarkNet53.STAGE_BLOCKS = old
