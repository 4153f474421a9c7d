"""End-to-end golden test on the reference's benchmark asset image.

SURVEY.md §4 calls for golden tests against the shipped fixture
(assets/000000163126.jpg): this chains model forward + postprocess — torch
oracle + sequential numpy postprocess vs our converted-weight JAX model + fused
static-shape postprocess — and requires matching detections and near-identical
masks on the real image.
"""

import os

import cv2
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
from orienmask_tpu.models import OrienMaskYOLOFPNPlus
from orienmask_tpu.models.convert import torch_to_variables
from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess

from numpy_ref import reference_postprocess
from torch_ref import TorchOrienMaskFPNPlus

ASSET = "/root/reference/assets/000000163126.jpg"
SIZE = 160  # small enough for single-core CPU, /32-divisible


@pytest.mark.skipif(not os.path.exists(ASSET), reason="asset image unavailable")
def test_golden_asset_end_to_end():
    img = cv2.cvtColor(cv2.imread(ASSET), cv2.COLOR_BGR2RGB)
    x = cv2.resize(img, (SIZE, SIZE), interpolation=cv2.INTER_LINEAR)
    x = x.astype(np.float32) / 255.0

    torch.manual_seed(3)
    tmodel = TorchOrienMaskFPNPlus(num_anchors=3, num_classes=80).eval()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    jmodel = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    variables = torch_to_variables(jmodel, tmodel.state_dict())

    grids = [[SIZE // 32] * 2, [SIZE // 16] * 2, [SIZE // 8] * 2]
    pp = OrienMaskYOLOPostProcess(
        grid_size=grids, image_size=[SIZE, SIZE], anchors=ANCHORS_YOLOV4,
        anchor_mask=ANCHORS_MASK, num_classes=80, conf_thresh=0.05,
        nms=dict(threshold=0.5), nms_pre=100, nms_post=30, orien_thresh=0.3,
    )

    # ours: jax forward + fused postprocess
    out, _ = jmodel.forward(variables, jnp.asarray(x)[None])
    got = pp(out)[0]

    # oracle: torch forward + sequential numpy postprocess
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(2, 0, 1))[None])
    preds_np = [
        (p[0][0].numpy().transpose(1, 2, 0), p[1][0].numpy().transpose(1, 2, 0))
        for p in tout
    ]
    ref = reference_postprocess(
        preds_np, grids, (SIZE, SIZE), ANCHORS_YOLOV4, ANCHORS_MASK, 80,
        conf_thresh=0.05, nms_thresh=0.5, nms_pre=100, nms_post=30,
        orien_thresh=0.3,
    )

    assert got["bbox"].shape[0] == ref["bbox"].shape[0]
    assert got["bbox"].shape[0] > 0, "no detections on the asset image"
    np.testing.assert_allclose(got["bbox"], ref["bbox"], rtol=5e-3, atol=1e-4)
    np.testing.assert_array_equal(got["cls"], ref["cls"])
    # near-bit-comparable masks: tiny fp divergence at threshold boundaries only
    diff = (got["mask"] ^ ref["mask"]).mean()
    assert diff < 1e-3, f"mask mismatch fraction {diff}"
