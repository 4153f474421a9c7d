"""test.py path: build_tester from a saved checkpoint (ours and torch-format),
run the COCO test loop end-to-end on the CPU mesh."""

import os

import numpy as np
import pytest
import torch

import jax

from orienmask_tpu.trainer.checkpoint import load_checkpoint, save_checkpoint
from test_trainer import _tiny_config

from torch_ref import TorchOrienMaskFPNPlus


@pytest.fixture()
def slim_backbone(monkeypatch):
    from orienmask_tpu.models.darknet import DarkNet53

    monkeypatch.setattr(DarkNet53, "STAGE_BLOCKS", (1, 1, 1, 1, 1))


def _tiny_test_config(config):
    return dict(
        n_device=1,
        tester="Tester",
        compute_dtype="float32",
        model=config["model"],
        test_loader=dict(config["val_loader"], batch_size=2),
        postprocess=config["postprocess"],
        gt_file=config["val_gt_file"],
    )


def test_tester_runs_coco_eval(tmp_path, slim_backbone, capsys):
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.trainer import build_tester

    config = _tiny_config(str(tmp_path / "data"), str(tmp_path / "logs"))
    model = OrienMaskYOLOFPNPlus(
        **{k: v for k, v in config["model"].items() if k != "type"})
    variables = model.init_variables(jax.random.PRNGKey(0))
    ckpt_path = str(tmp_path / "weights.ckpt")
    save_checkpoint(ckpt_path, {
        "epoch": 1,
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "monitor_best": 0.0,
        "config": config,
    })

    tester = build_tester(_tiny_test_config(config), ckpt_path)
    tester.test()
    out = capsys.readouterr().out
    assert "COCO eval bbox" in out
    assert "COCO eval segm" in out
    assert "Speed Statistics" in out
    # 12-stat vector produced
    assert len(tester.coco_metrics.bbox_eval_stats) == 12


def test_torch_pth_checkpoint_roundtrip(tmp_path):
    """Reference-format .pth (state_dict + config) loads through our converter."""
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus

    torch.manual_seed(0)
    tmodel = TorchOrienMaskFPNPlus(num_anchors=3, num_classes=80)
    pth = str(tmp_path / "reference_style.pth")
    torch.save({"state_dict": tmodel.state_dict(), "epoch": 7}, pth)

    jmodel = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    state = load_checkpoint(pth, jmodel)
    assert "params" in state and "batch_stats" in state
    k = np.asarray(state["params"]["backbone"]["conv1"]["kernel"])
    ref = tmodel.backbone.conv1.conv_block[0].weight.detach().numpy()
    np.testing.assert_allclose(k, ref.transpose(2, 3, 1, 0))


def test_tester_data_parallel_matches_single_device(tmp_path, slim_backbone, capsys):
    """n_device>1 shards each eval batch over the mesh (beyond the reference's
    single-GPU test.py); COCO stats must equal the single-device run."""
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.trainer import build_tester

    config = _tiny_config(str(tmp_path / "data"), str(tmp_path / "logs"))
    model = OrienMaskYOLOFPNPlus(
        **{k: v for k, v in config["model"].items() if k != "type"})
    variables = model.init_variables(jax.random.PRNGKey(0))
    ckpt_path = str(tmp_path / "weights.ckpt")
    save_checkpoint(ckpt_path, {
        "epoch": 1,
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "monitor_best": 0.0,
        "config": config,
    })

    base = _tiny_test_config(config)
    single = build_tester(dict(base, n_device=1), ckpt_path)
    single.test()
    ref_bbox = np.array(single.coco_metrics.bbox_eval_stats)

    sharded_cfg = dict(base, n_device=4)
    sharded_cfg["test_loader"] = dict(base["test_loader"], batch_size=4)
    sharded = build_tester(sharded_cfg, ckpt_path)
    assert sharded._batch_sharding is not None
    sharded.test()
    got_bbox = np.array(sharded.coco_metrics.bbox_eval_stats)

    np.testing.assert_allclose(got_bbox, ref_bbox, atol=1e-6)
