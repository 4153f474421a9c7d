"""End-to-end trainer smoke test on the 8-device virtual CPU mesh.

Builds a full tiny config (96x96 images, 8 synthetic COCO samples, batch 1 per
device x 8 devices), runs one epoch of training + validation (COCO eval through
the lite evaluator), checkpoints, and resumes.
"""

import json
import os

import cv2
import numpy as np
import pytest

import jax

from orienmask_tpu.config.base import ANCHORS_MASK, construct_config
from orienmask_tpu.eval import rle


def _make_dataset(root, n_images=8, size_range=(80, 200)):
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    annos, names = {}, []
    coco_images, coco_anns = [], []
    ann_id = 1
    for i in range(n_images):
        h, w = int(rng.integers(*size_range)), int(rng.integers(*size_range))
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"img{i:03d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name), img)
        n = int(rng.integers(1, 4))
        bboxes, clses, masks = [], [], []
        for _ in range(n):
            bw, bh = rng.uniform(0.2, 0.5), rng.uniform(0.2, 0.5)
            cx, cy = rng.uniform(bw / 2, 1 - bw / 2), rng.uniform(bh / 2, 1 - bh / 2)
            bboxes.append([cx, cy, bw, bh])
            label = int(rng.integers(0, 80))
            clses.append(label)
            m = np.zeros((h, w), np.uint8)
            x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
            x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
            m[y1:y2, x1:x2] = 1
            masks.append(rle.encode(m))
            from orienmask_tpu.data.dataset import COCODataset

            coco_anns.append({
                "id": ann_id, "image_id": i,
                "category_id": COCODataset.CAT2LABEL[label],
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": (x2 - x1) * (y2 - y1), "iscrowd": 0,
                "segmentation": [[x1, y1, x2, y1, x2, y2, x1, y2]],
            })
            ann_id += 1
        annos[name] = {"anno": {"bbox": bboxes, "cls": clses, "mask": masks},
                       "image_id": i}
        names.append(name)
        coco_images.append({"id": i, "height": h, "width": w, "file_name": name})

    anno_file = os.path.join(root, "annos.json")
    json.dump(annos, open(anno_file, "w"))
    list_file = os.path.join(root, "list.txt")
    open(list_file, "w").write("\n".join(names))
    from orienmask_tpu.data.dataset import COCODataset

    gt_file = os.path.join(root, "instances.json")
    json.dump({
        "images": coco_images,
        "annotations": coco_anns,
        "categories": [{"id": c, "name": str(c)} for c in COCODataset.CAT2LABEL],
    }, open(gt_file, "w"))
    return list_file, img_dir, anno_file, gt_file


def _tiny_config(root, log_dir):
    list_file, img_dir, anno_file, gt_file = _make_dataset(root)
    size = 96
    grids = [[size // 32] * 2, [size // 16] * 2, [size // 8] * 2]
    anchors = [[4, 6], [8, 10], [12, 8], [10, 20], [20, 16], [18, 36],
               [36, 28], [48, 60], [60, 50]]

    dataset = dict(type="COCODataset", list_file=list_file, image_dir=img_dir,
                   anno_file=anno_file, with_mask=True, with_info=True)
    transform = dict(type="COCOTransform", pipeline=[
        dict(type="Resize", size=(size, size), pad_needed=False, warp_p=0.,
             jitter=0., random_place=False, pad_p=0., pad_ratio=0., pad_value=0),
        dict(type="ToArray"),
        dict(type="Normalize", mean=(0, 0, 0), std=(255, 255, 255)),
    ])
    loader = dict(type="DataLoader", dataset=dataset, transform=transform,
                  batch_size=1, num_workers=0, shuffle=True,
                  max_instances=8, pack_masks=True, collate=dict(type="collate"))

    return dict(
        name="TinySmoke",
        n_device=8,
        epochs=1,
        accumulate=1,
        monitor="segm_AP",
        monitor_mode="max",
        log_dir=log_dir,
        val_freq=1,
        save_freq=1,
        log_freq=1,
        seed=0,
        trainer="Trainer",
        compute_dtype="float32",
        model=dict(type="OrienMaskYOLOFPNPlus", num_anchors=3, num_classes=80,
                   pretrained=None, freeze_backbone=False,
                   backbone_batchnorm_eval=False),
        train_loader=loader,
        val_loader=construct_config(loader, update=dict(shuffle=False)),
        val_gt_file=gt_file,
        loss=dict(type="OrienMaskYOLOMultiScaleLoss", grid_size=grids,
                  image_size=[size, size], anchors=anchors,
                  anchor_mask=ANCHORS_MASK, num_classes=80,
                  center_region=0.6, valid_region=0.6, label_smooth=False,
                  obj_ignore_threshold=0.7, weight=[1, 1, 1, 1, 1, 20, 20],
                  scales_weight=[1, 1, 1], target_chunk=4),
        postprocess=dict(type="OrienMaskYOLOPostProcess", grid_size=grids,
                         image_size=[size, size], anchors=anchors,
                         anchor_mask=ANCHORS_MASK, num_classes=80,
                         conf_thresh=0.005,
                         nms=dict(type="batched_nms", threshold=0.5),
                         nms_pre=50, nms_post=10, orien_thresh=0.3),
        optimizer=dict(type="SGD", lr=1e-3, momentum=0.9, weight_decay=5e-4),
        lr_scheduler=dict(type="StepWarmUpLR", warmup_type="linear",
                          warmup_iter=10, warmup_ratio=0.1,
                          milestones=[100, 200], gamma=0.1),
    )


def test_train_one_epoch_and_resume(tmp_path, monkeypatch):
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    # Single-core CPU: slim the backbone to keep the XLA compile tractable.
    # The train-step machinery (sharding, loss, target builder, optimizer,
    # checkpointing) is identical; full-size numerics are covered elsewhere.
    from orienmask_tpu.models.darknet import DarkNet53

    monkeypatch.setattr(DarkNet53, "STAGE_BLOCKS", (1, 1, 1, 1, 1))
    from orienmask_tpu.trainer import build_trainer

    config = _tiny_config(str(tmp_path / "data"), str(tmp_path / "logs"))
    trainer = build_trainer(config)
    trainer.train()

    # loss values logged and finite
    ckpt_dir = trainer.checkpoint_dir
    assert os.path.exists(os.path.join(ckpt_dir, "config.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "epoch1.ckpt"))

    # params actually changed
    import numpy as np

    p0 = np.asarray(jax.device_get(
        trainer.state["params"]["backbone"]["conv1"]["kernel"]))
    model2 = trainer.model
    fresh = model2.init_variables(jax.random.PRNGKey(config["seed"]))
    p_init = np.asarray(fresh["params"]["backbone"]["conv1"]["kernel"])
    assert not np.allclose(p0, p_init)

    # resume restores epoch counter and state without error
    trainer2 = build_trainer(config, resume=os.path.join(ckpt_dir, "epoch1.ckpt"))
    assert trainer2.start_epoch == 2
    p_resumed = np.asarray(jax.device_get(
        trainer2.state["params"]["backbone"]["conv1"]["kernel"]))
    np.testing.assert_allclose(p_resumed, p0)


def test_train_one_epoch_spatial(tmp_path, monkeypatch):
    """Config-driven spatial training (n_space=2): the full Trainer runs a
    train epoch with image rows sharded over the space axis of a (4, 2)
    mesh, then a normal data-sharded val epoch with COCO scoring."""
    assert jax.device_count() == 8
    from orienmask_tpu.models.darknet import DarkNet53

    monkeypatch.setattr(DarkNet53, "STAGE_BLOCKS", (1, 1, 1, 1, 1))
    from orienmask_tpu.trainer import build_trainer

    config = _tiny_config(str(tmp_path / "data"), str(tmp_path / "logs"))
    config["n_space"] = 2
    trainer = build_trainer(config)
    assert trainer.mesh.devices.shape == (4, 2)
    assert trainer.spatial
    # loader feeds one whole image per DATA row, not per device
    assert trainer.train_loader.batch_size == 4
    trainer.train()

    ckpt_dir = trainer.checkpoint_dir
    assert os.path.exists(os.path.join(ckpt_dir, "epoch1.ckpt"))
    p0 = np.asarray(jax.device_get(
        trainer.state["params"]["backbone"]["conv1"]["kernel"]))
    fresh = trainer.model.init_variables(jax.random.PRNGKey(config["seed"]))
    p_init = np.asarray(fresh["params"]["backbone"]["conv1"]["kernel"])
    assert not np.allclose(p0, p_init)
    assert np.isfinite(p0).all()
