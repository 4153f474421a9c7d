"""Data pipeline: synthetic mini-COCO dataset -> transforms -> collate -> loader."""

import json
import os

import cv2
import numpy as np
import pytest

from orienmask_tpu.data import COCODataset, COCOTransform, DataLoader, collate
from orienmask_tpu.eval import rle


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    """8 synthetic images with 0-4 rectangle instances each."""
    root = tmp_path_factory.mktemp("minicoco")
    img_dir = root / "images"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    annos = {}
    names = []
    for i in range(8):
        h, w = int(rng.integers(80, 200)), int(rng.integers(80, 200))
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"img{i:03d}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        n = int(rng.integers(0, 5))
        bboxes, clses, masks = [], [], []
        for _ in range(n):
            bw, bh = rng.uniform(0.2, 0.5), rng.uniform(0.2, 0.5)
            cx, cy = rng.uniform(bw / 2, 1 - bw / 2), rng.uniform(bh / 2, 1 - bh / 2)
            bboxes.append([cx, cy, bw, bh])
            clses.append(int(rng.integers(0, 80)))
            m = np.zeros((h, w), np.uint8)
            x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
            x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
            m[y1:y2, x1:x2] = 1
            masks.append(rle.encode(m))
        annos[name] = {"anno": {"bbox": bboxes, "cls": clses, "mask": masks},
                       "image_id": i}
        names.append(name)
    anno_file = root / "annos.json"
    with open(anno_file, "w") as fh:
        json.dump(annos, fh)
    list_file = root / "list.txt"
    list_file.write_text("\n".join(names))
    return str(list_file), str(img_dir), str(anno_file)


def _train_transform():
    return COCOTransform([
        COCOTransform.ColorJitter(brightness=0.2, contrast=0.5, saturation=0.5, hue=0.1),
        COCOTransform.RandomCrop(p=0.5),
        COCOTransform.Resize((96, 96), pad_needed=True, warp_p=0.25, jitter=0.3,
                             random_place=True, pad_p=0.75, pad_ratio=0.75,
                             pad_value=(123.675, 116.28, 103.53)),
        COCOTransform.RandomHorizontalFlip(p=0.5),
        COCOTransform.ToArray(),
        COCOTransform.Normalize((0, 0, 0), (255, 255, 255)),
    ])


def test_dataset_and_collate(mini_coco):
    list_file, img_dir, anno_file = mini_coco
    ds = COCODataset(list_file, img_dir, anno_file, transform=_train_transform(),
                     with_mask=True, with_info=True)
    assert len(ds) == 8
    s = ds[0]
    assert s["image"].shape == (96, 96, 3)
    assert s["image"].dtype == np.float32
    assert s["bbox"].shape[1] == 4 if s["bbox"].size else True
    if s["bbox"].shape[0]:
        assert s["mask"].shape == (s["bbox"].shape[0], 96, 96)
        assert 0 <= s["bbox"].min() and s["bbox"].max() <= 1.0 + 1e-6

    batch = collate([ds[i] for i in range(4)], max_instances=10)
    assert batch["image"].shape == (4, 96, 96, 3)
    assert batch["bbox"].shape == (4, 10, 4)
    assert batch["mask"].shape == (4, 10, 96, 96)
    assert batch["valid"].sum() >= 0
    assert len(batch["info"]) == 4


def test_collate_packed_masks(mini_coco):
    list_file, img_dir, anno_file = mini_coco
    ds = COCODataset(list_file, img_dir, anno_file, transform=_train_transform())
    batch = collate([ds[0], ds[1]], max_instances=8, pack_masks=True)
    assert batch["mask"].shape == (2, 8, 96, 12)  # 96/8 = 12 bytes
    unpacked = np.unpackbits(batch["mask"], axis=-1)[..., :96].astype(bool)
    plain = collate([ds2 for ds2 in [ds[0], ds[1]]], max_instances=8)["mask"]
    # NOTE: random transforms re-run -> compare only shapes/dtype here
    assert unpacked.shape == plain.shape


def test_dataloader_inline_and_workers(mini_coco):
    list_file, img_dir, anno_file = mini_coco
    ds = COCODataset(list_file, img_dir, anno_file, transform=_train_transform())
    from functools import partial
    cfn = partial(collate, max_instances=10)

    dl0 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=0, collate_fn=cfn, seed=1)
    batches0 = list(dl0)
    assert len(batches0) == 2
    assert batches0[0]["image"].shape == (4, 96, 96, 3)

    dl2 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, collate_fn=cfn, seed=1)
    batches2 = list(dl2)
    dl2.shutdown()
    assert len(batches2) == 2
    # same seed + epoch -> same sample order and identical augmented batches
    np.testing.assert_allclose(batches0[0]["image"], batches2[0]["image"], atol=1e-6)
    np.testing.assert_allclose(batches0[0]["bbox"], batches2[0]["bbox"], atol=1e-6)


def test_dataloader_bounded_inflight_slow_consumer(mini_coco):
    """A slow consumer must NOT let workers run ahead unboundedly: at most
    ``max_inflight`` samples may be dispatched-but-unconsumed at any time
    (the round-1 loader dispatched the whole epoch up front — unbounded
    result-queue growth on full COCO)."""
    import time

    list_file, img_dir, anno_file = mini_coco
    ds = COCODataset(list_file, img_dir, anno_file, transform=_train_transform())
    from functools import partial
    cfn = partial(collate, max_instances=10)

    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                    collate_fn=cfn, seed=1, prefetch_factor=1)
    assert dl.max_inflight == 2 + 2 * 1
    n = 0
    for _ in dl:
        time.sleep(0.05)  # consumer slower than the 2 workers
        n += 1
    dl.shutdown()
    assert n == len(dl)
    assert 0 < dl.inflight_peak <= dl.max_inflight


def test_aspect_grouped_loader_workers_match_inline(mini_coco):
    """AspectRatioGroupedDataloader rides the same multiprocess prefetch
    stream as DataLoader; grouped batches must be identical inline vs with
    workers (same deterministic (seed, epoch, idx) RNG, same index order into
    the portrait/landscape buckets)."""
    from orienmask_tpu.data.dataloader import AspectRatioGroupedDataloader

    list_file, img_dir, anno_file = mini_coco
    ds = COCODataset(list_file, img_dir, anno_file)  # raw sizes: mixed aspects

    def run(num_workers):
        dl = AspectRatioGroupedDataloader(
            ds, batch_size=2, shuffle=True, num_workers=num_workers,
            collate_fn=lambda b: b, seed=3)
        batches = list(dl)
        dl.shutdown()
        return batches

    inline, workers = run(0), run(2)
    assert len(inline) == len(workers)
    assert sum(len(b) for b in inline) == 8
    saw_group_batch = False
    for b0, b2 in zip(inline, workers):
        assert len(b0) == len(b2)
        for s0, s2 in zip(b0, b2):
            np.testing.assert_array_equal(s0["image"], s2["image"])
        orients = {s["image"].shape[0] > s["image"].shape[1] for s in b0}
        if len(b0) == 2 and len(orients) == 1:
            saw_group_batch = True
    assert saw_group_batch  # grouping actually produced homogeneous batches


def test_dataloader_dead_worker_raises(mini_coco, monkeypatch):
    """A worker killed by the OS (OOM, segfault) can never report its job;
    the parent must raise — not block forever on the result queue (the poll
    timeout re-checks liveness each expiry)."""
    list_file, img_dir, anno_file = mini_coco
    ds = COCODataset(list_file, img_dir, anno_file, transform=_train_transform())
    from functools import partial
    cfn = partial(collate, max_instances=10)

    monkeypatch.setattr(DataLoader, "_RESULT_POLL_S", 0.2)
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                    collate_fn=cfn, seed=1)
    # Start the (only) worker while it is still idle, then SIGKILL it — every
    # dispatched job is now unservable, exactly the OOM-kill scenario.
    dl._ensure_workers()
    dl._workers[0].kill()
    dl._workers[0].join()
    with pytest.raises(RuntimeError, match="worker.*died"):
        list(dl)
    dl.shutdown()


def test_dataloader_abandoned_iterator(mini_coco):
    """Breaking out of an epoch mid-way must not corrupt the next one: results
    already dispatched by the abandoned iterator carry a stale generation tag
    and are discarded, so re-iteration serves exactly the inline loader's
    batches (regression: job ids restarted at 0 and stale queued samples were
    served as the new epoch's first indices)."""
    list_file, img_dir, anno_file = mini_coco
    ds = COCODataset(list_file, img_dir, anno_file, transform=_train_transform())
    from functools import partial
    cfn = partial(collate, max_instances=10)

    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                    collate_fn=cfn, seed=1)
    it = iter(dl)
    next(it)  # consume one batch, then abandon mid-epoch
    del it
    dl.set_epoch(1)
    got = list(dl)
    dl.shutdown()

    ref = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0,
                     collate_fn=cfn, seed=1)
    ref.set_epoch(1)
    want = list(ref)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["image"], w["image"], atol=1e-6)
        np.testing.assert_allclose(g["bbox"], w["bbox"], atol=1e-6)


def test_dataloader_sharding(mini_coco):
    list_file, img_dir, anno_file = mini_coco
    ds = COCODataset(list_file, img_dir, anno_file, transform=_train_transform())
    from functools import partial
    cfn = partial(collate, max_instances=10)
    dl_a = DataLoader(ds, batch_size=2, shuffle=False, rank=0, world_size=2, collate_fn=cfn)
    dl_b = DataLoader(ds, batch_size=2, shuffle=False, rank=1, world_size=2, collate_fn=cfn)
    assert len(dl_a) == len(dl_b) == 2
    ids_a = {i["id"] for b in dl_a for i in b["info"]} if False else None
    # epoch reshuffle changes order
    dl = DataLoader(ds, batch_size=8, shuffle=True, collate_fn=cfn, seed=3)
    dl.set_epoch(0)
    b0 = next(iter(dl))
    dl.set_epoch(1)
    b1 = next(iter(dl))
    assert [i["id"] for i in b0["info"]] != [i["id"] for i in b1["info"]]


def test_voc_dataset(mini_coco):
    """VOCDataset (reference data/dataset.py:103-115): 20-class table, same
    sample format as COCODataset."""
    from orienmask_tpu.data import VOCDataset

    list_file, img_dir, anno_file = mini_coco
    ds = VOCDataset(list_file, img_dir, anno_file, transform=_train_transform(),
                    with_mask=True, with_info=True)
    assert len(ds.CLASSES) == 20
    assert ds.CAT2LABEL == list(range(1, 21))
    assert len(ds) == 8
    s = ds[3]
    assert s["image"].shape == (96, 96, 3)
    assert s["image"].dtype == np.float32


def test_uint8_image_transport(mini_coco):
    """collate(image_transport='uint8') + on-device /255 reproduces the f32
    pipeline within quantization (0.5/255)."""
    import jax.numpy as jnp
    from orienmask_tpu.trainer.train_state import _image_f32

    list_file, img_dir, anno_file = mini_coco
    ds = COCODataset(list_file, img_dir, anno_file, transform=_train_transform())
    samples = [ds[i] for i in range(4)]
    b32 = collate(samples, max_instances=8)
    bu8 = collate(samples, max_instances=8, image_transport="uint8")
    assert bu8["image"].dtype == np.uint8
    assert b32["image"].nbytes == 4 * bu8["image"].nbytes
    back = np.asarray(_image_f32(jnp.asarray(bu8["image"])))
    np.testing.assert_allclose(back, b32["image"], atol=0.5 / 255 + 1e-6)
    # non-image fields identical
    for k in ("bbox", "cls", "valid"):
        np.testing.assert_array_equal(b32[k], bu8[k])


def test_uint8_transport_requires_255_normalize(mini_coco):
    """build_dataloader validates that uint8 transport pairs with
    Normalize(mean 0, std 255) and the plain `collate` type."""
    import pytest as _pytest
    from orienmask_tpu.trainer.builder import build_dataloader

    list_file, img_dir, anno_file = mini_coco
    base = dict(
        dataset=dict(type="COCODataset", list_file=list_file,
                     image_dir=img_dir, anno_file=anno_file),
        transform=dict(type="COCOTransform", pipeline=[
            dict(type="ToArray"),
            dict(type="Normalize", mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375)),
        ]),
        batch_size=2, num_workers=0, image_transport="uint8",
    )
    with _pytest.raises(ValueError, match="Normalize"):
        build_dataloader(base)
    bad_collate = dict(base, collate={"type": "collate_plus"})
    bad_collate["transform"]["pipeline"][1] = dict(
        type="Normalize", mean=(0, 0, 0), std=(255, 255, 255))
    with _pytest.raises(ValueError, match="collate"):
        build_dataloader(bad_collate)


def test_collate_truncation_guard(caplog):
    """A sample over max_instances logs EVERY drop (logging, not
    warnings.warn — the default warnings filter dedups per call site) and
    keeps the largest-area instances deterministically (original order
    preserved); strict mode raises (VERDICT r2 task 5; reference keeps all
    instances via cumsum collate, reference data/collate.py:13-30)."""
    import logging as _logging

    import importlib

    # the package __init__ re-exports the collate FUNCTION under the same
    # name; fetch the module explicitly
    collate_mod = importlib.import_module("orienmask_tpu.data.collate")

    rng = np.random.default_rng(0)
    h = w = 32
    n_inst, cap = 101, 100
    wh = rng.uniform(0.05, 0.5, size=(n_inst, 2)).astype(np.float32)
    cxy = rng.uniform(0.3, 0.7, size=(n_inst, 2)).astype(np.float32)
    sample = {
        "image": np.zeros((h, w, 3), np.float32),
        "bbox": np.concatenate([cxy, wh], axis=1),
        "cls": np.arange(n_inst, dtype=np.int64) % 7,
        "mask": rng.integers(0, 2, size=(n_inst, h, w)).astype(bool),
    }

    base_samples = collate_mod.TRUNCATION_STATS["samples"]
    with caplog.at_level(_logging.WARNING, logger="orienmask_tpu.data.collate"):
        out = collate([dict(sample)], max_instances=cap)
        # EVERY drop logs, not just the first (ADVICE r3: warnings.warn
        # dedups per call site)
        collate([dict(sample)], max_instances=cap)
    assert sum("truncated" in r.getMessage() for r in caplog.records) == 2
    assert collate_mod.TRUNCATION_STATS["samples"] == base_samples + 2
    caplog.clear()

    area = sample["bbox"][:, 2] * sample["bbox"][:, 3]
    keep = np.sort(np.argsort(-area, kind="stable")[:cap])
    assert out["bbox"].shape == (1, cap, 4)
    np.testing.assert_array_equal(out["bbox"][0], sample["bbox"][keep])
    np.testing.assert_array_equal(out["cls"][0], sample["cls"][keep].astype(np.int32))
    np.testing.assert_array_equal(out["mask"][0], sample["mask"][keep])
    assert out["valid"].all()
    # the dropped instance is exactly the smallest-area one
    dropped = set(range(n_inst)) - set(keep.tolist())
    assert dropped == {int(np.argmin(area))}

    # deterministic: same result twice
    out2 = collate([dict(sample)], max_instances=cap)
    np.testing.assert_array_equal(out2["bbox"], out["bbox"])

    # strict mode raises
    with pytest.raises(ValueError, match="max_instances"):
        collate([dict(sample)], max_instances=cap, strict_instances=True)

    # at exactly the cap: no warning, no truncation
    caplog.clear()  # drop the log from the determinism re-collate above
    sample100 = {k: (v[:cap] if k != "image" else v) for k, v in sample.items()}
    with caplog.at_level(_logging.WARNING, logger="orienmask_tpu.data.collate"):
        out3 = collate([sample100], max_instances=cap)
    assert not any("truncated" in r.getMessage() for r in caplog.records)
    np.testing.assert_array_equal(out3["bbox"][0], sample["bbox"][:cap])
