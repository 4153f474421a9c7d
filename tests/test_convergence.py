"""Gradient-correctness signal: the full train step overfits a fixed batch.

Runs the real jitted train step (forward + loss with target building + SGD) on
one synthetic batch for a few dozen iterations and requires a large, monotone-ish
loss decrease — the cheapest end-to-end check that gradients flow correctly
through every loss term.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def slim_backbone(monkeypatch):
    from orienmask_tpu.models.darknet import DarkNet53

    monkeypatch.setattr(DarkNet53, "STAGE_BLOCKS", (1, 1, 1, 1, 1))


def test_train_step_overfits_one_batch(slim_backbone):
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss
    from orienmask_tpu.optim import SGD
    from orienmask_tpu.parallel.mesh import data_mesh, shard_batch
    from orienmask_tpu.trainer.train_state import make_train_step

    size = 64
    grids = [[size // 32] * 2, [size // 16] * 2, [size // 8] * 2]
    anchors = [[4, 6], [8, 10], [12, 8], [10, 20], [20, 16], [18, 36],
               [36, 28], [48, 60], [60, 50]]
    masks = [[6, 7, 8], [3, 4, 5], [0, 1, 2]]

    model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=8)
    variables = model.init_variables(jax.random.PRNGKey(0))
    loss = OrienMaskYOLOMultiScaleLoss(
        grid_size=grids, image_size=[size, size], anchors=anchors,
        anchor_mask=masks, num_classes=8, center_region=0.6, valid_region=0.6,
        label_smooth=False, obj_ignore_threshold=0.7,
        weight=[1, 1, 1, 1, 1, 20, 20], scales_weight=[1, 1, 1], target_chunk=4,
    )
    optimizer = SGD(lr=3e-4, momentum=0.9, weight_decay=0.0)
    mesh = data_mesh(n_devices=1)
    train_step, init_state = make_train_step(model, loss, optimizer, mesh)
    state = init_state(variables)

    rng = np.random.default_rng(0)
    n_inst = 2
    gt_mask = np.zeros((1, 8, size, size), bool)
    gt_mask[0, 0, 8:40, 8:40] = True
    gt_mask[0, 1, 30:60, 30:60] = True
    batch = {
        "image": rng.standard_normal((1, size, size, 3)).astype(np.float32) * 0.1,
        "bbox": np.array([[[0.375, 0.375, 0.5, 0.5],
                           [0.7, 0.7, 0.45, 0.45]] + [[0, 0, 0, 0]] * 6],
                         np.float32),
        "cls": np.zeros((1, 8), np.int32),
        "mask": gt_mask,
        "valid": np.array([[True] * n_inst + [False] * 6]),
    }
    sharded = shard_batch(batch, mesh)

    losses = []
    for step in range(60):
        state, logs = train_step(state, sharded, 3e-4, True)
        losses.append(float(logs["loss"]))

    assert np.isfinite(losses).all()
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert last < first * 0.5, f"loss did not halve: {first:.2f} -> {last:.2f}"


def test_train_step_bfloat16(slim_backbone):
    """compute_dtype='bfloat16' trains: finite loss, params update."""
    import jax.numpy as jnp

    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss
    from orienmask_tpu.optim import SGD
    from orienmask_tpu.parallel.mesh import data_mesh, shard_batch
    from orienmask_tpu.trainer.train_state import make_train_step

    size = 64
    grids = [[size // 32] * 2, [size // 16] * 2, [size // 8] * 2]
    anchors = [[4, 6], [8, 10], [12, 8], [10, 20], [20, 16], [18, 36],
               [36, 28], [48, 60], [60, 50]]
    model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=8)
    variables = model.init_variables(jax.random.PRNGKey(0))
    loss = OrienMaskYOLOMultiScaleLoss(
        grid_size=grids, image_size=[size, size], anchors=anchors,
        anchor_mask=[[6, 7, 8], [3, 4, 5], [0, 1, 2]], num_classes=8,
        weight=[1, 1, 1, 1, 1, 20, 20], scales_weight=[1, 1, 1],
        obj_ignore_threshold=0.7, target_chunk=4)
    optimizer = SGD(lr=1e-4, momentum=0.9)
    mesh = data_mesh(n_devices=1)
    step_fn, init_state = make_train_step(
        model, loss, optimizer, mesh, size, compute_dtype=jnp.bfloat16)
    state = init_state(variables)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((1, size, size, 3)).astype(np.float32),
        "bbox": np.array([[[0.5, 0.5, 0.4, 0.4]] + [[0, 0, 0, 0]] * 3], np.float32),
        "cls": np.zeros((1, 4), np.int32),
        "mask": np.ones((1, 4, size, size), bool),
        "valid": np.array([[True, False, False, False]]),
    }
    p0 = np.asarray(state["params"]["backbone"]["conv1"]["kernel"]).copy()
    state, logs = step_fn(state, shard_batch(batch, mesh), 1e-4, True)
    assert np.isfinite(float(logs["loss"]))
    p1 = np.asarray(state["params"]["backbone"]["conv1"]["kernel"])
    assert not np.allclose(p0, p1)
    assert p1.dtype == np.float32  # params stay fp32 (bf16 is compute-only)
