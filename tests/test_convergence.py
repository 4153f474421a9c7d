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
        model, loss, optimizer, mesh, compute_dtype=jnp.bfloat16)
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


def test_gradient_accumulation_mechanics(slim_backbone):
    """accumulate=2: microbatch 1 (do_step=False) leaves params untouched and
    accumulates grads; microbatch 2 (do_step=True) applies SGD once with
    lr/accumulate on the SUMMED grads (reference builder.py:121 +
    trainer.py:52-55 semantics), then zeroes the accumulator.

    The expected gradient sum is extracted by replaying the SAME compiled
    step with do_step=False twice: the loss is discontinuous in params
    (ignore-mask IoU thresholds), so grads recomputed through a separately
    compiled graph can legitimately differ — only the same executable is
    bit-comparable."""
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss
    from orienmask_tpu.optim import SGD
    from orienmask_tpu.parallel.mesh import data_mesh, shard_batch
    from orienmask_tpu.trainer.train_state import make_train_step

    size = 64
    grids = [[size // 32] * 2, [size // 16] * 2, [size // 8] * 2]
    anchors = [[4, 6], [8, 10], [12, 8], [10, 20], [20, 16], [18, 36],
               [36, 28], [48, 60], [60, 50]]
    masks3 = [[6, 7, 8], [3, 4, 5], [0, 1, 2]]

    model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=8)
    variables = model.init_variables(jax.random.PRNGKey(1))
    loss = OrienMaskYOLOMultiScaleLoss(
        grid_size=grids, image_size=[size, size], anchors=anchors,
        anchor_mask=masks3, num_classes=8, center_region=0.6, valid_region=0.6,
        label_smooth=False, obj_ignore_threshold=0.7,
        weight=[1, 1, 1, 1, 1, 20, 20], scales_weight=[1, 1, 1], target_chunk=4,
    )
    lr = 3e-4
    optimizer = SGD(lr=lr, momentum=0.9, weight_decay=5e-4)
    mesh = data_mesh(n_devices=1)
    step_acc, init_acc = make_train_step(model, loss, optimizer, mesh,
                                         accumulate=2)

    def mk_batch(seed):
        r = np.random.default_rng(seed)
        gt_mask = np.zeros((1, 4, size, size), bool)
        gt_mask[0, 0, 8:40, 8:40] = True
        return shard_batch({
            "image": r.standard_normal((1, size, size, 3)).astype(np.float32) * 0.1,
            "bbox": np.array([[[0.375, 0.375, 0.5, 0.5]] + [[0, 0, 0, 0]] * 3],
                             np.float32),
            "cls": np.zeros((1, 4), np.int32),
            "mask": gt_mask,
            "valid": np.array([[True, False, False, False]]),
        }, mesh)

    b1, b2 = mk_batch(10), mk_batch(11)

    # replay run: same executable, never stepping -> accumulator holds g1+g2
    ref_state = init_acc(variables)
    ref_state, _ = step_acc(ref_state, b1, lr, False)
    ref_state, _ = step_acc(ref_state, b2, lr, False)
    gsum = jax.tree_util.tree_map(np.asarray, ref_state["grad_acc"])

    state = init_acc(variables)
    p0 = jax.tree_util.tree_map(np.asarray, state["params"])
    state, _ = step_acc(state, b1, lr, False)
    # microbatch 1: no optimizer application, grads accumulated
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(state["params"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert max(float(np.abs(np.asarray(x)).max())
               for x in jax.tree_util.tree_leaves(state["grad_acc"])) > 0

    state, _ = step_acc(state, b2, lr, True)
    # accumulator zeroed after the applied step
    assert max(float(np.abs(np.asarray(x)).max())
               for x in jax.tree_util.tree_leaves(state["grad_acc"])) == 0
    # applied update == one SGD application of (g1+g2) at lr/accumulate
    p0j = jax.tree_util.tree_map(jnp.asarray, p0)
    want_p, _ = optimizer.apply(
        p0j, jax.tree_util.tree_map(jnp.asarray, gsum),
        optimizer.init(variables["params"]), lr / 2)
    for a, b in zip(jax.tree_util.tree_leaves(want_p),
                    jax.tree_util.tree_leaves(state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_nan_guard_skips_update_keeps_state_finite(slim_backbone):
    """On-device NaN guard (train_state.py): a batch that produces a
    non-finite loss updates NOTHING — params, momentum and BN stats are
    bit-identical to before the step — and the next finite batch trains
    normally.  The logged loss still carries the NaN so the host-side abort
    (trainer.py, reference parity) fires, but from an intact state."""
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
    optimizer = SGD(lr=1e-3, momentum=0.9)
    mesh = data_mesh(n_devices=1)
    step_fn, init_state = make_train_step(model, loss, optimizer, mesh)
    state = init_state(variables)

    def mk_batch(poison):
        r = np.random.default_rng(3)
        img = r.standard_normal((1, size, size, 3)).astype(np.float32)
        if poison:
            img[0, 5, 5, 0] = np.inf
        return shard_batch({
            "image": img,
            "bbox": np.array([[[0.5, 0.5, 0.4, 0.4]] + [[0, 0, 0, 0]] * 3],
                             np.float32),
            "cls": np.zeros((1, 4), np.int32),
            "mask": np.ones((1, 4, size, size), bool),
            "valid": np.array([[True, False, False, False]]),
        }, mesh)

    snap = jax.tree_util.tree_map(np.asarray, state)
    state, logs = step_fn(state, mk_batch(poison=True), 1e-3, True)
    assert not np.isfinite(float(logs["loss"]))  # host abort still sees it
    for a, b in zip(jax.tree_util.tree_leaves(snap),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(a, np.asarray(b))

    state, logs = step_fn(state, mk_batch(poison=False), 1e-3, True)
    assert np.isfinite(float(logs["loss"]))
    p_before = jax.tree_util.tree_leaves(snap["params"])
    p_after = jax.tree_util.tree_leaves(state["params"])
    assert any(not np.array_equal(a, np.asarray(b))
               for a, b in zip(p_before, p_after))
    for leaf in jax.tree_util.tree_leaves(state):
        assert np.isfinite(np.asarray(leaf)).all()
