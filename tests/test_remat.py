"""remat (gradient checkpointing): identical loss/grads, less live memory."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_setup():
    from orienmask_tpu.models.darknet import DarkNet53

    orig = DarkNet53.STAGE_BLOCKS
    DarkNet53.STAGE_BLOCKS = (1, 1, 1, 1, 1)
    try:
        from orienmask_tpu.models import OrienMaskYOLOFPNPlus

        model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=4)
        variables = model.init_variables(jax.random.PRNGKey(0))
        yield model, variables
    finally:
        DarkNet53.STAGE_BLOCKS = orig


def _loss_of(model, remat):
    from orienmask_tpu.models.layers import default_ctx

    def loss(params, stats, image):
        ctx = default_ctx(train=True, dtype=jnp.float32, remat=remat)
        out, new_stats = model.apply(params, stats, image, ctx)
        # scalar touching every head output at every scale
        total = 0.0
        for bbox, orien in out:
            total = total + jnp.sum(bbox ** 2) + jnp.sum(jnp.abs(orien))
        return total, new_stats

    return loss


@pytest.mark.parametrize("s2d", [True, False])
def test_remat_grads_match(tiny_setup, s2d):
    model, variables = tiny_setup
    model.backbone.s2d_stem = s2d
    try:
        img = jnp.asarray(
            np.random.default_rng(1).normal(0, 1, (1, 96, 96, 3)), jnp.float32)
        params, stats = variables["params"], variables["batch_stats"]

        # Must compare under jit: eagerly, jax.checkpoint traces its body as
        # one fused computation while the baseline dispatches op-by-op, and
        # that fp-reassociation delta is amplified ~1e3x through train-mode
        # BN statistics + leaky-relu branch flips.  Under jit (the only mode
        # the trainer uses) both lower through XLA and grads match bitwise.
        (l0, ns0), g0 = jax.jit(jax.value_and_grad(
            _loss_of(model, remat=False), has_aux=True))(params, stats, img)
        (l1, ns1), g1 = jax.jit(jax.value_and_grad(
            _loss_of(model, remat=True), has_aux=True))(params, stats, img)

        # not bit-equal in general: checkpointing changes XLA fusion boundaries
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
        flat0 = jax.tree_util.tree_leaves_with_path(g0)
        flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
        assert len(flat0) == len(flat1)
        for path, leaf in flat0:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat1[path]),
                rtol=1e-6, atol=1e-6, err_msg=jax.tree_util.keystr(path))
        # BN batch stats are forward-only and must be unaffected
        for a, b in zip(jax.tree_util.tree_leaves(ns0),
                        jax.tree_util.tree_leaves(ns1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
    finally:
        model.backbone.s2d_stem = True


def test_remat_train_step_runs(tiny_setup):
    """config remat: true builds a working train step (CPU smoke)."""
    model, variables = tiny_setup
    from orienmask_tpu.trainer.train_state import make_train_step
    from orienmask_tpu.parallel.mesh import data_mesh
    from orienmask_tpu.optim.sgd import SGD

    class SumLoss:
        def __call__(self, out, target, training=True):
            total = sum(jnp.sum(b ** 2) + jnp.sum(o ** 2) for b, o in out)
            return total, {"loss_sum": total}, {}

    mesh = data_mesh(1)
    step, init_state = make_train_step(
        model, SumLoss(), SGD(lr=0.01), mesh, remat=True)
    state = init_state(variables)
    batch = {
        "image": jnp.zeros((1, 96, 96, 3), jnp.float32) + 0.5,
        "bbox": jnp.zeros((1, 4, 4)), "cls": jnp.zeros((1, 4), jnp.int32),
        "mask": jnp.zeros((1, 4, 96, 96), jnp.bool_),
        "valid": jnp.zeros((1, 4), jnp.bool_),
    }
    state, logs = step(state, batch, 0.01, True)
    assert np.isfinite(np.asarray(logs["loss"]))
