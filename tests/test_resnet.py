"""ResNet backbone family: shapes, torch-golden activations, conversion."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from orienmask_tpu.models import resnet18, resnet50, resnext50_32x4d
from orienmask_tpu.models.resnet import resnet_from_torch

from torch_ref import TorchResNet18


def test_resnet18_matches_torch():
    torch.manual_seed(0)
    tmodel = TorchResNet18().eval()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    jmodel = resnet18()
    params, stats = resnet_from_torch(jmodel, tmodel.state_dict())

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    from orienmask_tpu.models.layers import default_ctx

    got, _ = jmodel.apply(params, stats, jnp.asarray(x), default_ctx())
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy().transpose(0, 2, 3, 1), rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("factory,channels", [
    (resnet18, (512, 256, 128, 64)),
    (resnet50, (2048, 1024, 512, 256)),
    (resnext50_32x4d, (2048, 1024, 512, 256)),
])
def test_resnet_family_shapes(factory, channels):
    model = factory()
    assert model.get_output_channels() == channels
    variables = model.init_variables(jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    from orienmask_tpu.models.layers import default_ctx

    out, _ = jax.eval_shape(
        lambda p, s, im: model.apply(p, s, im, default_ctx()),
        variables["params"], variables["batch_stats"], x)
    x32, x16, x8, x4 = out
    assert x32.shape == (1, 2, 2, channels[0])
    assert x16.shape == (1, 4, 4, channels[1])
    assert x8.shape == (1, 8, 8, channels[2])
    assert x4.shape == (1, 16, 16, channels[3])


def _tree_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    if ta != tb:
        return False
    return all(np.array_equal(np.asarray(u), np.asarray(v))
               for u, v in zip(la, lb))


def test_frozen_stages_hold_bn_stats():
    """Frozen stages use eval-mode BN in training (reference FrozenBatchNorm2d
    conversion): their batch stats must come back unchanged while unfrozen
    stages update theirs."""
    from orienmask_tpu.models.layers import default_ctx

    model = resnet18(pretrained=None, frozen_stages=2)
    assert model.frozen_stages() == ["stem", "layer1"]  # optimizer protocol
    params, stats = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    _, ns = model.apply(params, stats, x, default_ctx(train=True))

    assert _tree_equal(ns["stem"], stats["stem"])        # frozen: held
    assert _tree_equal(ns["layer1"], stats["layer1"])    # frozen: held
    assert not _tree_equal(ns["layer2"], stats["layer2"])  # training: updated


def test_darknet_frozen_stages_hold_bn_stats():
    from orienmask_tpu.models.darknet import DarkNet53
    from orienmask_tpu.models.layers import default_ctx

    for s2d in (False, True):
        model = DarkNet53(freeze_backbone=3, s2d_stem=s2d)
        params, stats = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 64, 64, 3)),
            jnp.float32)
        _, ns = model.apply(params, stats, x, default_ctx(train=True))

        for name in ("conv1", "conv2", "conv3"):
            assert _tree_equal(ns[name], stats[name]), (s2d, name)
        assert not _tree_equal(ns["conv4"], stats["conv4"]), s2d
