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
