"""Golden tests: JAX model activations vs an independent PyTorch oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from orienmask_tpu.models import OrienMaskYOLO, OrienMaskYOLOFPNPlus
from orienmask_tpu.models.convert import torch_to_variables
from orienmask_tpu.models.layers import bilinear_resize

from torch_ref import TorchOrienMaskFPNPlus, upsample4_bilinear


def _rand_image(rng, b, h, w):
    return rng.standard_normal((b, h, w, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def fpnplus_pair():
    torch.manual_seed(0)
    tmodel = TorchOrienMaskFPNPlus(num_anchors=3, num_classes=80).eval()
    # randomize BN running stats so eval-mode BN is non-trivial
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_(1, 0.2)
            m.bias.data.normal_(0, 0.2)
    jmodel = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    variables = torch_to_variables(jmodel, tmodel.state_dict())
    return tmodel, jmodel, variables


def test_fpnplus_forward_matches_torch(fpnplus_pair):
    tmodel, jmodel, variables = fpnplus_pair
    rng = np.random.default_rng(1)
    x = _rand_image(rng, 2, 64, 64)

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    jout, _ = jmodel.forward(variables, jnp.asarray(x), train=False)

    for s in range(3):
        for j in range(2):  # bbox, orien
            ref = tout[s][j].numpy().transpose(0, 2, 3, 1)
            got = np.asarray(jout[s][j])
            assert got.shape == ref.shape, (s, j, got.shape, ref.shape)
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fpnplus_folded_matches_unfolded(fpnplus_pair):
    _, jmodel, variables = fpnplus_pair
    rng = np.random.default_rng(2)
    x = jnp.asarray(_rand_image(rng, 1, 64, 64))
    out, _ = jmodel.forward(variables, x, train=False)
    folded = jmodel.fold(variables)
    from orienmask_tpu.models.layers import default_ctx

    out_f = jmodel.apply_folded(folded, x, default_ctx())
    for s in range(3):
        for j in range(2):
            np.testing.assert_allclose(
                np.asarray(out_f[s][j]), np.asarray(out[s][j]), rtol=1e-3, atol=1e-3
            )


def test_output_shapes_544():
    jmodel = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    variables = jmodel.init_variables(jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((1, 544, 544, 3), jnp.float32)
    out, _ = jax.eval_shape(lambda v, im: jmodel.forward(v, im), variables, x)
    (b32, o32), (b16, o16), (b8, o8) = out
    assert b32.shape == (1, 17, 17, 255)
    assert b16.shape == (1, 34, 34, 255)
    assert b8.shape == (1, 68, 68, 255)
    for o in (o32, o16, o8):
        assert o.shape == (1, 136, 136, 6)


def test_base_variant_shapes():
    jmodel = OrienMaskYOLO(num_anchors=3, num_classes=80)
    variables = jmodel.init_variables(jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((1, 128, 128, 3), jnp.float32)
    out, _ = jax.eval_shape(lambda v, im: jmodel.forward(v, im), variables, x)
    assert out[0][0].shape == (1, 4, 4, 255)
    assert out[2][1].shape == (1, 32, 32, 6)


def test_train_mode_bn_updates_stats():
    jmodel = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    variables = jmodel.init_variables(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    _, new_stats = jmodel.forward(variables, x, train=True)
    old = variables["batch_stats"]["backbone"]["conv1"]["mean"]
    new = new_stats["backbone"]["conv1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_bilinear_resize_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 17, 23, 4)).astype(np.float32)
    ref = upsample4_bilinear(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(bilinear_resize(jnp.asarray(x), 68, 92))
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5)


def test_base_variant_matches_torch():
    """OrienMaskYOLO (non-FPNPlus) golden vs its torch oracle."""
    import torch
    from torch_ref import TorchOrienMaskBase

    torch.manual_seed(1)
    tmodel = TorchOrienMaskBase(num_anchors=3, num_classes=12).eval()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.6, 1.6)
    jmodel = OrienMaskYOLO(num_anchors=3, num_classes=12)
    variables = torch_to_variables(jmodel, tmodel.state_dict())

    rng = np.random.default_rng(4)
    x = _rand_image(rng, 1, 64, 64)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    jout, _ = jmodel.forward(variables, jnp.asarray(x), train=False)
    for s in range(3):
        for j in range(2):
            ref = tout[s][j].numpy().transpose(0, 2, 3, 1)
            got = np.asarray(jout[s][j])
            np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_s2d_stem_matches_standard_path():
    """The space-to-depth phase stem (models/darknet.py module docstring) is an
    exact reformulation: eval/train/folded outputs and BN stats match the
    standard per-layer path up to fp reassociation."""
    from orienmask_tpu.models.darknet import DarkNet53
    from orienmask_tpu.models.layers import default_ctx

    m_std = DarkNet53(s2d_stem=False)
    m_s2d = DarkNet53(s2d_stem=True)
    params, stats = m_std.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (2, 32, 48, 3)).astype(np.float32))

    @jax.jit
    def run(params, stats, x):
        ev = default_ctx(train=False)
        tr = default_ctx(train=True)
        a, _ = m_std.apply(params, stats, x, ev)
        b, _ = m_s2d.apply(params, stats, x, ev)
        at, ns_a = m_std.apply(params, stats, x, tr)
        bt, ns_b = m_s2d.apply(params, stats, x, tr)
        folded = m_std.fold(params, stats)
        fa = m_std.apply_folded(folded, x, ev)
        fb = m_s2d.apply_folded(folded, x, ev)
        return a, b, at, bt, ns_a, ns_b, fa, fb

    a, b, at, bt, ns_a, ns_b, fa, fb = run(params, stats, x)
    for ta, tb in zip(a, b):
        np.testing.assert_allclose(np.asarray(ta), np.asarray(tb),
                                   rtol=2e-3, atol=2e-3)
    for ta, tb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(ta), np.asarray(tb),
                                   rtol=2e-3, atol=2e-3)
    # train-mode BN running stats agree (stem layers reduce over phases)
    for la, lb in zip(jax.tree_util.tree_leaves(ns_a),
                      jax.tree_util.tree_leaves(ns_b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=5e-3, atol=5e-3)
    # gradients flow to every master stem kernel through the phase derivation
    def loss(p):
        (o32, *_), _ = m_s2d.apply(p, stats, x, default_ctx(train=True))
        return jnp.sum(o32 ** 2)

    g = jax.grad(loss)(params)
    for gk in [g["conv1"]["kernel"], g["conv2"][0]["kernel"],
               g["conv2"][1][0]["kernel"], g["conv2"][1][1]["kernel"],
               g["conv3"][0]["kernel"]]:
        assert float(jnp.linalg.norm(gk)) > 0.0


def test_export_torch_checkpoint_roundtrip(tmp_path, fpnplus_pair):
    """variables -> .pth -> reference-style strict load + back-conversion
    reproduces the exact leaves (models/convert.py export path)."""
    from orienmask_tpu.models.convert import (
        export_torch_checkpoint, load_torch_checkpoint,
    )

    tmodel, jmodel, variables = fpnplus_pair
    path = str(tmp_path / "export.pth")
    export_torch_checkpoint(jmodel, variables, path)

    # the torch oracle loads it strictly (reference infer.py:83 semantics)
    sd = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
    tmodel2 = type(tmodel)(num_anchors=3, num_classes=80)
    tmodel2.load_state_dict(sd, strict=True)

    # and converting back gives the identical pytree
    back = load_torch_checkpoint(jmodel, path)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_phase_resize_fused_stem_matches_resize_then_stem():
    """layers.phase_resize + the z-input folded stem (darknet
    `_phase_kernel_im_z`, pipeline.py fused path) equals bilinear_resize
    followed by the standard folded backbone, up to fp reassociation."""
    from orienmask_tpu.models.darknet import DarkNet53
    from orienmask_tpu.models.layers import default_ctx, phase_resize

    net_h, net_w = 32, 48  # /32-friendly "network size"
    m = DarkNet53(s2d_stem=True)
    params, stats = m.init(jax.random.PRNGKey(1))
    folded = m.fold(params, stats)
    img = jnp.asarray(np.random.default_rng(11).standard_normal(
        (2, 40, 56, 3)).astype(np.float32))

    @jax.jit
    def run(folded, img):
        ev = default_ctx(train=False)
        x = bilinear_resize(img, net_h, net_w)
        ref = m.apply_folded(folded, x, ev)
        z = phase_resize(img, net_h, net_w)
        got = m.apply_folded(folded, z, ev, phase_hw=(net_h // 2, net_w // 2))
        return ref, got, x, z

    ref, got, x, z = run(folded, img)
    # z itself is exactly the padded space-to-depth of the resized image
    ph, pw = net_h // 2 + 1, net_w // 2 + 1
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    want_z = np.stack(
        [xp[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1)], axis=3
    ).transpose(0, 1, 2, 3, 4).reshape(2, ph, pw, 12)
    np.testing.assert_allclose(np.asarray(z)[:, :ph, :pw], want_z,
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(z)[:, ph:]).max() == 0.0
    for ta, tb in zip(ref, got):
        np.testing.assert_allclose(np.asarray(ta), np.asarray(tb),
                                   rtol=2e-3, atol=2e-3)
