"""Layer zoo: FPN / SPP / Scale / Upsample correctness."""

import numpy as np

import jax
import jax.numpy as jnp

from orienmask_tpu.models.layers import (
    FPN,
    SPP,
    ConvBNLeaky,
    NearestUpsample,
    Scale,
    Sequential,
    Upsample,
    default_ctx,
)


def test_fpn_shapes_and_topdown():
    fpn = FPN([256, 128, 64], 96, extra_levels=2)
    params, stats = fpn.init(jax.random.PRNGKey(0))
    xs = [jnp.ones((1, 4, 4, 256)), jnp.ones((1, 8, 8, 128)), jnp.ones((1, 16, 16, 64))]
    out, _ = fpn.apply(params, stats, xs, default_ctx())
    # 2 extra levels prepended, then the 3 pyramid levels
    assert len(out) == 5
    assert out[0].shape == (1, 1, 1, 96)   # extra stride-4 (4 -> 2 -> 1)
    assert out[1].shape == (1, 2, 2, 96)
    assert out[2].shape == (1, 4, 4, 96)
    assert out[3].shape == (1, 8, 8, 96)
    assert out[4].shape == (1, 16, 16, 96)


def test_spp_preserves_shape():
    spp = SPP([2, 4], 32)
    params, stats = spp.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 32)), jnp.float32)
    y, _ = spp.apply(params, stats, x, default_ctx())
    assert y.shape == (1, 8, 8, 32)


def test_spp_stride1_pool_semantics():
    """YOLOv3-SPP pools are stride-1 SAME: each output pixel is the max of
    its kxk neighborhood at unchanged resolution (NOT torch MaxPool2d(k)'s
    stride-k block max, which shrinks the map and crashes the reference's
    own concat). Checked through SPP.apply itself with the 1x1 conv pinned
    to a channel-selecting identity."""
    k = 3
    spp = SPP([k], 1, activation="linear")
    params, stats = spp.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(1).standard_normal((6, 6)).astype(np.float32)

    def run_with_selector(col):
        # conv kernel (1,1,2,1): pick pyramid member `col` (0=x, 1=pool_k)
        sel = np.zeros((1, 1, 2, 1), np.float32)
        sel[0, 0, col, 0] = 1.0
        p = dict(params, kernel=jnp.asarray(sel),
                 scale=jnp.ones_like(params["scale"]),
                 bias=jnp.zeros_like(params["bias"]))
        s = {"mean": jnp.zeros_like(stats["mean"]),
             "var": jnp.ones_like(stats["var"]) - 1e-5}
        y, _ = spp.apply(p, s, jnp.asarray(x)[None, :, :, None],
                         default_ctx())
        return np.asarray(y)[0, :, :, 0]

    np.testing.assert_allclose(run_with_selector(0), x, atol=1e-5)
    padded = np.pad(x, 1, constant_values=-np.inf)
    want = np.stack([
        [padded[i:i + k, j:j + k].max() for j in range(6)] for i in range(6)
    ])
    np.testing.assert_allclose(run_with_selector(1), want, atol=1e-5)


def test_scale():
    s = Scale(2.5)
    params, _ = s.init(jax.random.PRNGKey(0))
    y, _ = s.apply(params, {}, jnp.ones((3,)), default_ctx())
    np.testing.assert_allclose(np.asarray(y), 2.5)


def test_upsample_bilinear_vs_nearest():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    up_b = Upsample(2, "bilinear")
    up_n = Upsample(2, "nearest")
    yb, _ = up_b.apply({}, {}, x, default_ctx())
    yn, _ = up_n.apply({}, {}, x, default_ctx())
    assert yb.shape == yn.shape == (1, 8, 8, 1)
    # nearest repeats exactly; bilinear interpolates interior values
    np.testing.assert_allclose(np.asarray(yn)[0, :2, :2, 0], x[0, 0, 0, 0])
    assert not np.allclose(np.asarray(yb), np.asarray(yn))


def test_sequential_fold_roundtrip():
    seq = Sequential(ConvBNLeaky(3, 8, 3, padding=1), ConvBNLeaky(8, 4, 1))
    params, stats = seq.init(jax.random.PRNGKey(1))
    # randomize stats so folding is non-trivial
    stats = jax.tree_util.tree_map(
        lambda x: x + 0.3 * np.random.default_rng(0).standard_normal(x.shape).astype(np.float32),
        stats)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 8, 3)), jnp.float32)
    y, _ = seq.apply(params, stats, x, default_ctx())
    y_folded = seq.apply_folded(seq.fold(params, stats), x, default_ctx())
    np.testing.assert_allclose(np.asarray(y_folded), np.asarray(y), rtol=1e-4, atol=1e-5)
