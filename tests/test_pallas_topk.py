"""exact_topk (ops/pallas_topk.py) vs jax.lax.top_k — bit-identity.

The kernel runs in Pallas interpret mode on the CPU test mesh; on-chip
equality is covered by tools/validate_tpu.py.  Equality must hold for
values AND indices, including the adversarial tie patterns the detect
stage actually produces (thousands of identical -1.0 below-threshold
sentinels competing for the tail slots by lower index).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orienmask_tpu.ops.pallas_topk import exact_topk


def _check(x, k):
    x = jnp.asarray(x, jnp.float32)
    want_v, want_i = jax.lax.top_k(x, k)
    got_v, got_i = exact_topk(x, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(want_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))


def test_random_detect_shape():
    rng = np.random.default_rng(0)
    _check(rng.standard_normal(18207), 400)


def test_random_pair_shape():
    rng = np.random.default_rng(1)
    _check(rng.standard_normal(32000), 400)


def test_mostly_masked_sentinels():
    """Detect-stage reality: a handful of real scores, the rest -1.0 — the
    tail of the 400 fills with the LOWEST-index sentinels."""
    rng = np.random.default_rng(2)
    x = np.full(18207, -1.0, np.float32)
    pos = rng.choice(18207, 37, replace=False)
    x[pos] = rng.uniform(0.005, 1.0, 37)
    _check(x, 400)


def test_all_equal():
    _check(np.full(4096, 0.25, np.float32), 400)


def test_quantized_values_heavy_ties():
    rng = np.random.default_rng(3)
    _check(rng.choice([0.1, 0.2, 0.3, -1.0], 18207), 400)


def test_negatives_and_boundary():
    rng = np.random.default_rng(4)
    x = rng.uniform(-2.0, 2.0, 1000).astype(np.float32)
    _check(x, 1000)  # k == P
    _check(x, 1)


def test_small_p():
    rng = np.random.default_rng(5)
    _check(rng.standard_normal(500), 400)


def test_detect_stage_bit_identity(monkeypatch):
    """The wired detect stage (ops/postprocess.py _topk) with the Pallas
    selection must produce the IDENTICAL detect dict as the split-top-k
    path — boxes, classes, anchors, validity (CPU via interpret mode;
    compiled-path equality: tools/validate_tpu.py check 'topk')."""
    import functools

    from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
    from orienmask_tpu.ops import pallas_topk as ptk
    from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess

    monkeypatch.setattr(
        ptk, "exact_topk",
        functools.partial(ptk.exact_topk.__wrapped__, interpret=True))

    size = 96
    kw = dict(
        grid_size=[[size // 32] * 2, [size // 16] * 2, [size // 8] * 2],
        image_size=[size, size], anchors=ANCHORS_YOLOV4,
        anchor_mask=ANCHORS_MASK, num_classes=80, conf_thresh=0.005,
        nms=dict(threshold=0.5), nms_pre=50, nms_post=10, orien_thresh=0.3)
    pp_pl = OrienMaskYOLOPostProcess(**kw, use_pallas_topk=True)
    pp_xla = OrienMaskYOLOPostProcess(**kw, use_pallas_topk=False)
    assert pp_pl.use_pallas_topk and not pp_xla.use_pallas_topk

    rng = np.random.default_rng(7)
    heads = [jnp.asarray(rng.standard_normal(
        (nh, nw, len(m) * 85)).astype(np.float32))
        for (nh, nw), m in zip(pp_pl.grid_hw, pp_pl.anchor_mask)]
    want = pp_xla._detect_image(heads)
    got = pp_pl._detect_image(heads)
    for k in ("bbox", "cls", "anchor", "valid"):
        np.testing.assert_array_equal(
            np.asarray(want[k]), np.asarray(got[k]), err_msg=k)


def test_vmap_batches():
    """The detect stage calls this under jax.vmap (batched inference)."""
    rng = np.random.default_rng(6)
    xb = jnp.asarray(rng.standard_normal((3, 2048)), jnp.float32)
    want_v, want_i = jax.vmap(lambda x: jax.lax.top_k(x, 100))(xb)
    got_v, got_i = jax.vmap(
        lambda x: exact_topk(x, 100, interpret=True))(xb)
    np.testing.assert_array_equal(np.asarray(want_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))
