"""Coverage batch: LR schedules, collate_plus, freezing, label smoothing,
aspect-ratio grouping, model summary, debug utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orienmask_tpu.optim import SGD, PolyLR, StepWarmUpLR


def test_step_warmup_lr_values():
    # reference recipe: linear warmup 1000 iters ratio 0.1, x0.1 at 520k/660k
    sched = StepWarmUpLR("linear", 1000, 0.1, [520000, 660000], 0.1, base_lr=1e-3)
    assert np.isclose(sched(0), 1e-4)
    assert np.isclose(sched(500), 1e-3 * (0.1 + 0.9 * 0.5))
    assert np.isclose(sched(1000), 1e-3)  # warmup boundary uses warmup formula
    assert np.isclose(sched(1001), 1e-3)
    assert np.isclose(sched(520000), 1e-4)  # milestone inclusive (torch semantics)
    assert np.isclose(sched(660001), 1e-5)


def test_poly_lr():
    sched = PolyLR(max_iter=100, power=0.9, base_lr=1.0)
    assert np.isclose(sched(0), 1.0)
    assert sched(50) < 1.0
    assert np.isclose(sched(100), 0.0)
    # past max_iter: clamp to 0 (the reference's math.pow raises a domain
    # error on the negative base — a crash in the final accumulate window)
    assert sched(101) == 0.0


def test_sgd_matches_torch_semantics():
    import torch

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g_seq = [np.array([0.1, 0.2, -0.3], np.float32),
             np.array([-0.5, 0.1, 0.2], np.float32)]

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in g_seq:
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    sgd = SGD(lr=0.1, momentum=0.9, weight_decay=0.01)
    params = {"w": jnp.asarray(w0)}
    state = sgd.init(params)
    for g in g_seq:
        params, state = sgd.apply(params, {"w": jnp.asarray(g)}, state, 0.1)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-6, atol=1e-7)


def test_sgd_freeze_mask():
    sgd = SGD(lr=0.1, momentum=0.9, freeze_mask={"a": True, "b": False})
    params = {"a": jnp.ones(3), "b": jnp.ones(3)}
    grads = {"a": jnp.ones(3), "b": jnp.ones(3)}
    state = sgd.init(params)
    new_params, _ = sgd.apply(params, grads, state, 0.1)
    np.testing.assert_allclose(np.asarray(new_params["a"]), 1.0)  # frozen
    assert not np.allclose(np.asarray(new_params["b"]), 1.0)


def test_collate_plus_pads_batch():
    from orienmask_tpu.data.collate import collate_plus

    rng = np.random.default_rng(0)
    batch = []
    for h, w in [(60, 90), (100, 40)]:
        batch.append({
            "image": rng.standard_normal((h, w, 3)).astype(np.float32),
            "bbox": np.array([[0.5, 0.5, 0.5, 0.5]], np.float32),
            "cls": np.array([1]),
            "mask": np.ones((1, h, w), bool),
            "info": {"id": 0, "height": h, "width": w},
        })
    out = collate_plus(batch, max_instances=4, size_divisor=32)
    assert out["image"].shape[1] % 32 == 0 and out["image"].shape[2] % 32 == 0
    assert out["image"].shape == (2, 128, 96, 3)
    for info in out["info"]:
        assert "collate_pad" in info
    # boxes stay normalized inside [0, 1]
    valid = out["valid"]
    assert out["bbox"][valid].max() <= 1.0


def test_label_smooth_targets():
    from orienmask_tpu.ops.targets import TargetBuilder

    b = TargetBuilder((8, 8), (64, 64),
                      [[4, 6], [8, 10], [12, 8], [10, 20], [20, 16], [18, 36],
                       [36, 28], [48, 60], [60, 50]],
                      [6, 7, 8], 50, label_smooth=True, chunk=4)
    assert np.isclose(b.label_smooth, 1.0 / 50)
    gt_bbox = np.array([[0.5, 0.5, 0.9, 0.9]], np.float32).repeat(4, 0)
    gt_bbox = np.concatenate([gt_bbox, np.zeros((12, 4), np.float32)])
    valid = np.arange(16) < 1
    out = b(jnp.asarray(gt_bbox), jnp.zeros(16, jnp.int32),
            jnp.ones((16, 64, 64), bool), jnp.asarray(valid),
            jnp.ones((3 * 64, 4)))
    tcls = np.asarray(out[6])
    assert np.isclose(tcls.min(), 1.0 / 50)
    assert np.isclose(tcls.max(), 1 - 1.0 / 50)


def test_aspect_ratio_grouped_loader(tmp_path):
    from orienmask_tpu.data.dataloader import AspectRatioGroupedDataloader

    class DS:
        transform = None

        def __len__(self):
            return 10

        def __getitem__(self, i):
            h, w = (40, 20) if i % 2 else (20, 40)
            return {"image": np.zeros((h, w, 3), np.float32), "i": i}

    dl = AspectRatioGroupedDataloader(DS(), batch_size=2, collate_fn=lambda b: b)
    batches = list(dl)
    total = sum(len(b) for b in batches)
    assert total == 10
    for b in batches[:-1]:
        shapes = {s["image"].shape for s in b}
        assert len(shapes) == 1  # homogeneous aspect groups


def test_model_summary(capsys):
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.models.summary import model_summary

    model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    info = model_summary(model, (1, 544, 544, 3))
    out = capsys.readouterr().out
    assert "backbone" in out and "orien_head" in out
    assert info["params"] > 40_000_000  # DarkNet53+heads ~ 50M params
    assert info["outputs"][0][0] == (1, 17, 17, 255)


def test_debug_assert_finite():
    from orienmask_tpu.utils.debug import assert_finite_tree

    assert_finite_tree({"a": np.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite_tree({"a": np.array([1.0, np.nan])})


def test_param_group_factors_structure():
    from orienmask_tpu.optim import param_group_factors

    params = {
        "cbl": {"kernel": np.zeros((3, 3, 4, 8)), "scale": np.ones(8), "bias": np.zeros(8)},
        "head": {"kernel": np.zeros((1, 1, 8, 2)), "bias": np.zeros(2)},
    }
    lr_f, wd_f = param_group_factors(params, weight_decay=5e-4,
                                     norm_weight_decay=0.0, bias_lr_factor=2.0,
                                     bias_weight_decay=1e-4)
    assert lr_f["cbl"]["kernel"] == 1.0 and wd_f["cbl"]["kernel"] == 5e-4
    assert wd_f["cbl"]["scale"] == 0.0 and wd_f["cbl"]["bias"] == 0.0
    assert lr_f["head"]["bias"] == 2.0 and wd_f["head"]["bias"] == 1e-4


def test_build_optimizer_param_groups_config():
    """A shipped-style optimizer config with a ``param_groups`` sub-config
    (reference trainer/builder.py:122-126) wires per-leaf lr/wd factors into
    SGD, and one step applies them (norm wd=0, bias lr factor)."""
    from orienmask_tpu.trainer.builder import build_optimizer

    cfg = dict(type="SGD", lr=0.1, momentum=0.0, weight_decay=5e-4,
               param_groups=dict(norm_weight_decay=0.0, bias_lr_factor=2.0,
                                 bias_weight_decay=0.0))
    params = {
        "cbl": {"kernel": jnp.ones((1, 1, 1, 2)), "scale": jnp.ones(2),
                "bias": jnp.zeros(2)},
        "head": {"kernel": jnp.ones((1, 1, 2, 1)), "bias": jnp.ones(1)},
    }
    opt = build_optimizer(cfg, params=params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = opt.init(params)
    new_params, _ = opt.apply(params, grads, state, 0.1)

    # conv kernel: wd 5e-4, lr 0.1 -> 1 - 0.1*(1 + 5e-4*1)
    np.testing.assert_allclose(
        np.asarray(new_params["cbl"]["kernel"]), 1 - 0.1 * (1 + 5e-4), rtol=1e-6)
    # norm scale: wd 0 -> 1 - 0.1*1
    np.testing.assert_allclose(np.asarray(new_params["cbl"]["scale"]), 0.9,
                               rtol=1e-6)
    # norm bias (param 0): wd 0, lr factor 1 -> 0 - 0.1*1
    np.testing.assert_allclose(np.asarray(new_params["cbl"]["bias"]), -0.1,
                               rtol=1e-6)
    # conv bias: lr factor 2, wd 0 -> 1 - 0.2*1
    np.testing.assert_allclose(np.asarray(new_params["head"]["bias"]), 0.8,
                               rtol=1e-6)


def test_step_warmup_const_matches_reference_statefulness():
    """Reference quirk (optim/lr_scheduler.py:44-48): MultiStepLR never resets
    the group lr after warmup, so a 'const' warmup stays at base*ratio
    forever (scaled at milestones); 'linear'/'power' end at base_lr."""
    base = 1e-2
    const = StepWarmUpLR("const", 100, 0.1, [1000], 0.1, base_lr=base)
    assert const(50) == base * 0.1          # during warmup
    assert const(101) == base * 0.1         # post-warmup: NOT reset to base
    assert abs(const(1001) - base * 0.1 * 0.1) < 1e-12  # milestone scales it

    linear = StepWarmUpLR("linear", 100, 0.1, [1000], 0.1, base_lr=base)
    assert abs(linear(101) - base) < 1e-12  # linear warmup ends at base_lr
    power = StepWarmUpLR("power", 100, 0.1, [1000], 0.1, base_lr=base)
    assert abs(power(101) - base) < 1e-12
