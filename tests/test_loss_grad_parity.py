"""Gradient-level loss parity vs torch autograd (VERDICT r2 task 1).

Loss VALUES have long been oracle-exact; these tests close the last untested
link in the training-parity chain by comparing ``jax.grad`` of the rebuilt
loss against torch autograd through an independent torch implementation of
the reference loss (tests/torch_ref.py:TorchOrienMaskMultiScaleLoss, mirroring
reference eval/orienmask_yolo_loss.py:63-286).  A misplaced stop_gradient —
e.g. detaching (or failing to detach) the decoded boxes feeding the
ignore-IoU test, reference eval/orienmask_yolo_loss.py:90-91 — is invisible
to value tests but flips these.

Covered: gradients of all 21 per-scale loss items w.r.t. raw predictions,
the ignore path active, a zero-positive batch, and end-to-end
d(loss)/d(params) through the FPNPlus model with shared converted weights
in both frozen-BN (eval) and batch-stat (train) modes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss

from test_targets import ANCHORS, IMAGE, MASKS, _pad_gt, _random_gt
from torch_ref import TorchOrienMaskMultiScaleLoss

GRIDS = [(2, 2), (4, 4), (8, 8)]  # realistic stride-32/16/8 pyramid at 64x64
NUM_CLASSES = 8
ITEM_KEYS = ("loss_xy", "loss_wh", "loss_obj", "loss_noobj", "loss_cls",
             "loss_orien_pos", "loss_orien_neg")
SCALE_IDS = ("S32", "S16", "S08")


def _make_losses(ignore_thresh, weight=(1, 1, 1, 1, 1, 20, 20)):
    kw = dict(
        grid_size=[list(g) for g in GRIDS], image_size=list(IMAGE),
        anchors=ANCHORS, anchor_mask=MASKS, num_classes=NUM_CLASSES,
        center_region=0.6, valid_region=0.6, label_smooth=False,
        obj_ignore_threshold=ignore_thresh,
    )
    jl = OrienMaskYOLOMultiScaleLoss(
        weight=list(weight), scales_weight=[1, 1, 1], target_chunk=4, **kw)
    tl = TorchOrienMaskMultiScaleLoss(weight=list(weight), **kw)
    return jl, tl


def _random_batch(rng, n_insts):
    """Returns (jax target dict, torch per-sample GT lists, raw numpy preds)."""
    samples = [_pad_gt(*_random_gt(rng, n)) if n else _pad_gt(
        np.zeros((0, 4), np.float32), np.zeros((0,), np.int64),
        np.zeros((0, *IMAGE), bool)) for n in n_insts]
    target = {
        "bbox": jnp.asarray(np.stack([s[0] for s in samples])),
        "cls": jnp.asarray(np.stack([s[1] for s in samples])),
        "mask": jnp.asarray(np.stack([s[2] for s in samples])),
        "valid": jnp.asarray(np.stack([s[3] for s in samples])),
    }
    t_bboxes, t_clses, t_masks = [], [], []
    for (pb, pc, pm, pv) in samples:
        n = int(pv.sum())
        t_bboxes.append(torch.from_numpy(pb[:n]).double())
        t_clses.append(torch.from_numpy(pc[:n]).long())
        t_masks.append(torch.from_numpy(pm[:n].astype(np.float64)))
    preds_np = []
    B = len(n_insts)
    for s in range(3):
        nh, nw = GRIDS[s]
        b = rng.standard_normal((B, nh, nw, 3 * (5 + NUM_CLASSES))).astype(np.float32)
        o = rng.standard_normal((B, IMAGE[0] // 4, IMAGE[1] // 4, 6)).astype(np.float32)
        preds_np.append((b, o))
    return target, (t_bboxes, t_clses, t_masks), preds_np


def _torch_pred(preds_np, s):
    """NHWC numpy -> NCHW f64 torch leaves with grad."""
    b, o = preds_np[s]
    tb = torch.from_numpy(b.transpose(0, 3, 1, 2)).double().requires_grad_(True)
    to = torch.from_numpy(o.transpose(0, 3, 1, 2)).double().requires_grad_(True)
    return tb, to


def _assert_grads_close(jg_nhwc, tg_nchw, name, rtol=5e-3):
    got = np.asarray(jg_nhwc, np.float64)
    ref = tg_nchw.detach().numpy().transpose(0, 2, 3, 1)
    atol = max(np.abs(ref).max(), 1e-6) * 1e-4
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol, err_msg=name)


def _pred_grad_case(seed, n_insts, ignore_thresh, check_ignore_active=False):
    rng = np.random.default_rng(seed)
    target, (tb, tc, tm), preds_np = _random_batch(rng, n_insts)
    jloss, tloss = _make_losses(ignore_thresh)

    # ---- torch side: per-item grads via autograd ------------------------
    t_leaves = [_torch_pred(preds_np, s) for s in range(3)]
    t_predict = [(t_leaves[s][0], t_leaves[s][1]) for s in range(3)]
    t_sum, t_items = tloss(t_predict, tb, tc, tm)  # t_items: (S, 7) weighted

    if check_ignore_active:
        # the ignore path must actually fire somewhere (neg mask has zeros
        # beyond the positive cells) or this case proves nothing
        fired = False
        for s, scale in enumerate(tloss.scales):
            pred_bbox = t_predict[s][0].detach()
            nb, na = pred_bbox.shape[0], scale.num_anchors
            nh, nw = scale.grid_h, scale.grid_w
            pb = pred_bbox.view(nb, na, -1, nh, nw).permute(0, 1, 3, 4, 2)
            box_xy = pb[..., 0:2].sigmoid() + scale.grid_mesh_xy
            box_wh = pb[..., 2:4].exp() * scale.grid_anchors.view(1, na, 1, 1, 2)
            boxes = torch.cat([box_xy, box_wh], -1).view(nb, -1, 4)
            (pos, neg, *_rest) = scale.build_targets(boxes, tb, tc, tm)
            n_ignored = float((1 - pos - neg).clamp(min=0).sum())
            if n_ignored > 0:
                fired = True
        assert fired, "ignore-IoU path never fired; case is vacuous"

    flat_items = t_items.reshape(-1)  # 21 per-scale weighted items
    t_grads = []  # list over items of list over leaves
    for i in range(flat_items.numel()):
        gs = torch.autograd.grad(
            flat_items[i], [g for pair in t_leaves for g in pair],
            retain_graph=True, allow_unused=True)
        t_grads.append([torch.zeros_like(l) if g is None else g
                        for g, l in zip(gs, [g for pair in t_leaves for g in pair])])
    all_leaves = [g for pair in t_leaves for g in pair]
    t_sum_grads = [torch.zeros_like(l) if g is None else g for g, l in zip(
        torch.autograd.grad(t_sum, all_leaves, allow_unused=True), all_leaves)]

    # ---- jax side: jacrev of the stacked item vector --------------------
    def items_fn(flat_preds):
        predict = [(flat_preds[2 * s], flat_preds[2 * s + 1]) for s in range(3)]
        _, loss_log, _ = jloss(predict, target, training=True)
        per_item = [loss_log[f"{sid}_{k}"] for sid in SCALE_IDS for k in ITEM_KEYS]
        return jnp.stack(per_item), loss_log["loss_sum"]

    flat_preds = [jnp.asarray(a) for pair in preds_np for a in pair]
    (j_items, j_sum) = items_fn(flat_preds)

    # values must agree before grads are meaningful
    np.testing.assert_allclose(
        np.asarray(j_items, np.float64), flat_items.detach().numpy(),
        rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(j_sum), float(t_sum), rtol=2e-3)

    jac_items, jac_sum = jax.jit(jax.jacrev(items_fn))(flat_preds)
    item_names = [f"{sid}_{k}" for sid in SCALE_IDS for k in ITEM_KEYS]
    for i, name in enumerate(item_names):
        for leaf in range(6):
            _assert_grads_close(jac_items[leaf][i], t_grads[i][leaf],
                                f"d({name})/d(pred leaf {leaf})")
    for leaf in range(6):
        _assert_grads_close(jac_sum[leaf], t_sum_grads[leaf],
                            f"d(loss_sum)/d(pred leaf {leaf})")


def test_grad_wrt_predictions():
    """All 21 per-scale items + total, random batch of 2, default ignore."""
    _pred_grad_case(seed=0, n_insts=(5, 3), ignore_thresh=0.5)


def test_grad_wrt_predictions_ignore_active():
    """Low ignore threshold so the pred-IoU ignore path fires: catches a
    missing stop_gradient on the decoded boxes (reference detaches them,
    eval/orienmask_yolo_loss.py:90-91 — grads must NOT flow through the
    ignore mask)."""
    _pred_grad_case(seed=1, n_insts=(7,), ignore_thresh=0.05,
                    check_ignore_active=True)


def test_grad_zero_positive_batch():
    """A batch with no GT at all: orientation losses are exactly zero and
    gradients must be finite zeros (not NaNs from the where-guarded
    divisions), xy/wh/cls grads zero, noobj grads dense."""
    _pred_grad_case(seed=2, n_insts=(0, 0), ignore_thresh=0.5)


@pytest.mark.parametrize("bn_mode", ["frozen", "train"])
def test_grad_wrt_params_through_model(bn_mode):
    """End-to-end d(weighted total loss)/d(params) through OrienMaskFPNPlus
    with shared converted weights — the exact training gradient.  frozen =
    eval-mode BN everywhere (backbone_batchnorm_eval, reference
    model/base.py:71-77); train = batch-stat BN."""
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.models.convert import torch_to_variables
    from torch_ref import TorchOrienMaskFPNPlus

    torch.manual_seed(3)
    tmodel = TorchOrienMaskFPNPlus(num_anchors=3, num_classes=NUM_CLASSES).double()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_(1, 0.2)
            m.bias.data.normal_(0, 0.2)
    # f32 twin: measures torch's OWN f32-vs-f64 gradient noise through the
    # 53-layer chain (train-mode BN backward is cancellation-heavy); the JAX
    # f32 grads are held to a bound calibrated on that noise, so the test
    # stays sharp for semantic errors (O(1) relative) without flaking on
    # accumulation-order differences.
    tmodel32 = TorchOrienMaskFPNPlus(num_anchors=3, num_classes=NUM_CLASSES)
    tmodel32.load_state_dict({k: v.float() for k, v in tmodel.state_dict().items()})
    for tm in (tmodel, tmodel32):
        if bn_mode == "frozen":
            tm.eval()
        else:
            tm.train()
    jmodel = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=NUM_CLASSES)
    variables = torch_to_variables(jmodel, tmodel.state_dict())
    variables = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float32)),
                             variables)

    rng = np.random.default_rng(4)
    target, (tb, tc, tm), _ = _random_batch(rng, (4, 2))
    x = rng.standard_normal((2, *IMAGE, 3)).astype(np.float32)
    jloss, tloss = _make_losses(0.5)

    # ---- torch ----------------------------------------------------------
    def torch_grads(tm_model, t_loss, dtype):
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2)).to(dtype)
        t_out = tm_model(tx)
        s, _ = t_loss(t_out, [g.to(dtype) for g in tb], tc,
                      [g.to(dtype) for g in tm])
        s.backward()
        grad_sd = {}
        for name, p in tm_model.named_parameters():
            grad_sd[name] = (torch.zeros_like(p) if p.grad is None else p.grad).float()
        for name, buf in tm_model.named_buffers():  # running stats: no grads
            grad_sd[name] = torch.zeros_like(buf).float()
        return s, torch_to_variables(jmodel, grad_sd)["params"]

    kw = dict(grid_size=[list(g) for g in GRIDS], image_size=list(IMAGE),
              anchors=ANCHORS, anchor_mask=MASKS, num_classes=NUM_CLASSES,
              center_region=0.6, valid_region=0.6, label_smooth=False,
              obj_ignore_threshold=0.5, weight=[1, 1, 1, 1, 1, 20, 20])
    tloss32 = TorchOrienMaskMultiScaleLoss(dtype=torch.float32, **kw)
    t_sum, t_grad_tree = torch_grads(tmodel, tloss, torch.float64)
    _, t32_grad_tree = torch_grads(tmodel32, tloss32, torch.float32)

    # ---- jax ------------------------------------------------------------
    train = bn_mode == "train"

    def loss_fn(params):
        out, _ = jmodel.forward(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=train)
        s, _, _ = jloss(out, target, training=True)
        return s

    j_sum, j_grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])

    np.testing.assert_allclose(float(j_sum), float(t_sum), rtol=5e-3)
    flat_j, tree = jax.tree.flatten_with_path(j_grads)
    flat_t = jax.tree.leaves(t_grad_tree)
    flat_t32 = jax.tree.leaves(t32_grad_tree)
    assert len(flat_j) == len(flat_t) == len(flat_t32)
    for (path, gj), gt, gt32 in zip(flat_j, flat_t, flat_t32):
        name = jax.tree_util.keystr(path)
        ref = np.asarray(gt, np.float64)
        got = np.asarray(gj, np.float64)
        scale = max(np.abs(ref).max(), 1e-8)
        # torch's own f32 error on this tensor = the accumulation-noise floor
        noise = np.abs(np.asarray(gt32, np.float64) - ref).max()
        bound = 10.0 * noise + 1e-3 * scale
        err = np.abs(got - ref).max()
        assert err <= bound, (
            f"{bn_mode}: grad {name}: |jax-f64| max {err:.4g} exceeds "
            f"10*torch-f32-noise+1e-3*scale = {bound:.4g} "
            f"(noise {noise:.4g}, scale {scale:.4g})")
