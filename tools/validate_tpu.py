"""On-chip validation suite: run the numerics-critical kernels on REAL TPU
hardware and compare against independent formulations.

The CPU test suite (tests/) proves semantics against numpy/torch oracles, but
Pallas interpret mode does not exercise Mosaic lowering and XLA:TPU layouts
differ from XLA:CPU.  This tool closes that gap; run it after touching any
kernel or model-structure code:

    tools/tpu_run.sh tools/validate_tpu.py /tmp/validate_tpu.log 240 3 1200

Checks (each prints PASS/FAIL, exit code 1 on any FAIL):
  1. s2d-stem forward parity: DarkNet53 phase-space stem vs per-layer path
     (eval + folded) on-chip.
  2. Pallas orientation painter (packed masks) vs the XLA painter: pos/neg
     canvases must be bit-exact; torien within the XLA path's approximate-
     division tolerance.
  3. Pallas mask assembly vs the XLA broadcast-compare formulation.
  4. Full fused inference pipeline vs an unfused forward+postprocess.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

t0 = time.time()
FAILURES = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{time.time()-t0:6.1f}s] {status} {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def check_s2d_stem():
    from orienmask_tpu.models.darknet import DarkNet53
    from orienmask_tpu.models.layers import default_ctx

    m_std = DarkNet53(s2d_stem=False)
    m_s2d = DarkNet53(s2d_stem=True)
    params, stats = m_std.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 160, 3), jnp.float32)

    @jax.jit
    def run(params, stats, x):
        ev = default_ctx(train=False)
        a, _ = m_std.apply(params, stats, x, ev)
        b, _ = m_s2d.apply(params, stats, x, ev)
        folded = m_std.fold(params, stats)
        fa = m_std.apply_folded(folded, x, ev)
        fb = m_s2d.apply_folded(folded, x, ev)
        return a, b, fa, fb

    a, b, fa, fb = run(params, stats, x)
    d_eval = max(float(jnp.max(jnp.abs(p - q))) for p, q in zip(a, b))
    d_fold = max(float(jnp.max(jnp.abs(p - q))) for p, q in zip(fa, fb))
    check("s2d-stem eval parity", d_eval < 2e-3, f"maxdiff={d_eval:.2e}")
    check("s2d-stem folded parity", d_fold < 2e-3, f"maxdiff={d_fold:.2e}")


def _random_scene(size, B=2, N=40, seed=3):
    h, w = size if isinstance(size, tuple) else (size, size)
    rng = np.random.default_rng(seed)
    bbox = np.zeros((B, N, 4), np.float32)
    bbox[..., :2] = rng.uniform(0.15, 0.85, (B, N, 2))
    bbox[..., 2:] = rng.uniform(0.05, 0.5, (B, N, 2))
    valid = rng.uniform(size=(B, N)) < 0.5
    masks = np.zeros((B, N, h, w), bool)
    for b in range(B):
        for n in range(N):
            cx, cy, w_, h_ = bbox[b, n]
            x1, x2 = int((cx - w_ / 2) * w), int((cx + w_ / 2) * w)
            y1, y2 = int((cy - h_ / 2) * h), int((cy + h_ / 2) * h)
            y1, y2 = max(y1, 0), min(y2, h)
            x1, x2 = max(x1, 0), min(x2, w)
            masks[b, n, y1:y2, x1:x2] = \
                rng.uniform(size=(y2 - y1, x2 - x1)) < 0.7
    return bbox, valid, masks


def check_painter(size=(544, 544)):
    from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
    from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss
    from orienmask_tpu.ops.maskops import pack_bits

    h, w = size
    grid = [[h // 32, w // 32], [h // 16, w // 16], [h // 8, w // 8]]
    kw = dict(grid_size=grid, image_size=[h, w], anchors=ANCHORS_YOLOV4,
              anchor_mask=ANCHORS_MASK, num_classes=80,
              obj_ignore_threshold=0.7, weight=[1, 1, 1, 1, 1, 20, 20],
              scales_weight=[1, 1, 1], target_chunk=8)
    l_pal = OrienMaskYOLOMultiScaleLoss(painter_impl="pallas", **kw)
    l_xla = OrienMaskYOLOMultiScaleLoss(painter_impl="xla", **kw)
    bbox, valid, masks = _random_scene((h, w))
    packed = pack_bits(jnp.asarray(masks))

    f_pal = jax.jit(l_pal._paint_shared_batch)
    f_xla = jax.jit(l_xla._paint_shared_batch)
    p1 = f_pal(jnp.asarray(bbox), jnp.asarray(valid), packed)
    p2 = f_xla(jnp.asarray(bbox), jnp.asarray(valid), packed)
    d_pos = float(jnp.max(jnp.abs(p1[0] - p2[0])))
    d_neg = float(jnp.max(jnp.abs(p1[1] - p2[1])))
    d_tor = float(jnp.max(jnp.abs(p1[2] - p2[2])))
    tag = f"{h}x{w}"
    check(f"painter pos bit-exact {tag}", d_pos == 0.0, f"maxdiff={d_pos:.2e}")
    check(f"painter neg bit-exact {tag}", d_neg == 0.0, f"maxdiff={d_neg:.2e}")
    # XLA path divides approximately on TPU; the Pallas kernel uses exact
    # reciprocals — allow the known XLA-side tolerance.
    check(f"painter torien tolerance {tag}", d_tor < 0.1, f"maxdiff={d_tor:.2e}")


def check_mask_kernel(size=544):
    from orienmask_tpu.ops.pallas_masks import assemble_masks

    rng = np.random.default_rng(5)
    A, K = 9, 100
    field = rng.standard_normal((A, 2, size, size)).astype(np.float32)
    boxes = np.zeros((K, 4), np.float32)
    boxes[:, :2] = rng.uniform(0.2, 0.8, (K, 2))
    boxes[:, 2:] = rng.uniform(0.05, 0.6, (K, 2))
    aidx = rng.integers(0, A, K).astype(np.int32)
    na = rng.uniform(0.02, 0.5, (A, 2)).astype(np.float32)

    got = assemble_masks(jnp.asarray(field), jnp.asarray(boxes),
                         jnp.asarray(na[aidx]), jnp.asarray(aidx))

    def ref(field, boxes, awh, aidx):
        ys = jnp.arange(size, dtype=jnp.float32)[:, None] / size
        xs = jnp.arange(size, dtype=jnp.float32)[None, :] / size

        def one(a, wh, box):
            fx = field[a, 0] * (wh[0] * 0.5) + xs
            fy = field[a, 1] * (wh[1] * 0.5) + ys
            return (jnp.abs(fx - box[0]) < 0.3 * box[2]) \
                & (jnp.abs(fy - box[1]) < 0.3 * box[3])

        return jax.vmap(one)(aidx, awh, boxes)

    want = jax.jit(ref)(jnp.asarray(field), jnp.asarray(boxes),
                        jnp.asarray(na[aidx]), jnp.asarray(aidx))
    diff = int(jnp.sum(got.astype(jnp.int32) != want.astype(jnp.int32)))
    check("mask kernel vs XLA compare", diff == 0, f"mismatched px={diff}")

    # in-kernel MXU bit-packing vs XLA pack of the plain kernel's output
    from orienmask_tpu.ops.maskops import pack_bits
    from orienmask_tpu.ops.pallas_masks import assemble_masks_bitpacked

    packed = assemble_masks_bitpacked(
        jnp.asarray(field), jnp.asarray(boxes), jnp.asarray(na[aidx]),
        jnp.asarray(aidx))
    want_packed = pack_bits(got.astype(bool))
    dp = int(jnp.sum(packed.astype(jnp.int32) != want_packed.astype(jnp.int32)))
    check("bit-packing mask kernel", dp == 0, f"mismatched bytes={dp}")


def check_pipeline():
    from orienmask_tpu.config import (
        orienmask_yolo_coco_544_anchor4_fpn_plus_infer as cfg,
    )
    import orienmask_tpu.models as mm
    from orienmask_tpu.pipeline import InferencePipeline
    from orienmask_tpu.trainer.builder import build, build_postprocess, \
        build_transform

    from orienmask_tpu.models.layers import default_ctx

    mc = dict(cfg["model"])
    mc["pretrained"] = None
    model = build(mc, mm)
    variables = model.init_variables(jax.random.PRNGKey(0))
    transform = build_transform(cfg["transform"])
    pp_packed = build_postprocess(cfg["postprocess"], pack_masks=True)
    pp_plain = build_postprocess(cfg["postprocess"], pack_masks=False)
    pipe = InferencePipeline(model, variables, transform, pp_packed,
                             compute_dtype="float32")

    img = np.random.default_rng(0).integers(0, 255, (1, 480, 640, 3), np.uint8)
    fused = pipe(img)[0][0]

    # Unfused: the SAME folded pieces as separate programs.  Caveat: with
    # random weights every candidate score is identical to ~1e-6 (sigmoids
    # of near-zero logits), so detection RANK is pure fusion-reassociation
    # noise — row-wise equality is meaningless.  This is a smoke-level
    # consistency check: shapes, class set, the sorted score multiset, and
    # a bound on strict-inequality mask boundary flips (exact formulation
    # equality on identical inputs is proven by check 3).
    x = transform.apply(jnp.asarray(img, jnp.float32))
    ctx = default_ctx(train=False, dtype=jnp.float32)
    predict = jax.jit(
        lambda f, xx: model.apply_folded(f, xx, ctx))(pipe.folded, x)
    plain = pp_plain(predict)[0]
    n = fused["bbox"].shape[0]
    px = n * pp_plain.image_h * pp_plain.image_w
    mask_mismatch = (int(np.sum(fused["mask"] != plain["mask"]))
                     if fused["mask"].shape == plain["mask"].shape else px)
    scores_ok = np.allclose(np.sort(fused["bbox"][:, 4]),
                            np.sort(plain["bbox"][:, 4]), atol=1e-5)
    ok = (fused["bbox"].shape == plain["bbox"].shape
          and scores_ok
          and set(fused["cls"].tolist()) == set(plain["cls"].tolist())
          and mask_mismatch <= px // 1000)
    check("fused pipeline ~ unfused pieces (f32, rank-agnostic)", ok,
          f"n={n} mask_mismatch_px={mask_mismatch}/{px}")


def check_torch_oracle_544():
    """Full-resolution torch-oracle golden ON CHIP (VERDICT r1 item 6).

    The CPU suite proves 160^2 parity (tests/test_golden_asset.py); this
    closes the resolution/backend gap: the 544^2 model + postprocess on the
    REAL asset image, f32 and bf16 on-chip forward vs the torch oracle
    (generated live, ~7s on this host) + sequential numpy postprocess.

    With seeded random weights detection scores cluster within ~1e-3, so
    detections are compared rank-agnostically: greedy (cls, IoU>=0.5,
    score-close) bipartite matching, requiring >=90% (f32) / >=80% (bf16)
    matched and bounded mask disagreement inside matched pairs.
    """
    import cv2
    import torch

    tests_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests")
    sys.path.insert(0, tests_dir)
    from numpy_ref import reference_postprocess
    from torch_ref import TorchOrienMaskFPNPlus

    from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.models.convert import torch_to_variables
    from orienmask_tpu.models.layers import default_ctx
    from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess

    SIZE = 544
    asset = "/root/reference/assets/000000163126.jpg"
    img = cv2.cvtColor(cv2.imread(asset), cv2.COLOR_BGR2RGB)
    x = cv2.resize(img, (SIZE, SIZE), interpolation=cv2.INTER_LINEAR)
    x = x.astype(np.float32) / 255.0

    torch.manual_seed(3)
    tmodel = TorchOrienMaskFPNPlus(num_anchors=3, num_classes=80).eval()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    # Spread the head logits: untouched random weights give obj/cls logits
    # within ~1e-3 of each other, so every candidate score ties and the NMS
    # keep-set differs between ANY two compilations (pure rank noise, see
    # this file's gotchas). Amplified final convs + random biases give
    # distinct scores, making the detection comparison meaningful.
    with torch.no_grad():
        for head in (tmodel.bbox_head8, tmodel.bbox_head16, tmodel.bbox_head32):
            head[1].weight.mul_(6.0)
            head[1].bias.normal_(0, 1.0)
    jmodel = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    variables = torch_to_variables(jmodel, tmodel.state_dict())
    variables = jax.device_put(variables, jax.devices()[0])

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(2, 0, 1))[None])
    preds_np = [
        (p[0][0].numpy().transpose(1, 2, 0), p[1][0].numpy().transpose(1, 2, 0))
        for p in tout
    ]
    print(f"[{time.time()-t0:6.1f}s] torch oracle forward done", flush=True)

    grids = [[SIZE // 32] * 2, [SIZE // 16] * 2, [SIZE // 8] * 2]
    pp_kw = dict(grid_size=grids, image_size=[SIZE, SIZE],
                 anchors=ANCHORS_YOLOV4, anchor_mask=ANCHORS_MASK,
                 num_classes=80, conf_thresh=0.05, nms=dict(threshold=0.5),
                 nms_pre=400, nms_post=100, orien_thresh=0.3,
                 topk_mode="exact")
    ref = reference_postprocess(
        preds_np, grids, (SIZE, SIZE), ANCHORS_YOLOV4, ANCHORS_MASK, 80,
        conf_thresh=0.05, nms_thresh=0.5, nms_pre=400, nms_post=100,
        orien_thresh=0.3,
    )
    print(f"[{time.time()-t0:6.1f}s] numpy reference postprocess: "
          f"{ref['bbox'].shape[0]} dets", flush=True)

    def match_rate(got, tol_score, top_k=50):
        """Greedy rank-agnostic matching: same cls, IoU>=0.5, close score.

        The rate is measured over the oracle's ``top_k`` highest-scored
        detections: candidates near the nms_post keep-boundary reorder under
        ~1e-3 cross-backend logit differences (both keep-sets are 'correct'
        there), so only the confident head of the list is a meaningful
        parity signal."""
        gb, rb = got["bbox"], ref["bbox"]
        top = np.argsort(-rb[:, 4])[:top_k]
        used = np.zeros(rb.shape[0], bool)
        matched = 0
        mask_err = []
        for i in range(gb.shape[0]):
            best, bj = -1.0, -1
            for j in top:
                if used[j] or got["cls"][i] != ref["cls"][j]:
                    continue
                if abs(gb[i, 4] - rb[j, 4]) > tol_score:
                    continue
                bx = gb[i, :4]
                rx = rb[j, :4]
                lo = np.maximum(bx[:2] - bx[2:] / 2, rx[:2] - rx[2:] / 2)
                hi = np.minimum(bx[:2] + bx[2:] / 2, rx[:2] + rx[2:] / 2)
                inter = np.prod(np.clip(hi - lo, 0, None))
                union = bx[2] * bx[3] + rx[2] * rx[3] - inter
                iou = inter / union if union > 0 else 0.0
                if iou > best:
                    best, bj = iou, j
            if best >= 0.5:
                used[bj] = True
                matched += 1
                mask_err.append(
                    float((got["mask"][i] ^ ref["mask"][bj]).mean()))
        rate = matched / min(top_k, max(1, rb.shape[0]))
        return rate, (float(np.mean(mask_err)) if mask_err else 1.0)

    # forward tolerances: heads are amplified 6x (see above), so the raw
    # cross-backend logit difference scales with it — measured 1.3e-3
    # unamplified f32, 6e-3 amplified; 7.7e-3 bf16 amplified.
    for dtype, min_rate, fwd_tol in [(jnp.float32, 0.9, 2e-2),
                                     (jnp.bfloat16, 0.85, 6e-2)]:
        ctx = default_ctx(train=False, dtype=dtype)

        @jax.jit
        def fwd(v, xx):
            return jmodel.apply(v["params"], v["batch_stats"], xx, ctx)[0]

        out = fwd(variables, jnp.asarray(x)[None])
        # forward parity on the bbox-head logits
        d_fwd = max(
            float(jnp.max(jnp.abs(out[i][0][0] - preds_np[i][0])))
            for i in range(3)
        )
        pp = OrienMaskYOLOPostProcess(**pp_kw)
        got = pp(out)[0]
        rate, mask_err = match_rate(
            {"bbox": got["bbox"], "cls": got["cls"], "mask": got["mask"]},
            tol_score=0.02 if dtype == jnp.float32 else 0.1)
        name = "f32" if dtype == jnp.float32 else "bf16"
        check(f"544 oracle forward {name}", d_fwd < fwd_tol,
              f"max_logit_diff={d_fwd:.2e} (tol {fwd_tol})")
        check(f"544 oracle detections {name}", rate >= min_rate,
              f"match_rate={rate:.2f} ({got['bbox'].shape[0]} vs "
              f"{ref['bbox'].shape[0]} dets) mask_err={mask_err:.4f}")
        if dtype == jnp.float32:
            check(f"544 oracle masks {name}", mask_err < 1e-2,
                  f"mean mask diff fraction={mask_err:.4f}")


def check_pallas_topk():
    """exact_topk (ops/pallas_topk.py) vs lax.top_k, compiled Mosaic path —
    the detect-stage selection shapes plus the adversarial tie patterns
    (thousands of equal -1.0 sentinels fighting for the tail by index)."""
    from orienmask_tpu.ops.pallas_topk import exact_topk

    rng = np.random.default_rng(0)
    cases = [
        ("random18207", rng.standard_normal(18207).astype(np.float32), 400),
        ("random32000", rng.standard_normal(32000).astype(np.float32), 400),
    ]
    x = np.full(18207, -1.0, np.float32)
    pos = rng.choice(18207, 23, replace=False)
    x[pos] = rng.uniform(0.005, 1.0, 23).astype(np.float32)
    cases.append(("sentinel_ties", x, 400))
    cases.append(("quantized_ties",
                  rng.choice([0.1, 0.2, 0.3, -1.0], 32000)
                  .astype(np.float32), 400))
    for name, arr, k in cases:
        xj = jnp.asarray(arr)
        want_v, want_i = jax.jit(
            lambda a: jax.lax.top_k(a, k))(xj)
        got_v, got_i = exact_topk(xj, k)
        ok = (np.array_equal(np.asarray(want_v), np.asarray(got_v))
              and np.array_equal(np.asarray(want_i), np.asarray(got_i)))
        check(f"pallas_topk/{name}", ok)
    # batched, as _detect_image uses it under vmap
    xb = jnp.asarray(rng.standard_normal((4, 18207)), jnp.float32)
    want_v, want_i = jax.jit(jax.vmap(lambda a: jax.lax.top_k(a, 400)))(xb)
    got_v, got_i = jax.jit(jax.vmap(lambda a: exact_topk(a, 400)))(xb)
    ok = (np.array_equal(np.asarray(want_v), np.asarray(got_v))
          and np.array_equal(np.asarray(want_i), np.asarray(got_i)))
    check("pallas_topk/vmap4", ok)


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    checks = [
        ("topk", check_pallas_topk),
        ("s2d", check_s2d_stem),
        ("painter", check_painter),
        ("painter_nonsquare", lambda: check_painter(size=(160, 224))),
        ("mask_kernel", check_mask_kernel),
        ("pipeline", check_pipeline),
        ("oracle544", check_torch_oracle_544),
    ]
    print(f"[{time.time()-t0:6.1f}s] devices: {jax.devices()}", flush=True)
    for name, fn in checks:
        if only and only not in name:
            continue
        fn()
    n = len(FAILURES)
    print(f"[{time.time()-t0:6.1f}s] {'ALL PASS' if n == 0 else f'{n} FAILURES: {FAILURES}'}")
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main()
