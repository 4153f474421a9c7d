"""Profile the detect stage (candidate selection + decode + NMS fixpoint) on
the real chip — VERDICT r3 task 3: the only non-conv chunk left in the fused
frame (~0.63 ms in-program of 2.38 ms at 544² bs=1), and the suspect for
batch-16 (450 img/s) trailing batch-8 (466).

Measures, per batch size, separately-jitted subprograms over the same random
head tensors (each timing = median over windows of pipelined calls, sync at
window end — the bench.py methodology):

  flat      — _flat_head only (scale-major (P, 5+C) buffer materialization)
  select    — _flat_head + _select_candidates (top-k included)
  decode    — + _decode_rows on the selected 400
  nms       — + batched_class_nms fixpoint  (== full _detect_image)
  rounds    — fixpoint iteration count actually hit (device count, random
              and worst-ish score patterns)

Run: tools/tpu_run.sh "tools/bench_detect.py" /tmp/bench_detect.log 240 3 1200
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_pp(size=544, **kw):
    from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
    from orienmask_tpu.ops.postprocess import OrienMaskYOLOPostProcess

    return OrienMaskYOLOPostProcess(
        grid_size=[[size // 32] * 2, [size // 16] * 2, [size // 8] * 2],
        image_size=[size, size], anchors=ANCHORS_YOLOV4,
        anchor_mask=ANCHORS_MASK, num_classes=80, conf_thresh=0.005,
        nms=dict(threshold=0.5), nms_pre=400, nms_post=100,
        orien_thresh=0.3, pack_masks=True, **kw)


def make_heads(pp, batch, size, seed=0):
    rng = np.random.default_rng(seed)
    heads = []
    for (nh, nw), mask in zip(pp.grid_hw, pp.anchor_mask):
        heads.append(jnp.asarray(rng.standard_normal(
            (batch, nh, nw, len(mask) * 85)).astype(np.float32)))
    return heads


def timeit(fn, args, n_frames, n_windows=5, warmup=2):
    """Pipelined window timing, bench.py-style: EVERY call's outputs are
    kept alive and the window blocks on all of them.  Blocking only on the
    last call lets the async relay client discard (never execute) the
    dropped-output computations — measured: every stage reads ~0.02 ms
    'dispatch-only' regardless of workload.  n_frames is capped so the
    retained outputs stay under ~2.5 GB of HBM."""
    out_bytes = sum(
        np.prod(l.shape) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(jax.eval_shape(fn, *args)))
    n_frames = max(10, min(n_frames, int(2.5e9 / max(out_bytes, 1))))
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n_frames)]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / n_frames)
        del outs
    times.sort()
    return times[len(times) // 2], times[0], times[-1]


def main():
    dev = jax.devices()[0]
    print(f"[bench_detect] device: {dev}")
    size = 544

    for batch in (1, 8, 16):
        # default pp pinned to the XLA top-k so the flat/select/decode/native
        # rows measure the round-4 formulation; the pallas row is the A/B
        pp = make_pp(size, use_pallas_topk=False)
        heads = make_heads(pp, batch, size)

        def flat_only(hs):
            return jax.vmap(pp._flat_head)(hs)

        def select(hs):
            flat = jax.vmap(pp._flat_head)(hs)
            return jax.vmap(pp._select_candidates)(flat)

        def select_decode(hs):
            flat = jax.vmap(pp._flat_head)(hs)
            det_idx, cls_idx, scores, valid = jax.vmap(
                pp._select_candidates)(flat)
            boxes = jax.vmap(pp._decode_rows)(
                jax.vmap(lambda f, i: f[i])(flat, det_idx), det_idx)
            return boxes, cls_idx, scores, valid

        def full_detect(hs):
            return jax.vmap(pp._detect_image)(hs)

        pp_pl = make_pp(size, use_pallas_topk=True)
        pp_xla = make_pp(size, use_pallas_topk=False)

        def detect_pallas(hs):
            return jax.vmap(pp_pl._detect_image)(hs)

        def detect_xla_topk(hs):
            return jax.vmap(pp_xla._detect_image)(hs)

        def detect_flatbuf(hs):
            # round-3 formulation: materialized (B, P, 5+C) transposed buffer
            from orienmask_tpu.ops.nms import NEG_INF, batched_class_nms

            def one(pbs):
                flat = pp._flat_head(pbs)
                det_idx, cls_idx, scores, valid = pp._select_candidates(flat)
                cand_boxes = pp._decode_rows(flat[det_idx], det_idx)
                nms_scores = jnp.where(valid, scores, NEG_INF)
                keep_idx, keep_valid = batched_class_nms(
                    cand_boxes, nms_scores, cls_idx, pp.nms_post,
                    pp.nms_threshold)
                return cand_boxes[keep_idx], keep_valid

            return jax.vmap(one)(hs)

        n_frames = max(50, 400 // batch)
        rows = []
        for name, fn in (("flat", flat_only), ("select", select),
                         ("sel+decode", select_decode),
                         ("detect(flatbuf)", detect_flatbuf),
                         ("detect(native)", full_detect),
                         ("detect(xla-topk)", detect_xla_topk),
                         ("detect(pallas-topk)", detect_pallas)):
            jfn = jax.jit(fn)
            med, lo, hi = timeit(jfn, (heads,), n_frames)
            per_img = med / batch * 1e3
            rows.append((name, med * 1e3, per_img, lo * 1e3, hi * 1e3))
            print(f"[B={batch:2d}] {name:16s} {med*1e3:7.3f} ms/call "
                  f"({per_img:6.3f} ms/img)  [{lo*1e3:.3f}..{hi*1e3:.3f}]")
        # stage deltas (in-pipeline marginal costs)
        print(f"[B={batch:2d}] marginal: flat={rows[0][1]:.3f} "
              f"select={rows[1][1]-rows[0][1]:.3f} "
              f"decode={rows[2][1]-rows[1][1]:.3f} "
              f"nms={rows[3][1]-rows[2][1]:.3f} ms/call")

    # fixpoint round count on realistic candidates
    from orienmask_tpu.ops.boxes import bbox_ious
    from orienmask_tpu.ops.nms import NEG_INF

    pp = make_pp(size)
    heads = make_heads(pp, 1, size)
    flat = pp._flat_head([h[0] for h in heads])
    det_idx, cls_idx, scores, valid = pp._select_candidates(flat)
    boxes = pp._decode_rows(flat[det_idx], det_idx)
    nms_scores = jnp.where(valid, scores, NEG_INF)

    def count_rounds(bxs, scs, cls):
        off = cls.astype(bxs.dtype)[:, None] * 2.0
        shifted = jnp.concatenate([bxs[:, :2] + off, bxs[:, 2:4]], axis=1)
        n = shifted.shape[0]
        order = jnp.argsort(-scs)
        sb = shifted[order]
        sv = scs[order] > NEG_INF / 2
        iou = bbox_ious(sb, sb)
        row = jnp.arange(n)
        sup = ((iou >= 0.5) & (row[:, None] < row[None, :])
               & sv[:, None] & sv[None, :]).astype(jnp.float32)

        def cond(st):
            return st[1]

        def body(st):
            kept, _, r = st
            dom = (kept.astype(jnp.float32) @ sup) > 0
            new = sv & ~dom
            return new, jnp.any(new != kept), r + 1

        _, _, rounds = jax.lax.while_loop(
            cond, body, (sv, jnp.array(True), jnp.array(0)))
        return rounds

    r = jax.jit(count_rounds)(boxes, nms_scores, cls_idx)
    print(f"[rounds] fixpoint rounds on random-weight candidates: {int(r)}")


if __name__ == "__main__":
    main()
