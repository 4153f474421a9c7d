"""Static-shape greedy NMS for XLA.

The reference implements greedy NMS as C++/CUDA extensions (eval/src/nms_cpu.cpp,
nms_kernel.cu) invoked per image with dynamic candidate counts, syncing device->host.
On TPU we reformulate it as a *fixed-iteration selection loop* fully inside the jit
program: because the final stage keeps only the ``nms_post`` highest-scoring survivors
(reference eval/orienmask_yolo_postprocess.py:150-154), the kept set equals the first
``nms_post`` boxes chosen by greedy max-score selection.  Each iteration picks the
current argmax and suppresses its >=threshold-IoU neighbors — ``nms_post`` (100)
iterations of cheap VPU work over a ``nms_pre`` (400) candidate buffer, no host sync,
no dynamic shapes.

Multi-class NMS uses the class-offset trick of reference ``batched_nms``
(eval/function.py:77-103): boxes of different classes are translated apart so a single
class-agnostic pass suppresses only within-class overlaps.
"""

import jax
import jax.numpy as jnp

from .boxes import iou_one_vs_many

NEG_INF = -1e30


def greedy_nms_select(boxes, scores, n_keep, iou_threshold=0.5):
    """Select up to ``n_keep`` boxes by greedy max-score NMS.

    Args:
      boxes: (n, 4) cxcywh (already class-offset for multi-class use).
      scores: (n,) — invalid candidates must carry ``NEG_INF``.
      n_keep: static int, number of selection iterations.
      iou_threshold: suppress when IoU >= threshold (matches reference ``>=``,
        nms_cpu.cpp:60).

    Returns:
      keep_idx: (n_keep,) int32 indices into the candidate buffer (descending score).
      keep_valid: (n_keep,) bool.
    """
    n = boxes.shape[0]

    def body(t, carry):
        live_scores, keep_idx, keep_valid = carry
        i = jnp.argmax(live_scores)
        s = live_scores[i]
        valid = s > NEG_INF / 2
        ious = iou_one_vs_many(boxes[i], boxes)
        suppress = (ious >= iou_threshold) | (jnp.arange(n) == i)
        live_scores = jnp.where(valid & suppress, NEG_INF, live_scores)
        keep_idx = keep_idx.at[t].set(i.astype(jnp.int32))
        keep_valid = keep_valid.at[t].set(valid)
        return live_scores, keep_idx, keep_valid

    init = (
        scores,
        jnp.zeros((n_keep,), jnp.int32),
        jnp.zeros((n_keep,), bool),
    )
    _, keep_idx, keep_valid = jax.lax.fori_loop(0, n_keep, body, init)
    return keep_idx, keep_valid


def greedy_nms_fixpoint(boxes, scores, n_keep, iou_threshold=0.5,
                        presorted=False):
    """Greedy NMS via suppression-closure fixpoint — the TPU-fast formulation.

    In descending-score order, the greedy kept set satisfies
    ``kept[j] = not any(i < j, kept[i], IoU(i,j) >= t)``.  Iterating that
    recurrence from ``kept = all`` converges to the unique greedy solution in
    at most the suppression-chain depth (a handful of rounds in practice, 3-8);
    each round is one dense (n, n) masked reduction instead of a sequential
    per-box scan — hundreds of tiny loop steps collapse into a few fused
    matrix ops.  Exactness: a ``while_loop`` runs until the fixpoint, so the
    result is bit-identical to the sequential reference algorithm.

    Returns (keep_idx, keep_valid) like ``greedy_nms_select``: the top
    ``n_keep`` surviving candidates in descending score order.

    ``presorted=True``: the caller guarantees ``scores`` is already
    descending (the detect stage feeds the output of a top-k here, so the
    argsort is the identity permutation) — skips the sort and both gathers.
    Bit-identical: ``jnp.argsort`` is stable, so on sorted input it IS the
    identity, ties included (tests/test_nms.py).
    """
    n = boxes.shape[0]
    if presorted:
        order = jnp.arange(n)
        sboxes = boxes
        svalid = scores > NEG_INF / 2
    else:
        order = jnp.argsort(-scores)
        sboxes = boxes[order]
        svalid = scores[order] > NEG_INF / 2

    from .boxes import bbox_ious

    iou = bbox_ious(sboxes, sboxes)
    row = jnp.arange(n)
    # suppress[i, j]: higher-ranked valid i can suppress j
    suppress = (iou >= iou_threshold) & (row[:, None] < row[None, :]) \
        & svalid[:, None] & svalid[None, :]
    suppress_f = suppress.astype(jnp.float32)

    def cond(state):
        kept, changed = state
        return changed

    def body(state):
        kept, _ = state
        dominated = (kept.astype(jnp.float32) @ suppress_f) > 0
        new_kept = svalid & ~dominated
        return new_kept, jnp.any(new_kept != kept)

    kept, _ = jax.lax.while_loop(cond, body, (svalid, jnp.array(True)))

    ranked = jnp.where(kept, -row, -(n + row))  # kept first, by ascending rank
    _, top = jax.lax.top_k(ranked, n_keep)
    keep_valid = kept[top]
    keep_idx = order[top].astype(jnp.int32)
    return keep_idx, keep_valid


def batched_class_nms(boxes, scores, classes, n_keep, iou_threshold=0.5,
                      normalized=True, method="fixpoint", presorted=False):
    """Class-wise greedy NMS via coordinate offsets (reference batched_nms).

    ``normalized=True`` uses max_coordinate=1.5 so the per-class offset is
    ``cls * 2.0`` (eval/function.py:96-99).
    """
    max_coordinate = 1.5 if normalized else jnp.max(boxes[:, :2]) + jnp.max(boxes[:, 2:4]) / 2
    offsets = classes.astype(boxes.dtype)[:, None] * (max_coordinate + 0.5)
    shifted = jnp.concatenate([boxes[:, :2] + offsets, boxes[:, 2:4]], axis=1)
    if method == "fixpoint":
        return greedy_nms_fixpoint(shifted, scores, n_keep, iou_threshold,
                                   presorted=presorted)
    return greedy_nms_select(shifted, scores, n_keep, iou_threshold)


def nms_keep_mask(boxes, scores, valid, iou_threshold=0.5):
    """Full greedy NMS keep mask over all candidates (sequential semantics of
    nms_cpu.cpp:38-61) — used for parity tests and as a host-free general op.

    Returns a boolean keep mask aligned with the input order.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, NEG_INF))
    sboxes = boxes[order]
    svalid = valid[order]

    def body(i, keep):
        ious = iou_one_vs_many(sboxes[i], sboxes)
        later = jnp.arange(n) > i
        suppress = later & (ious >= iou_threshold)
        return jnp.where(keep[i] & svalid[i], keep & ~suppress, keep)

    keep_sorted = jax.lax.fori_loop(0, n, body, svalid)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep
