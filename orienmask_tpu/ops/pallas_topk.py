"""Exact top-k as a Pallas TPU kernel — the detect stage's selection engine.

Why: the two candidate-selection top-ks in ``ops/postprocess.py`` (top
``nms_pre``=400 of the 18207 per-detection max scores, then top 400 of the
400x80 (det, class) pair scores) are the largest non-conv cost in the fused
inference frame.  ``jax.lax.top_k`` lowers to a full sort on TPU — ~0.8 ms
standalone for the pair at 544² even with the split-merge trick — yet the
data is only ~73-128 KB: selection is compute-light and should be
VMEM-resident.  This kernel computes an EXACT top-k in two cheap phases:

  1. *radix threshold search*: floats are bitcast to sign-biased int32 keys
     (monotone: ``a >= b`` in float, NaN excluded, iff ``key(a) >= key(b)``
     signed), and the k-th largest key is found by building the 32-bit
     threshold MSB-first — 32 masked count-reductions over the VMEM-resident
     block, no sort;
  2. *per-column compaction*: with the threshold known, the selected mask is
     ``key > T``  plus  the first ``k - count(key > T)`` elements with
     ``key == T`` in flat-index order (exactly ``lax.top_k``'s lower-index
     tie-break).  Selected elements compact within each 128-lane column via
     rank-match reduction (a 128-iteration loop of masked sums — VPU work,
     no scatter), giving (value, flat index) panels plus per-column counts.

The XLA glue then gathers the k winners (a searchsorted over the per-column
counts) and orders them with a tiny k-element ``lax.top_k`` whose
position-based tie-break equals flat-index order by construction.  The
result is BIT-IDENTICAL to ``jax.lax.top_k(x, k)`` — same multiset, same
descending-value lower-index-first order, same gathered values
(tests/test_pallas_topk.py asserts equality, including adversarial ties).

Layout: the (P,) input is reshaped to a TRANSPOSED (128, C) block — flat
element ``f`` sits at (sublane f % 128, lane f // 128) — so every in-kernel
rank/prefix runs on the native tiling with no transposes: within-column
prefix sums are one strict-lower-triangular (128,128) MXU matmul, and
cross-column offsets one (1,C)@(C,C) matmul.  Both detect-stage call sites
(P=18207 and P=32000) pad to the same (128, 256) block, so one compiled
kernel serves the whole stage.

Caveat: keys assume non-NaN scores (detect scores are sigmoid products or
the -1.0 below-threshold sentinel, so this holds by construction; NaN logits
are handled upstream by the trainer's NaN guard).

Reference lineage: this replaces the score-sort half of the reference's
CUDA NMS tier (eval/orienmask_yolo_postprocess.py:107-110 ``topk``;
eval/src/nms_kernel.cu sorts by score on device) with a TPU-shaped
selection that never materializes a sorted order of all P candidates.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Unified block: 128 sublanes x 256 lanes = 32768 slots covers both detect
# call sites (18207 and 32000).  Callers with larger P get more lanes.
_SUBLANES = 128
_PAD_VALUE = -3.0  # strictly below every selectable score (>= -1.0 sentinel)


def _sign_biased_keys(x):
    """f32 -> int32 keys with float ordering under SIGNED compares.

    bits(x) for x >= 0 already ascends with x; for x < 0 the bit pattern
    descends, so flip all bits.  XORing the sign bit then maps the unsigned
    order onto signed int32 order.  Net: nonneg x -> bits(x) (>= 0), negative
    x -> ~bits(x) ^ 0x80000000 (< 0).
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    sign_mask = jax.lax.shift_left(jnp.int32(1), jnp.int32(31))
    flipped = jax.lax.bitwise_xor(jax.lax.bitwise_not(bits), sign_mask)
    return jnp.where(x < 0, flipped, bits)


def _topk_kernel(x_ref, vals_ref, idx_ref, cnt_ref, *, k, n_cols):
    x = x_ref[:]  # (128, C) f32, flat element f at (f % 128, f // 128)
    keyb = _sign_biased_keys(x)

    # ---- phase 1: radix MSB-first threshold build ------------------------
    # After the loop, T is the k-th largest key: count(key >= T) >= k and
    # count(key > T) < k.  MSB-first bit building is an UNSIGNED-domain
    # algorithm, so the threshold is tracked as the unsigned pattern
    # u = keyb ^ 0x80000000 (a >=_u b  <=>  a^sign >=_s b^sign) and every
    # count compares in the signed keyb domain by XORing the sign back.
    sign_mask = jax.lax.shift_left(jnp.int32(1), jnp.int32(31))

    def bit_body(b, t_u):
        bit = jax.lax.shift_left(jnp.int32(1), jnp.int32(31) - b)
        cand = jax.lax.bitwise_or(t_u, bit)
        cand_b = jax.lax.bitwise_xor(cand, sign_mask)
        c = jnp.sum((keyb >= cand_b).astype(jnp.int32))
        return jnp.where(c >= k, cand, t_u)

    t_u = jax.lax.fori_loop(0, 32, bit_body, jnp.int32(0))
    t_b = jax.lax.bitwise_xor(t_u, sign_mask)  # threshold, signed key domain

    gt = keyb > t_b
    eq = keyb == t_b
    need = k - jnp.sum(gt.astype(jnp.int32))  # eq-tie slots to fill, in (0, k]

    # ---- phase 2: flat-index-order ranks (exact lax.top_k tie-break) -----
    # Exclusive prefix in flat order = within-column prefix (strict-lower
    # triangular MXU matmul over sublanes) + exclusive column offsets
    # ((1,C)@(C,C) strict-lower matmul over lanes).  Counts < 2^24 -> f32
    # exact.
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _SUBLANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _SUBLANES), 1)
    tri_low = (sub > lanes).astype(jnp.float32)  # (128,128): i>j
    csub = jax.lax.broadcasted_iota(jnp.int32, (n_cols, n_cols), 0)
    clane = jax.lax.broadcasted_iota(jnp.int32, (n_cols, n_cols), 1)
    ctri = (csub < clane).astype(jnp.float32)  # (C,C): col i before col j

    def flat_exclusive_rank(mask):
        m = mask.astype(jnp.float32)
        within = jnp.dot(tri_low, m, preferred_element_type=jnp.float32)
        col_tot = jnp.sum(m, axis=0, keepdims=True)  # (1, C)
        col_off = jnp.dot(col_tot, ctri, preferred_element_type=jnp.float32)
        return within + col_off  # (128, C) f32

    eq_rank = flat_exclusive_rank(eq)
    sel = gt | (eq & (eq_rank < need.astype(jnp.float32)))

    # compaction only needs the WITHIN-column rank (the caller re-applies
    # column offsets from the counts)
    wrank = jnp.dot(tri_low, sel.astype(jnp.float32),
                    preferred_element_type=jnp.float32)

    cnt_ref[:] = jnp.sum(sel.astype(jnp.int32), axis=0, keepdims=True)

    # flat index payload, exact in f32 (max 2^15 here)
    fidx = (jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, n_cols), 1)
            * _SUBLANES
            + jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, n_cols), 0)
            ).astype(jnp.float32)

    # ---- phase 3: per-column compaction, no scatter ----------------------
    # Row t of the outputs collects, per column, that column's t-th selected
    # element (sublane order).  128 masked-sum reductions; unfilled slots
    # hold 0 and are never gathered (the caller bounds by cnt).
    xz = jnp.where(sel, x, 0.0)
    fz = jnp.where(sel, fidx, 0.0)

    def t_body(t, _):
        hit = (wrank == t.astype(jnp.float32)) & sel
        hf = hit.astype(jnp.float32)
        vals_ref[pl.ds(t, 1), :] = jnp.sum(
            jnp.where(hit, xz, 0.0), axis=0, keepdims=True)
        idx_ref[pl.ds(t, 1), :] = jnp.sum(hf * fz, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, _SUBLANES, t_body, 0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def exact_topk(x, k, interpret=False):
    """Bit-identical replacement for ``jax.lax.top_k(x, k)`` on (P,) f32.

    Returns (values (k,), indices (k,) int32) in descending value order,
    ties broken by lower index — lax.top_k's contract.  P must be >= k.
    """
    (p,) = x.shape
    assert p >= k, (p, k)
    n_cols = max(256, -(-p // _SUBLANES))  # >= 256 so both detect sites share
    n_cols = -(-n_cols // 128) * 128  # lane-dim multiple of 128
    total = _SUBLANES * n_cols
    xp = jnp.pad(x.astype(jnp.float32), (0, total - p),
                 constant_values=_PAD_VALUE)
    # flat f -> (f % 128, f // 128): the transposed layout the kernel expects
    xt = xp.reshape(n_cols, _SUBLANES).T

    vals_t, idx_t, cnt = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, n_cols=n_cols),
        out_shape=(
            jax.ShapeDtypeStruct((_SUBLANES, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((_SUBLANES, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((1, n_cols), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xt)

    # ---- glue: gather the k winners in flat-index order, then order ------
    cnt = cnt[0]  # (C,)
    roff = jnp.cumsum(cnt)  # inclusive per-column offsets
    s = jnp.arange(k)
    # column of the s-th selected element: searchsorted(roff, s, 'right')
    col = jnp.sum((s[:, None] >= roff[None, :]).astype(jnp.int32), axis=1)
    t = s - (roff[col] - cnt[col])  # within-column rank
    flat_t = t * jnp.int32(roff.shape[0]) + col
    v = vals_t.reshape(-1)[flat_t]
    ix = idx_t.reshape(-1)[flat_t].astype(jnp.int32)
    # exactly k selected by construction -> order by (value desc, position
    # asc); positions are flat-index-ascending, so this IS lax.top_k order
    vv, j = jax.lax.top_k(v, k)
    return vv, ix[j]
