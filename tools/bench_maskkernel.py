"""On-chip check + microbench of the Pallas mask-assembly kernels.

Compares assemble_masks_anchor_resident against assemble_masks_bitpacked
(bit-exactness) and times both at 544^2, K=100.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N = 200
t0 = time.time()


def tick(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def timed(name, fn, *argsets):
    """argsets: list of distinct argument tuples cycled through — identical
    repeated calls can be memoized upstream (relay), giving fake numbers."""
    outs = [fn(*argsets[i % len(argsets)]) for i in range(10)]
    jax.block_until_ready(outs)
    start = time.perf_counter()
    outs = [fn(*argsets[i % len(argsets)]) for i in range(N)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - start) / N
    tick(f"{name:44s} {dt*1e3:7.3f} ms")
    return outs[0]


def main():
    from orienmask_tpu.ops.pallas_masks import (
        assemble_masks_anchor_resident,
        assemble_masks_bitpacked,
    )

    rng = np.random.default_rng(0)
    A, H, W, K = 9, 544, 544, 100

    def argset():
        field = jnp.asarray(rng.normal(0, 1, (A, 2, H, W)).astype(np.float32))
        boxes = jnp.asarray(
            np.stack([
                rng.uniform(0.2, 0.8, K), rng.uniform(0.2, 0.8, K),
                rng.uniform(0.05, 0.6, K), rng.uniform(0.05, 0.6, K),
            ], 1).astype(np.float32))
        aidx = jnp.asarray(rng.integers(0, A, K).astype(np.int32))
        # real contract: anchor_wh[k] == norm_anchors[aidx[k]] (per-ANCHOR
        # sizes); the anchor-resident kernel hoists on that invariant
        anchors = rng.uniform(0.05, 0.5, (A, 2)).astype(np.float32)
        na = jnp.asarray(anchors[np.asarray(aidx)])
        return field, boxes, na, aidx

    sets = [argset() for _ in range(8)]
    tick(f"devices: {jax.devices()}")

    f_old = jax.jit(lambda *a: assemble_masks_bitpacked(*a))
    f_new = jax.jit(lambda *a: assemble_masks_anchor_resident(*a))

    timed("per-det grid (varying inputs)", f_old, *sets)
    timed("anchor-resident (varying inputs)", f_new, *sets)
    timed("per-det grid (identical inputs)", f_old, sets[0])
    timed("anchor-resident (identical inputs)", f_new, sets[0])

    bad = 0
    for s in sets:
        old = f_old(*s)
        new = f_new(*s)
        bad += int(jnp.sum(old.astype(jnp.int32) != new.astype(jnp.int32)))
    tick(f"{'PASS' if bad == 0 else 'FAIL'} bit-exact: mismatched bytes={bad}")
    if bad != 0:
        sys.exit(1)


if __name__ == "__main__":
    main()
