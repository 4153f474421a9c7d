"""Microbench: stage-1 candidate top-k split variants + negative-padding
stem conv (kills the post-conv slice copy).

Stage-1 selection is one top_k(18207, 400) measured at 0.182 ms/frame —
above the top-k size cliff (tools/bench_topk2.py) that the 32000-element
stage-2 already dodges by splitting.  The same split-merge argument applies
verbatim (contiguous ranges, lower-index ties).

The fused stem's 2x2 VALID conv emits 275^2 and slices to 272^2, which
materializes an 18.9 MB copy (copy.412, 0.040 ms in the per-instance
profile).  Negative window padding ((0,-3),(0,-3)) makes the conv emit
272^2 directly — numerically identical (checked here on chip).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N = 300
t0 = time.time()


def tick(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def timed(name, fn, *args):
    outs = [fn(*args) for _ in range(10)]
    jax.block_until_ready(outs)
    start = time.perf_counter()
    outs = [fn(*args) for _ in range(N)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - start) / N * 1000
    tick(f"{name:46s} {dt:7.3f} ms")
    return outs[0]


def main():
    tick(f"devices: {jax.devices()}")
    P, K = 18207, 400
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(P).astype(np.float32))

    def topk_plain(x):
        return jax.lax.top_k(x, K)

    def make_split(nsplit):
        def f(x):
            n = x.shape[0]
            bound = -(-n // nsplit)
            vs, is_ = [], []
            for s in range(nsplit):
                lo = s * bound
                hi = min(n, lo + bound)
                v, i = jax.lax.top_k(x[lo:hi], min(K, hi - lo))
                vs.append(v)
                is_.append(i + lo)
            v2, j = jax.lax.top_k(jnp.concatenate(vs), K)
            return v2, jnp.concatenate(is_)[j]
        return f

    if os.environ.get("SKIP_TOPK"):
        _bench_stem()
        return
    ref_v, ref_i = jax.jit(topk_plain)(x)
    for ns in (2, 3, 4):
        f = jax.jit(make_split(ns))
        v, i = f(x)
        ok = bool(jnp.array_equal(v, ref_v) and jnp.array_equal(i, ref_i))
        tick(f"split{ns} exact={ok}")
    timed("top_k(18207,400) plain", jax.jit(topk_plain), x)
    for ns in (2, 3, 4):
        timed(f"top_k split{ns}", jax.jit(make_split(ns)), x)

    _bench_stem()


def _bench_stem():
    # ---- stem conv: VALID+slice vs negative padding
    z = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 276, 276, 12)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 2, 12, 128)).astype(np.float32)).astype(jnp.bfloat16)

    def conv_slice(z, k):
        return jax.lax.conv_general_dilated(
            z, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :272, :272]

    def conv_neg(z, k):
        return jax.lax.conv_general_dilated(
            z, k, (1, 1), ((0, -3), (0, -3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    a = jax.jit(conv_slice)(z, k)
    tick("conv_slice compiled")
    b = jax.jit(conv_neg)(z, k)
    tick(f"neg-pad exact={bool(jnp.array_equal(a, b))} shape={b.shape}")
    timed("stem conv VALID + slice", jax.jit(conv_slice), z, k)
    timed("stem conv negative pad", jax.jit(conv_neg), z, k)


if __name__ == "__main__":
    main()
