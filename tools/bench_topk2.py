"""Microbench round 2: beating the top_k size cliff.

Observed on chip: single top_k(n<=18207, 400) is ~0.03-0.04 ms but
top_k(32000, 400) is 0.465 ms and batched row-wise variants are erratic.
Hypothesis: XLA TPU's fast partial-reduction TopK applies below a size
threshold; above it, a full variadic sort runs.

Variant 'split2': two sequential top_k calls on 16000-element halves +
top_k(800) merge — exact (any partition preserves the global top-k set).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N_ITERS = 200
t0 = time.time()


def tick(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def timed(name, fn, *args):
    outs = [fn(*args) for _ in range(10)]
    jax.block_until_ready(outs)
    start = time.perf_counter()
    outs = [fn(*args) for _ in range(N_ITERS)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - start) / N_ITERS
    tick(f"{name:48s} {dt*1e3:7.3f} ms")
    return outs[0]


def split_topk(x, k, nsplit):
    n = x.shape[0]
    bound = -(-n // nsplit)
    vs, is_ = [], []
    for s in range(nsplit):
        lo = s * bound
        hi = min(n, lo + bound)
        v, i = jax.lax.top_k(x[lo:hi], min(k, hi - lo))
        vs.append(v)
        is_.append(i + lo)
    v = jnp.concatenate(vs)
    i = jnp.concatenate(is_)
    v2, j = jax.lax.top_k(v, k)
    return v2, i[j]


def main():
    key = jax.random.PRNGKey(0)

    for n in (32000,):
        x = jax.random.uniform(key, (n,), jnp.float32)
        plain = jax.jit(lambda x: jax.lax.top_k(x, 400))
        pv, pi = timed(f"plain top_k({n}, 400)", plain, x)
        for nsplit in (2, 4):
            f = jax.jit(lambda x, s=nsplit: split_topk(x, 400, s))
            bv, bi = timed(f"split{nsplit} top_k({n}, 400)", f, x)
            tick(f"  equal: v={bool(jnp.all(pv == bv))} i={bool(jnp.all(pi == bi))}")

    # thresholds: where is the cliff?
    for n in (16384, 20000, 24000, 28000):
        x = jax.random.uniform(key, (n,), jnp.float32)
        plain = jax.jit(lambda x: jax.lax.top_k(x, 400))
        timed(f"plain top_k({n}, 400)", plain, x)

    # exact-mode size: 18207*80 pairs
    n = 18207 * 80
    x = jax.random.uniform(key, (n,), jnp.float32)
    plain = jax.jit(lambda x: jax.lax.top_k(x, 400))
    pv, pi = timed(f"plain top_k({n}, 400)", plain, x)
    # tree: per-class (80, 18207) batched + split-merge of the 32000
    xm = x.reshape(-1)[: 18207 * 80].reshape(80, 18207)

    def tree(xm):
        v, i = jax.lax.top_k(xm, 400)  # (80, 400) batched
        base = (jnp.arange(80, dtype=jnp.int32) * 18207)[:, None]
        flat_v = v.reshape(-1)
        flat_i = (i + base).reshape(-1)
        v2, j = split_topk(flat_v, 400, 2)
        return v2, flat_i[j]

    f = jax.jit(tree)
    bv, bi = timed("tree (80,18207) batched + split2 merge", f, xm)
    tick(f"  equal: v={bool(jnp.all(pv == bv))} i={bool(jnp.all(pi == bi))}")

    batched = jax.jit(lambda xm: jax.lax.top_k(xm, 400))
    timed("batched top_k((80,18207), 400) alone", batched, xm)


if __name__ == "__main__":
    main()
