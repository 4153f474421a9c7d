"""Microbench: lax.top_k formulations for the candidate-selection sizes.

Stage 1 of twostage selection: top-400 of ~18207 f32 (per-det max scores).
Stage 2: top-400 of 400*80=32000 f32 (masked pair scores).

Variants:
  plain    — jax.lax.top_k on the flat array.
  blocked  — reshape to (R, C) rows, per-row top-k (one batched sort of
             much shorter rows), then top-k over the R*k merged candidates.
             Set-exact: every global top-k element is in its row's top-k.
  blocked2 — same but two merge levels for the larger size.

Prints ms per call for each (pipelined, one sync).
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
    tick(f"{name:44s} {dt*1e3:7.3f} ms")
    return outs[0]


def blocked_topk(x, k, ncols):
    """Exact top-k values+indices via per-row top-k then merge."""
    n = x.shape[0]
    rows = -(-n // ncols)
    pad = rows * ncols - n
    xp = jnp.pad(x, (0, pad), constant_values=-np.inf).reshape(rows, ncols)
    kb = min(k, ncols)
    v, i = jax.lax.top_k(xp, kb)  # (rows, kb) batched short sort
    base = (jnp.arange(rows, dtype=jnp.int32) * ncols)[:, None]
    flat_i = (i + base).reshape(-1)
    v2, j = jax.lax.top_k(v.reshape(-1), k)
    return v2, flat_i[j]


def main():
    key = jax.random.PRNGKey(0)
    for n in (18207, 32000):
        x = jax.random.uniform(key, (n,), jnp.float32)
        plain = jax.jit(lambda x: jax.lax.top_k(x, 400))
        pv, pi = timed(f"plain top_k({n}, 400)", plain, x)

        for ncols in (1024, 2048, 4096):
            blk = jax.jit(lambda x, c=ncols: blocked_topk(x, 400, c))
            bv, bi = timed(f"blocked top_k({n}, 400) cols={ncols}", blk, x)
            ok_v = bool(jnp.all(pv == bv))
            ok_i = bool(jnp.all(pi == bi))
            tick(f"  values equal: {ok_v}  indices equal: {ok_i}")

        # sort-based: how much of plain cost is the full sort?
        srt = jax.jit(lambda x: jax.lax.sort(x)[-400:])
        timed(f"full sort({n}) [floor check]", srt, x)


if __name__ == "__main__":
    main()
