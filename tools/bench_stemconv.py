"""Microbench: first-conv formulations for the 544^2 RGB stem.

The folded phase stem's first conv (darknet.py apply_folded, 4x4 stride-2
pad-1, 3->128 channels, bf16) measures ~0.25 ms on chip -- 3.6 TFLOP/s,
~2% of MXU peak: C=3 in the lane dimension wastes 125/128 lanes of every
load.  Variants that repack the contraction:

  conv4x4   -- current formulation (baseline).
  s2d2x2    -- shifted 2x2 space-to-depth (273,273,12) + 2x2 VALID conv.
               y[ph,pw] = sum_{A,B,a,b} z[ph+A,pw+B,(a,b)] W[2A+a,2B+b]
               with z[p,q,(a,b)] = xpad1[2p+a, 2q+b]: identical arithmetic.
  patches   -- conv_general_dilated_patches + (272*272,48)@(48,128) matmul.
  wide_mm   -- row-gather im2col: 4 shifted row-slabs concatenated on
               channels then 1x4-window conv.

Each variant is checked bit-close (bf16) against conv4x4 before timing.
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


def timed(name, fn, *argsets):
    outs = [fn(*argsets[i % len(argsets)]) for i in range(10)]
    jax.block_until_ready(outs)
    start = time.perf_counter()
    outs = [fn(*argsets[i % len(argsets)]) for i in range(N)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - start) / N
    tick(f"{name:44s} {dt*1e3:7.3f} ms")
    return outs[0]


def main():
    rng = np.random.default_rng(0)
    H = W = 544
    CO = 128
    x = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((4, 4, 3, CO)) * 0.1, jnp.float32)

    def conv4x4(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = timed("conv4x4 3->128 (current)", jax.jit(conv4x4), (x,), (x2,))

    # --- shifted s2d + 2x2 conv ------------------------------------------
    # z[p,q,a,b,c] = xpad1[2p+a, 2q+b, c], p,q in 0..272  (273^2 x 12)
    # W2[A,B,(a,b,c),o] = k[2A+a, 2B+b, c, o]
    k2 = k.reshape(2, 2, 2, 2, 3, CO).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(2, 2, 2 * 2 * 3, CO)  # (A,a,B,b,c,o) -> (A,B,(a,b,c),o)

    def s2d2x2(x):
        xb = x.astype(jnp.bfloat16)
        xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (1,546,546,3)
        zs = []
        for a in (0, 1):
            for b in (0, 1):
                zs.append(xp[:, a::2, b::2, :])  # (1,273,273,3)
        z = jnp.concatenate(zs, axis=-1)  # (1,273,273,12)  order (a,b,c)
        return jax.lax.conv_general_dilated(
            z, k2.astype(jnp.bfloat16), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = timed("s2d 2x2x12 + 2x2 conv", jax.jit(s2d2x2), (x,), (x2,))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    tick(f"  s2d2x2 maxdiff={err:.2e}")

    # --- patches + matmul -------------------------------------------------
    def patches_mm(x):
        xb = x.astype(jnp.bfloat16)
        p = jax.lax.conv_general_dilated_patches(
            xb, (4, 4), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (1,272,272,48)
        # patches channel order: (c, ky, kx) per XLA docs (feature-major)
        km = k.transpose(2, 0, 1, 3).reshape(48, CO)  # (c,ky,kx)->flat
        return jnp.einsum("bhwk,ko->bhwo", p, km.astype(jnp.bfloat16))

    got = timed("dilated_patches + matmul", jax.jit(patches_mm), (x,), (x2,))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    tick(f"  patches maxdiff={err:.2e}")

    # --- 4 row-slabs + 1x4 conv ------------------------------------------
    # gather rows 2ph-1..2ph+2 as 4 channel groups, then conv over kx only.
    k3 = k.transpose(1, 0, 2, 3).reshape(1, 4, 12, CO)  # (kx,(ky,c),o) HWIO

    def rowslab(x):
        xb = x.astype(jnp.bfloat16)
        xp = jnp.pad(xb, ((0, 0), (1, 1), (0, 0), (0, 0)))  # (1,546,544,3)
        slabs = [xp[:, dy:dy + 543:2, :, :] for dy in range(4)]  # 4x(1,272,544,3)
        z = jnp.concatenate(slabs, axis=-1)  # (1,272,544,12) order (ky,c)
        return jax.lax.conv_general_dilated(
            z, k3.astype(jnp.bfloat16), window_strides=(1, 2),
            padding=((0, 0), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = timed("4 row-slabs + 1x4 conv", jax.jit(rowslab), (x,), (x2,))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    tick(f"  rowslab maxdiff={err:.2e}")


if __name__ == "__main__":
    tick(f"devices: {jax.devices()}")
    main()
