"""Stem conv round 2: attribute the s2d cost, try layouts.

Variants:
  conv4x4      -- baseline (bf16 NHWC).
  conv4x4_f32  -- f32 in/out (does the cast/layout dominate?).
  conv4x4_nchw -- NCHW/OIHW dimension numbers.
  z_conv_only  -- 2x2x12 conv on a PRE-BUILT z (273,273,12): the conv cost
                  if s2d were free (e.g. produced by the resize step).
  s2d_only     -- building z alone (4 strided slices + concat).
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

    ref = timed("conv4x4 bf16 (current)", jax.jit(conv4x4), (x,), (x2,))

    def conv4x4_f32(x):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    timed("conv4x4 f32", jax.jit(conv4x4_f32), (x,), (x2,))

    xn = jnp.transpose(x, (0, 3, 1, 2))
    xn2 = jnp.transpose(x2, (0, 3, 1, 2))
    ko = jnp.transpose(k, (3, 2, 0, 1))  # OIHW

    def conv4x4_nchw(xn):
        return jax.lax.conv_general_dilated(
            xn.astype(jnp.bfloat16), ko.astype(jnp.bfloat16),
            window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    got = timed("conv4x4 nchw (pre-transposed in)", jax.jit(conv4x4_nchw),
                (xn,), (xn2,))
    err = float(jnp.max(jnp.abs(
        jnp.transpose(got, (0, 2, 3, 1)).astype(jnp.float32)
        - ref.astype(jnp.float32))))
    tick(f"  nchw maxdiff={err:.2e}")

    # pre-built z
    k2 = k.reshape(2, 2, 2, 2, 3, CO).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(2, 2, 12, CO)

    def build_z(x):
        xb = x.astype(jnp.bfloat16)
        xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
        zs = [xp[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1)]
        return jnp.concatenate(zs, axis=-1)

    z = jax.jit(build_z)(x)
    z2 = jax.jit(build_z)(x2)
    jax.block_until_ready([z, z2])

    def z_conv(z):
        return jax.lax.conv_general_dilated(
            z, k2.astype(jnp.bfloat16), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = timed("2x2x12 conv on prebuilt z", jax.jit(z_conv), (z,), (z2,))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    tick(f"  z_conv maxdiff={err:.2e}")

    timed("s2d build alone", jax.jit(build_z), (x,), (x2,))

    # z at 274x274 (even dims; does odd-spatial tiling hurt?)
    def z_conv_pad(z):
        zp = jnp.pad(z, ((0, 0), (0, 3), (0, 3), (0, 0)))  # 276^2
        return jax.lax.conv_general_dilated(
            zp, k2.astype(jnp.bfloat16), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :272, :272]

    timed("2x2x12 conv on 276^2-padded z", jax.jit(z_conv_pad), (z,), (z2,))


if __name__ == "__main__":
    tick(f"devices: {jax.devices()}")
    main()
