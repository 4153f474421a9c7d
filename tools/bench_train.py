"""Train-step throughput benchmark (one chip or a local mesh).

Times the full jitted training step (forward + loss/targets + backward +
SGD update + BN stat sync) on synthetic COCO-like batches, the same program
`trainer/trainer.py` runs. Counterpart to the reference's per-batch wall
clock in trainer/trainer.py:42-55 (which it never reports as a benchmark).

Usage:
    tools/tpu_run.sh python tools/bench_train.py --batch 8 --dtype bfloat16

Measured on one v5e @544x544 (2026-08-16): f32 B=8 93ms (86 img/s);
bf16 B=8 71ms (112 img/s), B=16 148ms (108 img/s), B=32 303ms (106 img/s)
-- throughput saturates at B=8, so the shipped config's per-chip batch is
already at the ceiling. With the fused Pallas painting kernel
(ops/pallas_paint.py): bf16 B=8 64.5ms (124 img/s).  With dtype-uniform
BatchNorm + gather-free target tables + the space-to-depth stem
(models/darknet.py): bf16 B=8 49.4ms (161.9 img/s).  With the painter
consuming bit-packed masks (in-kernel MXU unpack): 46.9ms (170.6 img/s).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
from orienmask_tpu.models import OrienMaskYOLOFPNPlus
from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss
from orienmask_tpu.ops.maskops import pack_bits
from orienmask_tpu.optim import SGD
from orienmask_tpu.parallel.mesh import data_mesh, shard_batch
from orienmask_tpu.trainer.train_state import make_train_step


def synthetic_batch(batch_size, size, max_instances=100, n_valid=16):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    bbox = jnp.tile(
        jnp.asarray([[0.5, 0.5, 0.3, 0.3]], jnp.float32), (max_instances, 1)
    )
    return {
        "image": jax.random.normal(k1, (batch_size, size, size, 3), jnp.float32),
        "bbox": jnp.tile(bbox[None], (batch_size, 1, 1)),
        "cls": jnp.zeros((batch_size, max_instances), jnp.int32),
        "mask": pack_bits(
            jax.random.uniform(k2, (batch_size, max_instances, size, size)) < 0.2
        ),
        "valid": jnp.tile(jnp.arange(max_instances)[None, :] < n_valid, (batch_size, 1)),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=544)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    print(f"[bench_train] batch={args.batch} dtype={args.dtype} "
          f"size={args.size}", flush=True)  # early line for tpu_run.sh watchdog
    grid = [[args.size // 32] * 2, [args.size // 16] * 2, [args.size // 8] * 2]
    model = OrienMaskYOLOFPNPlus(num_anchors=3, num_classes=80)
    variables = model.init_variables(jax.random.PRNGKey(0))
    loss = OrienMaskYOLOMultiScaleLoss(
        grid_size=grid, image_size=[args.size, args.size],
        anchors=ANCHORS_YOLOV4, anchor_mask=ANCHORS_MASK, num_classes=80,
        obj_ignore_threshold=0.7, weight=[1, 1, 1, 1, 1, 20, 20],
        scales_weight=[1, 1, 1], target_chunk=8,
    )
    optimizer = SGD(lr=1e-3, momentum=0.9, weight_decay=5e-4)
    mesh = data_mesh()

    train_step, init_state = make_train_step(
        model, loss, optimizer, mesh,
        compute_dtype=jnp.dtype(args.dtype),
    )
    state = init_state(variables)
    batch = shard_batch(synthetic_batch(args.batch, args.size), mesh)
    jax.block_until_ready(batch)

    t0 = time.perf_counter()
    state, logs = train_step(state, batch, 1e-3, True)
    jax.block_until_ready(state["params"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(logs['loss']):.1f}", flush=True)

    start = time.perf_counter()
    for _ in range(args.iters):
        state, logs = train_step(state, batch, 1e-3, True)
    jax.block_until_ready(state["params"])
    dt = (time.perf_counter() - start) / args.iters
    print(f"train {args.dtype} B={args.batch} @{args.size}: "
          f"{dt * 1000:.1f} ms/step -> {args.batch / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
