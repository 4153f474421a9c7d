"""HBM memory analysis of the train step with/without backbone remat.

AOT-compiles the full B x 544^2 train step on the attached backend (no
execution, so it is safe to run alongside other chip users) and prints the
XLA memory analysis for remat=False vs remat=True: the temp-allocation
delta is the activation memory the stage-granular ``jax.checkpoint``
(models/darknet.py DarkNet53.apply) removes from the forward->backward
live range.

Usage:
    python tools/remat_memory.py --batch 8 --dtype bfloat16 [--size 544]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_step(args, remat):
    from orienmask_tpu.config.base import ANCHORS_MASK, ANCHORS_YOLOV4
    from orienmask_tpu.models import OrienMaskYOLOFPNPlus
    from orienmask_tpu.ops.loss import OrienMaskYOLOMultiScaleLoss
    from orienmask_tpu.optim import SGD
    from orienmask_tpu.parallel.mesh import data_mesh
    from orienmask_tpu.trainer.train_state import make_train_step

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
        compute_dtype=jnp.dtype(args.dtype), remat=remat,
    )
    state = init_state(variables)
    return train_step, state


def batch_spec(args):
    from tools.bench_train import synthetic_batch

    batch = synthetic_batch(args.batch, args.size)
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)


def analyze(args, remat):
    step, state = build_step(args, remat)
    lowered = jax.jit(step).lower(
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state),
        batch_spec(args),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.bool_),
    )
    mem = lowered.compile().memory_analysis()
    return mem


def fmt(mem):
    g = 1024 ** 3
    return ("temp %.3f GiB  args %.3f GiB  out %.3f GiB  code %.1f MiB" % (
        mem.temp_size_in_bytes / g, mem.argument_size_in_bytes / g,
        mem.output_size_in_bytes / g,
        mem.generated_code_size_in_bytes / 1024 ** 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=544)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the container sitecustomize "
                         "overrides JAX_PLATFORMS at import)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("[remat_memory] backend:", jax.default_backend(), flush=True)
    m0 = analyze(args, remat=False)
    print("[remat=False] " + fmt(m0), flush=True)
    m1 = analyze(args, remat=True)
    print("[remat=True ] " + fmt(m1), flush=True)
    d = m0.temp_size_in_bytes - m1.temp_size_in_bytes
    print("[delta] temp %.3f GiB saved (%.1f%%)" % (
        d / 1024 ** 3, 100.0 * d / max(m0.temp_size_in_bytes, 1)))


if __name__ == "__main__":
    main()
