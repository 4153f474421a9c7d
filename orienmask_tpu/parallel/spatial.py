"""Spatial partitioning (SP): shard the *image* across devices.

The reference scales only by data parallelism (SURVEY.md §2.12; its DDP wrap at
/root/reference/trainer/builder.py:87) — one whole image per GPU. On a TPU pod
the extra axis worth sharding for a fixed-resolution CNN is *space*: split the
input rows across a mesh axis and let GSPMD partition every convolution,
inserting halo exchanges over ICI for the window rows that straddle a shard
boundary. No manual communication; the model code is unchanged.

When it pays: batch-1 latency at large input sizes (736² video, 1088²+ stills)
where one chip's MXU is the bottleneck — per-device conv FLOPs drop ~linearly
with the shard count while halo traffic grows only with the cut perimeter.
When it does not: throughput serving (just batch more images per chip — DP).

Head outputs are small (17²/34²/68² grids + a stride-4 orientation map), so
this module gathers them to replicated before postprocess: the gather is a few
hundred KB against the megabytes of backbone activations that stay sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

SPACE_AXIS = "space"


def spatial_mesh(n_space, n_data=1, devices=None):
    """2-D ``(data, space)`` mesh over ``n_data * n_space`` devices.

    ``n_data`` batches in parallel (the reference's DP axis), ``n_space``
    row-shards per image. Adjacent devices land on the space axis so halo
    exchanges ride the shortest ICI hops.
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_space
    if len(devices) < need:
        raise ValueError(f"spatial_mesh: need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_space)
    if jax.process_count() > 1:
        # Multi-process: each image's space shards must live on ONE process so
        # every host can feed whole image rows through
        # jax.make_array_from_process_local_data (shard_spatial_batch). With
        # process-major jax.devices() order that holds iff n_space divides the
        # local device count.
        for row in grid:
            procs = {d.process_index for d in row}
            if len(procs) > 1:
                raise ValueError(
                    f"spatial_mesh: a space row straddles processes {procs}; "
                    f"n_space={n_space} must divide the local device count "
                    f"({jax.local_device_count()}) so each image stays on one "
                    f"host")
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def image_sharding(mesh):
    """NHWC input sharding: batch over the data axis, rows over space."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))


def spatial_forward(model, mesh, train=False, dtype=jnp.float32):
    """Jitted eval forward with the image row-sharded over ``mesh``.

    Parameters are replicated (this model is ~50M params — far below a chip's
    HBM; sharding them would only add gather latency). Outputs come back
    replicated for the host-side or replicated postprocess.

    Returns ``fn(variables, image_nhwc) -> ((bbox_s, orien_s) x 3 scales)``.
    """
    rep = NamedSharding(mesh, P())
    img = image_sharding(mesh)

    def fwd(variables, image):
        out, _ = model.forward(variables, image, train=train, dtype=dtype)
        return out

    return jax.jit(fwd, in_shardings=(rep, img), out_shardings=rep)


# The fused inference pipeline gains spatial sharding via its constructor:
# ``InferencePipeline(..., mesh=spatial_mesh(n_space, n_data))`` — every
# per-shape program it builds is then jitted with the image row-sharded and
# outputs replicated (pipeline.py), reachable from the CLI as
# ``infer.py --spatial N``.


def shard_spatial_batch(batch, mesh):
    """Place a train batch on a ``(data, space)`` mesh: images row-sharded
    over space, every other leaf batch-sharded only.

    GT masks stay data-sharded (replicated over space): the painting kernel
    consumes whole masks, and at stride-4 canvas resolution GSPMD reshards
    the painted canvases to whatever layout the loss's image-resolution
    terms want. Pair with ``make_train_step(..., follow_batch_sharding=True)``
    so the jitted step adopts these per-leaf shardings instead of forcing
    the 1-D batch prefix.

    Multi-process (``jax.distributed``): each process passes its LOCAL batch
    (whole images for its data rows) and the global arrays are assembled with
    ``jax.make_array_from_process_local_data`` — valid because spatial_mesh
    guarantees each image's space shards live on one process, so this host's
    addressable shards are exactly its full-image data rows (the same
    contract as parallel.mesh.shard_batch; tested 2-process in
    tests/test_distributed.py)."""
    img = image_sharding(mesh)
    data_only = NamedSharding(mesh, P(DATA_AXIS))

    if jax.process_count() > 1:
        def put(k, v):
            sh = img if k == "image" else data_only
            return jax.make_array_from_process_local_data(sh, np.asarray(v))
    else:
        def put(k, v):
            return jax.device_put(v, img if k == "image" else data_only)

    return {k: (put(k, v) if k != "info" else v) for k, v in batch.items()}


def spatial_train_step(model, loss_fn, optimizer, mesh, accumulate=1,
                       compute_dtype=jnp.float32):
    """(train_step, init_state) over a ``(data, space)`` mesh: beyond the
    reference's DP-only scaling (SURVEY §2.12), the image's rows are sharded
    across the space axis THROUGH the full training step — forward convs
    (GSPMD halo exchanges), the loss's image-resolution orientation terms,
    backward, and the SGD update (params replicated, grads all-reduced).

    Feed batches through ``shard_spatial_batch``. Numerically equal to the
    DP step on the same global batch (tests/test_spatial.py)."""
    from ..trainer.train_state import make_train_step

    return make_train_step(
        model, loss_fn, optimizer, mesh, accumulate=accumulate,
        compute_dtype=compute_dtype, follow_batch_sharding=True,
    )
