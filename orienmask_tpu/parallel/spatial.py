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


def run_batch_spatial(postprocess, mesh, predict, use_pallas=None):
    """Postprocess with the mask stage row-sharded over ``mesh``'s space axis.

    The detect stage (candidate top-k + decode + NMS fixpoint) stays
    replicated: its operands are the tiny head grids (17²/34²/68² at 544²,
    ~1.4 MB total) and the NMS fixpoint is a sequential 400×400 dependence —
    sharding it buys nothing and costs a gather. The expensive tail is the
    image-resolution work: the ×4 bilinear orientation upsample (~113 MB of
    f32 writes at 1088²) and the per-detection mask rasterization (HBM-bound,
    docs/PERFORMANCE.md frame breakdown). Both are embarrassingly row-
    parallel, so this runs them under ``shard_map``: each device upsamples
    ONLY its own output rows (a row slice of the resize matrix — same FLOPs,
    1/n the writes) and rasterizes its row block of every kept mask. The
    Pallas kernel receives the global row offset as an integer before its
    coordinate scale, so shard outputs are bit-identical to the whole-image
    kernel (ops/pallas_masks.py ``row0``).

    Per-device HBM traffic for upsample+masks drops ~linearly with n_space;
    cross-device traffic is one broadcast of the stride-4 orientation maps
    (~2.8 MB at 1088²) plus the packed-mask gather the caller's out_sharding
    requests (~15 MB at 1088², or zero if the consumer keeps masks sharded).

    Same output contract as ``OrienMaskYOLOPostProcess._run_batch``; equality
    vs the replicated path is asserted on the CPU mesh (tests/test_spatial.py).
    """
    import functools

    from ..models.layers import upsample_matrix

    pp = postprocess
    n_space = mesh.shape[SPACE_AXIS]
    big_h, big_w = pp.image_h, pp.image_w
    if big_h % n_space != 0:
        raise ValueError(
            f"run_batch_spatial: image_h={big_h} not divisible by "
            f"n_space={n_space}")
    shard_h = big_h // n_space
    if use_pallas is None:
        use_pallas = pp.use_pallas_masks and pp.pack_masks

    pred_bboxes = [p[0] for p in predict]
    pred_oriens = [p[1] for p in predict]
    # Detect: replicated (GSPMD sees replicated operands in and out).
    dets = jax.vmap(pp._detect_image)(pred_bboxes)

    x = jnp.concatenate(pred_oriens, axis=-1)  # (B, H/4, W/4, 6A) stride-4
    # channel perm at stride-4, before the upsample (commutes bit-identically
    # through the channelwise resize; 16x less gather traffic — see
    # postprocess._upsample_orientation)
    x = x[..., jnp.asarray(pp.orien_channel_perm)]
    mh = jnp.asarray(upsample_matrix(big_h, x.shape[1], False))
    mw = jnp.asarray(upsample_matrix(big_w, x.shape[2], False))
    na_table = jnp.asarray(pp.norm_anchors)
    mesh_x = jnp.asarray(pp.mesh_x)           # (1, W) normalized cols
    mesh_y = jnp.asarray(pp.mesh_y)           # (H, 1) normalized rows

    def _block_h():
        for bh in (136, 128, 64, 32, 16, 8):
            if shard_h % bh == 0:
                return bh
        return shard_h

    def local(x, boxes5, anchor_idx, valid):
        row0 = jax.lax.axis_index(SPACE_AXIS) * shard_h
        # This shard's output rows = a row slice of the resize matrix: the
        # H-matmul emits only shard_h rows (same total FLOPs across devices,
        # 1/n_space of the HBM writes each).
        mh_loc = jax.lax.dynamic_slice_in_dim(mh, row0, shard_h, 0)
        up = jnp.einsum("Hh,bhwc->bHwc", mh_loc, x,
                        preferred_element_type=jnp.float32)
        up = jnp.einsum("Ww,bhwc->bhWc", mw, up,
                        preferred_element_type=jnp.float32)
        b = up.shape[0]
        field = up.reshape(b, shard_h, big_w, pp.num_anchors_total, 2)
        boxes = boxes5[..., :4]

        if use_pallas:
            field_t = field.transpose(0, 3, 4, 1, 2)  # (B, A, 2, shard_h, W)
            from ..ops.pallas_masks import assemble_masks_packed

            packed = []
            for i in range(b):  # static unroll, as in _run_batch
                a_i = anchor_idx[i]
                packed.append(assemble_masks_packed(
                    field_t[i], boxes[i], na_table[a_i], a_i,
                    orien_thresh=pp.orien_thresh, block_h=_block_h(),
                    coord_h=big_h, row0=row0))
            masks = jnp.stack(packed)
            return masks * valid[..., None, None].astype(jnp.uint8)

        # XLA path (CPU mesh / no Pallas): identical math to
        # pp._assemble_masks with the row mesh sliced to this shard — the
        # slice reads the SAME precomputed mesh array, so shard outputs are
        # bit-identical to the replicated path.
        my_loc = jax.lax.dynamic_slice_in_dim(mesh_y, row0, shard_h, 0)

        def one(a, box, field_img):
            fx = field_img[:, :, a, 0] * (na_table[a, 0] * 0.5) + mesh_x
            fy = field_img[:, :, a, 1] * (na_table[a, 1] * 0.5) + my_loc
            mx = jnp.abs(fx - box[0]) < pp.orien_thresh * box[2]
            my = jnp.abs(fy - box[1]) < pp.orien_thresh * box[3]
            return mx & my

        masks = jax.vmap(  # over batch
            lambda aidx, bxs, f: jax.vmap(
                functools.partial(one, field_img=f))(aidx, bxs)
        )(anchor_idx, boxes, field)
        masks = masks & valid[:, :, None, None]
        if pp.pack_masks:
            from ..ops.maskops import pack_bits

            return pack_bits(masks)
        return masks

    rep = P()
    masks = jax.shard_map(
        local, mesh=mesh,
        in_specs=(rep, rep, rep, rep),
        out_specs=P(None, None, SPACE_AXIS, None),
        check_vma=False,
    )(x, dets["bbox"], dets["anchor"], dets["valid"])

    return {"bbox": dets["bbox"], "cls": dets["cls"], "mask": masks,
            "valid": dets["valid"]}


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
