"""The jitted training / eval step factories.

One compiled function per epoch-invariant shape: forward + loss (with target
building) + backward + SGD update, executed under a batch-sharded 1-D mesh.  XLA
GSPMD turns every cross-batch reduction (loss sums, BatchNorm batch statistics)
into ICI all-reduces — this *is* DistributedDataParallel + SyncBatchNorm
(reference trainer/builder.py:86-87) with zero hand-written collectives.

Gradient accumulation keeps a grad-sum buffer in the state and applies the
optimizer every ``accumulate`` microbatches with the reference's lr/accumulate
compensation (builder.py:121).
"""


import jax
import jax.numpy as jnp

from ..parallel.mesh import batch_sharding, data_mesh, replicate_sharding


def _image_f32(x):
    """uint8-transported images (collate image_transport='uint8') -> the f32
    the Normalize(mean 0, std 255) transform would have produced."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * (1.0 / 255.0)
    return x


def unpack_target(batch):
    """Collated batch -> loss target dict.

    Bit-packed GT masks pass through PACKED: the Pallas painting kernel
    consumes them directly (8x less DMA + in-kernel unpack on the MXU);
    the XLA painter paths unpack at their own boundary (ops/loss.py
    _paint_shared_batch, ops/targets.py TargetBuilder.__call__).
    ``sample_weight`` (0 for wrap-padded eval samples) passes through when
    present — the loss excludes padded samples from sums and divisors."""
    target = {"bbox": batch["bbox"], "cls": batch["cls"], "mask": batch["mask"],
              "valid": batch["valid"]}
    if "sample_weight" in batch:
        target["sample_weight"] = batch["sample_weight"]
    return target


def make_train_step(model, loss_fn, optimizer, mesh, accumulate=1,
                    compute_dtype=jnp.float32, follow_batch_sharding=False,
                    remat=False):
    """Returns (train_step, init_state_fn).

    state = {'params', 'batch_stats', 'opt_state', 'grad_acc'?}
    train_step(state, batch, lr, do_step) -> (state, logs)
    ``do_step`` (bool device scalar) gates the optimizer application when
    accumulating.

    ``follow_batch_sharding``: adopt the caller-placed per-leaf batch
    shardings (e.g. spatial (data, space) placement from
    parallel.spatial.shard_spatial_batch) instead of forcing the 1-D
    batch-axis prefix.
    """

    if hasattr(loss_fn, "set_paint_mesh"):
        loss_fn.set_paint_mesh(mesh)  # Pallas painter runs per-shard (shard_map)

    def loss_of(params, stats, batch):
        from ..models.layers import default_ctx

        ctx = default_ctx(train=True, dtype=compute_dtype, remat=remat)
        out, new_stats = model.apply(params, stats, _image_f32(batch["image"]), ctx)
        target = unpack_target(batch)
        loss_sum, loss_log, _ = loss_fn(out, target, training=True)
        return loss_sum, (new_stats, loss_log)

    def train_step(state, batch, lr, do_step):
        params, stats = state["params"], state["batch_stats"]
        (loss_val, (new_stats, loss_log)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(params, stats, batch)
        loss_log = dict(loss_log, loss=loss_val)

        # Per-step on-device NaN guard: a non-finite microbatch contributes
        # nothing — its grads are dropped, the optimizer update is gated off
        # (a fused per-element select, NOT a lax.cond: the cond costs ~1 ms
        # of lost fusion on chip) and the BN stats keep their previous value
        # — so state NEVER contains a non-finite value and the temp
        # checkpoint stays resumable.  The host still sees the NaN loss in
        # the drained logs and aborts with the reference's message
        # (trainer.py), it just aborts from an intact state instead of a
        # poisoned one.  ``skipped`` is logged for the loss-finite-but-
        # grads-not case the reference's loss check would miss.
        finite = jnp.isfinite(loss_val)
        for leaf in jax.tree_util.tree_leaves(grads):
            finite = finite & jnp.all(jnp.isfinite(leaf))
        loss_log = dict(loss_log, skipped=1.0 - finite.astype(jnp.float32))
        new_stats = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_stats, stats
        )

        if accumulate > 1:
            grads = jax.tree_util.tree_map(
                lambda a, g: a + jnp.where(finite, g, jnp.zeros_like(g)),
                state["grad_acc"], grads
            )

        def apply_opt(_):
            new_params, new_opt = optimizer.apply(
                params, grads, state["opt_state"], lr / accumulate
            )
            zeros = jax.tree_util.tree_map(jnp.zeros_like, grads) \
                if accumulate > 1 else None
            return new_params, new_opt, zeros

        def skip_opt(_):
            return params, state["opt_state"], (grads if accumulate > 1 else None)

        if accumulate > 1:
            # Accumulated grads are finite by construction (bad microbatches
            # contribute zeros above), so only do_step gates the application.
            # cond (not a gate) is right here: on the accumulate-1 microbatches
            # it skips the whole optimizer pass, which outweighs its overhead.
            new_params, new_opt, new_acc = jax.lax.cond(do_step, apply_opt, skip_opt, None)
            new_state = {"params": new_params, "batch_stats": new_stats,
                         "opt_state": new_opt, "grad_acc": new_acc}
        else:
            new_params, new_opt = optimizer.apply(
                params, grads, state["opt_state"], lr, update_gate=finite
            )
            new_state = {"params": new_params, "batch_stats": new_stats,
                         "opt_state": new_opt}
        return new_state, loss_log

    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh)
    # One batch-axis sharding as a pytree prefix: every batch leaf is
    # batch-major (image/bbox/cls/mask/valid and optional sample_weight).
    # With follow_batch_sharding, no in_shardings at all: jit adopts the
    # caller's committed per-leaf placement (spatial (data, space) batches
    # from parallel.spatial.shard_spatial_batch; the state is committed
    # replicated by init_state either way).
    if follow_batch_sharding:
        jitted = jax.jit(
            train_step, out_shardings=(repl, repl), donate_argnums=(0,),
        )
    else:
        jitted = jax.jit(
            train_step,
            in_shardings=(repl, bsh, None, None),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def init_state(variables):
        state = {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "opt_state": optimizer.init(variables["params"]),
        }
        if accumulate > 1:
            state["grad_acc"] = jax.tree_util.tree_map(
                jnp.zeros_like, variables["params"]
            )
        # Copy (not just place): train_step donates its state, and device_put is
        # a no-op for already-placed arrays — without the copy the caller's
        # ``variables`` would be invalidated by the first step.  Multi-process:
        # replicate_global assembles the global array from the identical
        # per-rank values (same seed) instead of a cross-host device_put.
        if jax.process_count() > 1:
            from ..parallel.mesh import replicate_global

            return replicate_global(state, mesh)
        state = jax.tree_util.tree_map(jnp.array, state)
        return jax.device_put(state, repl)

    return jitted, init_state


def make_eval_step(model, loss_fn, mesh, compute_dtype=jnp.float32):
    """Eval-mode forward + loss metrics; returns (model outputs, loss log, metric log)."""

    if hasattr(loss_fn, "set_paint_mesh"):
        loss_fn.set_paint_mesh(mesh)

    def eval_step(params, stats, batch):
        from ..models.layers import default_ctx

        ctx = default_ctx(train=False, dtype=compute_dtype)
        out, _ = model.apply(params, stats, _image_f32(batch["image"]), ctx)
        target = unpack_target(batch)
        loss_sum, loss_log, metric_log = loss_fn(out, target, training=False)
        loss_log = dict(loss_log, loss=loss_sum)
        return out, loss_log, metric_log

    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        eval_step,
        in_shardings=(repl, repl, bsh),
    )
