"""Shared body + subprocess worker for the 2-process jax.distributed test.

Exercises the true multi-process data-parallel path the reference reaches via
``torch.distributed.launch`` (reference dist_train.sh:7-10): each process holds
only its rank-shard of the global batch, feeds it through
``parallel.mesh.shard_batch`` (which must use
``jax.make_array_from_process_local_data`` when process_count > 1), runs ONE
real ``make_train_step`` step (grads + SyncBN batch statistics globally reduced
by GSPMD across BOTH processes), and runs the COCO shard-merge protocol
(trainer/trainer.py Trainer._merge_coco_shards).

Run as a script:  python dist_worker.py <coordinator> <n_procs> <pid> <outdir>
The parent test (test_distributed.py) imports the helpers to compute the
single-process ground truth on its own 8-device mesh.
"""

import json
import os
import sys

import numpy as np

TINY_GT = {
    "images": [{"id": 1, "height": 32, "width": 32},
               {"id": 2, "height": 32, "width": 32}],
    "categories": [{"id": 1, "name": "thing"}],
    "annotations": [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [4, 4, 10, 10],
         "area": 100, "iscrowd": 0, "segmentation": [[4, 4, 14, 4, 14, 14, 4, 14]]},
        {"id": 2, "image_id": 2, "category_id": 1, "bbox": [8, 8, 12, 12],
         "area": 144, "iscrowd": 0, "segmentation": [[8, 8, 20, 8, 20, 20, 8, 20]]},
    ],
}


class TinyConvBNModel:
    """One ConvBNLeaky + global-mean head: the smallest model that still
    exercises cross-process SyncBN (global batch statistics under GSPMD)."""

    def __init__(self):
        from orienmask_tpu.models.layers import ConvBNLeaky

        self.layer = ConvBNLeaky(3, 8, 3, stride=1, padding=1)

    def init_variables(self, key):
        params, stats = self.layer.init(key)
        return {"params": {"l1": params}, "batch_stats": {"l1": stats}}

    def apply(self, params, stats, x, ctx):
        y, new_stats = self.layer.apply(params["l1"], stats["l1"], x, ctx)
        return y, {"l1": new_stats}


class TinyLoss:
    """loss = mean(out^2) + mean(bbox): touches both the model output and a
    target leaf, so the batch pytree sharding is exercised end to end."""

    def __call__(self, out, target, training=True):
        import jax.numpy as jnp

        loss = jnp.mean(jnp.square(out)) + jnp.mean(target["bbox"])
        return loss, {"l2": loss}, {}


def global_batch(batch_size=8, size=16, n_inst=2):
    rng = np.random.default_rng(42)
    return {
        "image": rng.standard_normal((batch_size, size, size, 3)).astype(np.float32),
        "bbox": rng.uniform(0.2, 0.8, (batch_size, n_inst, 4)).astype(np.float32),
        "cls": np.zeros((batch_size, n_inst), np.int32),
        "mask": np.ones((batch_size, n_inst, size, size), bool),
        "valid": np.ones((batch_size, n_inst), bool),
    }


def run_one_step(mesh, local_batch):
    """Build tiny model + optimizer, run ONE train step on ``local_batch``
    (each process passes its process-local shard), return host pytrees."""
    import jax

    from orienmask_tpu.optim import SGD
    from orienmask_tpu.parallel.mesh import shard_batch
    from orienmask_tpu.trainer.train_state import make_train_step

    model = TinyConvBNModel()
    variables = model.init_variables(jax.random.PRNGKey(0))
    optimizer = SGD(lr=0.1, momentum=0.9, weight_decay=1e-4)
    train_step, init_state = make_train_step(
        model, TinyLoss(), optimizer, mesh, accumulate=1)
    state = init_state(variables)
    sharded = shard_batch(local_batch, mesh)
    state, logs = train_step(state, sharded, 0.1, True)
    jax.block_until_ready(state["params"])
    return (
        jax.device_get(state["params"]),
        jax.device_get(state["batch_stats"]),
        float(logs["loss"]),
    )


def run_one_spatial_step(n_procs, local_batch):
    """ONE train step on a (data=n_procs, space=local_device_count) mesh:
    image rows sharded within each process, batch across processes — the
    multi-process spatial path (shard_spatial_batch's
    make_array_from_process_local_data branch).  Must equal the DP step on
    the same global batch."""
    import jax

    from orienmask_tpu.optim import SGD
    from orienmask_tpu.parallel.spatial import (
        shard_spatial_batch, spatial_mesh, spatial_train_step)

    mesh = spatial_mesh(n_space=jax.local_device_count(), n_data=n_procs)
    model = TinyConvBNModel()
    variables = model.init_variables(jax.random.PRNGKey(0))
    optimizer = SGD(lr=0.1, momentum=0.9, weight_decay=1e-4)
    train_step, init_state = spatial_train_step(
        model, TinyLoss(), optimizer, mesh)
    state = init_state(variables)
    sharded = shard_spatial_batch(local_batch, mesh)
    state, logs = train_step(state, sharded, 0.1, True)
    jax.block_until_ready(state["params"])
    return (
        jax.device_get(state["params"]),
        jax.device_get(state["batch_stats"]),
        float(logs["loss"]),
    )


def run_coco_shard_merge(outdir, rank):
    """Rank-sharded detections -> the Trainer._merge_coco_shards protocol."""
    from orienmask_tpu.eval.coco_eval import COCOMetrics
    from orienmask_tpu.trainer.trainer import Trainer

    gt_path = os.path.join(outdir, "tiny_gt.json")
    if rank == 0 and not os.path.exists(gt_path):
        with open(gt_path, "w") as fh:
            json.dump(TINY_GT, fh)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("tiny_gt_written")

    metrics = COCOMetrics(gt_path, cat2label=[1], with_mask=False,
                          save_dir=outdir)
    # one detection per rank, distinguishable by image_id
    metrics.update_results({"bbox": [{
        "image_id": rank + 1, "category_id": 1, "score": 0.9,
        "bbox": [4.0 + rank, 4.0 + rank, 10.0, 10.0],
    }], "segm": []})

    class _Shim:
        pass

    shim = _Shim()
    shim.coco_metrics = metrics
    shim.checkpoint_dir = outdir
    shim.device_rank = rank
    Trainer._merge_coco_shards(shim)
    return metrics


def main():
    coordinator, n_procs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    import jax

    jax.distributed.initialize(coordinator, n_procs, pid)
    from orienmask_tpu.parallel.mesh import data_mesh

    n_local = jax.local_device_count()
    mesh = data_mesh()  # global mesh over all processes' devices

    batch = global_batch()
    # Process-local shard: contiguous block matching the mesh's device order
    # (process 0's devices come first in jax.devices()).
    per = batch["image"].shape[0] // n_procs
    local = {k: v[pid * per:(pid + 1) * per] for k, v in batch.items()}

    params, stats, loss = run_one_step(mesh, local)
    sp_params, sp_stats, sp_loss = run_one_spatial_step(n_procs, local)
    # spatial (data, space) step == DP step on the same global batch
    np.testing.assert_allclose(sp_loss, loss, rtol=1e-6, atol=1e-7)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(sp_params)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"spatial vs DP {pa}")

    # local_shard must invert shard_batch: a global computation's output,
    # pulled per process, equals the rows this process supplied (+1 here) in
    # local order — the multi-host COCO val path depends on this pairing.
    from orienmask_tpu.parallel.mesh import local_shard, shard_batch
    sharded = shard_batch({"image": local["image"]}, mesh)
    bumped = jax.jit(lambda t: {"image": t["image"] + 1.0})(sharded)
    pulled = local_shard(bumped)
    np.testing.assert_allclose(pulled["image"], local["image"] + 1.0,
                               rtol=1e-6)

    # Run-dir stamp broadcast (trainer/base.py): every rank must end up with
    # rank 0's string, not its own.
    from orienmask_tpu.utils.envs import broadcast_str
    stamp = broadcast_str(f"rank{pid}_stamp")
    assert stamp == "rank0_stamp", f"rank {pid} got {stamp!r}"

    metrics = run_coco_shard_merge(outdir, pid)
    n_results = len(metrics.bbox_results)

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            {"params": params, "batch_stats": stats})[0]:
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    np.savez(os.path.join(outdir, f"rank{pid}.npz"),
             loss=np.float64(loss), n_devices=len(jax.devices()),
             n_local=n_local, n_coco_results=n_results, **flat)
    print(f"rank {pid}: loss={loss:.6f} devices={len(jax.devices())} "
          f"coco_results={n_results} OK", flush=True)


if __name__ == "__main__":
    main()
