"""Device mesh + sharding rules for data-parallel training.

Replaces the reference's NCCL DistributedDataParallel stack (trainer/builder.py:87,
train.py:43): one 1-D ``Mesh`` over all devices with the batch axis sharded; XLA
GSPMD inserts gradient all-reduces and global BatchNorm statistics (SyncBN) for
free because every cross-batch reduction inside the jitted step spans the mesh.
Multi-host initialization goes through ``jax.distributed`` instead of
``torch.distributed.launch``; there is no filesystem rendezvous anywhere — metric
counters are device scalars aggregated inside the compiled step (SURVEY.md §2.12).
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host init (no-op for single-host)."""
    if num_processes and num_processes > 1:
        # Long shutdown grace: rank 0 finishes an epoch with COCO scoring +
        # checkpoint serialization after the other ranks' last collective;
        # on loaded hosts that tail can exceed the 300s default and the
        # coordination service then kills the whole job at the Shutdown
        # barrier.
        jax.distributed.initialize(coordinator, num_processes, process_id,
                                   shutdown_timeout_seconds=1800)
        # Rendezvous NOW, while every process is still at the same (cheap)
        # point.  The first cross-process collective creates the backend's
        # communicator context under a short internal timeout (Gloo on CPU:
        # 30s KV-store wait); model/dataset build before the trainer's first
        # real collective can skew processes past it on loaded hosts.  The
        # context created here is reused by every later collective.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("orienmask:init")


def data_mesh(n_devices=None, devices=None):
    """1-D mesh over (up to) n_devices local devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicate_sharding(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh, ndim=None):
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch, mesh):
    """Device-put a host batch dict with the leading axis sharded over the mesh.

    Single-process: plain ``device_put`` with the batch sharding (the host holds
    the full global batch).  Multi-process (``jax.distributed`` runs, the
    reference's ``torch.distributed.launch`` analogue at dist_train.sh:7-10):
    each process holds only its rank-shard of the global batch, so the global
    array must be assembled with ``jax.make_array_from_process_local_data`` —
    a ``device_put`` with a global-mesh sharding would mis-shard the local data.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        import numpy as np

        def put(v):
            return jax.make_array_from_process_local_data(sh, np.asarray(v))

        return {k: (put(v) if k != "info" else v) for k, v in batch.items()}
    return {
        k: (jax.device_put(v, sh) if k != "info" else v) for k, v in batch.items()
    }


def replicate_global(tree, mesh):
    """Place a pytree replicated over a (possibly multi-process) mesh.

    Single-process: plain ``device_put``.  Multi-process: every process must
    already hold the SAME values (deterministic seeded init, or the same
    checkpoint file read by every rank) — the global replicated array is
    assembled from per-process local copies with
    ``host_local_array_to_global_array``, because a ``device_put`` of a
    process-local (or committed single-device) array onto a global-mesh
    sharding demands a cross-host transfer the CPU/Gloo backend refuses.
    """
    repl = replicate_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, repl)
    import numpy as np

    from jax.experimental import multihost_utils

    tree = jax.tree_util.tree_map(np.asarray, tree)
    return multihost_utils.host_local_array_to_global_array(tree, mesh, P())


def local_shard(tree):
    """Process-local block of batch-sharded global arrays -> host numpy.

    Inverse of ``shard_batch`` for a computation's outputs in multi-process
    runs: ``jax.device_get`` on a global array spans non-addressable devices
    and raises, so pull only this process's addressable shards, concatenated
    along the batch axis in global-index order — exactly the rows this
    process's ``make_array_from_process_local_data`` supplied (jax.devices()
    order is process-major)."""
    import numpy as np

    def pull(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            shards = sorted(x.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        return np.asarray(x)

    return jax.tree_util.tree_map(pull, tree)
