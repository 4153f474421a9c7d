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
        jax.distributed.initialize(coordinator, num_processes, process_id)


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
    """Device-put a host batch dict with the leading axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    return {
        k: (jax.device_put(v, sh) if k != "info" else v) for k, v in batch.items()
    }
