"""Process/topology helpers (reference utils/envs.py, minus torch.distributed)."""

import jax


def get_device_rank():
    return jax.process_index()


def get_world_size():
    return jax.process_count()


def get_local_device_count():
    return jax.local_device_count()
