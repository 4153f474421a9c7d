"""Process/topology helpers (reference utils/envs.py, minus torch.distributed)."""

import jax


def get_device_rank():
    return jax.process_index()


def get_world_size():
    return jax.process_count()


def get_local_device_count():
    return jax.local_device_count()


def reduce_sum(tree):
    """Cross-process sum of a host pytree (reference utils/envs.py:23-31).

    Inside jitted steps reductions are XLA psums already; this is for the rare
    host-level value (e.g. dataset statistics) in multi-host runs.
    """
    if get_world_size() < 2:
        return tree
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(tree)
    return jax.tree_util.tree_map(lambda x: x.sum(axis=0), gathered)


def reduce_mean(tree):
    if get_world_size() < 2:
        return tree
    summed = reduce_sum(tree)
    n = get_world_size()
    return jax.tree_util.tree_map(lambda x: x / n, summed)
