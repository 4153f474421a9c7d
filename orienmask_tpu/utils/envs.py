"""Process/topology helpers (reference utils/envs.py, minus torch.distributed)."""

import os

import jax


def is_tpu_platform():
    """True when the default JAX device is a TPU (incl. the axon relay).

    Shared gate for TPU-only Pallas kernels (ops/loss.py painter,
    ops/postprocess.py mask kernel) so the platform whitelist lives once.
    """
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        plat = "cpu"
    return "tpu" in plat or plat == "axon"


def cpu_subprocess_env(n_devices=None, base=None):
    """Environment for a subprocess that must initialize on the CPU backend.

    Three knobs that all have to agree (and are easy to drift apart when
    copy-pasted): ``JAX_PLATFORMS=cpu``; dropping ``PALLAS_AXON_*`` so the
    axon sitecustomize does not re-register the TPU plugin over it; and —
    when ``n_devices`` is given — replacing any stale
    ``--xla_force_host_platform_device_count`` in ``XLA_FLAGS`` with ours
    (the flag only takes effect before backend init, hence a subprocess).
    """
    env = dict(os.environ if base is None else base)
    env["JAX_PLATFORMS"] = "cpu"
    for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(k, None)
    if n_devices is not None:
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f
        )
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    return env


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


def broadcast_str(s, max_len=64):
    """Rank 0's string to every process (fixed-width uint8 transport).

    Used for the run-directory timestamp: every rank must derive the SAME
    checkpoint dir, and per-process clocks can disagree across a second
    boundary (reference relies on a single launcher process; here each rank
    computes its own stamp).
    """
    if get_world_size() < 2:
        return s
    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.int32)
    raw = s.encode()
    assert len(raw) <= max_len, f"string too long to broadcast: {len(raw)}"
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf)
    out = np.asarray(buf, np.int32)
    return bytes(out[out > 0].astype(np.uint8)).decode()


def reduce_mean(tree):
    if get_world_size() < 2:
        return tree
    summed = reduce_sum(tree)
    n = get_world_size()
    return jax.tree_util.tree_map(lambda x: x / n, summed)
