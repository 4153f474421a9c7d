"""Host-keyed persistent XLA compilation cache, with a CPU-collectives guard.

Two distinct failure modes of jax's persistent compilation cache on the CPU
backend, both observed in this environment (jax 0.9.0):

1. Cross-host: the cache key does NOT include the host CPU's feature set,
   but XLA:CPU AOT results are machine-code blobs — loading an entry
   compiled on a different machine logs ``cpu_aot_loader.cc: ... could lead
   to execution errors such as SIGILL``.  Mitigation: key the directory by
   a fingerprint of the host CPU (``compile_cache_dir``).

2. Same-host: DESERIALIZED multi-device XLA:CPU executables wedge forever at
   collective rendezvous.  Reproduced deterministically: a freshly compiled
   8-virtual-device train step runs fine and writes its cache entry; the
   next process to load that entry blocks at 0%% CPU inside the first
   all-reduce (main thread stuck in ``device_get``, all tf_XLAEigen threads
   parked on futexes).  Mitigation: ``_install_cpu_collective_cache_guard``
   bypasses the persistent cache for exactly that class — CPU executables
   spanning >1 device — while single-device CPU programs and all TPU
   programs keep full caching.
"""

import hashlib
import os
import platform


def _host_fingerprint():
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    bits.append(line.split(":", 1)[1].strip())
                    break
    except OSError:
        pass
    return hashlib.sha256(" ".join(bits).encode()).hexdigest()[:12]


def compile_cache_dir(root):
    """Return the host-keyed cache directory under ``root`` (repo root)."""
    return os.path.join(root, ".jax_cache-" + _host_fingerprint())


def _install_cpu_collective_cache_guard():
    """Bypass the persistent cache for multi-device XLA:CPU executables.

    See module docstring, failure mode 2.  Wraps the private
    ``jax._src.compiler.compile_or_get_cached`` (both pxla call sites resolve
    it through the module attribute); falls back to doing nothing if jax's
    internals have moved — the guard is an environment workaround, not a
    correctness dependency.
    """
    try:
        from jax._src import compiler as _compiler

        orig = _compiler.compile_or_get_cached
        fresh = _compiler.backend_compile_and_load
    except Exception:
        return
    if getattr(orig, "_omtpu_cpu_guard", False):
        return

    import numpy as _np

    def compile_or_get_cached(backend, computation, devices, compile_options,
                              host_callbacks, executable_devices,
                              pgle_profiler=None):
        if backend.platform == "cpu" and _np.asarray(devices).size > 1:
            return fresh(backend, computation, executable_devices,
                         compile_options, host_callbacks)
        return orig(backend, computation, devices, compile_options,
                    host_callbacks, executable_devices, pgle_profiler)

    compile_or_get_cached._omtpu_cpu_guard = True
    _compiler.compile_or_get_cached = compile_or_get_cached


def enable_compile_cache(root, min_compile_secs=5.0):
    """Point JAX's persistent compilation cache at the host-keyed directory.

    Safe to call before or after backend init; never raises.
    """
    import jax

    _install_cpu_collective_cache_guard()
    path = compile_cache_dir(root)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:
        return None
    return path
