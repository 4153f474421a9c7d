"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-device sharding paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4).  The container's
sitecustomize force-registers the 'axon' TPU backend and overrides JAX_PLATFORMS,
so we must flip the platform through jax.config *after* import but before any
backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# This box has a single CPU core: XLA compiles of the full model take minutes.
# A persistent compilation cache makes reruns cheap.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
