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
    flags += " --xla_force_host_platform_device_count=8"
# 8 virtual device threads share ONE physical core here. XLA:CPU aborts the
# process (CHECK-fail in rendezvous.cc) if a cross-device collective's
# participants don't all arrive within 40s — under late-suite load the
# sharded train-step tests trip that spuriously. Give collectives real slack.
if "collective" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=900"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Dev boxes here can have a single CPU core: XLA compiles of the full model
# take minutes, so use a persistent compilation cache. Host-keyed: a stale
# cross-machine cache loads bad AOT code that wedges collective rendezvous
# (utils/cache.py).
from orienmask_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute rehearsal; skipped unless ORIENMASK_RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    if os.environ.get("ORIENMASK_RUN_SLOW"):
        return
    skip = _pytest.mark.skip(reason="slow rehearsal (set ORIENMASK_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
