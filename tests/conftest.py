"""Test harness config: force an 8-device virtual CPU mesh (SURVEY.md §5.3)
so sharding/collective paths run in CI without TPU hardware.

NOTE: this environment's jax build (axon TPU plugin) IGNORES the
``JAX_PLATFORMS`` env var — ``jax.config.update("jax_platforms", ...)``
must be used instead, before the backend is first initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: repeat test runs skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lhvi_jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after every test module.

    The XLA CPU client segfaults (inside ``backend_compile_and_load``)
    once a single process accumulates roughly 230+ tests' worth of live
    compiled programs — observed reproducibly in round 5 at whatever
    test happened to compile next, independent of that test's content.
    Clearing per module keeps the live-executable count bounded; the
    persistent on-disk compile cache makes the re-traces cheap."""
    yield
    jax.clear_caches()
