"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (the standard JAX pattern).

The container's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel), so
the env var alone is not enough — we must override jax.config after import
but before any backend is initialized.
"""

import os

# Never write the persistent XLA cache from tests: test_cli enables it
# process-globally, and serializing some later executables (CPU-backend
# shard_map programs) segfaults inside jaxlib — which killed entire suite
# runs mid-way (observed: Fatal Python error in
# compilation_cache.put_executable_and_time during test_pipeline).
os.environ.setdefault("AUTOPANO_DISABLE_COMPILE_CACHE", "1")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    A full-suite session compiles 1000+ CPU executables; around the
    ~500-compile mark XLA:CPU has been observed to SEGFAULT
    non-deterministically inside backend_compile (also once inside the
    cache writer) — killing the whole run. Clearing per module caps the
    live-executable count; shared helpers recompile (seconds per module)
    but the suite survives."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running guard tests (compile-count etc.)"
    )
