"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (the standard JAX pattern).

The container's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel), so
the env var alone is not enough — we must override jax.config after import
but before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
