"""Persistent XLA compilation cache.

A fresh process pays tens of seconds of XLA compilation before the first
stitch (round-1 measured 101 s cold). The JAX persistent cache writes
compiled executables to disk keyed by HLO fingerprint, so any later process
with the same shapes skips compilation entirely. Called by the CLI and
bench entry points; safe to call multiple times.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    import jax

    if os.environ.get("AUTOPANO_DISABLE_COMPILE_CACHE"):
        # test suites set this: writing certain executables (observed with
        # the CPU backend's shard_map programs) can SEGFAULT inside
        # jaxlib's executable serialization, killing the whole run; tests
        # gain nothing from the persistent cache anyway
        return ""
    if cache_dir is None:
        cache_dir = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "autopanostitch", "xla_cache",
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
