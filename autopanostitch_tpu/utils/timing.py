"""Per-stage wall-clock timing & logging.

Equivalent of the reference's tic/toc stage report (`main.m:88-137`) and
`diary` logging (`main.m:63-77`). For device work, timings are only
meaningful after synchronization — stages that return device arrays should
pass them to `sync` before the timer stops.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Dict, List, Optional, TextIO


def sync(tree):
    """Block until all device arrays in a pytree are ready."""
    import jax

    jax.block_until_ready(tree)
    return tree


@contextlib.contextmanager
def device_profile(trace_dir: Optional[str]):
    """Capture a `jax.profiler` device trace into trace_dir (view with
    TensorBoard / Perfetto). No-op when trace_dir is None — the zero-cost
    default, like the reference's optional verbose instrumentation.

    >>> with device_profile("/tmp/trace"):
    ...     result = pipeline.stitch(...)
    """
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class StageTimer:
    """Collects named stage durations and prints a report.

    >>> timer = StageTimer()
    >>> with timer.stage("features"):
    ...     ...
    >>> timer.report()
    """

    def __init__(self, out: Optional[TextIO] = None, verbose: bool = True):
        self.durations: List[tuple] = []
        self.out = out or sys.stdout
        self.verbose = verbose
        self._t_start = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.durations.append((name, dt))
        if self.verbose:
            print(f"{name} execution time: {dt:.3f} seconds", file=self.out)

    def total(self) -> float:
        return time.perf_counter() - self._t_start

    def report(self) -> Dict[str, float]:
        d = dict(self.durations)
        if self.verbose:
            print(f"Total execution time: {self.total():.3f} seconds", file=self.out)
        return d


class Tee:
    """Duplicate stdout to a log file (the reference's `diary log.txt`)."""

    def __init__(self, path: str):
        self.file = open(path, "a")
        self.stdout = sys.stdout

    def write(self, data):
        self.file.write(data)
        self.stdout.write(data)

    def flush(self):
        self.file.flush()
        self.stdout.flush()

    def close(self):
        sys.stdout = self.stdout
        self.file.close()

    def __enter__(self):
        sys.stdout = self
        return self

    def __exit__(self, *a):
        self.close()


def report_device_memory(out: Optional[TextIO] = None) -> Optional[Dict[str, float]]:
    """Print / return HBM usage of the first device (the reference's
    `utils/reportGPUMemory.m`). Returns None when stats are unavailable
    (e.g. CPU backend)."""
    import jax

    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        stats = None
    if not stats:
        return None
    used = stats.get("bytes_in_use", 0) / 1e6
    limit = stats.get("bytes_limit", 0) / 1e6
    print(f"Device memory: {used:.0f} / {limit:.0f} MB in use", file=out or sys.stdout)
    return {"used_mb": used, "limit_mb": limit}
