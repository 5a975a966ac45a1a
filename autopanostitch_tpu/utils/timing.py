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


class DispatchCounter:
    """Count device dispatches (executable invocations) per stage.

    On the axon relay every dispatch costs a ~25 ms round-trip, so the
    dispatch COUNT per stage — not just its wall time — is the quantity to
    minimize (VERDICT r4 item 1). jit's C++ fastpath bypasses Python on
    cache hits, so while active the counter disables the fastpath
    (`_get_fastpath_data` -> None) and wraps the Python executable call.
    Use on an UNTIMED run only: the Python dispatch path is slower.

    Counts depend only on program structure and shapes, so a CPU-backend
    counting run reports the same numbers as the TPU run.

    >>> with DispatchCounter() as dc:
    ...     with dc.stage("features"): ...
    >>> dc.per_stage  # {"features": 7, ...}; dc.total
    """

    def __init__(self):
        self.per_stage: Dict[str, int] = {}
        self.total = 0
        self.by_name: Dict[str, int] = {}
        self._stack: List[str] = []

    def __enter__(self):
        import jax._src.interpreters.pxla as pxla
        import jax._src.pjit as pj

        self._orig_fastpath = pj._get_fastpath_data
        self._orig_call = pxla.ExecuteReplicated.__call__
        pj._get_fastpath_data = lambda *a, **k: None
        counter = self

        def counted(ex_self, *args):
            counter.total += 1
            counter.by_name[ex_self.name] = counter.by_name.get(ex_self.name, 0) + 1
            if counter._stack:
                s = counter._stack[-1]
                counter.per_stage[s] = counter.per_stage.get(s, 0) + 1
            return counter._orig_call(ex_self, *args)

        pxla.ExecuteReplicated.__call__ = counted
        return self

    def __exit__(self, *a):
        import jax._src.interpreters.pxla as pxla
        import jax._src.pjit as pj

        pj._get_fastpath_data = self._orig_fastpath
        pxla.ExecuteReplicated.__call__ = self._orig_call

    @contextlib.contextmanager
    def stage(self, name: str):
        self._stack.append(name)
        try:
            yield
        finally:
            self._stack.pop()


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
