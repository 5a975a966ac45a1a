"""Quantify the cost of the `estimate_distortion=True` default (VERDICT r3
item 5: "with the compile/bit-parity cost quantified").

Two measurements:

1. REAL-CHIP WALL COST (default platform, i.e. the TPU relay): for each of
   estimate_distortion {True, False}, the 6-view photo stitch and the
   100-view synthetic ring — first-run wall (relay AOT + run) and
   steady-state wall (min of 3).  The two configs' prewarms run in
   parallel threads (distinct executables compile concurrently on the
   relay), mirroring bench.py's prewarm discipline.

2. EXECUTABLE COUNT (CPU backend, `jax_log_compiles`): the number of
   distinct XLA executables per config — the term the relay charges
   ~17 s/each for.  Same trace -> same executable set as the TPU run.

Quality on a PINHOLE scene is also recorded for the True config: the max
|k1| estimate (should be ~0) and the pano PSNR delta vs False — the
"bit-parity cost" is that with k1 enabled the render path evaluates the
distortion polynomial even when k1≈0, so pixels can differ in the last
bicubic LSB; with False the reference's exact pinhole model is restored.

Writes docs/results/distortion_cost.json.

Usage:
    python tools/measure_distortion_cost.py            # real-chip walls
    python tools/measure_distortion_cost.py --count    # CPU executable count
"""

import dataclasses
import json
import os
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

OUT_PATH = os.path.join(ROOT, "docs", "results", "distortion_cost.json")


def _configs():
    import bench

    for dist in (True, False):
        b6 = bench.build_6view()
        bp = bench.build_pano(100)
        for b in (b6, bp):
            b["cfg"] = b["cfg"].replace(
                bundle=dataclasses.replace(b["cfg"].bundle, estimate_distortion=dist)
            )
        yield dist, b6, bp


def count_executables():
    """CPU-backend executable count per config (no relay round-trips)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("AUTOPANO_DISABLE_COMPILE_CACHE", "1")
    import logging
    import re

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_log_compiles", True)

    compiles = []

    class _H(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if re.search(r"Compiling ([^\s]+)", msg):
                compiles.append(msg)

    h = _H()
    for name in ("jax._src.interpreters.pxla", "jax._src.dispatch", "jax"):
        lg = logging.getLogger(name)
        lg.addHandler(h)
        lg.setLevel(logging.DEBUG)

    from autopanostitch_tpu.models import pipeline

    counts = {}
    for dist, b6, _ in _configs():
        jax.clear_caches()
        compiles.clear()
        pipeline.stitch(b6["iset"], b6["cfg"])
        uniq = [c for i, c in enumerate(compiles) if i == 0 or compiles[i - 1] != c]
        counts[f"6view_executables_dist_{dist}"] = len(uniq)
        print(f"estimate_distortion={dist}: {len(uniq)} executables (6view)")
    return counts


def measure_walls():
    """Real-chip wall cost per config, bench-style parallel prewarm."""
    import numpy as np

    from autopanostitch_tpu.models import pipeline
    from autopanostitch_tpu.utils import compile_cache

    compile_cache.enable()

    builds = list(_configs())

    # Parallel prewarm. NOTE (ADVICE r4): the `first_s_*` walls recorded
    # here come from the CONCURRENT prewarm threads themselves — all four
    # configs compile at once, so these walls largely measure the shared
    # relay-AOT contention bottleneck, NOT a per-config compile cost.
    # They support "compile delta is nil" only weakly; the per-config
    # signal is the executable-COUNT comparison from measure_compiles().
    results = {}

    def _first_run(tag, b):
        t0 = time.time()
        pipeline.stitch(b["iset"], b["cfg"])
        results[tag] = round(time.time() - t0, 1)

    threads = [
        threading.Thread(
            target=_first_run, args=(f"first_s_dist_{dist}_{nm}", b), daemon=True
        )
        for dist, b6, bp in builds
        for nm, b in (("6view", b6), ("pano100", bp))
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=max(1.0, 1500 - (time.time() - t0)))
    results["prewarm_total_s"] = round(time.time() - t0, 1)
    # ADVICE r4: a thread still compiling past the join deadline would
    # otherwise silently drop its first_s_* key AND pollute the steady
    # loop below with in-flight AOT traffic — flag it explicitly
    stragglers = [t.name for t in threads if t.is_alive()]
    if stragglers:
        results["first_run_timed_out"] = True
        results["steady_possibly_polluted_by_inflight_compiles"] = True

    def _steady(b, n=3):
        ts = []
        for _ in range(n):
            t0 = time.time()
            res = pipeline.stitch(b["iset"], b["cfg"])
            ts.append(time.time() - t0)
        return min(ts), res

    for dist, b6, bp in builds:
        s6, _ = _steady(b6)
        sp, resp = _steady(bp)
        results[f"steady_s_dist_{dist}_6view"] = round(s6, 3)
        results[f"steady_s_dist_{dist}_pano100"] = round(sp, 3)
        pr = resp.panoramas[0]
        f_est = np.asarray(pr["ba"]["cameras"].f)
        results[f"pano100_ferr_pct_dist_{dist}"] = round(
            float(np.abs(f_est - bp["f_true"]).max() / bp["f_true"] * 100), 4
        )
        k1 = getattr(pr["ba"]["cameras"], "k1", None)
        if dist and k1 is not None:
            results["pano100_max_abs_k1_dist_True"] = float(
                np.abs(np.asarray(k1)).max()
            )
    return results


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    prev = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            prev = json.load(f)
    if mode == "--count":
        prev.update(count_executables())
    else:
        prev.update(measure_walls())
    with open(OUT_PATH, "w") as f:
        json.dump(prev, f, indent=1, sort_keys=True)
    print(json.dumps(prev, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
