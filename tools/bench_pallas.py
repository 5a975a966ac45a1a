"""Re-benchmark the two default-off Pallas kernels on the CURRENT toolchain.

VERDICT r3 item 8: "no default-off kernel without a current-toolchain
measurement". This tool produces that measurement on the real TPU chip:

1. `ops/pallas/window_gather.py` vs the XLA flat dynamic_slice window fetch
   inside SIFT extraction — timed end-to-end (`features.extract_features`)
   at 50 images with `sift._use_pallas_gather` monkeypatched, because the
   fetch formulation changes the surrounding layout (slab padding, chunk
   quantum 1024 vs 256), so only the full stage is a fair comparison.
2. `ops/pallas/match_kernel.two_nn_pallas` vs `matching.global_knn`
   (XLA streaming top-k) on a pooled descriptor matrix of ~50k rows —
   both exact 2-NN over the same data, timed steady-state.

Timing rule (see .claude/skills/verify): sync by pulling a scalar off the
device — block_until_ready is unreliable through the axon relay.

Usage: python tools/bench_pallas.py [--views N] [--desc F]
Writes docs/results/pallas_rebench.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _sync(x) -> float:
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def _time_best(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _sync(fn())
        best = min(best, time.time() - t0)
    return best


def bench_window_gather(n_views: int) -> dict:
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    import synthdata

    from autopanostitch_tpu.models import features
    from autopanostitch_tpu.ops import sift

    env, views, _, _ = synthdata.rotational_views(
        5, n_views=n_views, f=330.0, size=(480, 360), yaw_step=2 * np.pi / n_views
    )
    stack = jnp.asarray(np.stack(views, dtype=np.float32))
    sizes = np.tile(np.array([[360, 480]], np.int32), (n_views, 1))

    out = {}
    for use_pallas in (False, True):
        orig = sift._use_pallas_gather
        sift._use_pallas_gather = lambda: use_pallas  # noqa: E731
        try:
            jax.clear_caches()

            def run():
                f = features.extract_features(stack, sizes)
                return f.xy

            t_first = time.time()
            _sync(run())
            compile_s = time.time() - t_first
            steady = _time_best(run, reps=3)
            key = "pallas" if use_pallas else "xla"
            out[f"extract_{key}_s"] = round(steady, 3)
            out[f"extract_{key}_compile_s"] = round(compile_s, 1)
            print(f"window fetch [{key}]: {steady:.3f} s steady "
                  f"({compile_s:.0f} s first)", flush=True)
        finally:
            sift._use_pallas_gather = orig
    out["winner"] = "pallas" if out["extract_pallas_s"] < out["extract_xla_s"] else "xla"
    return out


def bench_match_kernel(n_desc: int) -> dict:
    from autopanostitch_tpu.ops import matching as mt
    from autopanostitch_tpu.ops.pallas.match_kernel import two_nn_pallas

    r = np.random.default_rng(0)
    desc = jnp.asarray(r.normal(size=(n_desc, 128)).astype(np.float32))
    ids = jnp.asarray((np.arange(n_desc) // (n_desc // 50)).astype(np.int32))
    mask = jnp.ones((n_desc,), bool)
    self_idx = jnp.arange(n_desc, dtype=jnp.int32)

    out = {"n_desc": n_desc}

    def run_xla():
        idx, dist = mt.global_knn(desc, mask, ids, k=2, block=1024)
        return dist

    _sync(run_xla())
    out["knn_xla_s"] = round(_time_best(run_xla), 3)

    def run_pallas():
        _, d1, _ = two_nn_pallas(desc, ids, desc, ids, self_idx)
        return d1

    _sync(run_pallas())
    out["knn_pallas_s"] = round(_time_best(run_pallas), 3)
    gd = n_desc * n_desc / 1e9
    out["knn_xla_gdist_s"] = round(gd / out["knn_xla_s"], 2)
    out["knn_pallas_gdist_s"] = round(gd / out["knn_pallas_s"], 2)
    out["winner"] = "pallas" if out["knn_pallas_s"] < out["knn_xla_s"] else "xla"
    print(f"2-NN {n_desc} desc: xla {out['knn_xla_s']} s "
          f"({out['knn_xla_gdist_s']} Gdist/s), pallas {out['knn_pallas_s']} s "
          f"({out['knn_pallas_gdist_s']} Gdist/s)", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=50)
    ap.add_argument("--desc", type=int, default=50_000)
    ap.add_argument("--skip-gather", action="store_true")
    ap.add_argument("--skip-match", action="store_true")
    args = ap.parse_args()

    res = {"toolchain": jax.__version__, "device": str(jax.devices()[0])}
    if not args.skip_match:
        res["match_kernel"] = bench_match_kernel(args.desc)
    if not args.skip_gather:
        res["window_gather"] = bench_window_gather(args.views)
    out = Path(__file__).resolve().parents[1] / "docs/results/pallas_rebench.json"
    out.write_text(json.dumps(res, indent=2))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
