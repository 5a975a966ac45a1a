"""Measure the 'approximate' global matcher: recall vs exact + throughput.

VERDICT r4 item 9: `MatchingConfig.method='approximate'` (random-projection
sketch prefilter + exact re-rank, `ops/matching.global_knn`) replaced the
reference's three approximate float matchers (pca2nn / kdtree /
subsetpdist2, `matchFeaturesScratch.m:368-573`) but had no recorded
recall/speed measurement. This tool produces one, at pooled-descriptor
scales bracketing real workloads (50k-500k), and writes
docs/results/approx_match.json.

Descriptors are REAL SIFT descriptors pooled from the reference montage
sheets (recall on structured data is the honest number; iid gaussian
vectors have no meaningful neighbours). Pools larger than the sheets
provide are built by jittering real descriptors with small gaussian noise
and re-normalizing — preserving the cluster structure that makes the
2-NN ratio test hard.

Usage:  python tools/measure_approx_match.py            # on the TPU
        python tools/measure_approx_match.py --sizes 50000
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pool(target: int):
    """(desc (F, 128) float32 L2-normalized, image_id (F,)) from real sheets."""
    import jax.numpy as jnp

    from autopanostitch_tpu.config import DetectorConfig
    from autopanostitch_tpu.models import features as features_stage
    from autopanostitch_tpu.utils import real_data

    descs, ids = [], []
    img_id = 0
    for sheet in ("CMU0", "grandcanyon", "yellowstone", "shanghai"):
        try:
            tiles = real_data.load_montage_tiles(sheet)
        except Exception:
            continue
        iset = real_data.image_set_from_arrays(tiles, 480, 480)
        imgs = jnp.asarray(iset.images.astype(np.float32) / 255.0)
        feats = features_stage.extract_features(
            imgs, iset.sizes, DetectorConfig(max_keypoints=1024, num_octaves=4)
        )
        m = np.asarray(feats.mask)
        d = np.asarray(feats.desc)
        for i in range(d.shape[0]):
            di = d[i][m[i]]
            descs.append(di)
            ids.append(np.full(len(di), img_id, np.int32))
            img_id += 1
        if sum(len(x) for x in descs) >= target:
            break
    base = np.concatenate(descs) if descs else np.zeros((0, 128), np.float32)
    base_id = np.concatenate(ids) if ids else np.zeros((0,), np.int32)
    if len(base) == 0:
        raise SystemExit("no reference montage sheets available")
    rng = np.random.default_rng(0)
    out_d, out_i = [base], [base_id]
    total = len(base)
    rep = 1
    while total < target:
        jit = base + rng.normal(0, 0.05, base.shape).astype(np.float32)
        jit /= np.maximum(np.linalg.norm(jit, axis=1, keepdims=True), 1e-8)
        out_d.append(jit)
        out_i.append(base_id + rep * (base_id.max() + 1))
        total += len(base)
        rep += 1
    d = np.concatenate(out_d)[:target]
    i = np.concatenate(out_i)[:target]
    return d.astype(np.float32), i


def run_one(F: int, block: int = 1024):
    import jax
    import jax.numpy as jnp

    from autopanostitch_tpu.ops import matching as mt

    desc_np, ids_np = build_pool(F)
    desc = jnp.asarray(desc_np)
    ids = jnp.asarray(ids_np)
    mask = jnp.ones((F,), bool)

    knn = jax.jit(mt.global_knn, static_argnames=("k", "block", "method",
                                                  "compute_dtype"))

    def timed(method):
        idx, dist = knn(desc, mask, ids, k=4, block=block, method=method)
        jax.block_until_ready(idx)  # compile
        t0 = time.perf_counter()
        idx, dist = knn(desc, mask, ids, k=4, block=block, method=method)
        jax.block_until_ready(idx)
        dt = time.perf_counter() - t0
        return np.asarray(idx), np.asarray(dist), dt

    idx_ex, dist_ex, t_ex = timed("exhaustive")
    idx_ap, dist_ap, t_ap = timed("approximate")

    # recall@1 / @2: do the exact 1st/2nd neighbours appear in the
    # approximate k-list (the ratio test consumes exactly these two)
    r1 = float((idx_ap == idx_ex[:, 0:1]).any(1).mean())
    r2 = float((idx_ap == idx_ex[:, 1:2]).any(1).mean())
    # ratio-test decision agreement (Lowe 0.8 on cross-image best/second)
    rat_ex = dist_ex[:, 0] / np.maximum(dist_ex[:, 1], 1e-12)
    rat_ap = dist_ap[:, 0] / np.maximum(dist_ap[:, 1], 1e-12)
    acc_ex = rat_ex < 0.8**2  # squared-distance ratio semantics
    acc_ap = (rat_ap < 0.8**2) & (idx_ap[:, 0] == idx_ex[:, 0])
    agree = float(np.mean(acc_ex == acc_ap))
    match_recall = float(
        np.sum(acc_ex & acc_ap) / max(np.sum(acc_ex), 1)
    )
    gdist = F * F / 1e9
    return {
        "F": F,
        "exact_s": round(t_ex, 3),
        "approx_s": round(t_ap, 3),
        "speedup": round(t_ex / t_ap, 2),
        "exact_gdist_per_s": round(gdist / t_ex, 2),
        "approx_gdist_per_s_equiv": round(gdist / t_ap, 2),
        "recall_at_1": round(r1, 4),
        "recall_at_2": round(r2, 4),
        "ratio_decision_agreement": round(agree, 4),
        "accepted_match_recall": round(match_recall, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[50_000, 200_000, 500_000])
    ap.add_argument("--out", default="docs/results/approx_match.json")
    args = ap.parse_args()

    from autopanostitch_tpu.utils import compile_cache

    compile_cache.enable()
    import jax

    results = {"device": str(jax.devices()[0]), "runs": []}
    for F in args.sizes:
        print(f"pool F={F} ...", flush=True)
        r = run_one(F)
        print(json.dumps(r), flush=True)
        results["runs"].append(r)
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
