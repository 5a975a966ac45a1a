"""Localize a robustness-sweep scene's ghost tail: WHERE on the canvas,
WHICH camera pairs, and at WHAT fusion weights the large ray disagreements
happen. Distinguishes a real double image (both contributors at visible
weight) from a metric artifact (a sliver-weight contributor "inside"
bounds but invisible in the blend).

Usage: python tools/diag_ghost.py 2 [--distortion]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))
sys.path.insert(0, os.path.join(_REPO, "tools"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_id", type=int)
    ap.add_argument("--distortion", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from autopanostitch_tpu.utils import compile_cache

    compile_cache.enable()

    import dataclasses

    import robustness_sweep as rs

    from autopanostitch_tpu.models import pipeline
    from autopanostitch_tpu.utils.image_io import ImageSet

    p = rs.sample_scene(args.scene_id)
    print({k: (round(v, 3) if isinstance(v, float) else v) for k, v in p.items()})
    views, Rs_true, env = rs.build_scene(p)
    n = len(views)
    stack = (np.stack(views) * 255).astype(np.uint8)
    sizes = np.tile(np.array([rs.VIEW_H, rs.VIEW_W], np.int32), (n, 1))
    iset = ImageSet(images=stack, sizes=sizes, names=[f"v{k}" for k in range(n)])
    cfg = rs._sweep_config()
    if args.distortion:
        cfg = dataclasses.replace(
            cfg, bundle=dataclasses.replace(cfg.bundle, estimate_distortion=True)
        )
    res = pipeline.stitch(iset, cfg)
    print("n_panoramas", len(res.panoramas),
          "members", [len(pr["members"]) for pr in res.panoramas])
    pr = res.panoramas[0]
    g = rs._fused_sample_geometry(pr, p, Rs_true)
    inside, tw, w = g["inside"], g["tw"], g["weight"]
    P = len(g["ys"])
    worst = np.zeros(P)
    worst_pair = np.full((P, 2), -1)
    for i in range(n):
        for j in range(i + 1, n):
            both = inside[i] & inside[j]
            if not both.any():
                continue
            dot = np.clip(np.sum(tw[i][both] * tw[j][both], -1), -1, 1)
            ang = np.arccos(dot)
            idx = np.nonzero(both)[0]
            upd = ang > worst[idx]
            worst[idx[upd]] = ang[upd]
            worst_pair[idx[upd]] = (i, j)
    gp = worst * p["f_true"]
    bad = gp > 10.0
    print(f"ghost>10px at {bad.sum()}/{P} sampled pixels "
          f"(p50={np.percentile(gp,50):.2f} p99={np.percentile(gp,99):.2f})")
    if bad.any():
        from collections import Counter

        pairs = Counter(tuple(t) for t in worst_pair[bad])
        print("worst pairs:", pairs.most_common(8))
        # weight structure at the bad pixels: is the disagreeing
        # contributor visible in the blend?
        wsum = w.sum(0)
        for (i, j), cnt in pairs.most_common(4):
            sel = bad & (worst_pair[:, 0] == i) & (worst_pair[:, 1] == j)
            wi = w[i][sel] / np.maximum(wsum[sel], 1e-9)
            wj = w[j][sel] / np.maximum(wsum[sel], 1e-9)
            zi = g["z"][i][sel]
            zj = g["z"][j][sel]
            print(f"  pair ({i},{j}) n={cnt}: rel-weight i "
                  f"p50={np.percentile(wi,50):.4f} max={wi.max():.4f}; j "
                  f"p50={np.percentile(wj,50):.4f} max={wj.max():.4f}; "
                  f"z_i p50={np.percentile(zi,50):.3f} "
                  f"z_j p50={np.percentile(zj,50):.3f}")
        ys, xs = g["ys"][bad], g["xs"][bad]
        print(f"  bad-pixel canvas extent: x [{xs.min():.0f},{xs.max():.0f}] "
              f"y [{ys.min():.0f},{ys.max():.0f}] of canvas "
              f"{pr['projections']['spherical'].shape}")
    # per-camera yaw error vs truth (gauge-aligned)
    R_est = np.asarray(pr["R_render"])
    M = sum(R_est[i].T @ Rs_true[i] for i in range(n))
    U, _, Vt = np.linalg.svd(M)
    G = U @ Vt
    if np.linalg.det(G) < 0:
        U[:, -1] *= -1
        G = U @ Vt
    errs = []
    for i in range(n):
        E = (R_est[i] @ G).T @ Rs_true[i]
        ang = np.degrees(np.arccos(np.clip((np.trace(E) - 1) / 2, -1, 1)))
        errs.append(ang)
    f_est = np.asarray(pr["ba"]["cameras"].f)
    k1_est = (np.zeros(n) if pr["ba"]["cameras"].k1 is None
              else np.asarray(pr["ba"]["cameras"].k1))
    for i in range(n):
        print(f"  cam {i}: rot_err {errs[i]:7.3f} deg  f {f_est[i]:7.1f} "
              f"({(f_est[i]/p['f_true']-1)*100:+5.2f}%)  k1 {k1_est[i]:+.4f}")


if __name__ == "__main__":
    main()
