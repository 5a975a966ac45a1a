"""Is a robustness-sweep scene's focal bias in the DATA or the OPTIMIZER?

Builds one sweep scene, runs the pipeline to get the verified match graph
and the BA solution, then evaluates the same robust bidirectional
reprojection cost at (a) the BA estimate and (b) the ground-truth cameras
(true rotations + true focal + true k1). Also sweeps a global focal scale
around truth (re-using truth rotations) to show where the data's own
minimum sits.

cost(truth) < cost(BA)  -> optimizer problem (caps, phases, local minimum)
cost(BA) < cost(truth)  -> the matches themselves prefer the biased focal
                           (detection/localization bias), BA is innocent.

Usage: python tools/diag_ba_cost.py 25
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


def robust_cost(pairs, pair_idx, pair_mask, inliers, xy, Rs, fs, k1s, sizes,
                sigma=2.0):
    """Huber-weighted bidirectional reprojection cost over inlier matches.

    Mirrors models.bundle._pair_residual semantics EXACTLY (ADVICE r3:
    an earlier version distorted the projection into stored-image
    coordinates instead — a residual differing by the local distortion
    Jacobian near the corners): BOTH measured observations are
    undistorted by their camera's k1 and the residual is taken in
    PINHOLE space."""
    cost = 0.0
    n_res = 0
    rms_acc = []
    for p in range(len(pairs)):
        i, j = int(pairs[p][0]), int(pairs[p][1])
        sel = np.asarray(pair_mask[p], bool) & np.asarray(inliers[p], bool)
        if not sel.any():
            continue
        ki = np.asarray(pair_idx[p][sel, 0])
        kj = np.asarray(pair_idx[p][sel, 1])
        u_i = xy[i][ki]  # (M, 2)
        u_j = xy[j][kj]
        for (a, b, ua, ub) in ((i, j, u_i, u_j), (j, i, u_j, u_i)):
            ha, wa = sizes[a]
            hb, wb = sizes[b]
            cxa, cya = (wa - 1) / 2.0, (ha - 1) / 2.0
            cxb, cyb = (wb - 1) / 2.0, (hb - 1) / 2.0
            # undistort measured a-coords -> pinhole
            dx = ua[:, 0] - cxa
            dy = ua[:, 1] - cya
            r2 = (dx * dx + dy * dy) / (cxa * cxa + cya * cya)
            fac = 1.0 + k1s[a] * r2
            xp = dx * fac
            yp = dy * fac
            d = np.stack([xp / fs[a], yp / fs[a], np.ones_like(xp)], -1)
            dw = d @ Rs[a]  # R^T d  (world)
            dc = dw @ Rs[b].T  # into camera b
            z = np.maximum(dc[:, 2], 1e-6)
            ub_pin_x = fs[b] * dc[:, 0] / z
            ub_pin_y = fs[b] * dc[:, 1] / z
            # undistort the measured b-observation -> pinhole, compare in
            # pinhole space (exactly _pair_residual / _undistort_point)
            dxb = ub[:, 0] - cxb
            dyb = ub[:, 1] - cyb
            r2b = (dxb * dxb + dyb * dyb) / (cxb * cxb + cyb * cyb)
            facb = 1.0 + k1s[b] * r2b
            rx = ub_pin_x - dxb * facb
            ry = ub_pin_y - dyb * facb
            r2v = rx * rx + ry * ry
            w = np.where(r2v <= sigma * sigma, 1.0, sigma / np.sqrt(np.maximum(r2v, 1e-12)))
            cost += float(np.sum(w * r2v))
            rms_acc.append(r2v)
            n_res += len(rx)
    rms = float(np.sqrt(np.mean(np.concatenate(rms_acc)))) if rms_acc else 0.0
    return cost, rms, n_res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_id", type=int)
    ap.add_argument("--no-distortion", action="store_true")
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
    views, Rs_true, env = rs.build_scene(p)
    n = len(views)
    stack = (np.stack(views) * 255).astype(np.uint8)
    sizes = np.tile(np.array([rs.VIEW_H, rs.VIEW_W], np.int32), (n, 1))
    iset = ImageSet(images=stack, sizes=sizes, names=[f"v{k}" for k in range(n)])
    cfg = rs._sweep_config()
    if not args.no_distortion:
        cfg = dataclasses.replace(
            cfg, bundle=dataclasses.replace(cfg.bundle, estimate_distortion=True)
        )
    res = pipeline.stitch(iset, cfg)
    assert len(res.panoramas) == 1
    pr = res.panoramas[0]
    cams = pr["ba"]["cameras"]
    f_est = np.asarray(cams.f, np.float64)
    R_est = np.asarray(cams.R, np.float64)
    k1_est = (
        np.zeros(n) if getattr(cams, "k1", None) is None
        else np.asarray(cams.k1, np.float64)
    )
    g = res.graph
    acc = np.asarray(g.accepted, bool)
    pairs = np.asarray(g.pairs)[acc]
    pair_idx = np.asarray(g.pair_idx)[acc]
    pair_mask = np.asarray(g.pair_mask)[acc]
    inliers = np.asarray(g.inliers)[acc]
    xy = np.asarray(res.features.xy, np.float64)

    f_true = np.full(n, p["f_true"])
    k1_true = np.full(n, p["k1"])
    c_ba, rms_ba, m = robust_cost(
        pairs, pair_idx, pair_mask, inliers, xy, R_est, f_est, k1_est, sizes)
    c_tr, rms_tr, _ = robust_cost(
        pairs, pair_idx, pair_mask, inliers, xy, Rs_true, f_true, k1_true, sizes)
    print(f"n_residual_pts={m}")
    print(f"cost(BA estimate) = {c_ba:12.2f}  rms={rms_ba:.4f}px  "
          f"f_mean={f_est.mean():.2f} ({(f_est.mean()/p['f_true']-1)*100:+.2f}%)"
          f"  k1_mean={k1_est.mean():+.5f}")
    print(f"cost(ground truth) = {c_tr:12.2f}  rms={rms_tr:.4f}px  "
          f"f={p['f_true']:.2f}  k1={p['k1']:+.5f}")
    # focal sweep at TRUE rotations/k1: where does the data's min sit?
    print("\nglobal-f sweep at true rotations/k1:")
    for s in (-0.02, -0.01, -0.005, 0.0, 0.005, 0.01, 0.013, 0.02):
        c, rms, _ = robust_cost(
            pairs, pair_idx, pair_mask, inliers, xy, Rs_true,
            f_true * (1 + s), k1_true, sizes)
        print(f"  f_scale={1+s:.3f}: cost={c:12.2f} rms={rms:.4f}px")


if __name__ == "__main__":
    main()
