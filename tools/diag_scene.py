"""Deep-dive diagnostic for ONE robustness-sweep scene.

Reruns a sweep scene (same deterministic parameters as
`tools/robustness_sweep.py`) and prints everything the summary record
hides: per-camera focal/k1 versus truth, per-view gain versus the applied
exposure factor, where the worst ghost pixels sit and WHICH view pair
disagrees there, and (optionally) saves the stitched pano / oracle pano /
error map as PNGs for eyeballing.

Usage:
  python tools/diag_scene.py 25
  python tools/diag_scene.py 55 --save /tmp/s55
"""

from __future__ import annotations

import argparse
import math
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
    ap.add_argument("--save", default=None)
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
    print("scene params:", p)
    views, Rs, env = rs.build_scene(p)
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
    print(f"panoramas: {len(res.panoramas)}")
    for pr in res.panoramas:
        print("  members:", sorted(pr["members"]))
    if len(res.panoramas) != 1 or len(res.panoramas[0]["members"]) != n:
        print("FRAGMENTED — stopping at graph diagnostics")
        return
    pr = res.panoramas[0]
    cams = pr["ba"]["cameras"]
    f_est = np.asarray(cams.f, np.float64)
    k1_est = (
        np.zeros_like(f_est)
        if getattr(cams, "k1", None) is None
        else np.asarray(cams.k1, np.float64)
    )
    # members are view indices; cameras are member-local
    order = np.argsort(np.asarray(sorted(pr["members"])))
    print("\nper-camera estimates (view order):")
    fi = pr["ba"].get("focal_init")
    if fi is not None:
        print(
            f"  focal_init={fi:.2f} ({(fi / p['f_true'] - 1) * 100:+.2f}%)"
        )
    print(f"  f_true={p['f_true']:.2f}  k1_true={p['k1']:.4f}")
    for i in range(n):
        print(
            f"  cam{i:2d}: f={f_est[i]:8.2f} ({(f_est[i]/p['f_true']-1)*100:+6.2f}%)"
            f"  k1={k1_est[i]:+.4f}"
        )
    psnr, cov = rs.evaluate(pr, env, Rs, p["f_true"])
    g50, g90, g99 = rs.ghost_displacement_px(pr, p, Rs)
    print(f"\npsnr={psnr:.2f} cov={cov:.3f} ghost p50/p90/p99 = {g50:.2f}/{g90:.2f}/{g99:.2f}")

    # --- where are the worst ghost pixels, and which pair? ---
    cover = np.asarray(pr["coverage_by_mode"]["spherical"])
    canvas = pr["canvas"]["spherical"]
    R_est = np.asarray(pr["R_render"])
    f_true, k1 = p["f_true"], p["k1"]
    ys, xs = np.nonzero(cover)
    rng = np.random.default_rng(2)
    sub = rng.choice(len(ys), min(30000, len(ys)), replace=False)
    ys, xs = ys[sub].astype(np.float64), xs[sub].astype(np.float64)
    u = canvas["x0"] + xs / canvas["f_pan"]
    v = canvas["y0"] + ys / canvas["f_pan"]
    d = np.stack([np.cos(v) * np.sin(u), np.sin(v), np.cos(v) * np.cos(u)], -1)
    cam = np.einsum("nij,pj->npi", R_est, d)
    z = cam[..., 2]
    with np.errstate(all="ignore"):
        px = f_est[:, None] * cam[..., 0] / z
        py = f_est[:, None] * cam[..., 1] / z
    norm2 = (rs.VIEW_W / 2.0) ** 2 + (rs.VIEW_H / 2.0) ** 2
    rq2 = (px * px + py * py) / norm2
    rp2 = rq2.copy()
    for _ in range(6):
        rp2 = rq2 / np.maximum(1.0 + k1_est[:, None] * rp2, 0.25) ** 2
    fest = np.maximum(1.0 + k1_est[:, None] * rp2, 0.25)
    fest = np.where(rq2 > 2.25, 1.0, fest)
    px_d = px / fest
    py_d = py / fest
    inside = (
        (z > 1e-6)
        & (np.abs(px_d) <= rs.VIEW_W / 2.0 - 1)
        & (np.abs(py_d) <= rs.VIEW_H / 2.0 - 1)
    )
    fac = 1.0 + k1 * (px_d * px_d + py_d * py_d) / norm2
    vecs = np.stack(
        [px_d * fac, py_d * fac, np.broadcast_to(f_true, px_d.shape)], -1
    )
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    tw = np.einsum("nji,npj->npi", Rs, vecs)
    P = len(ys)
    worst = np.zeros(P)
    worst_pair = np.full((P, 2), -1)
    for i in range(n):
        for j in range(i + 1, n):
            both = inside[i] & inside[j]
            if not both.any():
                continue
            dot = np.clip(np.sum(tw[i][both] * tw[j][both], -1), -1.0, 1.0)
            ang = np.arccos(dot)
            idx = np.nonzero(both)[0]
            upd = ang > worst[idx]
            worst[idx[upd]] = ang[upd]
            worst_pair[idx[upd]] = (i, j)
    g = worst * f_true
    bad = np.argsort(g)[::-1][:20]
    print("\nworst ghost samples:")
    for b in bad:
        i, j = worst_pair[b]
        print(
            f"  canvas({int(ys[b])},{int(xs[b])}) ghost={g[b]:8.2f}px pair=({i},{j})"
            f"  px_d[i]=({px_d[i, b]:7.1f},{py_d[i, b]:7.1f})"
            f"  px_d[j]=({px_d[j, b]:7.1f},{py_d[j, b]:7.1f})  z=({z[i, b]:.2f},{z[j, b]:.2f})"
        )
    npair = {}
    for b in np.nonzero(g > 10.0)[0]:
        key = tuple(worst_pair[b])
        npair[key] = npair.get(key, 0) + 1
    print("  pairs with >10px ghosts:", npair)

    # --- gains vs applied exposure ---
    prng = np.random.default_rng(1_000_003 * (p["scene_id"] + 1))
    stops = prng.uniform(-p["stops_amp"], p["stops_amp"], n)
    gains = np.asarray(pr["gains"]) if pr.get("gains") is not None else None
    if gains is not None and gains.ndim == 0:
        gains = None
    print("\nexposure vs gain (encoded-space factor 2^(stops/2.2)):")
    for i in range(n):
        fac_i = 2.0 ** (stops[i] / 2.2)
        gtxt = f"{np.ravel(gains[i])}" if gains is not None else "n/a"
        print(f"  v{i:2d}: exposure x{fac_i:.3f}  gain={gtxt}")

    if args.save:
        os.makedirs(args.save, exist_ok=True)
        from PIL import Image

        pano = np.asarray(pr["projections"]["spherical"])
        Image.fromarray(pano).save(os.path.join(args.save, "pano.png"))
        # error map vs GT on full canvas
        import synthdata

        hc, wc = cover.shape
        yy, xx = np.mgrid[0:hc, 0:wc]
        M = sum(R_est[i].T @ Rs[i] for i in range(n))
        U, _, Vt = np.linalg.svd(M)
        G = U @ Vt
        if np.linalg.det(G) < 0:
            U[:, -1] *= -1
            G = U @ Vt
        uu = canvas["x0"] + xx / canvas["f_pan"]
        vv = canvas["y0"] + yy / canvas["f_pan"]
        dd = np.stack(
            [np.cos(vv) * np.sin(uu), np.sin(vv), np.cos(vv) * np.cos(uu)], -1
        )
        gt = synthdata.env_lookup(env, (dd @ G).reshape(-1, 3), interp="bilinear")
        gt = gt.reshape(hc, wc, 3)
        a = pano.astype(np.float64) / 255.0
        err = np.abs(a - gt).mean(-1) * cover
        Image.fromarray(
            (np.clip(err * 4.0, 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(args.save, "err.png"))
        Image.fromarray(
            (np.clip(gt, 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(args.save, "gt.png"))
        print("saved to", args.save)


if __name__ == "__main__":
    main()
