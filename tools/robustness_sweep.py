"""Randomized-scene robustness sweep: the artifact-rate experiment.

The reference's headline quality claim is qualitative robustness over a
150+ dataset compilation with a ~6-8% artifact rate
(`/root/reference/README.md:171,194`). This harness reproduces that
experiment as a controlled, reproducible measurement: it samples many
randomized capture scenarios (scene texture richness, focal length /
field of view, partial arcs vs full rings, 1- and 2-row rigs, handheld
pose jitter, exposure steps, sensor noise, barrel distortion), stitches
each with the default pipeline, and classifies every scene as clean or
artifacted against explicit gates:

  fragmentation  — the views do not survive as ONE panorama with full
                   membership (the reference's failure mode: BA divergence
                   or matching starvation splits/drops views),
  holes          — covered canvas pixels < 90% of the pixels the
                   ground-truth camera frustums (gauge-aligned) say should
                   be covered; raw canvas fill is NOT gated because the
                   fitted rectangular canvas legitimately exceeds a jagged
                   footprint (2-row rigs, partial arcs),
  low fidelity   — PSNR of the panorama vs the IDEAL BLEND its estimated
                   geometry implies (true-environment content at the true
                   ray of every fused view sample, renderer-weighted)
                   below 25 dB AND more than 3 dB under the scene's
                   perfect-knowledge oracle. This measures VISIBLE
                   photometric error — gain/exposure seams, clipping
                   beyond the oracle's, garbage content — matching the
                   reference's artifact standard (visible defects,
                   README.md:194). A self-consistent global warp (a focal
                   bias stretching an open arc ~1%) is invisible to a
                   viewer and is NOT gated: it is reported separately as
                   `psnr_db` (gauge-aligned PSNR vs the raw ground truth)
                   and `ferr_pct`. Measured on these scenes the matched
                   features THEMSELVES prefer the biased focal (the robust
                   BA cost at the estimate is lower than at the true
                   cameras — a sub-0.1 px second-order localization bias
                   at narrow FoV), so no estimator on this data recovers
                   truth; gating on it would count invisible,
                   irrecoverable warp as artifacts. The ORACLE is scored
                   with the same ideal-blend metric so the margin
                   comparison is like-for-like, and a loose WARP backstop
                   (ferr_pct / raw-PSNR floors) still trips on gross
                   self-consistent warps,
  ghosting       — double-image displacement: for canvas pixels covered by
                   >=2 views, the angular disagreement of the TRUE rays the
                   estimated geometry fuses there, in pixels; p99 > 10 px
                   means a visible double image somewhere, p50 > 2 px means
                   pervasive softness/double edges everywhere.

Scenes are seeded and deterministic: scene `i` of a sweep is identical
across runs and platforms, so the artifact rate is a reproducible number,
not an anecdote. Run on CPU (default; robustness is algorithmic) or on
the real chip with --platform tpu.

Usage:
  python tools/robustness_sweep.py --scenes 60 --out docs/results/robustness.json
  python tools/robustness_sweep.py --scenes 8 --platform tpu
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

VIEW_W, VIEW_H = 320, 256
PSNR_GATE_DB = 25.0
# fidelity is judged against the scene's ORACLE stitch (true cameras, same
# renderer) when the absolute gate trips: resampling softness shared by
# both cancels, only estimation error fails the gate. The oracle is scored
# with the SAME ideal-blend metric as the estimate (ADVICE r3: comparing
# the estimate's ideal-blend PSNR against a raw-ground-truth oracle PSNR
# mixed metric kinds and made the 3 dB margin meaningless).
FIDELITY_MARGIN_DB = 3.0
COVERAGE_RATIO_GATE = 0.90
GHOST_P99_GATE_PX = 10.0
GHOST_P50_GATE_PX = 2.0
# Warp BACKSTOP (ADVICE r3): the gated fidelity metric is blind by
# construction to a SELF-CONSISTENT global warp, so a regression that
# amplifies systematic focal/rotation bias must still trip the sweep.
# Loose absolute floors on the warp-inclusive metrics: a >3% focal error
# or a raw-ground-truth PSNR under 15 dB is a gross warp regardless of
# how self-consistent it is.
FERR_BACKSTOP_PCT = 3.0
PSNR_RAW_FLOOR_DB = 15.0
_SEED0 = 20260818


def sample_scene(scene_id: int, n_views: int = 12) -> dict:
    """Deterministic capture-scenario parameters for scene `scene_id`.

    Couples the yaw step to the sampled focal's field of view so every
    scenario has realistic planned overlap (35-60%, the band real capture
    rigs target) — what varies is everything a photographer does NOT
    control: scene texture, lens, handheld jitter, exposure steps, noise,
    distortion.
    """
    rng = np.random.default_rng(_SEED0 + scene_id)
    f = float(rng.uniform(260.0, 420.0))
    rows = 2 if (n_views >= 10 and rng.random() < 0.35) else 1
    per_row = n_views // rows
    overlap = float(rng.uniform(0.35, 0.60))
    hfov = 2.0 * math.atan(VIEW_W / (2.0 * f))
    step = hfov * (1.0 - overlap)
    full_ring = step * per_row >= 2.0 * math.pi
    if full_ring:
        step = 2.0 * math.pi / per_row
        # keep >= 30% overlap on the closed ring: widen the lens if needed
        if 1.0 - step / hfov < 0.30:
            hfov = step / (1.0 - 0.35)
            f = VIEW_W / (2.0 * math.tan(hfov / 2.0))
    vfov = 2.0 * math.atan(VIEW_H / (2.0 * f))
    pitch_sep = vfov * 0.55 if rows == 2 else 0.0
    return {
        "scene_id": scene_id,
        "n_views": n_views,
        "rows": rows,
        "per_row": per_row,
        "f_true": round(f, 2),
        "yaw_step_deg": round(math.degrees(step), 2),
        "full_ring": bool(full_ring),
        "pitch_sep_deg": round(math.degrees(pitch_sep), 2),
        "env_seed": int(rng.integers(0, 2**31)),
        "env_cutoff": float(rng.uniform(0.05, 0.16)),
        "jitter_deg": float(rng.uniform(0.0, 1.5)),
        "stops_amp": 0.0 if rng.random() < 0.25 else float(rng.uniform(0.3, 1.2)),
        "noise_sigma": float(rng.uniform(0.0, 3.0) / 255.0),
        "k1": 0.0 if rng.random() < 0.25 else float(rng.uniform(-0.06, -0.01)),
    }


def build_scene(p: dict):
    """Render the scene's views from a synthetic environment and apply the
    capture perturbations. Returns (views, Rs world->cam, env)."""
    import synthdata

    from autopanostitch_tpu.utils import perturb

    rng = np.random.default_rng(p["env_seed"])
    env = synthdata.smooth_texture(
        p["env_seed"] % 1000, 512, 1536, cutoff=p["env_cutoff"]
    )
    step = math.radians(p["yaw_step_deg"])
    jit = math.radians(p["jitter_deg"])
    pitches = (
        [-math.radians(p["pitch_sep_deg"]) / 2, math.radians(p["pitch_sep_deg"]) / 2]
        if p["rows"] == 2
        else [0.0]
    )
    views, Rs = [], []
    for pitch in pitches:
        for i in range(p["per_row"]):
            yaw = i * step + (0.0 if p["rows"] == 1 else step / 2 * (pitch > 0))
            jy, jp, jr = rng.normal(0.0, jit, 3) if jit > 0 else (0.0, 0.0, 0.0)
            R = (
                synthdata.rot_z(jr)
                @ synthdata.rot_x(pitch + jp)
                @ synthdata.rot_y(yaw + jy)
            ).T  # world->cam
            views.append(
                synthdata.render_pinhole_from_equirect(
                    env, R, p["f_true"], VIEW_W, VIEW_H, "bicubic"
                )
            )
            Rs.append(R)
    # Per-view perturbations. Exposure is drawn per view (auto-exposure on a
    # real rig wanders within a band) — NOT perturb_views' alternating
    # +-amp recipe, which puts a 2*amp step between EVERY adjacent pair and
    # is a deliberate worst case reserved for the gate tests.
    prng = np.random.default_rng(1_000_003 * (p["scene_id"] + 1))
    stops = prng.uniform(-p["stops_amp"], p["stops_amp"], len(views))
    out = []
    for i, v in enumerate(views):
        v = np.asarray(v, np.float32)
        if p["stops_amp"]:
            v = perturb.exposure_jitter(v, float(stops[i]))
        if p["k1"]:
            v = perturb.radial_distort(v, p["k1"])
        if p["noise_sigma"]:
            v = perturb.add_sensor_noise(v, p["noise_sigma"], prng)
        out.append(v.astype(np.float32))
    return out, np.stack(Rs), env


def _sweep_config():
    from autopanostitch_tpu.config import (
        BlendConfig,
        DetectorConfig,
        ImageMatchConfig,
        MatchingConfig,
        RenderConfig,
        StitchConfig,
        StraightenConfig,
    )

    return StitchConfig(
        detector=DetectorConfig(max_keypoints=512, num_octaves=3),
        matching=MatchingConfig(max_matches_per_pair=256),
        image_match=ImageMatchConfig(ransac_batch=256, max_iter=256),
        straighten=StraightenConfig(enabled=False),
        render=RenderConfig(projections=("spherical",)),
        blend=BlendConfig(mode="multiband"),
    )


def evaluate(pano_rec: dict, env: np.ndarray, Rs: np.ndarray, f_true: float):
    """Gauge-aligned quality measurements of one stitched panorama.

    Returns (psnr_db, coverage_ratio):
    - psnr_db: orthogonal-Procrustes gauge over all cameras, PSNR of the
      spherical panorama vs the ground-truth environment after removing the
      global per-channel exposure offset (exposure gauge is unconstrained —
      the reference normalizes gains to mean 1, `gainCompensationRKf.m`);
    - coverage_ratio: covered canvas pixels / pixels the gauge-aligned
      ground-truth frustums say SHOULD be covered. Footprint shape cancels,
      so only genuine holes (missed contributors, warp errors) score.
    """
    import synthdata

    pano = pano_rec["projections"]["spherical"]
    cover = np.asarray(pano_rec["coverage_by_mode"]["spherical"])
    canvas = pano_rec["canvas"]["spherical"]
    R_est = pano_rec["R_render"]
    n = len(Rs)
    M = sum(np.asarray(R_est[i]).T @ np.asarray(Rs[i]) for i in range(n))
    U, _, Vt = np.linalg.svd(M)
    G = U @ Vt
    if np.linalg.det(G) < 0:
        U[:, -1] *= -1
        G = U @ Vt

    def rays(ys, xs):
        u = canvas["x0"] + xs / canvas["f_pan"]
        v = canvas["y0"] + ys / canvas["f_pan"]
        d = np.stack(
            [np.cos(v) * np.sin(u), np.sin(v), np.cos(v) * np.cos(u)], -1
        )
        return d @ G  # estimated gauge -> ground-truth world

    # --- PSNR over covered pixels ---
    ys, xs = np.nonzero(cover)
    sub = np.random.default_rng(0).choice(
        len(ys), min(60000, len(ys)), replace=False
    )
    d = rays(ys[sub], xs[sub])
    gt = synthdata.env_lookup(env, d, interp="bicubic")
    a = np.asarray(pano)[ys[sub], xs[sub]].astype(np.float64) / 255.0
    a = a - a.mean(0) + gt.mean(0)
    mse = np.mean((a - gt) ** 2)
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))

    # --- coverage ratio over ALL canvas pixels (sampled) ---
    hc, wc = cover.shape
    rng = np.random.default_rng(1)
    m = min(120_000, hc * wc)
    flat = rng.choice(hc * wc, m, replace=False)
    ys_a, xs_a = flat // wc, flat % wc
    d_all = rays(ys_a.astype(np.float64), xs_a.astype(np.float64))
    cam = np.einsum("nij,pj->npi", Rs, d_all)  # world->cam per true camera
    z = cam[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        px = f_true * cam[..., 0] / z
        py = f_true * cam[..., 1] / z
    inside = (
        (z > 1e-6)
        & (np.abs(px) <= VIEW_W / 2.0)
        & (np.abs(py) <= VIEW_H / 2.0)
    ).any(0)
    measured = cover[ys_a, xs_a].astype(bool)
    expected = int(inside.sum())
    ratio = float((measured & inside).sum() / max(expected, 1))
    return psnr, ratio


def _fused_sample_geometry(
    pano_rec: dict, p: dict, Rs_true: np.ndarray, n_samples: int = 30000
):
    """Shared geometry of the fused view samples at sampled canvas pixels.

    Projects each sampled covered canvas pixel through every ESTIMATED
    camera exactly like the renderer (pinhole -> estimated-k1 distorted
    coords incl. the far-outside passthrough guard of
    `ops.projections.distort_pixels`), and maps every in-bounds view
    sample back to the TRUE world ray its content shows (true rotation +
    true focal + the applied lens distortion).

    Returns dict with (ys, xs) canvas sample coords, `inside` (n, P) the
    renderer's bounds mask, `tw` (n, P, 3) true content rays, `weight`
    (n, P) the renderer's fusion weight (feather ramp x view-angle
    cosine), and `z` (n, P) forward cosines."""
    cover = np.asarray(pano_rec["coverage_by_mode"]["spherical"])
    canvas = pano_rec["canvas"]["spherical"]
    cams = pano_rec["ba"]["cameras"]
    f_est = np.asarray(cams.f)
    R_est = np.asarray(pano_rec["R_render"])
    f_true, k1 = p["f_true"], p["k1"]
    k1_est = (
        np.zeros_like(f_est) if getattr(cams, "k1", None) is None
        else np.asarray(cams.k1, np.float64)
    )
    ys, xs = np.nonzero(cover)
    rng = np.random.default_rng(2)
    sub = rng.choice(len(ys), min(n_samples, len(ys)), replace=False)
    ys, xs = ys[sub].astype(np.float64), xs[sub].astype(np.float64)
    u = canvas["x0"] + xs / canvas["f_pan"]
    v = canvas["y0"] + ys / canvas["f_pan"]
    d = np.stack([np.cos(v) * np.sin(u), np.sin(v), np.cos(v) * np.cos(u)], -1)
    cam = np.einsum("nij,pj->npi", R_est, d)
    z = cam[..., 2]
    with np.errstate(all="ignore"):
        px = f_est[:, None] * cam[..., 0] / z
        py = f_est[:, None] * cam[..., 1] / z
    norm2 = (VIEW_W / 2.0) ** 2 + (VIEW_H / 2.0) ** 2
    # where the renderer actually GATHERS: the distortion-aware sampler
    # maps the estimated pinhole projection into the stored (distorted)
    # image by the estimated k1 (identity when k1 was not estimated)
    rq2 = (px * px + py * py) / norm2
    rp2 = rq2.copy()
    for _ in range(6):
        rp2 = rq2 / np.maximum(1.0 + k1_est[:, None] * rp2, 0.25) ** 2
    fest = np.maximum(1.0 + k1_est[:, None] * rp2, 0.25)
    # mirror ops.projections.distort_pixels: far-outside queries have no
    # preimage inside the frame — pass through so the bounds test rejects
    fest = np.where(rq2 > 2.25, 1.0, fest)
    px_d = px / fest
    py_d = py / fest
    inside = (
        (z > 1e-6)
        & (np.abs(px_d) <= VIEW_W / 2.0 - 1)
        & (np.abs(py_d) <= VIEW_H / 2.0 - 1)
    )
    # the (distorted) view sample at p shows true-pinhole content at
    # p * (1 + k1_true r^2) — the same forward map radial_distort applied
    fac = 1.0 + k1 * (px_d * px_d + py_d * py_d) / norm2
    vecs = np.stack(
        [px_d * fac, py_d * fac, np.broadcast_to(f_true, px_d.shape)], -1
    )
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    tw = np.einsum("nji,npj->npi", Rs_true, vecs)  # cam->world: R^T v
    # the renderer's fusion weight: separable triangle feather ramp
    # (ops.sampling.feather_stack) x view-angle cosine (angle_power=1)
    wy = 1.0 - np.abs(2.0 * (py_d + (VIEW_H - 1) / 2.0) / (VIEW_H - 1) - 1.0)
    wx = 1.0 - np.abs(2.0 * (px_d + (VIEW_W - 1) / 2.0) / (VIEW_W - 1) - 1.0)
    weight = (
        np.maximum(wy, 1e-4) * np.maximum(wx, 1e-4) * np.maximum(z, 0.0)
    ) * inside
    return {
        "ys": ys, "xs": xs, "inside": inside, "tw": tw,
        "weight": weight, "z": z,
    }


def ghost_displacement_px(
    pano_rec: dict, p: dict, Rs_true: np.ndarray, n_samples: int = 30000,
    geom: dict | None = None,
):
    """Worst-case double-image displacement, in true-image pixels.

    For each sampled covered canvas pixel, take the largest pairwise
    angular disagreement of the TRUE rays the estimated geometry fuses
    there (see `_fused_sample_geometry`). That angle times f_true is how
    far apart, in pixels, the contents fused at that canvas pixel really
    are — the ghost a viewer would see. Returns (p50, p90, p99) over
    pixels with >=2 contributors."""
    g = geom or _fused_sample_geometry(pano_rec, p, Rs_true, n_samples)
    inside, tw = g["inside"], g["tw"]
    n = inside.shape[0]
    worst = np.zeros(len(g["ys"]))
    multi = np.zeros(len(g["ys"]), bool)
    for i in range(n):
        for j in range(i + 1, n):
            both = inside[i] & inside[j]
            if not both.any():
                continue
            dot = np.clip(np.sum(tw[i][both] * tw[j][both], -1), -1.0, 1.0)
            idx = np.nonzero(both)[0]
            worst[idx] = np.maximum(worst[idx], np.arccos(dot))
            multi[idx] = True
    if not multi.any():
        return 0.0, 0.0, 0.0
    gp = worst[multi] * p["f_true"]
    return tuple(float(np.percentile(gp, q)) for q in (50, 90, 99))


def ideal_blend_psnr_db(
    pano_rec: dict, p: dict, Rs_true: np.ndarray, env: np.ndarray,
    geom: dict | None = None,
) -> float:
    """PSNR of the panorama vs the IDEAL BLEND its estimated geometry
    implies: at each sampled covered canvas pixel, the renderer-weighted
    mean of the TRUE environment content at the true ray of every fused
    view sample (see `_fused_sample_geometry`).

    When the estimated geometry is self-consistent, every contributor's
    true ray agrees and the ideal blend is sharp true content — so a
    global warp (focal bias on an open arc) cancels EXACTLY, while
    photometric estimation error (gain/exposure seams, clipping beyond
    the oracle's, garbage content fused from a camera that cannot see the
    pixel) still scores. Geometric misalignment is gated separately by
    `ghost_displacement_px`. The same global per-channel exposure offset
    as `evaluate` is removed (gain gauge is unconstrained).

    Blend-model approximation: the ideal target fuses with a linear
    feather-ramp x cosine weighted MEAN while the sweep renders multiband
    (Burt-Adelson moves low-frequency content between neighbouring
    contributors near seams) — so even a perfect estimate scores a few dB
    under infinity. The fidelity gate is immune to this bias because the
    ORACLE is scored with this same function (`oracle_scores`): the
    approximation error appears on both sides of the margin comparison
    and cancels."""
    import synthdata

    g = geom or _fused_sample_geometry(pano_rec, p, Rs_true)
    w = g["weight"]
    wsum = w.sum(0)
    ok = wsum > 1e-6
    n = w.shape[0]
    ideal = np.zeros((len(g["ys"]), 3))
    for i in range(n):
        sel = g["inside"][i] & ok
        if not sel.any():
            continue
        gt_i = synthdata.env_lookup(env, g["tw"][i][sel], interp="bicubic")
        ideal[sel] += w[i][sel][:, None] * gt_i
    ideal[ok] /= wsum[ok][:, None]
    pano = np.asarray(pano_rec["projections"]["spherical"])
    a = pano[g["ys"].astype(int), g["xs"].astype(int)].astype(np.float64) / 255.0
    a, ideal = a[ok], ideal[ok]
    a = a - a.mean(0) + ideal.mean(0)
    mse = np.mean((a - ideal) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def oracle_scores(
    views, Rs: np.ndarray, env: np.ndarray, p: dict, cfg
) -> dict:
    """Score ceiling of this scene: stitch with PERFECT knowledge.

    Renders the same perturbed views through the same renderer with the
    TRUE rotations/focal/distortion (gains still estimated — exposure is
    a perturbation the oracle must also compensate). The oracle absorbs
    every resampling loss the measurement chain shares (view synthesis,
    the distortion warp's bilinear resample, render interpolation), so
    `score - oracle score` isolates ESTIMATION error — a
    softness-independent fidelity gate. Mirrors the reference's
    qualitative standard: artifacts are misalignments, not resampling
    softness (README.md:194).

    Returns {'psnr_db': raw gauge-aligned PSNR vs ground truth,
    'psnr_ideal_db': the SAME ideal-blend metric used to gate the
    estimate (scored with the oracle's own true geometry) — so the
    fidelity margin compares like with like, and the ideal-blend model's
    linear-feather approximation of the multiband renderer cancels in
    the comparison}."""
    import jax.numpy as jnp

    from autopanostitch_tpu.models import gain as gain_stage
    from autopanostitch_tpu.models import render as render_stage
    from autopanostitch_tpu.ops import geometry as geo
    from autopanostitch_tpu.ops import sampling as samp_ops

    n = len(views)
    f = p["f_true"]
    cx, cy = (VIEW_W - 1) / 2.0, (VIEW_H - 1) / 2.0
    K = np.asarray(geo.build_K(
        jnp.full((n,), f, jnp.float32),
        jnp.full((n,), cx, jnp.float32),
        jnp.full((n,), cy, jnp.float32),
    ))
    k1 = (
        np.full((n,), p["k1"], np.float32) if p["k1"] else None
    )
    sizes = np.tile(np.array([VIEW_H, VIEW_W], np.int32), (n, 1))
    imgs = jnp.asarray(np.stack(views), jnp.float32)
    feathers = samp_ops.feather_stack(
        jnp.asarray(sizes), VIEW_H, VIEW_W
    )
    gains = gain_stage.compute_gains_rotational(
        imgs, feathers, jnp.asarray(Rs.astype(np.float32)),
        jnp.asarray(K.astype(np.float32)), sizes, cfg.gain, k1=k1,
    )
    canvas = render_stage.compute_canvas(
        Rs.astype(np.float32), K, sizes, "spherical", cfg.render, k1=k1
    )
    pano, cover = render_stage.render_rotational(
        np.asarray(imgs), np.asarray(feathers), Rs.astype(np.float32), K,
        canvas, gains=gains, blend_mode=cfg.blend.mode,
        bands=cfg.blend.bands, tile=cfg.render.tile,
        angle_power=cfg.render.angle_power, sizes=sizes,
        interp=cfg.render.interpolation,
        max_contributors=cfg.render.max_contributors, k1=k1,
    )
    import types

    rec = {
        "projections": {"spherical": pano},
        "coverage_by_mode": {"spherical": cover},
        "canvas": {"spherical": canvas},
        "R_render": Rs,
        # true-geometry camera namespace so _fused_sample_geometry scores
        # the oracle with the same ideal-blend metric as the estimate
        "ba": {
            "cameras": types.SimpleNamespace(
                f=np.full((n,), f, np.float64),
                k1=(np.full((n,), p["k1"], np.float64) if p["k1"] else None),
            )
        },
    }
    psnr, _ = evaluate(rec, env, Rs, f)
    return {
        "psnr_db": psnr,
        "psnr_ideal_db": ideal_blend_psnr_db(rec, p, Rs, env),
    }


def run_scene(p: dict, cfg=None) -> dict:
    """Stitch one sampled scene and classify it. Returns the scene record
    (params + measurements + artifact verdict)."""
    from autopanostitch_tpu.models import pipeline
    from autopanostitch_tpu.utils.image_io import ImageSet

    views, Rs, env = build_scene(p)
    n = len(views)
    stack = (np.stack(views) * 255).astype(np.uint8)
    sizes = np.tile(np.array([VIEW_H, VIEW_W], np.int32), (n, 1))
    iset = ImageSet(images=stack, sizes=sizes, names=[f"v{k}" for k in range(n)])
    cfg = cfg or _sweep_config()
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    rec = dict(p)
    rec["stitch_s"] = round(time.time() - t0, 2)
    sizes_found = sorted(
        (len(pr["members"]) for pr in res.panoramas), reverse=True
    )
    rec["n_panoramas"] = len(res.panoramas)
    rec["largest_members"] = sizes_found[0] if sizes_found else 0
    failures = []
    if rec["n_panoramas"] != 1 or rec["largest_members"] != n:
        failures.append("fragmentation")
        rec["coverage_ratio"] = rec["psnr_db"] = rec["ferr_pct"] = None
    else:
        pr = res.panoramas[0]
        psnr, cov_ratio = evaluate(pr, env, Rs, p["f_true"])
        geom = _fused_sample_geometry(pr, p, Rs)
        g50, g90, g99 = ghost_displacement_px(pr, p, Rs, geom=geom)
        psnr_ideal = ideal_blend_psnr_db(pr, p, Rs, env, geom=geom)
        rec["coverage_ratio"] = round(cov_ratio, 3)
        rec["psnr_db"] = round(psnr, 2)  # warp-inclusive, reported not gated
        rec["psnr_ideal_db"] = round(psnr_ideal, 2)
        rec["ghost_px_p50"] = round(g50, 2)
        rec["ghost_px_p90"] = round(g90, 2)
        rec["ghost_px_p99"] = round(g99, 2)
        # cameras are member-local; full membership => member k is view k
        f_est = np.asarray(pr["ba"]["cameras"].f)
        rec["ferr_pct"] = round(
            float(np.abs(f_est - p["f_true"]).max() / p["f_true"] * 100), 3
        )
        if cov_ratio < COVERAGE_RATIO_GATE:
            failures.append("holes")
        if rec["psnr_ideal_db"] < PSNR_GATE_DB:
            # below the absolute gate: compare to the scene's oracle with
            # the SAME ideal-blend metric — only an estimation-error
            # shortfall counts as an artifact
            orc = oracle_scores(views, Rs, env, p, cfg)
            rec["oracle_psnr_db"] = round(orc["psnr_db"], 2)
            rec["oracle_psnr_ideal_db"] = round(orc["psnr_ideal_db"], 2)
            if rec["psnr_ideal_db"] < orc["psnr_ideal_db"] - FIDELITY_MARGIN_DB:
                failures.append("fidelity")
        if g99 > GHOST_P99_GATE_PX or g50 > GHOST_P50_GATE_PX:
            failures.append("ghosting")
        # warp backstop (ADVICE r3): gross self-consistent warps must
        # still trip the sweep even though the ideal-blend gate forgives
        # them by construction
        if (rec["ferr_pct"] > FERR_BACKSTOP_PCT
                or rec["psnr_db"] < PSNR_RAW_FLOOR_DB):
            failures.append("warp")
    rec["failures"] = failures
    rec["artifact"] = bool(failures)
    return rec


def summarize(records) -> dict:
    n = len(records)
    bad = [r for r in records if r["artifact"]]
    psnrs = [r["psnr_db"] for r in records if r.get("psnr_db") is not None]
    ghosts = [
        r["ghost_px_p99"] for r in records if r.get("ghost_px_p99") is not None
    ]
    ideals = [
        r["psnr_ideal_db"] for r in records if r.get("psnr_ideal_db") is not None
    ]
    return {
        "n_scenes": n,
        "artifact_rate_pct": round(100.0 * len(bad) / max(n, 1), 1),
        "artifacts": [
            {"scene_id": r["scene_id"], "failures": r["failures"]} for r in bad
        ],
        "psnr_db_min": round(min(psnrs), 2) if psnrs else None,
        "psnr_db_median": round(float(np.median(psnrs)), 2) if psnrs else None,
        "psnr_db_max": round(max(psnrs), 2) if psnrs else None,
        "psnr_ideal_db_min": round(min(ideals), 2) if ideals else None,
        "psnr_ideal_db_median": (
            round(float(np.median(ideals)), 2) if ideals else None
        ),
        "ghost_px_p99_median": (
            round(float(np.median(ghosts)), 2) if ghosts else None
        ),
        "ghost_px_p99_max": round(max(ghosts), 2) if ghosts else None,
        "gates": {
            "psnr_ideal_db": PSNR_GATE_DB,
            "fidelity_margin_vs_oracle_db": FIDELITY_MARGIN_DB,
            "coverage_ratio": COVERAGE_RATIO_GATE,
            "ghost_px_p99": GHOST_P99_GATE_PX,
            "ghost_px_p50": GHOST_P50_GATE_PX,
            "ferr_backstop_pct": FERR_BACKSTOP_PCT,
            "psnr_raw_floor_db": PSNR_RAW_FLOOR_DB,
            "membership": "all views in ONE panorama",
            "note": (
                "fidelity margin compares ideal-blend PSNR of estimate vs "
                "ORACLE scored with the same metric; warp backstop gates "
                "gross self-consistent warps (ferr/raw-PSNR floors) — see "
                "module docstring"
            ),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=60)
    ap.add_argument("--n-views", type=int, default=12)
    ap.add_argument("--start", type=int, default=0, help="first scene_id")
    ap.add_argument("--platform", choices=("cpu", "tpu"), default="cpu")
    ap.add_argument("--out", default=None, help="write JSON records here")
    ap.add_argument(
        "--estimate-distortion", action="store_true",
        help="turn on per-camera k1 estimation in BA (beyond-reference)",
    )
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from autopanostitch_tpu.utils import compile_cache

    compile_cache.enable()

    cfg = _sweep_config()
    if args.estimate_distortion:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, bundle=dataclasses.replace(cfg.bundle, estimate_distortion=True)
        )
    records = []
    for sid in range(args.start, args.start + args.scenes):
        p = sample_scene(sid, args.n_views)
        rec = run_scene(p, cfg)
        records.append(rec)
        tag = "ARTIFACT " + ",".join(rec["failures"]) if rec["artifact"] else "ok"
        print(
            f"scene {sid:3d}: {tag:24s} rig={rec['rows']}x{rec['per_row']}"
            f" f={rec['f_true']:.0f} ring={int(rec['full_ring'])}"
            f" stops={rec['stops_amp']:.2f} noise={rec['noise_sigma'] * 255:.1f}"
            f" k1={rec['k1']:.3f} jit={rec['jitter_deg']:.2f}deg"
            f" psnr={rec['psnr_db']} ideal={rec.get('psnr_ideal_db')}"
            f" covr={rec['coverage_ratio']}"
            f" ghost99={rec.get('ghost_px_p99')}"
            f" ferr={rec['ferr_pct']}% t={rec['stitch_s']}s",
            flush=True,
        )
        if args.out:
            payload = {
                "platform": args.platform,
                "view_size": [VIEW_H, VIEW_W],
                "summary": summarize(records),
                "scenes": records,
            }
            with open(args.out, "w") as fh:
                json.dump(payload, fh, indent=1)
    print(json.dumps(summarize(records)))


if __name__ == "__main__":
    main()
