"""Deterministic parity scenes + per-stage artifact extraction.

The reference repo ships switchable MATLAB/scratch stage implementations
(`inputs.m:47,62,113`) so users can A/B each stage. We cannot run MATLAB
here, so the parity substitute (SURVEY.md §4) is RECORDED per-stage dumps:
`tools/record_parity.py` runs these scenes (BASELINE.json configs 1-4 in
miniature) on the deterministic CPU backend and stores compact stage
artifacts under `tests/goldens/`; `tests/test_parity.py` re-runs and diffs
them, catching any silent behavior drift in features, match verification,
bundle adjustment, gain compensation, or rendering.
"""

import numpy as np

import synthdata
from autopanostitch_tpu.config import (
    BlendConfig,
    BundleConfig,
    DetectorConfig,
    GainConfig,
    ImageMatchConfig,
    MatchingConfig,
    RenderConfig,
    StitchConfig,
    StraightenConfig,
)
from autopanostitch_tpu.utils.image_io import ImageSet


def _make_set(views):
    sizes = np.array([v.shape[:2] for v in views], np.int32)
    H, W = sizes[:, 0].max(), sizes[:, 1].max()
    stack = np.zeros((len(views), H, W, 3), np.float32)
    for k, v in enumerate(views):
        stack[k, : v.shape[0], : v.shape[1]] = v
    return ImageSet(images=stack, sizes=sizes,
                    names=[f"v{k}" for k in range(len(views))])


def _small(**kw):
    base = dict(
        detector=DetectorConfig(max_keypoints=512, num_octaves=3),
        matching=MatchingConfig(max_matches_per_pair=256),
        image_match=ImageMatchConfig(ransac_batch=256),
        bundle=BundleConfig(incremental_lm_iters=8, max_iter_lm=24),
    )
    base.update(kw)
    return StitchConfig(**base)


def config1_planar_pair():
    """BASELINE config 1: 2-image planar stitch (SIFT + RANSAC + blend)."""
    env = synthdata.texture(11, 420, 760)
    views = synthdata.planar_crops(env, [(0, 0, 440, 380), (300, 30, 440, 380)])
    cfg = _small(
        straighten=StraightenConfig(force_planar_scan=True),
        blend=BlendConfig(mode="linear"),
    )
    return _make_set(views), cfg


def config2_cylindrical6():
    """BASELINE config 2: 6-image cylindrical panorama + gain compensation."""
    env, views, Rs, f = synthdata.rotational_views(
        21, n_views=6, f=300.0, size=(320, 256), yaw_step=0.5
    )
    # per-view exposure dimming that gain compensation must undo
    dims = np.linspace(0.7, 1.15, 6)
    views = [np.clip(v * d, 0, 1) for v, d in zip(views, dims)]
    cfg = _small(
        straighten=StraightenConfig(enabled=False),
        gain=GainConfig(enabled=True),
        render=RenderConfig(projections=("cylindrical",)),
        blend=BlendConfig(mode="linear"),
    )
    return _make_set(views), cfg


def config3_spherical_ba():
    """BASELINE config 3: spherical pano, BA + straightening + multiband."""
    env, views, Rs, f = synthdata.rotational_views(
        31, n_views=8, f=280.0, size=(320, 256), yaw_step=0.42, pitch=0.12
    )
    cfg = _small(
        straighten=StraightenConfig(enabled=True),
        render=RenderConfig(projections=("spherical",)),
        blend=BlendConfig(mode="multiband", bands=3),
    )
    return _make_set(views), cfg


def config4_multipano():
    """BASELINE config 4: multi-panorama discovery in a mixed unordered set."""
    env_a = synthdata.texture(41, 400, 700)
    env_b = synthdata.texture(42, 400, 700)
    va = synthdata.planar_crops(env_a, [(0, 10, 400, 340), (260, 0, 400, 340)])
    vb = synthdata.planar_crops(env_b, [(20, 0, 400, 340), (280, 30, 400, 340)])
    # interleave the two panoramas (unordered set)
    views = [va[0], vb[0], va[1], vb[1]]
    cfg = _small(straighten=StraightenConfig(force_planar_scan=True),
                 blend=BlendConfig(mode="linear"))
    return _make_set(views), cfg


SCENES = {
    "config1_planar_pair": config1_planar_pair,
    "config2_cylindrical6": config2_cylindrical6,
    "config3_spherical_ba": config3_spherical_ba,
    "config4_multipano": config4_multipano,
}


def _norm_h(H):
    H = np.asarray(H, np.float64)
    s = H[..., 2:3, 2:3]
    s = np.where(np.abs(s) < 1e-12, 1.0, s)
    return H / s


def extract_artifacts(iset, result) -> dict:
    """Compact per-stage dumps: features -> graph -> BA -> gain -> render."""
    out = {}
    feats = result.features
    out["n_keypoints"] = np.asarray(feats.mask).sum(axis=1).astype(np.int64)
    g = result.graph
    out["pairs"] = np.asarray(g.pairs, np.int64)
    out["accepted"] = np.asarray(g.accepted, bool)
    out["num_inliers"] = np.asarray(g.num_inliers, np.int64)
    out["H"] = _norm_h(g.H)
    out["components"] = np.asarray(result.components, np.int64)
    out["n_panoramas"] = np.int64(len(result.panoramas))
    for i, pano in enumerate(result.panoramas):
        p = f"pano{i}_"
        if "hba" in pano:  # planar path
            out[p + "H_abs"] = _norm_h(pano["H_abs"])
        else:
            cams = pano["ba"]["cameras"]
            out[p + "f"] = np.asarray(cams.f, np.float64)
            out[p + "R"] = np.asarray(pano["R_render"], np.float64)
            out[p + "straightened"] = np.bool_(pano["straightened"])
        gains = pano.get("gains")
        if isinstance(gains, dict):  # rotational path: per projection mode
            for mode, gv in gains.items():
                out[p + f"gains_{mode}"] = np.asarray(gv, np.float64)
        elif gains is not None:  # planar path: one gain array
            out[p + "gains_planar"] = np.asarray(gains, np.float64)
        for mode, img in pano["projections"].items():
            cover = pano["coverage_by_mode"][mode]
            out[p + f"{mode}_shape"] = np.array(img.shape[:2], np.int64)
            out[p + f"{mode}_coverage"] = np.float64(np.mean(cover))
            sub = img[cover] if cover.any() else img.reshape(-1, 3)
            out[p + f"{mode}_mean"] = sub.astype(np.float64).mean(axis=0)
    return out


def run_scene(name: str) -> dict:
    from autopanostitch_tpu.models import pipeline

    iset, cfg = SCENES[name]()
    result = pipeline.stitch(iset, cfg, seed=0)
    return extract_artifacts(iset, result)
