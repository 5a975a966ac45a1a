"""Headline benchmark on one chip. Prints ONE JSON line with the three
BASELINE.json metrics:

  - e2e stitch throughput (Mpix/s): 6 overlapping 640x512 photo views
    through the full pipeline (SIFT -> global match -> RANSAC -> discovery
    -> composite), steady state.
  - SIFT keypoints/sec: batched extraction on the same 6-view stack.
  - PSNR (dB) + wall time of the north-star workload: a 100-view 360-degree
    spherical panorama from a smooth synthetic environment, rendered
    bicubic, compared against the gauge-aligned ground-truth environment
    lookup (north star: < 5 s at >= 40 dB).

vs_baseline: the MATLAB reference publishes no numbers (BASELINE.md); we
compare against a conservative ESTIMATE of 0.1 Mpix/s for the reference's
per-dataset wall time at its default operating point (800x800 inputs,
minutes-scale end-to-end runs per its own README performance remarks).

`compile_s` note: the JAX persistent compilation cache is enabled and
populated, but this harness reaches the TPU through the axon relay whose
server-side AOT compiler bypasses it — a trivial one-op jit costs ~17 s in
ANY fresh process (session setup + compile round trip), so the ~2 min
first-stitch number is relay round-trips per executable, not XLA work.
On a directly-attached TPU host the cache works as designed.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_EST_MPIX_S = 0.1  # estimate, not a published number

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def load_views():
    from PIL import Image

    path = "/root/reference/assets/grand_canyon_01.jpeg"
    if os.path.exists(path):
        env = np.asarray(Image.open(path).convert("RGB").resize((1920, 900)), np.float32) / 255.0
    else:  # fallback: synthetic
        import synthdata

        env = synthdata.texture(0, 900, 1920)
    boxes = [(i * 256, 20 * (i % 2), 640, 512) for i in range(6)]
    views = [env[y : y + h, x : x + w] for (x, y, w, h) in boxes]
    return views


def bench_6view(pipeline, StitchConfig, DetectorConfig, MatchingConfig, ImageMatchConfig, ImageSet):
    views = load_views()
    sizes = np.array([v.shape[:2] for v in views], np.int32)
    stack = (np.stack(views) * 255).astype(np.uint8)  # 4x cheaper upload
    iset = ImageSet(images=stack, sizes=sizes, names=[f"v{k}" for k in range(len(views))])
    cfg = StitchConfig(
        detector=DetectorConfig(max_keypoints=1024, num_octaves=4),
        matching=MatchingConfig(max_matches_per_pair=512),
        image_match=ImageMatchConfig(ransac_batch=512),
    )
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    compile_s = time.time() - t0
    # min of 3: relay round-trip jitter is +-30% run to run
    steady_s = min(
        _timed(lambda: pipeline.stitch(iset, cfg)) for _ in range(3)
    )
    res = pipeline.stitch(iset, cfg)

    # SIFT keypoints/sec: batched extraction alone, steady state
    import jax
    import jax.numpy as jnp

    from autopanostitch_tpu.models import features as features_stage

    img_f = jnp.asarray(stack.astype(np.float32) / 255.0)
    feats = features_stage.extract_features(img_f, sizes, cfg.detector)
    n_kp = int(np.asarray(feats.mask).sum())  # also syncs
    t0 = time.time()
    feats = features_stage.extract_features(img_f, sizes, cfg.detector)
    n_kp = int(np.asarray(feats.mask).sum())
    sift_s = time.time() - t0

    mpix = stack.shape[0] * stack.shape[1] * stack.shape[2] / 1e6
    return {
        "value": round(mpix / steady_s, 3),
        "steady_s": round(steady_s, 3),
        "compile_s": round(compile_s, 1),
        "n_images": len(views),
        "n_keypoints": n_kp,
        "sift_kps_per_sec": round(n_kp / sift_s, 0),
        "n_panoramas": len(res.panoramas),
        "accepted_pairs": int(res.graph.accepted.sum()),
    }


def bench_real(pipeline, StitchConfig, ImageSet):
    """Asset gate for the real-photograph sections (`_bench_church` /
    `_bench_cmu0` / `_bench_grandcanyon`, each isolated in main so a late
    failure cannot discard already-measured entries)."""
    from autopanostitch_tpu.utils import real_data

    if not real_data.have_reference_assets():
        return {"real_error": "reference assets not present"}
    return {}


def _bench_church(pipeline, StitchConfig, out):
    import dataclasses

    from autopanostitch_tpu.utils import real_data
    from autopanostitch_tpu.utils.image_io import load_image_set

    # church trio: 3 real overlapping renderings -> ONE panorama
    cfg = StitchConfig()
    cfg = cfg.replace(render=dataclasses.replace(
        cfg.render, height_limit=480, width_limit=480))
    iset = load_image_set(real_data.church_paths(), 480, 480)
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    out["church_first_s"] = round(time.time() - t0, 2)  # includes compiles
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    church_s = time.time() - t0
    pano = res.panoramas[0] if res.panoramas else None
    out["church_s"] = round(church_s, 2)
    out["church_n_panoramas"] = len(res.panoramas)
    out["church_members"] = (
        sorted(pano["members"].tolist()) if pano is not None else []
    )
    if pano is not None:
        cov_by_mode = pano.get("coverage_by_mode") or {}
        cov = next(iter(cov_by_mode.values()), None)
        if cov is not None:
            out["church_coverage"] = round(float(np.asarray(cov).mean()), 3)


def _bench_cmu0(pipeline, StitchConfig, out):
    import dataclasses

    from autopanostitch_tpu.utils import real_data

    # CMU0 sheet: 38 real photos. second_pass=False (the per-component
    # second pass re-extracts at many distinct shapes — minutes of relay
    # AOT compile for unchanged discovery metrics; covered by
    # tests/test_real_images.py). pairwise_rescue stays ON: it is what
    # consolidates the sheet into ONE ~360-degree panorama of 37/38
    # photos (measured r3; global-only fragments into 7).
    cfg0 = StitchConfig()
    cfg0 = cfg0.replace(matching=dataclasses.replace(
        cfg0.matching, second_pass=False))
    tiles = real_data.load_montage_tiles("CMU0")
    iset = real_data.image_set_from_arrays(tiles, 800, 800)
    t0 = time.time()
    res = pipeline.stitch(iset, cfg0)
    out["cmu0_first_s"] = round(time.time() - t0, 2)  # includes compiles
    t0 = time.time()
    res = pipeline.stitch(iset, cfg0)
    out["cmu0_s"] = round(time.time() - t0, 2)
    out["cmu0_n_images"] = len(tiles)
    out["cmu0_n_panoramas"] = len(res.panoramas)
    sizes = sorted((len(p["members"]) for p in res.panoramas), reverse=True)
    out["cmu0_panorama_sizes"] = sizes
    out["cmu0_images_stitched"] = int(sum(sizes))
    out["cmu0_accepted_pairs"] = int(np.asarray(res.graph.accepted).sum())


def _bench_grandcanyon(pipeline, StitchConfig, out):
    import dataclasses

    from autopanostitch_tpu.utils import real_data

    cfg0 = StitchConfig()
    cfg0 = cfg0.replace(matching=dataclasses.replace(
        cfg0.matching, second_pass=False))
    # Grand Canyon sheet: ALL 35 real photos must stitch into ONE panorama
    # (measured r3: 53 accepted pairs, single 35-view component)
    tiles = real_data.load_montage_tiles("grandcanyon")
    iset = real_data.image_set_from_arrays(tiles, 800, 800)
    t0 = time.time()
    res = pipeline.stitch(iset, cfg0)
    out["grandcanyon_s"] = round(time.time() - t0, 2)
    out["grandcanyon_n_images"] = len(tiles)
    out["grandcanyon_n_panoramas"] = len(res.panoramas)
    out["grandcanyon_largest"] = max(
        (len(p["members"]) for p in res.panoramas), default=0
    )


def _bench_yellowstone(pipeline, StitchConfig, out):
    import dataclasses

    from autopanostitch_tpu.utils import real_data

    # Yellowstone sheet: a 2-ROW capture rig of 22 real photos (the sheet's
    # 23rd slot is a blank slice, trimmed) — the 2-D match-graph +
    # multi-row renderer proof on real data (measured r3: ONE panorama
    # from all 22)
    cfg0 = StitchConfig()
    cfg0 = cfg0.replace(matching=dataclasses.replace(
        cfg0.matching, second_pass=False))
    tiles = real_data.load_montage_tiles("yellowstone")
    iset = real_data.image_set_from_arrays(tiles, 800, 800)
    t0 = time.time()
    res = pipeline.stitch(iset, cfg0)
    out["yellowstone_s"] = round(time.time() - t0, 2)
    out["yellowstone_n_images"] = len(tiles)
    out["yellowstone_n_panoramas"] = len(res.panoramas)
    out["yellowstone_largest"] = max(
        (len(p["members"]) for p in res.panoramas), default=0
    )


def bench_pano100(pipeline, StitchConfig, DetectorConfig, MatchingConfig,
                  ImageMatchConfig, ImageSet, n_views=100):
    """North-star workload: 100-view 360x~50 spherical pano, PSNR vs GT."""
    import synthdata

    from autopanostitch_tpu.config import BlendConfig, RenderConfig, StraightenConfig

    env = synthdata.smooth_texture(7, 768, 2048)
    f_true = 350.0
    w, h = 384, 288
    yaw = 2 * np.pi / n_views
    views, Rs = [], []
    for i in range(n_views):
        R = synthdata.rot_y(i * yaw).T
        views.append(synthdata.render_pinhole_from_equirect(env, R, f_true, w, h, "bicubic"))
        Rs.append(R)
    Rs = np.stack(Rs)
    stack = (np.stack(views) * 255).astype(np.uint8)
    sizes = np.tile(np.array([h, w], np.int32), (n_views, 1))
    iset = ImageSet(images=stack, sizes=sizes, names=[f"v{k}" for k in range(n_views)])
    cfg = StitchConfig(
        detector=DetectorConfig(max_keypoints=512, num_octaves=3),
        matching=MatchingConfig(max_matches_per_pair=256),
        # 256 RANSAC trials: the clean synthetic ring has ~80% inlier pairs,
        # where the adaptive formula needs ~14 trials — 256 is ample margin
        image_match=ImageMatchConfig(ransac_batch=256, max_iter=256),
        straighten=StraightenConfig(enabled=False),
        # interpolation left at the config default (bicubic2x: measured
        # PSNR-identical to bicubic at ~0.4x the render time)
        render=RenderConfig(projections=("spherical",)),
        blend=BlendConfig(mode="multiband"),
    )
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    compile_s = time.time() - t0
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    steady_s = time.time() - t0
    # device-resident input: excludes the host->device upload, which on this
    # harness runs through the axon relay at ~30 MB/s (a real v5e host moves
    # the 33 MB stack in milliseconds over PCIe). The steady re-run carries
    # a StageTimer so the driver JSON gets the per-stage breakdown.
    import jax.numpy as jnp

    from autopanostitch_tpu.utils.timing import StageTimer

    iset_dev = ImageSet(images=jnp.asarray(stack), sizes=sizes, names=iset.names)
    pipeline.stitch(iset_dev, cfg)
    timer = StageTimer(verbose=False)
    t0 = time.time()
    pipeline.stitch(iset_dev, cfg, timer=timer)
    dev_s = time.time() - t0
    dev_s = min(dev_s, _timed(lambda: pipeline.stitch(iset_dev, cfg)))
    stage_breakdown = {}
    for k, v in timer.durations:  # sum repeats (one entry per component)
        stage_breakdown[k] = round(stage_breakdown.get(k, 0.0) + v, 3)

    pr = res.panoramas[0]
    pano = pr["projections"]["spherical"]
    cover = pr["coverage"]
    canvas = pr["canvas"]["spherical"]
    R_est = pr["R_render"]
    # gauge: orthogonal Procrustes over all cameras
    M = sum(R_est[i].T @ Rs[i] for i in range(n_views))
    U, _, Vt = np.linalg.svd(M)
    G = U @ Vt
    if np.linalg.det(G) < 0:
        U[:, -1] *= -1
        G = U @ Vt
    ys, xs = np.nonzero(cover)
    sub = np.random.default_rng(0).choice(len(ys), min(400000, len(ys)), replace=False)
    ys, xs = ys[sub], xs[sub]
    u = canvas["x0"] + xs / canvas["f_pan"]
    v = canvas["y0"] + ys / canvas["f_pan"]
    d = np.stack([np.cos(v) * np.sin(u), np.sin(v), np.cos(v) * np.cos(u)], -1)
    gt = synthdata.env_lookup(env, d @ G, interp="bicubic")
    err = pano[ys, xs].astype(np.float64) / 255.0 - gt
    psnr = 10 * np.log10(1.0 / max(np.mean(err**2), 1e-12))
    f_est = np.asarray(pr["ba"]["cameras"].f)
    pre = f"pano{n_views}"
    return {
        f"{pre}_s": round(steady_s, 3),
        f"{pre}_dev_resident_s": round(dev_s, 3),
        f"{pre}_compile_s": round(compile_s, 1),
        f"{pre}_psnr_db": round(psnr, 2),
        f"{pre}_ferr_pct": round(float(np.abs(f_est - f_true).max() / f_true * 100), 4),
        f"{pre}_n_views": n_views,
        f"{pre}_canvas": [int(pano.shape[0]), int(pano.shape[1])],
        f"{pre}_coverage": round(float(np.mean(cover)), 3),
        f"{pre}_stage_s": stage_breakdown,
    }


def main():
    from autopanostitch_tpu.utils import compile_cache

    compile_cache.enable()

    from autopanostitch_tpu.config import (
        DetectorConfig,
        ImageMatchConfig,
        MatchingConfig,
        StitchConfig,
    )
    from autopanostitch_tpu.models import pipeline
    from autopanostitch_tpu.utils.image_io import ImageSet

    def checkpoint(out):
        # a full bench run is ~20 min of relay compiles; persist progress
        # so a truncated run still leaves the measured sections on disk
        try:
            with open("bench_partial.json", "w") as f:
                json.dump(out, f)
        except OSError:
            pass

    out = {"metric": "e2e_stitch_mpix_per_sec", "unit": "Mpix/s"}
    r6 = bench_6view(pipeline, StitchConfig, DetectorConfig, MatchingConfig,
                     ImageMatchConfig, ImageSet)
    out.update(r6)
    out["vs_baseline"] = round(r6["value"] / REFERENCE_EST_MPIX_S, 2)
    out["vs_baseline_note"] = "estimate; reference publishes no numbers"
    checkpoint(out)
    try:
        out.update(bench_pano100(pipeline, StitchConfig, DetectorConfig,
                                 MatchingConfig, ImageMatchConfig, ImageSet))
    except Exception as e:  # never lose the headline metric
        out["pano100_error"] = f"{type(e).__name__}: {e}"[:200]
    checkpoint(out)
    try:  # scaling point: 200 views (VERDICT r2 item 4)
        out.update(bench_pano100(pipeline, StitchConfig, DetectorConfig,
                                 MatchingConfig, ImageMatchConfig, ImageSet,
                                 n_views=200))
    except Exception as e:
        out["pano200_error"] = f"{type(e).__name__}: {e}"[:200]
    checkpoint(out)
    # real photographs (VERDICT r2 item 1): each dataset isolated so a
    # late failure cannot discard already-measured entries
    real = bench_real(pipeline, StitchConfig, ImageSet)
    out.update(real)
    if "real_error" not in real:
        for label, fn in (("church", _bench_church), ("cmu0", _bench_cmu0),
                          ("grandcanyon", _bench_grandcanyon),
                          ("yellowstone", _bench_yellowstone)):
            try:
                fn(pipeline, StitchConfig, out)
                checkpoint(out)
            except Exception as e:
                out[f"{label}_error"] = f"{type(e).__name__}: {e}"[:200]
    # randomized-scene robustness (the reference's "6-8% artifact rate"
    # claim, README.md:194): the 60-scene sweep is hours-scale, so bench
    # reports the latest checked-in sweep result (tools/robustness_sweep.py)
    try:
        rob_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "docs", "results", "robustness_r3_final.json",
        )
        with open(rob_path) as f:
            rob = json.load(f)["summary"]
        out["robustness_artifact_rate_pct"] = rob["artifact_rate_pct"]
        out["robustness_n_scenes"] = rob["n_scenes"]
        out["robustness_ghost_px_p99_median"] = rob["ghost_px_p99_median"]
        out["robustness_note"] = (
            "checked-in CPU sweep (tools/robustness_sweep.py, "
            "estimate_distortion on); reference claims 6-8% artifacts"
        )
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
