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

BUDGET DISCIPLINE (round-3 lesson: the driver's run timed out before the
JSON line was printed, leaving the round without an official number):
  - A hard internal wall-clock budget (AUTOPANO_BENCH_BUDGET_S, default
    840 s) gates every section: sections run most-valuable-first and are
    skipped (with a note) when the remaining budget is smaller than their
    calibrated cost.
  - The final JSON line is GUARANTEED: an atexit hook, SIGTERM/SIGINT
    handlers, and a SIGALRM scheduled at the budget horizon all print the
    checkpointed dict exactly once — even if a section hangs or the driver
    kills the process.
  - ONE PARALLEL PREWARM WAVE: every section's pipeline runs once in
    concurrent threads (the axon relay compiles DISTINCT executables
    concurrently, measured ~3x for 3 threads, and its per-executable AOT
    latency swings minute-to-minute, so overlapping compiles both
    shortens and de-risks the run); the measured sections then hit warm
    caches, in priority order, and the headline timings are RE-MEASURED
    quietly after every warm thread has finished (early sections
    otherwise time against background AOT traffic). Shape bucketing
    (utils/buckets.py) keeps the executable UNION small enough to
    compile inside one window — r4/r5's serial crash-isolation waves
    never fit their later sections into the budget; the gain kernel
    fault that motivated the isolation is fixed at the root
    (models/gain.py GAIN_BLOCK). Each measured section still retries
    once after an UNAVAILABLE (the worker restarts in under a minute and
    the client reconnects on the next dispatch).

vs_baseline: measured against this repo's ROUND-2 driver-captured number
(1.111 Mpix/s, BENCH_r02.json) — the reference publishes no numbers
(BASELINE.md), so progress-vs-self is the only honest comparator.

`prewarm_s` note: the JAX persistent compilation cache is enabled but the
relay's server-side AOT bypasses it (re-verified on this toolchain), so
prewarm time is relay AOT round-trips per executable, not XLA work. The
round-4 executable-count reduction (69 -> 14 for the 6-view stitch)
attacks the same term.
"""

import atexit
import json
import os
import signal
import sys
import threading
import time

import numpy as np

R2_BASELINE_MPIX_S = 1.111  # BENCH_r02.json driver-captured value

BUDGET_S = float(os.environ.get("AUTOPANO_BENCH_BUDGET_S", 840))
_T0 = time.time()

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

_out = {"metric": "e2e_stitch_mpix_per_sec", "unit": "Mpix/s", "value": 0.0}
_emitted = False


def _emit():
    global _emitted
    if not _emitted:
        _emitted = True
        _out["bench_wall_s"] = round(time.time() - _T0, 1)
        print(json.dumps(_out), flush=True)


def _on_signal(signum, frame):
    _out["bench_interrupted"] = signal.Signals(signum).name
    _emit()
    os._exit(0)


def _left() -> float:
    return BUDGET_S - (time.time() - _T0)


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def _relay_sync_overhead_s(n: int = 5) -> float:
    """Median cost of one trivial dispatch+sync: the per-stage relay tax.

    Subtracted from single-dispatch stage walls to estimate device time
    (the `*_device_s` twins). On a directly-attached host this is ~0."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    f(x).block_until_ready()  # compile outside the measurement
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


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


# ---------------------------------------------------------------------------
# Section input builders (shared by the parallel prewarm and the measured
# sections, so the prewarm compiles EXACTLY the executables the
# measurements hit)
# ---------------------------------------------------------------------------

def build_6view():
    from autopanostitch_tpu.config import (
        DetectorConfig, ImageMatchConfig, MatchingConfig, StitchConfig,
    )
    from autopanostitch_tpu.utils.image_io import ImageSet

    views = load_views()
    sizes = np.array([v.shape[:2] for v in views], np.int32)
    stack = (np.stack(views) * 255).astype(np.uint8)  # 4x cheaper upload
    iset = ImageSet(images=stack, sizes=sizes, names=[f"v{k}" for k in range(len(views))])
    cfg = StitchConfig(
        detector=DetectorConfig(max_keypoints=1024, num_octaves=4),
        matching=MatchingConfig(max_matches_per_pair=512),
        image_match=ImageMatchConfig(ransac_batch=512),
    )
    return {"iset": iset, "cfg": cfg, "stack": stack, "sizes": sizes}


def build_pano(n_views: int):
    import synthdata

    from autopanostitch_tpu.config import (
        BlendConfig, DetectorConfig, ImageMatchConfig, MatchingConfig,
        RenderConfig, StitchConfig, StraightenConfig,
    )
    from autopanostitch_tpu.utils.image_io import ImageSet

    env = synthdata.smooth_texture(7, 768, 2048)
    f_true = 350.0
    w, h = 384, 288
    yaw = 2 * np.pi / n_views
    views, Rs = [], []
    for i in range(n_views):
        R = synthdata.rot_y(i * yaw).T
        views.append(synthdata.render_pinhole_from_equirect(env, R, f_true, w, h, "bicubic"))
        Rs.append(R)
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
    return {
        "iset": iset, "cfg": cfg, "stack": stack, "sizes": sizes,
        "env": env, "Rs": np.stack(Rs), "f_true": f_true, "n_views": n_views,
    }


def build_church():
    import dataclasses

    from autopanostitch_tpu.config import StitchConfig
    from autopanostitch_tpu.utils import real_data
    from autopanostitch_tpu.utils.image_io import load_image_set

    cfg = StitchConfig()
    cfg = cfg.replace(render=dataclasses.replace(
        cfg.render, height_limit=480, width_limit=480))
    iset = load_image_set(real_data.church_paths(), 480, 480)
    return {"iset": iset, "cfg": cfg}


def build_sheet(sheet: str):
    """A reference capture sheet with the DEFAULT config (second_pass and
    pairwise_rescue both on — round-3 had to disable second_pass to dodge
    relay compile cost; the round-4 executable-count reduction plus the
    parallel prewarm make the default path affordable)."""
    from autopanostitch_tpu.config import StitchConfig
    from autopanostitch_tpu.utils import real_data

    tiles = real_data.load_montage_tiles(sheet)
    iset = real_data.image_set_from_arrays(tiles, 800, 800)
    return {"iset": iset, "cfg": StitchConfig(), "n_tiles": len(tiles)}


# ---------------------------------------------------------------------------
# Measured sections
# ---------------------------------------------------------------------------

def bench_6view(pipeline, b):
    iset, cfg, stack, sizes = b["iset"], b["cfg"], b["stack"], b["sizes"]
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    first_s = time.time() - t0  # ~steady after prewarm
    # min of 3: relay round-trip jitter is +-30% run to run
    steady_s = min(
        first_s, *(_timed(lambda: pipeline.stitch(iset, cfg)) for _ in range(2))
    )
    res = pipeline.stitch(iset, cfg)

    # SIFT keypoints/sec: batched extraction alone, steady state
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
        "first_after_prewarm_s": round(first_s, 2),
        "n_images": stack.shape[0],
        "n_keypoints": n_kp,
        "sift_kps_per_sec": round(n_kp / sift_s, 0),
        "n_panoramas": len(res.panoramas),
        "accepted_pairs": int(res.graph.accepted.sum()),
    }


def _pano_mfu(res, cfg, stage_device, n_views, h, w):
    """Per-stage analytic-FLOP MFU fields (VERDICT r4 item 2).

    Counts from utils/flops.py are lower bounds; see that module's
    docstring for the roofline context (only the matcher GEMM and SIFT
    convolutions are FLOP-carrying; RANSAC/BA/gain/render are
    latency/bandwidth-bound and honestly report ~0 MFU)."""
    import numpy as np

    from autopanostitch_tpu.models.bundle import run_incremental_ba
    from autopanostitch_tpu.ops.ransac import verify_pairs
    from autopanostitch_tpu.utils import flops as fl

    out = {}
    n_desc = int(np.asarray(res.features.mask).sum())
    det = cfg.detector
    stage_flops = {
        "features": fl.sift_flops(
            n_views, h, w, det.num_octaves, max_keypoints=det.max_keypoints),
        "matching": fl.matching_flops(n_desc),
    }
    rs_stats = getattr(verify_pairs, "last_stats", None)
    if rs_stats:
        stage_flops["ransac"] = fl.ransac_flops(
            rs_stats["n_pairs"],
            rs_stats["trials_spent"] / max(rs_stats["n_pairs"], 1),
            rs_stats["m_matches"],
        )
        out["ransac_trials_spent"] = rs_stats["trials_spent"]
        out["ransac_pairs_continued"] = rs_stats["n_continued"]
    ba_stats = getattr(run_incremental_ba, "last_stats", None)
    if ba_stats:
        stage_flops["bundle_adjustment"] = sum(
            fl.ba_flops(g, iters, ba_stats["n_pairs"], ba_stats["m_matches"],
                        nb, pd=ba_stats["pd"])
            for nb, pb, iters, g in ba_stats["phase_shapes"]
        )
    grid = (h // cfg.gain.grid_stride) * (w // cfg.gain.grid_stride)
    stage_flops["gain"] = fl.gain_flops(n_views, grid)
    if res.panoramas:
        from autopanostitch_tpu.models.render import tile_contributors

        pano0 = next(iter(res.panoramas[0]["projections"].values()))
        # max_contributors=None means auto-sized: read the C the renderer
        # actually chose (recorded by tile_contributors)
        c_eff = (cfg.render.max_contributors
                 or getattr(tile_contributors, "last_C", 8))
        stage_flops["render:spherical"] = fl.render_flops(
            pano0.shape[0] * pano0.shape[1], c_eff)
    mfu = {}
    for k, f in stage_flops.items():
        t = stage_device.get(k, 0.0)
        gflops, frac = fl.stage_mfu(f, t)
        mfu[k] = {"gflop": round(f / 1e9, 2), "gflop_per_s": round(gflops, 1),
                  "mfu_pct": round(100 * frac, 3)}
    out["mfu_by_stage"] = mfu
    # headline: the matcher GEMM, the one stage that SHOULD ride the MXU
    out["mfu_matcher_pct"] = mfu["matching"]["mfu_pct"]
    out["mfu_note"] = (
        "analytic lower-bound FLOPs / device-seconds / 197 TFLOP/s (v5e "
        "bf16 peak); non-GEMM stages are latency/bandwidth-bound by design "
        "— see utils/flops.py"
    )
    return out


def bench_pano(pipeline, b, light=False):
    """North-star workload: n-view 360x~50 spherical pano, PSNR vs GT.

    light=True (pano200): one timed stitch + PSNR only — no dev-resident
    re-runs, no dispatch counting — to fit the wave-2 budget."""
    import synthdata

    iset, cfg, stack, sizes = b["iset"], b["cfg"], b["stack"], b["sizes"]
    env, Rs, f_true, n_views = b["env"], b["Rs"], b["f_true"], b["n_views"]
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    steady_s = time.time() - t0
    # device-resident input: excludes the host->device upload, which on this
    # harness runs through the axon relay at ~30 MB/s (a real v5e host moves
    # the 33 MB stack in milliseconds over PCIe). The steady re-run carries
    # a StageTimer so the driver JSON gets the per-stage breakdown.
    import contextlib

    import jax.numpy as jnp

    from autopanostitch_tpu.utils.image_io import ImageSet
    from autopanostitch_tpu.utils.timing import DispatchCounter, StageTimer

    if light:
        pr = res.panoramas[0]
        pano = pr["projections"]["spherical"]
        psnr, ferr = _pano_psnr(res, env, Rs, f_true, n_views)
        pre = f"pano{n_views}"
        return {
            f"{pre}_s": round(steady_s, 3),
            f"{pre}_psnr_db": round(psnr, 2),
            f"{pre}_ferr_pct": round(ferr, 4),
            f"{pre}_n_views": n_views,
            f"{pre}_canvas": [int(pano.shape[0]), int(pano.shape[1])],
            f"{pre}_coverage": round(float(np.mean(pr["coverage"])), 3),
        }

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
    # `*_device_s` twins (VERDICT r3 item 6): stage wall minus the measured
    # per-dispatch relay sync tax. Exact for single-dispatch stages
    # (features/matching/verify/gain/render each sync once); an UPPER bound
    # on device time for the BA stage, whose grouped LM phases make several
    # dispatches (ROUND3.md measured 0.09 s device inside 0.73 s wall).
    sync_s = _relay_sync_overhead_s()
    stage_device = {
        k: round(max(0.0, v - sync_s), 3) for k, v in stage_breakdown.items()
    }

    # per-stage DISPATCH COUNTS (VERDICT r4 item 1): an untimed extra run
    # with the jit C++ fastpath disabled; counts depend only on program
    # structure, so the slower Python dispatch path does not skew them
    class _Fanout:
        def __init__(self, *sinks):
            self.sinks = sinks

        @contextlib.contextmanager
        def stage(self, name):
            with contextlib.ExitStack() as es:
                for s in self.sinks:
                    es.enter_context(s.stage(name))
                yield

    dc = DispatchCounter()
    with dc:
        pipeline.stitch(iset_dev, cfg, timer=_Fanout(dc))
    dispatch_counts = dict(dc.per_stage)
    dispatch_counts["total"] = dc.total
    if dc.total == 0:
        # the pjit-internals patch misses the axon relay's execute path;
        # report nothing rather than misleading zeros (CPU-backend counts
        # are available via tools/count_dispatches.py)
        dispatch_counts = None

    pr = res.panoramas[0]
    pano = pr["projections"]["spherical"]
    cover = pr["coverage"]
    psnr, ferr = _pano_psnr(res, env, Rs, f_true, n_views)
    pre = f"pano{n_views}"
    out = {
        f"{pre}_s": round(steady_s, 3),
        f"{pre}_dev_resident_s": round(dev_s, 3),
        f"{pre}_psnr_db": round(psnr, 2),
        f"{pre}_ferr_pct": round(ferr, 4),
        f"{pre}_n_views": n_views,
        f"{pre}_canvas": [int(pano.shape[0]), int(pano.shape[1])],
        f"{pre}_coverage": round(float(np.mean(cover)), 3),
        f"{pre}_stage_s": stage_breakdown,
        f"{pre}_stage_device_s": stage_device,
        f"{pre}_relay_sync_ms": round(sync_s * 1000, 1),
    }
    if dispatch_counts is not None:
        out[f"{pre}_dispatch_count"] = dispatch_counts
    h, w = stack.shape[1], stack.shape[2]
    try:  # accounting only — never lose the section's headline numbers
        for k, v in _pano_mfu(res, cfg, stage_device, n_views, h, w).items():
            out[f"{pre}_{k}"] = v
    except Exception as e:
        out[f"{pre}_mfu_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def _pano_psnr(res, env, Rs, f_true, n_views):
    """(PSNR dB vs gauge-aligned GT lookup, max focal error %)."""
    import synthdata

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
    ferr = float(np.abs(f_est - f_true).max() / f_true * 100)
    return psnr, ferr


def bench_church(pipeline, b, out):
    # church trio: 3 real overlapping renderings -> ONE panorama
    iset, cfg = b["iset"], b["cfg"]
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


def bench_cmu0(pipeline, b, out):
    # CMU0 sheet: 38 real photos, DEFAULT config. The pairwise rescue is
    # what consolidates the sheet into ONE ~360-degree panorama of 37/38
    # photos (global-only: 7 fragments).
    iset, cfg = b["iset"], b["cfg"]
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    out["cmu0_s"] = round(time.time() - t0, 2)
    out["cmu0_n_images"] = b["n_tiles"]
    out["cmu0_n_panoramas"] = len(res.panoramas)
    sizes = sorted((len(p["members"]) for p in res.panoramas), reverse=True)
    out["cmu0_panorama_sizes"] = sizes
    out["cmu0_images_stitched"] = int(sum(sizes))
    out["cmu0_accepted_pairs"] = int(np.asarray(res.graph.accepted).sum())


def bench_sheet_named(pipeline, b, out, name):
    # Grand Canyon: ALL 35 photos -> ONE panorama (measured r3);
    # Yellowstone: 2-ROW rig, all 22 -> ONE panorama (measured r3).
    iset, cfg = b["iset"], b["cfg"]
    t0 = time.time()
    res = pipeline.stitch(iset, cfg)
    out[f"{name}_s"] = round(time.time() - t0, 2)
    out[f"{name}_n_images"] = b["n_tiles"]
    out[f"{name}_n_panoramas"] = len(res.panoramas)
    out[f"{name}_largest"] = max(
        (len(p["members"]) for p in res.panoramas), default=0
    )


def main():
    atexit.register(_emit)
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    # hard horizon: even a hung section cannot suppress the JSON line
    signal.signal(signal.SIGALRM, _on_signal)
    signal.alarm(int(BUDGET_S) + 30)

    from autopanostitch_tpu.utils import compile_cache

    compile_cache.enable()

    from autopanostitch_tpu.models import pipeline
    from autopanostitch_tpu.utils import real_data

    def checkpoint():
        # persist progress so a truncated run still leaves the measured
        # sections on disk (and _emit always has the latest dict)
        try:
            with open("bench_partial.json", "w") as f:
                json.dump(_out, f)
        except OSError:
            pass

    have_real = real_data.have_reference_assets()
    if not have_real:
        _out["real_error"] = "reference assets not present"

    builders = [
        ("6view", build_6view),
        ("pano100", lambda: build_pano(100)),
        ("cmu0", lambda: build_sheet("CMU0")),
        ("church", build_church),
        ("pano200", lambda: build_pano(200)),
        ("grandcanyon", lambda: build_sheet("grandcanyon")),
        ("yellowstone", lambda: build_sheet("yellowstone")),
    ]
    real_names = {"cmu0", "church", "grandcanyon", "yellowstone"}
    built = {}
    for name, mk in builders:
        if name in real_names and not have_real:
            continue
        try:
            built[name] = mk()
        except Exception as e:
            _out[f"{name}_error"] = f"build {type(e).__name__}: {e}"[:200]

    # ---- TWO WAVES of (parallel prewarm -> sequential measure). One TPU
    # worker crash ("UNAVAILABLE: TPU worker process crashed") poisons
    # every in-flight and subsequent dispatch, so the headline sections
    # (wave 1) are prewarmed AND measured before the heavier wave-2
    # workloads ever touch the chip. Within a wave, prewarms run in
    # concurrent threads (the relay compiles distinct executables
    # concurrently, measured ~3x for 3 threads). ----
    def sec_6view():
        r6 = bench_6view(pipeline, built["6view"])
        _out.update(r6)
        _out["vs_baseline"] = round(r6["value"] / R2_BASELINE_MPIX_S, 2)
        _out["vs_baseline_note"] = (
            "vs this repo's round-2 driver-captured 1.111 Mpix/s; the "
            "MATLAB reference publishes no numbers (BASELINE.md)"
        )

    # ONE wave: all sections prewarm CONCURRENTLY from the start (the
    # relay compiles distinct executables in parallel, ~3x for 3
    # threads), and sections measure in priority order on warm caches
    # with per-section straggler joins. The old multi-wave split existed
    # for crash isolation around the gain kernel fault; with that fault
    # fixed at the root (gain.GAIN_BLOCK block-pair path) the serial
    # waves just paid the compile wall twice — measured: wave 2+ never
    # fit the 840 s budget in ANY r4/r5 run. Shape bucketing
    # (utils/buckets.py) keeps the total executable set small enough
    # that the union compiles inside one prewarm window: pano200 shares
    # pano100's programs, grandcanyon shares cmu0's. pano200 runs LIGHT
    # (one timed stitch + PSNR).
    waves = [
        [
            ("6view", sec_6view, 40),
            ("pano100", lambda: _out.update(bench_pano(pipeline, built["pano100"])), 75),
            ("cmu0", lambda: bench_cmu0(pipeline, built["cmu0"], _out), 30),
            ("church", lambda: bench_church(pipeline, built["church"], _out), 15),
            ("pano200",
             lambda: _out.update(
                 bench_pano(pipeline, built["pano200"], light=True)), 30),
            ("grandcanyon",
             lambda: bench_sheet_named(pipeline, built["grandcanyon"], _out, "grandcanyon"), 20),
            ("yellowstone",
             lambda: bench_sheet_named(pipeline, built["yellowstone"], _out, "yellowstone"), 30),
        ],
    ]

    def _warm(b):
        try:
            pipeline.stitch(b["iset"], b["cfg"])
        except Exception:
            pass  # the measured section will report the error

    def _retry_unavailable(fn, name):
        """One retry after a worker-crash error: the TPU worker restarts
        within ~a minute and the client reconnects on the next dispatch."""
        try:
            fn()
        except Exception as e:
            if "UNAVAILABLE" not in str(e) or _left() < 120:
                raise
            _out[f"{name}_retried_after_unavailable"] = True
            time.sleep(45)
            fn()

    skipped = []
    prewarm_total = 0.0
    all_warm_threads = {}  # across waves (ADVICE r4: join prior-wave
    # stragglers too — a daemon warm thread still compiling past its
    # wave's deadline would otherwise contend with later measurements)
    for wi, sections in enumerate(waves):
        wave_names = [n for n, _, _ in sections if n in built]
        if not wave_names:
            continue
        # skip the whole wave (cheaply, before compiling) if even its
        # cheapest section cannot fit the remaining budget
        if _left() < min(est for n, _, est in sections if n in built) + 60:
            skipped.extend(wave_names)
            continue
        t0 = time.time()
        # deadline caps keep prewarm from eating the wave-2 sections'
        # budget (r4: a 479 s prewarm left no room for pano200/sheets)
        # the cap leaves room for the measures (~150 s) plus straggler
        # joins; sections whose warm thread is still compiling at their
        # turn wait for THEIR straggler inside the measure loop anyway
        cap = 430.0
        prewarm_deadline = time.time() + max(30.0, min(cap, _left() * 0.62))
        warm_threads = {
            n: threading.Thread(
                target=_warm, args=(built[n],), daemon=True, name=f"warm-{n}")
            for n in wave_names
        }
        all_warm_threads.update(warm_threads)
        for t in warm_threads.values():
            t.start()
        for t in warm_threads.values():
            t.join(timeout=max(1.0, prewarm_deadline - time.time()))
        still = [t.name for t in all_warm_threads.values() if t.is_alive()]
        prewarm_total += time.time() - t0
        _out["prewarm_s"] = round(prewarm_total, 1)
        if still:
            _out.setdefault("prewarm_timed_out", []).extend(
                n for n in still if n not in _out.get("prewarm_timed_out", []))

        for name, fn, est in sections:
            if name not in built:
                continue
            if _left() < est:
                skipped.append(name)
                continue
            # a still-compiling warm thread (its own OR another section's,
            # including a PRIOR wave's straggler) contends with the
            # measurement — wait for this section's thread first, then
            # give stragglers a short grace so steady timings are not
            # polluted by background AOT traffic
            wt = warm_threads.get(name)
            if wt is not None and wt.is_alive():
                wt.join(timeout=max(1.0, _left() - est))
            for other in all_warm_threads.values():
                if other.is_alive():
                    other.join(timeout=5.0)
            try:
                _retry_unavailable(fn, name)
            except Exception as e:  # never lose earlier sections
                _out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
            checkpoint()
    # QUIET re-measure of the headline timings: the first sections run
    # while the other sections' prewarm threads are still compiling, and
    # that background AOT traffic inflates their walls (measured: 6view
    # 2.08 s mid-prewarm vs ~1.4 s quiet). Cheap (seconds) — take the min.
    if "6view" in built and _left() > 60 and "value" in _out:
        try:
            for t in all_warm_threads.values():
                if t.is_alive():
                    t.join(timeout=10.0)
            b = built["6view"]
            quiet = min(
                _timed(lambda: pipeline.stitch(b["iset"], b["cfg"]))
                for _ in range(3)
            )
            if quiet < _out.get("steady_s", float("inf")):
                _out["steady_s"] = round(quiet, 3)
                mpix = (b["stack"].shape[0] * b["stack"].shape[1]
                        * b["stack"].shape[2] / 1e6)
                _out["value"] = round(mpix / quiet, 3)
                _out["vs_baseline"] = round(_out["value"] / R2_BASELINE_MPIX_S, 2)
                _out["steady_requiet"] = True
        except Exception:
            pass
    if "pano100" in built and _left() > 30 and "pano100_s" in _out:
        try:
            b = built["pano100"]
            quiet = _timed(lambda: pipeline.stitch(b["iset"], b["cfg"]))
            if quiet < _out["pano100_s"]:
                _out["pano100_s"] = round(quiet, 3)
                _out["pano100_requiet"] = True
        except Exception:
            pass
    if skipped:
        _out["sections_skipped_for_budget"] = skipped
    _out["budget_s"] = BUDGET_S

    # randomized-scene robustness (the reference's "6-8% artifact rate"
    # claim, README.md:194): the 60-scene sweep is hours-scale, so bench
    # reports the latest checked-in sweep result (tools/robustness_sweep.py)
    for fname, note in (
        ("robustness_r5_default.json",
         "checked-in CPU sweep (tools/robustness_sweep.py) on the DEFAULT "
         "StitchConfig; reference claims 6-8% artifacts"),
        ("robustness_r4_default.json",
         "checked-in CPU sweep (tools/robustness_sweep.py) on the DEFAULT "
         "StitchConfig; reference claims 6-8% artifacts"),
        ("robustness_r3_final.json",
         "checked-in CPU sweep (tools/robustness_sweep.py, "
         "estimate_distortion on); reference claims 6-8% artifacts"),
    ):
        try:
            rob_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "docs", "results", fname,
            )
            with open(rob_path) as f:
                rob = json.load(f)["summary"]
            _out["robustness_artifact_rate_pct"] = rob["artifact_rate_pct"]
            _out["robustness_n_scenes"] = rob["n_scenes"]
            _out["robustness_ghost_px_p99_median"] = rob["ghost_px_p99_median"]
            _out["robustness_note"] = note
            break
        except Exception:
            continue
    checkpoint()
    _emit()


if __name__ == "__main__":
    main()
