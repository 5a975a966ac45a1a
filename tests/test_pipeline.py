import dataclasses
import types

import numpy as np
import pytest

import synthdata
from autopanostitch_tpu.config import (
    BlendConfig,
    BundleConfig,
    DetectorConfig,
    ImageMatchConfig,
    MatchingConfig,
    RenderConfig,
    StitchConfig,
    StraightenConfig,
)
from autopanostitch_tpu.models import pipeline
from autopanostitch_tpu.utils.image_io import ImageSet


def small_cfg(planar=True, **kw):
    """Small-capacity config. planar=True forces the planar compositing path
    (the reference's forcePlanarScan, inputs.m:91) — synthetic translated
    crops are geometrically planar even though short chains pass the
    rotation-consistency test (the reference behaves identically)."""
    return StitchConfig(
        detector=DetectorConfig(max_keypoints=512, num_octaves=3),
        matching=MatchingConfig(max_matches_per_pair=256),
        image_match=ImageMatchConfig(ransac_batch=256, **kw),
        straighten=StraightenConfig(force_planar_scan=planar),
        bundle=BundleConfig(incremental_lm_iters=8, max_iter_lm=30),
    )


def make_set(views):
    sizes = np.array([v.shape[:2] for v in views], np.int32)
    H = sizes[:, 0].max()
    W = sizes[:, 1].max()
    stack = np.zeros((len(views), H, W, 3), np.float32)
    for k, v in enumerate(views):
        stack[k, : v.shape[0], : v.shape[1]] = v
    return ImageSet(images=stack, sizes=sizes, names=[f"v{k}" for k in range(len(views))])


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


class TestPlanarStitch:
    def test_two_crop_stitch(self):
        env = synthdata.texture(0, 500, 900)
        boxes = [(0, 0, 520, 420), (350, 40, 520, 420)]
        views = synthdata.planar_crops(env, boxes)
        iset = make_set(views)
        res = pipeline.stitch(iset, small_cfg())

        assert len(res.panoramas) == 1
        pano = res.panoramas[0]
        assert pano["reachable"].all()
        pan = pano["panorama"]
        cov = pano["coverage"]
        # canvas should cover the union extent ~ (870 x 460)
        assert pan.shape[0] >= 440 and pan.shape[1] >= 850

        # reconstruct ground truth in the anchor frame and compare
        anchor = pano["anchor"]
        ax, ay = boxes[anchor][0], boxes[anchor][1]
        x0, y0 = pano["offset"]
        ys, xs = np.nonzero(cov)
        ex = (xs + x0 + ax).round().astype(int)
        ey = (ys + y0 + ay).round().astype(int)
        ok = (ex >= 0) & (ex < env.shape[1]) & (ey >= 0) & (ey < env.shape[0])
        p = psnr(pan[ys[ok], xs[ok]].astype(np.float64) / 255.0, env[ey[ok], ex[ok]])
        assert p > 30.0, f"stitch PSNR {p:.1f} dB"

    def test_three_crop_chain(self):
        """Crops 0-1 and 1-2 overlap; 0-2 barely. Chaining must cover all."""
        env = synthdata.texture(1, 480, 1200)
        boxes = [(0, 0, 460, 400), (330, 30, 460, 400), (660, 10, 460, 400)]
        views = synthdata.planar_crops(env, boxes)
        iset = make_set(views)
        res = pipeline.stitch(iset, small_cfg())
        assert len(res.panoramas) == 1
        assert res.panoramas[0]["reachable"].all()
        assert res.panoramas[0]["panorama"].shape[1] >= 1050

    def test_multi_panorama_discovery(self):
        """Two unrelated groups + one singleton -> two panoramas."""
        env_a = synthdata.texture(2, 420, 800)
        env_b = synthdata.texture(3, 420, 800)
        va = synthdata.planar_crops(env_a, [(0, 0, 420, 380), (280, 20, 420, 380)])
        vb = synthdata.planar_crops(env_b, [(10, 10, 420, 380), (300, 0, 420, 380)])
        lone = synthdata.texture(4, 380, 420)
        views = [va[0], vb[0], lone, va[1], vb[1]]
        iset = make_set(views)
        res = pipeline.stitch(iset, small_cfg())
        assert len(res.panoramas) == 2
        members = sorted(tuple(sorted(p["members"].tolist())) for p in res.panoramas)
        assert members == [(0, 3), (1, 4)]
        # singleton image 2 in neither
        comps = res.components
        assert (comps == comps[2]).sum() == 1

    def test_match_graph_contents(self):
        env = synthdata.texture(5, 500, 900)
        boxes = [(0, 0, 520, 420), (350, 40, 520, 420)]
        iset = make_set(synthdata.planar_crops(env, boxes))
        res = pipeline.stitch(iset, small_cfg())
        g = res.graph
        assert g.accepted.any()
        p = int(np.nonzero(g.accepted)[0][0])
        # H should be ~ translation by (-350, -40) (image0 frame -> image1 frame)
        H = g.H[p]
        assert abs(H[0, 2] + 350) < 2.0
        assert abs(H[1, 2] + 40) < 2.0
        assert g.num_inliers[p] > 30


class TestSecondPassResize:
    def test_cluster_resize_recovers_resolution(self):
        """Full second pass (`imageMatchingPanoramaConComps.m:48-90`): a
        multi-panorama set whose first-pass stack was ingested at HALF the
        configured resolution. The per-component re-resize re-extracts from
        the originals at full limits and must measurably increase inlier
        counts vs the degraded first pass."""
        env_a = synthdata.texture(21, 420, 800)
        env_b = synthdata.texture(22, 420, 800)
        va = synthdata.planar_crops(env_a, [(0, 0, 420, 380), (280, 20, 420, 380)])
        vb = synthdata.planar_crops(env_b, [(10, 10, 420, 380), (300, 0, 420, 380)])
        views = [va[0], vb[0], va[1], vb[1]]

        def degrade(v):  # half-res ingestion (mimics the reference's
            # common-size uniformization loss on mixed sets)
            from PIL import Image
            im = Image.fromarray((v * 255).astype(np.uint8))
            im = im.resize((v.shape[1] // 2, v.shape[0] // 2), Image.LANCZOS)
            return np.asarray(im, np.float32) / 255.0

        small = [degrade(v) for v in views]
        iset = make_set(small)
        iset.originals = [v for v in views]  # full-res originals

        base_cfg = small_cfg()
        cfg = base_cfg.replace(
            matching=dataclasses.replace(
                base_cfg.matching, resize_panorama_cluster=True
            ),
            render=dataclasses.replace(
                base_cfg.render, height_limit=420, width_limit=420
            ),
        )
        res = pipeline.stitch(iset, cfg)
        assert len(res.panoramas) == 2
        # first-pass inliers on the degraded stack
        first_inl = {}
        for p in range(len(res.graph.pairs)):
            if res.graph.accepted[p]:
                i, j = res.graph.pairs[p]
                first_inl[(int(i), int(j))] = int(res.graph.num_inliers[p])
        assert first_inl, "first pass found no accepted pairs"
        # the second pass ran per component on re-extracted full-res features
        for pano in res.panoramas:
            members = pano["members"]
            # panorama composited at recovered resolution: canvas spans the
            # full-res extent (~700 px wide), not the degraded ~350 px
            assert pano["panorama"].shape[1] > 500
            ba_pairs = pano["ba"]["pairs"]
            assert len(ba_pairs) >= 1


class TestRotationalStitch:
    def test_rotational_spherical_render(self):
        """Full pipeline on synthetic rotational views: BA + spherical render.
        The rendered panorama must match the ground-truth environment
        reprojection in the covered region."""
        env, views, Rs_true, f_true = synthdata.rotational_views(
            seed=11, n_views=4, f=350.0, size=(420, 320), yaw_step=0.55
        )
        iset = make_set([v.astype(np.float32) for v in views])
        cfg = small_cfg(planar=False).replace(
            render=RenderConfig(projections=("spherical",), tile=(256, 256)),
            blend=BlendConfig(mode="linear"),
        )
        res = pipeline.stitch(iset, cfg)
        assert len(res.panoramas) == 1
        pano_res = res.panoramas[0]
        ba = pano_res["ba"]
        assert not ba["no_rotation"]
        f_est = np.asarray(ba["cameras"].f)
        assert np.all(np.abs(f_est - f_true) / f_true < 0.12), f_est

        pano = pano_res["projections"]["spherical"]
        cover = pano_res["coverage"]
        assert cover.mean() > 0.25
        canvas = pano_res["canvas"]["spherical"]

        # ground truth: sample the environment along the same pano rays,
        # accounting for the unknown global rotation gauge (R_est = G R_true
        # -> environment direction = G^T d_pano). Estimate G from cam 0.
        R_est = pano_res["R_render"]  # rotations used by the renderer
        G = R_est[0].T @ Rs_true[0]  # maps est-world -> true-world
        ys, xs = np.nonzero(cover)
        sub = np.random.default_rng(0).choice(len(ys), min(20000, len(ys)), replace=False)
        ys, xs = ys[sub], xs[sub]
        u = canvas["x0"] + xs / canvas["f_pan"]
        v = canvas["y0"] + ys / canvas["f_pan"]
        cu, su_ = np.cos(u), np.sin(u)
        cv, sv = np.cos(v), np.sin(v)
        d = np.stack([cv * su_, sv, cv * cu], -1)
        d_true = d @ G  # rows: G^T @ d
        eh, ew = env.shape[:2]
        theta = np.arctan2(d_true[:, 0], d_true[:, 2])
        phi = np.arctan2(d_true[:, 1], np.hypot(d_true[:, 0], d_true[:, 2]))
        ex = (theta + np.pi) / (2 * np.pi) * (ew - 1)
        ey = (phi + np.pi / 2) / np.pi * (eh - 1)
        gt = synthdata._bilinear_np(env, ex, ey)
        err = pano[ys, xs].astype(np.float64) / 255.0 - gt
        mse = np.mean(err**2)
        p = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert p > 25.0, f"rotational stitch PSNR {p:.1f} dB"


class TestHighFidelityRotational:
    def test_smooth_env_psnr_40db(self):
        """North-star quality gate in miniature (BASELINE north star:
        >= 40 dB): band-limited environment, bicubic view synthesis,
        bicubic render, multiband blend. The round-1 bilinear path measured
        ~22 dB on this config; the bicubic path must clear 40."""
        env = synthdata.smooth_texture(5, 512, 1536)
        f_true = 300.0
        n = 12  # closed ring: loop closure distributes the chain drift
        # that bows an open chain's ends (~0.3 deg = 1.5 px of ghosting)
        views, Rs = [], []
        for i in range(n):
            R = synthdata.rot_y(i * 2 * np.pi / n).T
            views.append(synthdata.render_pinhole_from_equirect(
                env, R, f_true, 320, 256, "bicubic"))
            Rs.append(R)
        iset = make_set([v.astype(np.float32) for v in views])
        cfg = small_cfg(planar=False).replace(
            render=RenderConfig(projections=("spherical",),
                                interpolation="bicubic"),
            blend=BlendConfig(mode="multiband"),
            straighten=StraightenConfig(enabled=False),
        )
        res = pipeline.stitch(iset, cfg)
        assert len(res.panoramas) == 1
        pr = res.panoramas[0]
        f_est = np.asarray(pr["ba"]["cameras"].f)
        assert np.all(np.abs(f_est - f_true) / f_true < 0.02), f_est

        pano = pr["projections"]["spherical"]
        cover = pr["coverage_by_mode"]["spherical"]
        canvas = pr["canvas"]["spherical"]
        R_est = pr["R_render"]
        # gauge: orthogonal Procrustes over all cameras
        M = sum(R_est[i].T @ np.asarray(Rs[i]) for i in range(n))
        U, _, Vt = np.linalg.svd(M)
        G = U @ Vt
        if np.linalg.det(G) < 0:
            U[:, -1] *= -1
            G = U @ Vt
        ys, xs = np.nonzero(cover)
        sub = np.random.default_rng(0).choice(len(ys), min(60000, len(ys)),
                                              replace=False)
        ys, xs = ys[sub], xs[sub]
        u = canvas["x0"] + xs / canvas["f_pan"]
        v = canvas["y0"] + ys / canvas["f_pan"]
        d = np.stack([np.cos(v) * np.sin(u), np.sin(v),
                      np.cos(v) * np.cos(u)], -1)
        gt = synthdata.env_lookup(env, d @ G, interp="bicubic")
        err = pano[ys, xs].astype(np.float64) / 255.0 - gt
        p = 10 * np.log10(1.0 / max(np.mean(err**2), 1e-12))
        assert p > 40.0, f"smooth-env rotational PSNR {p:.1f} dB"

    def test_distorted_lens_estimate_distortion_recovers(self):
        """Barrel-distorted views (k1 = -0.04, a capability the reference
        lacks): estimate_distortion recovers f within 1% and k1 within
        0.01, and the distortion-aware render path produces the panorama
        (the 4-param model measured ~8-12% focal bias on this setup —
        the robustness sweep's dominant artifact class)."""
        from autopanostitch_tpu.utils import perturb

        env = synthdata.smooth_texture(11, 512, 1536)
        f_true, k1_true = 300.0, -0.04
        n = 10
        views, Rs = [], []
        for i in range(n):
            R = synthdata.rot_y(i * 2 * np.pi / n).T
            v = synthdata.render_pinhole_from_equirect(
                env, R, f_true, 320, 256, "bicubic")
            views.append(perturb.radial_distort(
                np.asarray(v, np.float32), k1_true))
            Rs.append(R)
        iset = make_set([v.astype(np.float32) for v in views])
        cfg = small_cfg(planar=False).replace(
            render=RenderConfig(projections=("spherical",),
                                interpolation="bicubic"),
            blend=BlendConfig(mode="multiband"),
            straighten=StraightenConfig(enabled=False),
        )
        cfg = cfg.replace(
            bundle=dataclasses.replace(cfg.bundle, estimate_distortion=True)
        )
        res = pipeline.stitch(iset, cfg)
        assert len(res.panoramas) == 1
        pr = res.panoramas[0]
        cams = pr["ba"]["cameras"]
        f_est = np.asarray(cams.f)
        k1_est = np.asarray(cams.k1)
        assert np.all(np.abs(f_est - f_true) / f_true < 0.01), f_est
        assert np.all(np.abs(k1_est - k1_true) < 0.01), k1_est
        # the distortion-corrected composite must align with the true
        # environment (gauge-aligned PSNR like the pinhole test above)
        pano = pr["projections"]["spherical"]
        cover = pr["coverage_by_mode"]["spherical"]
        canvas = pr["canvas"]["spherical"]
        R_est = pr["R_render"]
        M = sum(R_est[i].T @ np.asarray(Rs[i]) for i in range(n))
        U, _, Vt = np.linalg.svd(M)
        G = U @ Vt
        if np.linalg.det(G) < 0:
            U[:, -1] *= -1
            G = U @ Vt
        ys, xs = np.nonzero(cover)
        sub = np.random.default_rng(0).choice(len(ys), min(60000, len(ys)),
                                              replace=False)
        ys, xs = ys[sub], xs[sub]
        u = canvas["x0"] + xs / canvas["f_pan"]
        v = canvas["y0"] + ys / canvas["f_pan"]
        d = np.stack([np.cos(v) * np.sin(u), np.sin(v),
                      np.cos(v) * np.cos(u)], -1)
        gt = synthdata.env_lookup(env, d @ G, interp="bicubic")
        err = pano[ys, xs].astype(np.float64) / 255.0 - gt
        p = 10 * np.log10(1.0 / max(np.mean(err**2), 1e-12))
        # distorted inputs lose the rim to the distortion resample; the
        # correction must still land within a few dB of the pinhole gate
        assert p > 33.0, f"distortion-corrected PSNR {p:.1f} dB"


class TestDegenerateInputs:
    def test_all_unrelated_images(self):
        """A set with NO related pairs: zero panoramas, no crash (the
        P=0 RANSAC path and empty-component discovery)."""
        views = [synthdata.texture(50 + k, 240, 320) for k in range(3)]
        iset = make_set(views)
        res = pipeline.stitch(iset, small_cfg())
        assert len(res.panoramas) == 0
        assert not res.graph.accepted.any() if len(res.graph.accepted) else True
        assert len(np.unique(res.components)) == 3

    def test_single_image(self):
        """One image: nothing to match, empty result, no crash."""
        iset = make_set([synthdata.texture(60, 240, 320)])
        res = pipeline.stitch(iset, small_cfg())
        assert len(res.panoramas) == 0
        assert res.graph.pairs.shape[0] == 0


class TestMultiRowRig:
    def test_two_row_sphere_rig(self):
        """A 2-row x 8 capture rig (the '360x180' capture style): BA must
        solve the 2-D match graph and the renderer must cover both rows
        without contributor starvation at the row boundary."""
        env = synthdata.smooth_texture(9, 512, 1280)
        f_true = 200.0
        views, Rs = [], []
        for r, pitch in enumerate((-0.26, 0.26)):
            for i in range(8):
                yaw = (i + 0.5 * r) * 2 * np.pi / 8
                R = (synthdata.rot_x(pitch) @ synthdata.rot_y(yaw)).T
                views.append(synthdata.render_pinhole_from_equirect(
                    env, R, f_true, 256, 192, "bicubic"))
                Rs.append(R)
        iset = make_set([v.astype(np.float32) for v in views])
        cfg = small_cfg(planar=False).replace(
            render=RenderConfig(projections=("spherical",),
                                interpolation="bicubic"),
            blend=BlendConfig(mode="multiband"),
            straighten=StraightenConfig(enabled=False),
        )
        res = pipeline.stitch(iset, cfg)
        assert len(res.panoramas) == 1
        pr = res.panoramas[0]
        f_est = np.asarray(pr["ba"]["cameras"].f)
        assert np.all(np.abs(f_est - f_true) / f_true < 0.03), f_est
        cover = pr["coverage_by_mode"]["spherical"]
        # both rows covered: the canvas (with margins and tilted-view
        # corners) is ~0.65 coverable for this geometry; demand most of
        # that (contributor starvation at the row boundary once left
        # lens-shaped holes here)
        assert float(np.mean(cover)) > 0.6, float(np.mean(cover))
        rowcov = np.asarray(cover).mean(axis=1)
        mid = rowcov[len(rowcov) // 3 : 2 * len(rowcov) // 3]
        assert float(mid.min()) > 0.5  # no dead band at the row boundary


class TestPairwiseRescue:
    """The pooled global ratio test starves sets with repeated structure /
    near-duplicate views (the 2nd NN is the SAME point seen in a third
    image, so the ratio ~1 kills true matches). `pairwise_rescue`
    re-matches per-pair when discovery fragments and keeps whichever graph
    connects more images — measured on the reference's Shanghai set:
    16 pairs / 10 fragments -> 87 pairs / ONE 30-view panorama."""

    def _near_duplicates(self):
        # 7 crops shifted 6 px apart: nearly every scene point appears in
        # 3+ views, so the pooled 2nd NN is the same point elsewhere and
        # the global ratio test starves the graph. (The round-3 rescue
        # union made the previous 12 px/5-view set connect globally; this
        # tighter set still fragments without the rescue — re-verified
        # whenever this test's premise assertion below runs.)
        env = synthdata.texture(8, 500, 700)
        boxes = [(i * 6, 0, 480, 420) for i in range(7)]
        return make_set(synthdata.planar_crops(env, boxes))

    def test_rescue_consolidates_near_duplicates(self):
        iset = self._near_duplicates()
        cfg = small_cfg()
        cfg_no = cfg.replace(
            matching=dataclasses.replace(cfg.matching, pairwise_rescue=False)
        )
        res_no = pipeline.stitch(iset, cfg_no)
        # premise: the global matcher fragments this set (if this ever
        # starts passing, tighten _near_duplicates until it fragments)
        assert len(res_no.panoramas) >= 2 or (
            res_no.panoramas
            and len(res_no.panoramas[0]["members"]) < iset.n
        )
        res = pipeline.stitch(iset, cfg)  # rescue on by default
        assert len(res.panoramas) == 1
        assert len(res.panoramas[0]["members"]) == iset.n

    def test_vote_bounded_rescue_above_max_images(self):
        """Above pairwise_rescue_max_images the rescue re-matches only the
        top kNN-vote candidate pairs (O(N*m)) instead of giving up — same
        consolidation as the full-pairwise rescue on this set."""
        iset = self._near_duplicates()
        cfg = small_cfg()
        cfg = cfg.replace(
            matching=dataclasses.replace(
                cfg.matching, pairwise_rescue_max_images=2,  # n=5 > 2
                pairwise_rescue_m=3,
            )
        )
        res = pipeline.stitch(iset, cfg)
        assert len(res.panoramas) == 1
        assert len(res.panoramas[0]["members"]) == iset.n

    def test_suspicious_predicate_cross_component_votes(self):
        """`_rescue_suspicious` must fire on solid (>=3-member) fragments
        whose raw kNN votes stay strong ACROSS the split (a connected ring
        cut apart by ratio starvation), and stay quiet when the split is
        clean (cross votes at the noise floor)."""
        comps = np.array([0, 0, 0, 1, 1, 1])
        pairs = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
        accepted = np.array([True, True, True, True])
        graph = types.SimpleNamespace(pairs=pairs, accepted=accepted)
        votes = np.zeros((6, 6), np.int32)
        for i, j in pairs:
            votes[i, j] = votes[j, i] = 40
        # clean split: cross-component votes at noise floor -> quiet
        votes_clean = votes.copy()
        votes_clean[2, 3] = votes_clean[3, 2] = 3
        assert not pipeline._rescue_suspicious(comps, votes_clean, graph)
        # starved split: cross votes rival accepted-pair votes -> fires
        votes_starved = votes.copy()
        votes_starved[2, 3] = votes_starved[3, 2] = 25
        assert pipeline._rescue_suspicious(comps, votes_starved, graph)
        # no votes available (cached graph): quiet on solid fragments
        assert not pipeline._rescue_suspicious(comps, None, graph)
        # weak shard still fires regardless of votes
        comps_shard = np.array([0, 0, 0, 0, 0, 1])
        assert pipeline._rescue_suspicious(comps_shard, None, graph)
        # single component: never suspicious
        assert not pipeline._rescue_suspicious(np.zeros(6, int), votes_starved,
                                               graph)

    def test_rescue_low_texture_exposure_chain(self):
        """Regression (sweep scene 7): a LOW-TEXTURE yaw chain under
        strong per-view exposure steps yields only ~60 keypoints/view,
        so boundary pairs produce ~10 matches at the pooled ratio — all
        true inliers, yet below the `ni > 8 + 0.3 nf` floor. The rescue's
        per-pair re-match at Lowe's 0.8 ratio plus the graph UNION
        (rescued edges + originally-accepted edges) must reconnect the
        chain into one panorama."""
        from autopanostitch_tpu.utils import perturb

        env = synthdata.smooth_texture(54, 512, 1536, cutoff=0.054)
        f_true, n = 380.0, 8
        step = np.radians(23.0)
        rng = np.random.default_rng(9)
        views = []
        for i in range(n):
            R = synthdata.rot_y(i * step).T
            v = np.asarray(synthdata.render_pinhole_from_equirect(
                env, R, f_true, 320, 256, "bicubic"), np.float32)
            views.append(perturb.exposure_jitter(
                v, float(rng.uniform(-1.0, 1.0))))
        iset = make_set(views)
        cfg = small_cfg(planar=False).replace(
            straighten=StraightenConfig(enabled=False),
        )
        res = pipeline.stitch(iset, cfg)
        assert len(res.panoramas) == 1, [
            len(p["members"]) for p in res.panoramas
        ]
        assert len(res.panoramas[0]["members"]) == n

    def test_rescue_keeps_correct_multi_panorama_split(self):
        """Two genuinely unrelated groups: the rescue fires (discovery is
        'fragmented') but must NOT merge them or change the result."""
        env_a = synthdata.texture(2, 420, 800)
        env_b = synthdata.texture(3, 420, 800)
        va = synthdata.planar_crops(env_a, [(0, 0, 420, 380), (280, 20, 420, 380)])
        vb = synthdata.planar_crops(env_b, [(10, 10, 420, 380), (300, 0, 420, 380)])
        iset = make_set([va[0], vb[0], va[1], vb[1]])
        res = pipeline.stitch(iset, small_cfg())
        members = sorted(tuple(sorted(p["members"].tolist())) for p in res.panoramas)
        assert members == [(0, 2), (1, 3)]


def test_planar_subsample_multi_component_global_indices():
    """Planar H-BA subsampling uses GLOBAL image indices against the
    full-set sizes array (regression: it indexed the member-local sizes
    slice with a global index, crashing whenever a planar component's
    members did not start at image 0)."""
    env_a = synthdata.texture(21, 420, 800)
    env_b = synthdata.texture(22, 430, 820)
    va = synthdata.planar_crops(env_a, [(0, 0, 420, 380), (280, 20, 420, 380)])
    vb = synthdata.planar_crops(env_b, [(0, 0, 420, 380), (300, 10, 420, 380)])
    iset = make_set([va[0], va[1], vb[0], vb[1]])  # planar comp at [2, 3]
    cfg = small_cfg()
    cfg = cfg.replace(
        straighten=dataclasses.replace(cfg.straighten, force_planar_scan=True),
        # tiny cap so the over-cap stratified subsampling actually fires
        bundle=dataclasses.replace(cfg.bundle, max_matches=24,
                                   subsample_mode="grid"),
    )
    res = pipeline.stitch(iset, cfg)
    members = sorted(tuple(sorted(p["members"].tolist())) for p in res.panoramas)
    assert members == [(0, 1), (2, 3)]
