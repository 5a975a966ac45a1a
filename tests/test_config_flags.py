"""Behavioral coverage of config fields that map 1:1 to `inputs.m` knobs.

Every flag here changes an observable output when flipped, proving the
config surface is wired, not decorative (see docs/CONFIG_PARITY.md).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import synthdata
from autopanostitch_tpu.config import (
    DetectorConfig,
    ImageMatchConfig,
    MatchingConfig,
    RenderConfig,
    StitchConfig,
)
from autopanostitch_tpu.models import features as features_stage
from autopanostitch_tpu.models import pipeline, render
from autopanostitch_tpu.ops import matching as mt
from autopanostitch_tpu.ops import ransac as rs


def _two_view_scene():
    env = synthdata.texture(3, 400, 700)
    boxes = [(0, 0, 420, 360), (260, 20, 420, 360)]
    views = synthdata.planar_crops(env, boxes)
    sizes = np.array([v.shape[:2] for v in views], np.int32)
    H, W = sizes[:, 0].max(), sizes[:, 1].max()
    stack = np.zeros((len(views), H, W, 3), np.float32)
    for k, v in enumerate(views):
        stack[k, : v.shape[0], : v.shape[1]] = v
    return stack, sizes


class TestRansacBudget:
    def test_num_trials_confidence_shrinks_budget(self):
        # lower confidence -> smaller hypothesis budget (inputs.m:72)
        hi = rs.num_trials(99.9, "projective", max_iter=100000)
        lo = rs.num_trials(90.0, "projective", max_iter=100000)
        assert lo < hi
        # max_iter caps the budget (inputs.m:68)
        assert rs.num_trials(99.9, "projective", max_iter=128) == 128
        # easier models need fewer trials (w^s with smaller s)
        assert rs.num_trials(99.9, "translation", 100000) < hi

    def test_total_above_batch_still_fits(self):
        # budget > sub-batch exercises the running-best scan path
        rng = np.random.default_rng(0)
        src = rng.uniform(0, 300, (64, 2)).astype(np.float32)
        H = np.array([[1.0, 0.05, 8.0], [-0.03, 1.0, -5.0], [1e-4, 0, 1.0]])
        dsth = np.concatenate([src, np.ones((64, 1))], -1) @ H.T
        dst = (dsth[:, :2] / dsth[:, 2:]).astype(np.float32)
        dst[48:] += rng.uniform(40, 80, (16, 2))  # outliers
        res = rs.ransac_fit(
            jnp.asarray(src), jnp.asarray(dst), jnp.ones(64, bool),
            jnp.asarray(np.array([0, 1], np.uint32)),
            threshold=3.0, batch=64, total=256,
        )
        assert bool(res.success)
        assert int(res.num_inliers) >= 40


class TestAcceptanceDispatch:
    def test_per_model_constants(self):
        for model, (a, b) in pipeline._ACCEPT_CONSTANTS.items():
            im = ImageMatchConfig(transformation_type=model)
            assert pipeline._acceptance(im) == (a, b)
        # explicit values override the dispatch
        im = ImageMatchConfig(transformation_type="affine", accept_alpha=2.0)
        assert pipeline._acceptance(im) == (2.0, 0.15)


class TestMatchingMethod:
    def test_approximate_matches_exhaustive_on_easy_data(self):
        rng = np.random.default_rng(1)
        # well-separated cluster pairs across two images
        base = rng.normal(0, 1, (64, 128)).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        d0 = base
        d1 = base + rng.normal(0, 0.02, base.shape).astype(np.float32)
        desc = jnp.asarray(np.concatenate([d0, d1]))
        mask = jnp.ones(128, bool)
        image_id = jnp.asarray(np.repeat([0, 1], 64).astype(np.int32))
        iex, dex = mt.global_knn(desc, mask, image_id, k=2, block=64)
        iap, dap = mt.global_knn(
            desc, mask, image_id, k=2, block=64, method="approximate"
        )
        agree = np.mean(np.asarray(iex[:, 0]) == np.asarray(iap[:, 0]))
        assert agree > 0.9  # JL sketch keeps true NNs with high probability
        np.testing.assert_allclose(
            np.asarray(dap[:, 0])[np.asarray(iex[:, 0]) == np.asarray(iap[:, 0])],
            np.asarray(dex[:, 0])[np.asarray(iex[:, 0]) == np.asarray(iap[:, 0])],
            rtol=1e-4, atol=1e-5,
        )

    def test_bf16_compute_dtype(self):
        stack, sizes = _two_view_scene()
        cfg = StitchConfig(
            detector=DetectorConfig(max_keypoints=256, num_octaves=3),
            matching=MatchingConfig(max_matches_per_pair=128),
        )
        cfg_bf16 = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="bfloat16"))
        feats = features_stage.extract_features(jnp.asarray(stack), sizes, cfg.detector)
        p32 = pipeline.match_features(feats, cfg)
        pbf = pipeline.match_features(feats, cfg_bf16)
        # bf16 matmuls keep nearly all matches of the f32 path
        assert pbf[3].sum() > 0.8 * p32[3].sum()


class TestDetectorFlags:
    def test_descriptor_geometry(self):
        stack, sizes = _two_view_scene()
        cfg = DetectorConfig(max_keypoints=128, num_octaves=2,
                             descriptor_width=2, descriptor_bins=4)
        feats = features_stage.extract_features(jnp.asarray(stack), sizes, cfg)
        assert feats.desc.shape[-1] == 2 * 2 * 4

    def test_upsample_input_finds_more_keypoints(self):
        env = synthdata.texture(5, 160, 200)
        stack = env[None]
        sizes = np.array([[160, 200]], np.int32)
        base = DetectorConfig(max_keypoints=1024, num_octaves=3, upsample_input=False)
        up = DetectorConfig(max_keypoints=1024, num_octaves=3, upsample_input=True)
        f0 = features_stage.extract_features(jnp.asarray(stack), sizes, base)
        f1 = features_stage.extract_features(jnp.asarray(stack), sizes, up)
        n0 = int(np.asarray(f0.mask).sum())
        n1 = int(np.asarray(f1.mask).sum())
        assert n1 > n0  # octave -1 resolves finer scales
        # coordinates are mapped back to input pixels
        xy = np.asarray(f1.xy)[np.asarray(f1.mask)]
        assert xy[:, 0].max() <= 200 and xy[:, 1].max() <= 160

    def test_upsample_levels_auto(self):
        # auto mode: one level under upsample_below, two under
        # upsample_second_below (the thumbnail regime)
        auto = DetectorConfig()  # upsample_below=300, second_below=100
        assert features_stage.upsample_levels(auto, [[800, 600]]) == 0
        assert features_stage.upsample_levels(auto, [[200, 160]]) == 1
        assert features_stage.upsample_levels(auto, [[128, 96]]) == 1
        assert features_stage.upsample_levels(auto, [[78, 79]]) == 2
        # explicit tri-state still maps to 0/1 levels
        on = DetectorConfig(upsample_input=True)
        off = DetectorConfig(upsample_input=False)
        assert features_stage.upsample_levels(on, [[78, 79]]) == 1
        assert features_stage.upsample_levels(off, [[78, 79]]) == 0

    def test_two_level_upsample_outdetects_one_on_thumbnails(self):
        # ~80 px thumbnail regime (the reference Rio sheet): octave -2
        # resolves structure one level cannot (measured on real data:
        # 41/56 -> 52/56 images connected; see models/features.py).
        # Like real thumbnails, the input is a downsampled photo — a
        # native-80px noise texture has no sub-pixel detail to recover.
        hi = synthdata.texture(9, 320, 320)
        env = hi.reshape(80, 4, 80, 4, 3).mean(axis=(1, 3)).astype(np.float32)
        stack = env[None]
        sizes = np.array([[80, 80]], np.int32)
        one = DetectorConfig(max_keypoints=1024, num_octaves=3, upsample_input=True)
        two = DetectorConfig(max_keypoints=1024, num_octaves=3)  # auto -> 2
        assert features_stage.upsample_levels(two, sizes) == 2
        f1 = features_stage.extract_features(jnp.asarray(stack), sizes, one)
        f2 = features_stage.extract_features(jnp.asarray(stack), sizes, two)
        n1 = int(np.asarray(f1.mask).sum())
        n2 = int(np.asarray(f2.mask).sum())
        assert n2 > n1
        xy = np.asarray(f2.xy)[np.asarray(f2.mask)]
        assert xy.max() <= 80  # mapped back to input pixels


class TestRenderFlags:
    def _cams(self, n=4, f=300.0):
        R = np.stack([synthdata.rot_y(a) for a in np.linspace(0, 0.8, n)])
        K = np.tile(np.diag([f, f, 1.0]), (n, 1, 1))
        sizes = np.tile(np.array([240, 320], np.int32), (n, 1))
        return R.astype(np.float32), K.astype(np.float32), sizes

    def test_robust_pct_changes_planar_canvas(self):
        R, K, sizes = self._cams()
        tight = render.compute_canvas(R, K, sizes, "planar",
                                      RenderConfig(robust_pct=(20.0, 80.0)))
        wide = render.compute_canvas(R, K, sizes, "planar",
                                     RenderConfig(robust_pct=(0.0, 100.0)))
        assert tight["Hc"] * tight["Wc"] < wide["Hc"] * wide["Wc"]

    def test_equirect_fitted_bounds(self):
        # a ~46-degree panorama must not allocate the full 360x180 sphere
        R, K, sizes = self._cams()
        c = render.compute_canvas(R, K, sizes, "equirectangular", RenderConfig())
        full_w = 2 * np.pi * c["f_pan"]
        assert c["Wc"] < 0.5 * full_w

    def test_canvas_color_white(self):
        result = {
            "projections": {"planar": np.zeros((8, 8, 3), np.uint8)},
            "coverage_by_mode": {"planar": np.zeros((8, 8), bool)},
        }
        result["coverage_by_mode"]["planar"][2:6, 2:6] = True
        cfg = StitchConfig(render=RenderConfig(canvas_color="white",
                                               crop_border=False))
        pipeline._apply_crop(result, cfg)
        pano = result["projections"]["planar"]
        assert (pano[0, 0] == 255).all()
        assert (pano[3, 3] == 0).all()


class TestPostFlags:
    def test_show_crop_bounding_box(self):
        cover = np.zeros((32, 32), bool)
        cover[4:28, 2:30] = True
        result = {
            "projections": {"planar": np.full((32, 32, 3), 80, np.uint8)},
            "coverage_by_mode": {"planar": cover},
        }
        cfg = StitchConfig(
            post=StitchConfig().post.__class__(
                crop_panorama=True, show_crop_bounding_box=True
            )
        )
        pipeline._apply_crop(result, cfg)
        vis = result["projections_crop_bbox"]["planar"]
        assert (vis == np.array([255, 0, 0])).all(axis=-1).any()

    def test_cli_no_write(self, tmp_path):
        from autopanostitch_tpu import cli

        env = synthdata.texture(7, 300, 600)
        d = tmp_path / "set1"
        d.mkdir()
        from PIL import Image

        for k, (x0, y0, w, h) in enumerate([(0, 0, 360, 280), (200, 10, 360, 280)]):
            Image.fromarray(
                (env[y0 : y0 + h, x0 : x0 + w] * 255).astype(np.uint8)
            ).save(d / f"im{k}.png")
        out = tmp_path / "out"
        rc = cli.main([str(d), "--out", str(out), "--no-write",
                       "--force-planar", "--size-limit", "400"])
        assert rc == 0
        pngs = list(out.glob("*.png")) if out.exists() else []
        assert pngs == []  # imageWrite=false wrote nothing


class TestCropFallback:
    def test_color_threshold_coverage_fallback(self):
        """External panoramas (no renderer coverage) crop via the
        black/white-range color threshold (inputs.m:116-118)."""
        pano = np.zeros((20, 30, 3), np.uint8)
        pano[5:15, 8:25] = 120
        result = {"projections": {"planar": pano}}
        cfg = StitchConfig(
            post=StitchConfig().post.__class__(black_range=10),
        )
        pipeline._apply_crop(result, cfg)
        out = result["projections_cropped"]["planar"]
        assert out.shape == (10, 17, 3)
        # raising black_range above the content kills the mask -> no crop
        result2 = {"projections": {"planar": pano.copy()}}
        cfg2 = StitchConfig(post=StitchConfig().post.__class__(black_range=200))
        pipeline._apply_crop(result2, cfg2)
        assert result2["projections_cropped"]["planar"].shape == pano.shape
