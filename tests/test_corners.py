import jax.numpy as jnp
import numpy as np
import pytest

import synthdata
from autopanostitch_tpu.config import DetectorConfig
from autopanostitch_tpu.ops import corners, matching as mt

CFG = DetectorConfig(max_keypoints=256)


def checkerboard(size=128, sq=16):
    y, x = np.mgrid[0:size, 0:size]
    return (((x // sq) + (y // sq)) % 2).astype(np.float32)


class TestHarris:
    def test_detects_checkerboard_corners(self):
        img = jnp.asarray(checkerboard())
        resp = corners.harris_response(img)
        f = corners.extract_corners(img, CFG, "harris")
        assert int(f.mask.sum()) > 20
        xy = np.asarray(f.xy)[np.asarray(f.mask)]
        # detected corners should be near multiples of 16
        d = np.abs(((xy + 8) % 16) - 8)
        assert np.median(d) < 2.5

    def test_flat_image_no_corners(self):
        f = corners.extract_corners(jnp.zeros((64, 64)), CFG, "harris")
        assert int(f.mask.sum()) == 0


class TestFAST:
    def test_detects_corners(self):
        # checkerboard X-corners have max run 8 < 9, so FAST correctly
        # ignores them; blocky value-noise has L-corners FAST fires on
        img = jnp.asarray(synthdata.texture(3, 128, 128).mean(-1))
        f = corners.extract_corners(img, CFG, "fast")
        assert int(f.mask.sum()) > 10

    def test_flat_no_response(self):
        s = corners.fast_score(jnp.full((64, 64), 0.5))
        assert float(jnp.max(s)) == 0.0


class TestBinaryDescriptors:
    def test_descriptor_is_binary(self):
        img = jnp.asarray(synthdata.texture(0, 128, 128).mean(-1))
        f = corners.extract_corners(img, CFG, "orb")
        d = np.asarray(f.desc)[np.asarray(f.mask)]
        assert set(np.unique(d)).issubset({0.0, 1.0})
        assert d.shape[1] == 256

    def test_matching_under_translation(self):
        """Binary features of a translated image must match via the
        standard SSD matcher (Hamming == L2^2 on {0,1})."""
        img = synthdata.texture(1, 160, 200).mean(-1).astype(np.float32)
        sh = 30
        img2 = np.roll(img, sh, axis=1)
        f1 = corners.extract_corners(jnp.asarray(img), CFG, "orb")
        f2 = corners.extract_corners(jnp.asarray(img2), CFG, "orb")
        idx, m, n = mt.match_pair(f1.desc, f1.mask, f2.desc, f2.mask, ratio=0.8, max_matches=256)
        assert int(n) >= 15
        idx = np.asarray(idx)[np.asarray(m)]
        p1 = np.asarray(f1.xy)[idx[:, 0]]
        p2 = np.asarray(f2.xy)[idx[:, 1]]
        dx = (p2[:, 0] - p1[:, 0] - sh + 100) % 200 - 100
        assert (np.abs(dx) < 2.5).mean() > 0.6


class TestPipelineDispatch:
    def test_extract_features_binary_detector(self):
        from autopanostitch_tpu.models import features as fstage

        imgs = np.stack([synthdata.texture(s, 96, 96) for s in range(2)]).astype(np.float32)
        sizes = np.array([[96, 96], [96, 96]], np.int32)
        cfg = DetectorConfig(detector="HARRIS", max_keypoints=128)
        f = fstage.extract_features(jnp.asarray(imgs), sizes, cfg)
        assert f.desc.shape == (2, 128, 256)
        assert int(f.mask.sum()) > 0
