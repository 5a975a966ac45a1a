import jax.numpy as jnp
import numpy as np
import pytest

from autopanostitch_tpu.config import DetectorConfig
from autopanostitch_tpu.ops import matching as mt
from autopanostitch_tpu.ops import sift

CFG = DetectorConfig(max_keypoints=256, num_octaves=3)


def make_test_image(seed=0, size=256):
    """Random smooth blobby texture with strong corners (deterministic)."""
    r = np.random.default_rng(seed)
    img = r.uniform(size=(size // 8, size // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))  # blocky -> corners
    # add a few bright discs at known positions
    y, x = np.mgrid[0:size, 0:size]
    for cx, cy, rad in [(64, 64, 6), (192, 80, 9), (128, 192, 12)]:
        img += 0.8 * np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * (rad / 2) ** 2))
    img = (img - img.min()) / (img.max() - img.min())
    return img


@pytest.fixture(scope="module")
def feats():
    img = make_test_image()
    return img, sift.extract(jnp.array(img), CFG)


class TestDetection:
    def test_finds_keypoints(self, feats):
        img, f = feats
        assert int(f.mask.sum()) > 50

    def test_positions_in_bounds(self, feats):
        img, f = feats
        m = np.array(f.mask)
        xy = np.array(f.xy)[m]
        assert (xy >= 0).all()
        assert (xy[:, 0] <= img.shape[1] - 1).all()
        assert (xy[:, 1] <= img.shape[0] - 1).all()

    def test_descriptors_normalized_and_clipped(self, feats):
        _, f = feats
        m = np.array(f.mask)
        d = np.array(f.desc)[m]
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-3)
        assert d.min() >= 0.0
        # post-clip renormalization: typical entries stay small; only
        # degenerate few-bin descriptors can grow past the 0.2 clip
        assert np.median(d.max(axis=1)) <= 0.45
        assert d.max() <= 1.0 + 1e-5

    def test_masked_slots_zero(self):
        f = sift.extract(jnp.array(make_test_image(7, 128)), CFG)
        m = np.array(f.mask)
        if (~m).sum() == 0:
            pytest.skip("capacity saturated; no masked slots")
        assert np.abs(np.array(f.desc)[~m]).max() == 0.0

    def test_blank_image_no_keypoints(self):
        f = sift.extract(jnp.zeros((128, 128)), CFG)
        assert int(f.mask.sum()) == 0


class TestInvariance:
    def test_rotation_matching(self):
        """Extract on image and its 90-degree rotation; descriptors must match
        and matched positions must map by the rotation."""
        img = make_test_image(1)
        size = img.shape[0]
        img_rot = np.rot90(img).copy()  # (x,y) -> (y, size-1-x)
        f1 = sift.extract(jnp.array(img), CFG)
        f2 = sift.extract(jnp.array(img_rot), CFG)
        idx, m, n = mt.match_pair(f1.desc, f1.mask, f2.desc, f2.mask, ratio=0.7, max_matches=256)
        n = int(n)
        assert n >= 20, f"too few rotation matches: {n}"
        idx = np.array(idx)[np.array(m)]
        p1 = np.array(f1.xy)[idx[:, 0]]
        p2 = np.array(f2.xy)[idx[:, 1]]
        # ground-truth map for rot90 (counterclockwise): (x, y) -> (y, size-1-x)
        pred = np.stack([p1[:, 1], size - 1 - p1[:, 0]], axis=1)
        err = np.linalg.norm(pred - p2, axis=1)
        frac_good = (err < 3.0).mean()
        assert frac_good > 0.8, f"rotation inlier fraction {frac_good:.2f}"

    def test_translation_matching(self):
        img = make_test_image(2)
        sh = 40
        img2 = np.roll(img, (0, sh), axis=(0, 1))
        f1 = sift.extract(jnp.array(img), CFG)
        f2 = sift.extract(jnp.array(img2), CFG)
        idx, m, n = mt.match_pair(f1.desc, f1.mask, f2.desc, f2.mask, ratio=0.7, max_matches=256)
        assert int(n) >= 30
        idx = np.array(idx)[np.array(m)]
        p1 = np.array(f1.xy)[idx[:, 0]]
        p2 = np.array(f2.xy)[idx[:, 1]]
        dx = p2[:, 0] - p1[:, 0]
        # most matches should show the translation (mod wraparound region)
        frac = (np.abs(((dx - sh + size_half(img)) % img.shape[1]) - size_half(img)) < 2.0).mean()
        assert frac > 0.7

    def test_scale_relation(self):
        """Keypoint scales should roughly halve when the image is downsampled 2x."""
        img = make_test_image(3)
        f1 = sift.extract(jnp.array(img), CFG)
        img_small = img[::2, ::2]
        f2 = sift.extract(jnp.array(img_small), CFG)
        idx, m, n = mt.match_pair(f1.desc, f1.mask, f2.desc, f2.mask, ratio=0.75, max_matches=256)
        if int(n) < 10:
            pytest.skip("not enough cross-scale matches on synthetic texture")
        idx = np.array(idx)[np.array(m)]
        s1 = np.array(f1.scale)[idx[:, 0]]
        s2 = np.array(f2.scale)[idx[:, 1]]
        ratio = np.median(s1 / s2)
        assert 1.5 < ratio < 2.7, f"scale ratio {ratio}"


def size_half(img):
    return img.shape[1] // 2


class TestBatch:
    def test_extract_batch_shapes(self):
        imgs = jnp.stack([jnp.array(make_test_image(s, 128)) for s in range(2)])
        cfg = DetectorConfig(max_keypoints=128, num_octaves=2)
        f = sift.extract_batch(imgs, cfg)
        assert f.xy.shape == (2, 128, 2)
        assert f.desc.shape == (2, 128, 128)
        assert f.mask.shape == (2, 128)
        assert int(f.mask.sum()) > 0

    def test_rgb_to_gray(self):
        rgb = jnp.ones((4, 4, 3)) * jnp.array([1.0, 0.0, 0.0])
        g = sift.rgb_to_gray(rgb)
        np.testing.assert_allclose(np.array(g), 0.2989, atol=1e-6)


class TestPallasWindowGather:
    def test_interpret_matches_dynamic_slice(self):
        import numpy as np
        from autopanostitch_tpu.ops.pallas import window_gather as wg

        S, H, W, win = 5, 64, 128, 16
        rng = np.random.default_rng(3)
        src = jnp.asarray(rng.normal(size=(2, S, H, W)).astype(np.float32))
        K = 1024
        lev = jnp.asarray(rng.integers(0, S, K).astype(np.int32))
        ys = jnp.asarray(rng.integers(0, H - win, K).astype(np.int32))
        xs = jnp.asarray(rng.integers(0, W - win, K).astype(np.int32))
        y8, x128, rows, cols = wg.aligned_starts(ys, xs, win, H, W)
        out = wg.gather_windows(src, lev, y8, x128, rows, cols, interpret=True)
        y8n, x128n = np.asarray(y8), np.asarray(x128)
        for k in range(0, K, 173):
            ref = np.asarray(src)[:, int(lev[k]),
                                  y8n[k]:y8n[k] + rows, x128n[k]:x128n[k] + cols]
            np.testing.assert_allclose(np.asarray(out[k]), ref)
        # aligned windows still cover the requested win x win region
        assert (y8n <= np.asarray(ys)).all()
        assert (y8n + rows >= np.asarray(ys) + win).all()
        assert (x128n <= np.asarray(xs)).all()
        assert (x128n + cols >= np.asarray(xs) + win).all()
