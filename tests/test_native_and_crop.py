import numpy as np
import pytest

from autopanostitch_tpu.models import crop


class TestMaxRectangle:
    def test_full_mask(self):
        m = np.ones((10, 20), bool)
        r = crop.largest_inscribed_rect(m)
        assert r == (0, 10, 0, 20)

    def test_l_shape(self):
        m = np.zeros((10, 10), bool)
        m[:10, :4] = True
        m[:4, :10] = True
        r0, r1, c0, c1 = crop.largest_inscribed_rect(m)
        area = (r1 - r0) * (c1 - c0)
        assert area == 40
        assert m[r0:r1, c0:c1].all()

    def test_empty(self):
        assert crop.largest_inscribed_rect(np.zeros((5, 5), bool)) is None

    def test_python_matches_native(self):
        rng = np.random.default_rng(0)
        m = rng.uniform(size=(60, 80)) > 0.3
        # python fallback
        H, W = m.shape
        heights = np.zeros(W, np.int64)
        best = (0, 0, 0, 0, 0)
        for r in range(H):
            heights = np.where(m[r], heights + 1, 0)
            area, left, right, h = crop._max_rect_histogram(heights)
            if area > best[0]:
                best = (area, r + 1, left, right, h)
        try:
            from autopanostitch_tpu import native

            rect = native.max_rectangle(m)
        except Exception:
            pytest.skip("native build unavailable")
        area_native = (rect[1] - rect[0]) * (rect[3] - rect[2])
        assert area_native == best[0]
        assert m[rect[0] : rect[1], rect[2] : rect[3]].all()


class TestCropBBox:
    def test_bbox(self):
        pano = np.zeros((10, 10, 3), np.float32)
        mask = np.zeros((10, 10), bool)
        mask[2:7, 3:9] = True
        pano[mask] = 1.0
        cropped, (r0, r1, c0, c1) = crop.crop_bbox(pano, mask)
        assert cropped.shape == (5, 6, 3)
        assert (r0, r1, c0, c1) == (2, 7, 3, 9)

    def test_mask_from_color(self):
        pano = np.zeros((4, 4, 3), np.float32)
        pano[1, 1] = 0.5
        m = crop.mask_from_color(pano, "black")
        assert m[1, 1] and m.sum() == 1


class TestNativeHamming:
    def test_matches_numpy_popcount(self):
        try:
            from autopanostitch_tpu import native
        except Exception:
            pytest.skip("native unavailable")
        rng = np.random.default_rng(1)
        A = rng.integers(0, 256, size=(50, 32), dtype=np.uint8)
        B = rng.integers(0, 256, size=(80, 32), dtype=np.uint8)
        try:
            idx, d1, d2 = native.hamming_2nn(A, B)
        except Exception:
            pytest.skip("native build unavailable")
        # numpy reference
        bits = np.unpackbits(A[:, None, :] ^ B[None, :, :], axis=-1).sum(-1)
        np.testing.assert_array_equal(idx, bits.argmin(1))
        np.testing.assert_array_equal(d1, bits.min(1))
        part = np.partition(bits, 1, axis=1)
        np.testing.assert_array_equal(d2, part[:, 1])


class TestTPUHamming:
    def test_two_nn_matches_numpy(self):
        import jax.numpy as jnp

        from autopanostitch_tpu.ops import hamming as ham

        rng = np.random.default_rng(2)
        A = rng.integers(0, 256, size=(40, 32), dtype=np.uint8)
        B = rng.integers(0, 256, size=(60, 32), dtype=np.uint8)
        mask_a = jnp.ones(40, bool)
        mask_b = jnp.ones(60, bool)
        idx, d1, d2 = ham.hamming_two_nn(jnp.asarray(A), mask_a, jnp.asarray(B), mask_b)
        bits = np.unpackbits(A[:, None, :] ^ B[None, :, :], axis=-1).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx), bits.argmin(1))
        np.testing.assert_array_equal(np.asarray(d1).astype(int), bits.min(1))

    def test_pack_unpack_roundtrip(self):
        import jax.numpy as jnp

        from autopanostitch_tpu.ops import hamming as ham

        rng = np.random.default_rng(3)
        bits = (rng.uniform(size=(10, 256)) > 0.5).astype(np.float32)
        packed = ham.pack_bits(jnp.asarray(bits))
        unpacked = ham.unpack_bits(packed)
        np.testing.assert_array_equal(np.asarray(unpacked), bits)

    def test_match_pair_hamming_identity(self):
        import jax.numpy as jnp

        from autopanostitch_tpu.ops import hamming as ham

        rng = np.random.default_rng(4)
        A = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
        perm = rng.permutation(32)
        B = A[perm]
        mask = jnp.ones(32, bool)
        idx, m, n = ham.match_pair_hamming(
            jnp.asarray(A), mask, jnp.asarray(B), mask, ratio=0.9, max_matches=32
        )
        assert int(n) >= 28  # collisions possible but rare
        idx = np.asarray(idx)[np.asarray(m)]
        assert (perm[idx[:, 1]] == perm[idx[:, 1]]).all()
        for ia, ib in idx:
            assert (A[ia] == B[ib]).all()


class TestMaskFromColorHoles:
    def test_interior_holes_filled(self):
        # panoramaCropper.m:85 imfill: a shadow pixel inside the panorama
        # must not punch a hole that shrinks the inscribed rectangle
        pano = np.full((20, 30, 3), 0.5, np.float32)
        pano[:, :5] = 0.0   # uncovered canvas strip (border-connected)
        pano[8:12, 15:18] = 0.0  # interior black shadow
        m = crop.mask_from_color(pano, "black")
        assert m[10, 16]           # hole filled
        assert not m[:, :4].any()  # border canvas stays invalid

    def test_fill_holes_disabled(self):
        pano = np.full((10, 10, 3), 0.5, np.float32)
        pano[5, 5] = 0.0
        m = crop.mask_from_color(pano, "black", fill_holes=False)
        assert not m[5, 5]

    def test_white_canvas_holes(self):
        pano = np.zeros((12, 12, 3), np.uint8)
        pano[:] = 128
        pano[0:2] = 255          # white canvas row (border)
        pano[6, 6] = 255          # saturated interior highlight
        m = crop.mask_from_color(pano, "white", white_range=250)
        assert m[6, 6]
        assert not m[0].any()
