import jax.numpy as jnp
import numpy as np
import pytest

from autopanostitch_tpu.ops import sampling as samp


def make_gradient(h=16, w=24, c=3):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([x, y, x + y], axis=-1)[..., :c]
    return jnp.array(img)


class TestBilinear:
    def test_exact_at_integer_coords(self):
        img = make_gradient()
        x = jnp.array([0.0, 5.0, 23.0])
        y = jnp.array([0.0, 7.0, 15.0])
        vals, valid = samp.sample_bilinear(img, x, y)
        assert bool(valid.all())
        np.testing.assert_allclose(np.array(vals[:, 0]), np.array(x), atol=1e-5)
        np.testing.assert_allclose(np.array(vals[:, 1]), np.array(y), atol=1e-5)

    def test_linear_interpolation_of_linear_image(self):
        img = make_gradient()
        x = jnp.array([2.5, 10.25])
        y = jnp.array([3.5, 8.75])
        vals, _ = samp.sample_bilinear(img, x, y)
        np.testing.assert_allclose(np.array(vals[:, 0]), np.array(x), atol=1e-5)
        np.testing.assert_allclose(np.array(vals[:, 1]), np.array(y), atol=1e-5)

    def test_out_of_bounds_masked_and_zero(self):
        img = make_gradient()
        x = jnp.array([-1.0, 30.0, 5.0])
        y = jnp.array([5.0, 5.0, -0.5])
        vals, valid = samp.sample_bilinear(img, x, y)
        assert not bool(valid.any())
        np.testing.assert_allclose(np.array(vals), 0.0)


class TestBicubic:
    def test_reproduces_linear_image(self):
        img = make_gradient(32, 32)
        x = jnp.array([5.3, 10.7, 20.1])
        y = jnp.array([6.9, 15.5, 25.25])
        vals, valid = samp.sample_bicubic(img, x, y)
        assert bool(valid.all())
        np.testing.assert_allclose(np.array(vals[:, 0]), np.array(x), atol=1e-3)
        np.testing.assert_allclose(np.array(vals[:, 1]), np.array(y), atol=1e-3)


class TestNearest:
    def test_rounds(self):
        img = make_gradient()
        vals, valid = samp.sample_nearest(img, jnp.array([4.4, 4.6]), jnp.array([2.4, 2.6]))
        np.testing.assert_allclose(np.array(vals[:, 0]), [4.0, 5.0])
        np.testing.assert_allclose(np.array(vals[:, 1]), [2.0, 3.0])


class TestWarp:
    def test_identity_warp(self):
        img = make_gradient(16, 16)
        warped, valid = samp.warp_homography(img, jnp.eye(3), 16, 16)
        np.testing.assert_allclose(np.array(warped), np.array(img), atol=1e-5)
        assert bool(valid.all())

    def test_translation_warp(self):
        img = make_gradient(16, 16)
        # canvas pixel (x,y) samples source (x+3, y+2)
        H = jnp.eye(3).at[0, 2].set(-3.0).at[1, 2].set(-2.0)  # forward: src -> src-3
        H_inv = jnp.linalg.inv(H)
        warped, valid = samp.warp_homography(img, H_inv, 16, 16)
        v = np.array(valid)
        assert v[:14, :13].all()
        np.testing.assert_allclose(np.array(warped)[0, 0], np.array(img)[2, 3], atol=1e-4)

    def test_offset_canvas(self):
        img = make_gradient(16, 16)
        warped, valid = samp.warp_homography(img, jnp.eye(3), 8, 8, x_offset=4.0, y_offset=6.0)
        np.testing.assert_allclose(np.array(warped)[0, 0], np.array(img)[6, 4], atol=1e-5)


class TestFeather:
    def test_shape_and_symmetry(self):
        w = samp.feather_weights(21, 31)
        assert w.shape == (21, 31)
        wn = np.array(w)
        assert wn.max() == pytest.approx(1.0, abs=1e-5)
        np.testing.assert_allclose(wn, wn[::-1, :], atol=1e-6)
        np.testing.assert_allclose(wn, wn[:, ::-1], atol=1e-6)
        assert float(w[10, 15]) == pytest.approx(1.0, abs=1e-6)
        assert wn.min() > 0.0


class TestOutputLimits:
    def test_identity(self):
        x0, x1, y0, y1 = samp.output_limits(jnp.eye(3), 10, 20)
        assert float(x0) == pytest.approx(0.0, abs=1e-4)
        assert float(x1) == pytest.approx(19.0, abs=1e-4)
        assert float(y1) == pytest.approx(9.0, abs=1e-4)

    def test_translation(self):
        H = jnp.eye(3).at[0, 2].set(100.0)
        x0, x1, y0, y1 = samp.output_limits(H, 10, 20)
        assert float(x0) == pytest.approx(100.0, abs=1e-3)
        assert float(x1) == pytest.approx(119.0, abs=1e-3)
