import jax.numpy as jnp
import numpy as np
import pytest

from autopanostitch_tpu.ops import geometry as geo
from autopanostitch_tpu.ops import projections as proj


def random_rotation(seed):
    r = np.random.default_rng(seed)
    return np.array(geo.so3_exp(jnp.array(r.normal(size=3) * 0.5, jnp.float32)))


@pytest.mark.parametrize("mode", proj.PROJECTIONS)
def test_pano_ray_roundtrip(mode):
    """pixel -> ray -> surface coord must invert exactly."""
    R_ref = jnp.array(random_rotation(42), jnp.float32)
    f_pan = 500.0
    x0, y0 = -0.8, -0.5
    xp, yp = jnp.meshgrid(jnp.arange(0, 200, 17.0), jnp.arange(0, 150, 13.0))
    d = proj.pano_to_ray(mode, xp, yp, f_pan, x0, y0, R_ref)
    # unit norm
    np.testing.assert_allclose(np.array(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-5)
    u, v, valid = proj.ray_to_pano(mode, d, R_ref)
    xp2 = (np.array(u) - x0) * f_pan
    yp2 = (np.array(v) - y0) * f_pan
    m = np.array(valid)
    assert m.all()
    np.testing.assert_allclose(xp2[m], np.array(xp)[m], atol=0.01)
    np.testing.assert_allclose(yp2[m], np.array(yp)[m], atol=0.01)


def test_spherical_equals_equirectangular():
    xp, yp = jnp.meshgrid(jnp.arange(10.0), jnp.arange(8.0))
    d1 = proj.pano_to_ray("spherical", xp, yp, 300.0, -1.0, -0.5)
    d2 = proj.pano_to_ray("equirectangular", xp, yp, 300.0, -1.0, -0.5)
    np.testing.assert_allclose(np.array(d1), np.array(d2))


def test_camera_projection_roundtrip():
    """image pixel -> world ray -> back to image pixel."""
    K = geo.build_K(480.0, 320.0, 240.0)
    R = jnp.array(random_rotation(7), jnp.float32)
    xp, yp = jnp.meshgrid(jnp.arange(0, 640, 37.0), jnp.arange(0, 480, 31.0))
    d = proj.camera_pixel_rays(geo.invert_K(K), R, xp, yp)
    d = proj.normalize_rays(d)
    u, v, front, cosang = proj.project_ray_to_camera(d, R, K)
    assert bool(front.all())
    assert float(jnp.min(cosang)) > 0.0
    np.testing.assert_allclose(np.array(u), np.array(xp), atol=0.05)
    np.testing.assert_allclose(np.array(v), np.array(yp), atol=0.05)


def test_forward_facing_identity_camera_center():
    """The principal axis of an identity camera maps to theta=0, phi=0."""
    d = jnp.array([[0.0, 0.0, 1.0]])
    u, v, valid = proj.ray_to_pano("spherical", d)
    assert float(u[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(v[0]) == pytest.approx(0.0, abs=1e-6)
    u, v, valid = proj.ray_to_pano("cylindrical", d)
    assert float(u[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(v[0]) == pytest.approx(0.0, abs=1e-6)


def test_backfacing_rays_masked():
    R = jnp.eye(3)
    K = geo.build_K(480.0, 320.0, 240.0)
    d = jnp.array([[0.0, 0.0, -1.0]])
    _, _, front, cosang = proj.project_ray_to_camera(d, R, K)
    assert not bool(front[0])
    assert float(cosang[0]) == 0.0


def test_distortion_pixel_maps_roundtrip_and_forward_parity():
    """distort_pixels inverts undistort_pixels to sub-1e-3 px, and the
    forward (distorted -> pinhole) map matches the convention of
    `utils.perturb.radial_distort`: sampling the distorted image at
    distort_pixels(q) returns the pinhole image's content at q."""
    from autopanostitch_tpu.utils import perturb

    cx, cy = 159.5, 127.5
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.uniform(0, 319, 4000))
    v = jnp.asarray(rng.uniform(0, 255, 4000))
    for k1 in (-0.08, -0.02, 0.04):
        ud, vd = proj.distort_pixels(u, v, k1, cx, cy)
        ur, vr = proj.undistort_pixels(ud, vd, k1, cx, cy)
        err = np.hypot(np.asarray(ur - u), np.asarray(vr - v)).max()
        assert err < 1e-3, (k1, err)

    # forward parity against radial_distort on a smooth gradient image
    ys, xs = np.mgrid[0:256, 0:320].astype(np.float64)
    img = np.stack([xs / 319.0, ys / 255.0, (xs + ys) / 574.0], -1).astype(
        np.float32
    )
    k1 = -0.05
    dimg = perturb.radial_distort(img, k1)
    # sample the distorted image at distort_pixels of interior pinhole pts
    qx = jnp.asarray(rng.uniform(60, 260, 500))
    qy = jnp.asarray(rng.uniform(50, 200, 500))
    px, py = proj.distort_pixels(qx, qy, k1, cx, cy)
    from autopanostitch_tpu.ops import sampling as samp

    got, okm = samp.sample_bilinear(jnp.asarray(dimg), px, py)
    want, _ = samp.sample_bilinear(jnp.asarray(img), qx, qy)
    assert bool(np.asarray(okm).all())
    diff = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert diff < 0.01, diff


def test_distort_pixels_no_folding_far_outside():
    """A pinhole projection far outside the frame (a camera ~90 deg
    off-axis projects at |u| ~ f/eps) must STAY far outside after the
    pinhole -> distorted map: the fixed-point inversion has no preimage
    there and used to oscillate and fold such points back inside the
    bounds, so the sampler fused garbage content from cameras that cannot
    see the pixel (robustness-sweep ghost p99 >400 px on <1% of pixels
    while p90 stayed sub-pixel)."""
    cx, cy = 159.5, 127.5
    rng = np.random.default_rng(7)
    mag = rng.uniform(2e3, 4e5, 200)
    ang = rng.uniform(0, 2 * np.pi, 200)
    u = jnp.asarray(cx + mag * np.cos(ang))
    v = jnp.asarray(cy + mag * np.sin(ang))
    for k1 in (-0.06, -0.008, 0.0, 0.008, 0.06):
        ud, vd = proj.distort_pixels(u, v, k1, cx, cy)
        r = np.hypot(np.asarray(ud) - cx, np.asarray(vd) - cy)
        # half-diagonal is ~204 px; everything must stay well outside
        assert r.min() > 3.0 * np.hypot(cx, cy), (k1, r.min())
