import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autopanostitch_tpu.ops import geometry as geo


def rng(seed=0):
    return np.random.default_rng(seed)


def random_homography(r, scale=0.3):
    H = np.eye(3) + scale * r.normal(size=(3, 3)) * np.array(
        [[0.1, 0.1, 10.0], [0.1, 0.1, 10.0], [1e-4, 1e-4, 0.0]]
    )
    return H / H[2, 2]


class TestHomographyApply:
    def test_identity(self):
        pts = jnp.array([[1.0, 2.0], [3.0, 4.0]])
        out = geo.homography_apply(jnp.eye(3), pts)
        np.testing.assert_allclose(out, pts, atol=1e-6)

    def test_translation(self):
        H = jnp.eye(3).at[0, 2].set(5.0).at[1, 2].set(-3.0)
        pts = jnp.array([[0.0, 0.0], [1.0, 1.0]])
        out = geo.homography_apply(H, pts)
        np.testing.assert_allclose(out, pts + jnp.array([5.0, -3.0]), atol=1e-6)

    def test_inverse_roundtrip(self):
        r = rng(1)
        H = jnp.array(random_homography(r), jnp.float32)
        pts = jnp.array(r.uniform(0, 100, size=(20, 2)), jnp.float32)
        out = geo.homography_apply(geo.homography_inverse(H), geo.homography_apply(H, pts))
        np.testing.assert_allclose(out, pts, atol=1e-2)


class TestDLT:
    def test_recovers_exact_homography(self):
        r = rng(2)
        H_true = random_homography(r, scale=0.2)
        src = r.uniform(0, 200, size=(30, 2))
        dst_h = (np.concatenate([src, np.ones((30, 1))], -1) @ H_true.T)
        dst = dst_h[:, :2] / dst_h[:, 2:3]
        w = jnp.ones(30)
        H_est = geo.fit_homography_dlt(jnp.array(src, jnp.float32), jnp.array(dst, jnp.float32), w)
        err = geo.transfer_error(H_est, jnp.array(src, jnp.float32), jnp.array(dst, jnp.float32))
        assert float(jnp.max(err)) < 0.1

    def test_minimal_four_points(self):
        r = rng(3)
        H_true = random_homography(r, scale=0.1)
        src = np.array([[0.0, 0.0], [100.0, 0.0], [100.0, 100.0], [0.0, 100.0]])
        dst_h = np.concatenate([src, np.ones((4, 1))], -1) @ H_true.T
        dst = dst_h[:, :2] / dst_h[:, 2:3]
        H_est = geo.fit_homography_dlt(
            jnp.array(src, jnp.float32), jnp.array(dst, jnp.float32), jnp.ones(4)
        )
        err = geo.transfer_error(H_est, jnp.array(src, jnp.float32), jnp.array(dst, jnp.float32))
        assert float(jnp.max(err)) < 0.2

    def test_masked_rows_ignored(self):
        r = rng(4)
        H_true = random_homography(r, scale=0.1)
        src = r.uniform(0, 200, size=(20, 2))
        dst_h = np.concatenate([src, np.ones((20, 1))], -1) @ H_true.T
        dst = dst_h[:, :2] / dst_h[:, 2:3]
        # corrupt last 8 rows but zero their weights
        dst_bad = dst.copy()
        dst_bad[12:] += r.normal(size=(8, 2)) * 50
        w = jnp.array([1.0] * 12 + [0.0] * 8)
        H_est = geo.fit_homography_dlt(
            jnp.array(src, jnp.float32), jnp.array(dst_bad, jnp.float32), w
        )
        err = geo.transfer_error(
            H_est, jnp.array(src[:12], jnp.float32), jnp.array(dst[:12], jnp.float32)
        )
        assert float(jnp.max(err)) < 0.1

    def test_vmappable(self):
        r = rng(5)
        B = 8
        srcs, dsts = [], []
        for _ in range(B):
            H_true = random_homography(r, scale=0.1)
            src = r.uniform(0, 200, size=(8, 2))
            dst_h = np.concatenate([src, np.ones((8, 1))], -1) @ H_true.T
            srcs.append(src)
            dsts.append(dst_h[:, :2] / dst_h[:, 2:3])
        srcs = jnp.array(np.stack(srcs), jnp.float32)
        dsts = jnp.array(np.stack(dsts), jnp.float32)
        Hs = jax.vmap(geo.fit_homography_dlt, in_axes=(0, 0, None))(srcs, dsts, jnp.ones(8))
        errs = jax.vmap(geo.transfer_error)(Hs, srcs, dsts)
        assert float(jnp.max(errs)) < 0.3


class TestLinearModels:
    def _roundtrip(self, fit_fn, A_true, t_true, atol=1e-3):
        r = rng(6)
        src = r.uniform(-50, 50, size=(40, 2))
        dst = src @ A_true.T + t_true
        H = fit_fn(jnp.array(src, jnp.float32), jnp.array(dst, jnp.float32), jnp.ones(40))
        np.testing.assert_allclose(np.array(H[:2, :2]), A_true, atol=atol)
        np.testing.assert_allclose(np.array(H[:2, 2]), t_true, atol=atol)

    def test_affine(self):
        self._roundtrip(geo.fit_affine, np.array([[1.2, 0.3], [-0.1, 0.9]]), np.array([5.0, -2.0]))

    def test_similarity(self):
        th = 0.4
        s = 1.5
        A = s * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        self._roundtrip(geo.fit_similarity, A, np.array([3.0, 4.0]))

    def test_rigid(self):
        th = -0.7
        A = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        self._roundtrip(geo.fit_rigid, A, np.array([-1.0, 2.0]))

    def test_translation(self):
        self._roundtrip(geo.fit_translation, np.eye(2), np.array([7.0, -9.0]))


class TestSO3:
    def test_exp_log_roundtrip(self):
        r = rng(7)
        w = jnp.array(r.normal(size=(16, 3)) * 1.0, jnp.float32)
        R = geo.so3_exp(w)
        w2 = geo.so3_log(R)
        np.testing.assert_allclose(np.array(w2), np.array(w), atol=1e-4)

    def test_exp_is_rotation(self):
        r = rng(8)
        w = jnp.array(r.normal(size=(8, 3)), jnp.float32)
        R = geo.so3_exp(w)
        eye = jnp.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(np.array(eye), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.array(jnp.linalg.det(R)), np.ones(8), atol=1e-5)

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0.0, 0.0]], jnp.float32)
        R = geo.so3_exp(w)
        np.testing.assert_allclose(np.array(R[0]), np.eye(3), atol=1e-6)

    def test_log_near_pi(self):
        """exp(log(R)) == R for rotation angles approaching and at pi — the
        antisymmetric-part formula alone degenerates there (a 360-degree
        panorama ring always contains such rotations; the round-1 bug made
        BA diverge on full rings)."""
        r = rng(9)
        for ang in [3.0, 3.1, 3.13, 3.14, np.pi - 1e-5, np.pi]:
            axis = r.normal(size=3)
            axis /= np.linalg.norm(axis)
            w = jnp.asarray((axis * ang)[None], jnp.float32)
            R = geo.so3_exp(w)
            R2 = geo.so3_exp(geo.so3_log(R))
            np.testing.assert_allclose(np.array(R2), np.array(R), atol=2e-3)

    def test_project_to_so3(self):
        r = rng(9)
        M = jnp.array(np.eye(3) + 0.1 * r.normal(size=(3, 3)), jnp.float32)
        R = geo.project_to_so3(M)
        np.testing.assert_allclose(np.array(R @ R.T), np.eye(3), atol=1e-5)
        assert float(jnp.linalg.det(R)) == pytest.approx(1.0, abs=1e-5)

    def test_rotation_angle(self):
        w = jnp.array([0.0, 0.5, 0.0], jnp.float32)
        R = geo.so3_exp(w)
        assert float(geo.rotation_angle_deg(R)) == pytest.approx(np.degrees(0.5), abs=1e-3)


class TestIntrinsics:
    def test_build_and_invert_K(self):
        K = geo.build_K(jnp.array([500.0, 700.0]), jnp.array([320.0, 400.0]), jnp.array([240.0, 300.0]))
        assert K.shape == (2, 3, 3)
        Ki = geo.invert_K(K)
        eye = jnp.einsum("bij,bjk->bik", K, Ki)
        np.testing.assert_allclose(np.array(eye), np.tile(np.eye(3), (2, 1, 1)), atol=1e-4)


class TestErrors:
    def test_symmetric_transfer_error_zero_on_exact(self):
        r = rng(10)
        H = jnp.array(random_homography(r, 0.1), jnp.float32)
        src = jnp.array(r.uniform(0, 100, size=(10, 2)), jnp.float32)
        dst = geo.homography_apply(H, src)
        err = geo.symmetric_transfer_error(H, src, dst)
        assert float(jnp.max(err)) < 1e-2

    def test_homography_valid(self):
        assert bool(geo.homography_is_valid(jnp.eye(3)))
        bad = jnp.zeros((3, 3)).at[2, 2].set(1.0)
        assert not bool(geo.homography_is_valid(bad))
