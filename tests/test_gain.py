import numpy as np
import jax.numpy as jnp

from autopanostitch_tpu.config import GainConfig
from autopanostitch_tpu.models import gain


class TestSolveGains:
    def test_equalizes_two_images(self):
        N = 2
        Nij = np.array([[0.0, 500.0], [500.0, 0.0]])
        sumC = np.zeros((N, N, 3))
        # image 0 sees mean 100, image 1 sees mean 150 over the overlap
        sumC[0, 1] = 100.0 * 500
        sumC[1, 0] = 150.0 * 500
        g = gain.solve_gains(Nij, sumC, GainConfig())
        assert g[0, 0] > 1.02 and g[1, 0] < 0.98
        # gains should bring the products closer together
        assert abs(g[0, 0] * 100 - g[1, 0] * 150) < abs(100 - 150)

    def test_below_min_overlap_returns_ones(self):
        Nij = np.full((3, 3), 10.0)
        sumC = np.ones((3, 3, 3))
        g = gain.solve_gains(Nij, sumC, GainConfig(), min_overlap=50)
        np.testing.assert_allclose(g, 1.0)

    def test_clamped(self):
        Nij = np.array([[0.0, 1000.0], [1000.0, 0.0]])
        sumC = np.zeros((2, 2, 3))
        sumC[0, 1] = 10.0 * 1000  # extreme ratio
        sumC[1, 0] = 250.0 * 1000
        g = gain.solve_gains(Nij, sumC, GainConfig(sigma_g=10.0))  # weak prior
        assert (g >= 0.25).all() and (g <= 4.0).all()


class TestPlanarOverlap:
    def test_statistics_and_gains(self):
        imgs = np.zeros((2, 64, 96, 3), np.float32)
        imgs[0] += 0.4
        imgs[1] += 0.6
        fea = np.ones((2, 64, 96), np.float32)
        H_inv = np.stack([np.eye(3, dtype=np.float32)] * 2)
        H_inv[1][0, 2] = 40.0
        Nij, sumC = gain.overlap_statistics_planar(
            jnp.asarray(imgs), jnp.asarray(fea), jnp.asarray(H_inv),
            0.0, 0.0, jnp.float32(2.0), 32, 70,
        )
        Nij = np.asarray(Nij)
        sumC = np.asarray(sumC)
        assert Nij[0, 1] > 100  # overlap region sampled
        # mean colors over overlap on the 255 scale
        np.testing.assert_allclose(sumC[0, 1] / Nij[0, 1], 0.4 * 255, rtol=0.02)
        np.testing.assert_allclose(sumC[1, 0] / Nij[0, 1], 0.6 * 255, rtol=0.02)
        g = gain.compute_gains_planar(imgs, fea, H_inv, 0.0, 0.0, (64, 140), GainConfig())
        assert g[0, 0] > 1.05 and g[1, 0] < 0.95


class TestRotationalOverlap:
    def test_two_identical_cameras_full_overlap(self):
        from autopanostitch_tpu.ops import geometry as geo

        imgs = np.full((2, 64, 96, 3), 0.5, np.float32)
        fea = np.ones((2, 64, 96), np.float32)
        R = np.stack([np.eye(3, dtype=np.float32)] * 2)
        K = np.asarray(geo.build_K(jnp.asarray([80.0, 80.0]), jnp.asarray([47.5, 47.5]), jnp.asarray([31.5, 31.5])))
        Nij, sumC = gain.overlap_statistics(
            jnp.asarray(imgs), jnp.asarray(fea), jnp.asarray(R), jnp.asarray(K),
            "spherical", 80.0, -0.5, -0.35, jnp.eye(3), jnp.float32(2.0), 32, 48,
        )
        Nij = np.asarray(Nij)
        assert Nij[0, 1] > 200
        np.testing.assert_allclose(np.asarray(sumC)[0, 1] / Nij[0, 1], 127.5, rtol=0.02)


class TestImagespaceChunking:
    def test_statistics_invariant_to_chunk_size(self):
        # The host loop dispatching one chunk-accumulate executable per
        # grid chunk (the N>=160 TPU kernel-fault workaround) must produce
        # statistics independent of the chunk size, including the padded
        # tail chunk.
        from autopanostitch_tpu.ops import geometry as geo

        rng = np.random.default_rng(3)
        N, H, W = 3, 64, 96
        imgs = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
        fea = np.ones((N, H, W), np.float32)
        sizes = np.tile(np.array([H, W], np.int32), (N, 1))
        # small yaw steps so all three cameras overlap
        Rs = np.stack([np.asarray(geo.so3_exp(jnp.asarray(
            [0.0, 0.1 * i, 0.0], jnp.float32))) for i in range(N)])
        K = np.asarray(geo.build_K(
            jnp.full((N,), 120.0), jnp.full((N,), (W - 1) / 2.0),
            jnp.full((N,), (H - 1) / 2.0)))
        args = (jnp.asarray(imgs), jnp.asarray(fea), jnp.asarray(sizes),
                jnp.asarray(Rs), jnp.asarray(K))
        # stride 2 -> P = 32*48 = 1536 grid points: 24 chunks vs 1 chunk
        ref_N, ref_C = gain.overlap_statistics_imagespace(
            *args, stride=2, chunk=2048, force_host_loop=True)
        got_N, got_C = gain.overlap_statistics_imagespace(
            *args, stride=2, chunk=64, force_host_loop=True)
        assert np.asarray(ref_N).sum() > 0  # cameras genuinely overlap
        np.testing.assert_allclose(np.asarray(got_N), np.asarray(ref_N), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got_C), np.asarray(ref_C), rtol=1e-5)

    def test_gain_oneshot_matches_host_loop(self):
        # The one-shot (lax.scan) path used below gain.GAIN_HOST_LOOP_MIN_N
        # must be numerically identical to the host-dispatched chunk loop
        # selected at N >= GAIN_HOST_LOOP_MIN_N (the TPU kernel-fault
        # workaround, tools/repro_gain_fault.py) — same accumulate body,
        # same chunk order, so exact equality is required.
        from autopanostitch_tpu.ops import geometry as geo

        rng = np.random.default_rng(5)
        N, H, W = 4, 64, 96
        imgs = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
        fea = np.ones((N, H, W), np.float32)
        sizes = np.tile(np.array([H, W], np.int32), (N, 1))
        Rs = np.stack([np.asarray(geo.so3_exp(jnp.asarray(
            [0.0, 0.12 * i, 0.0], jnp.float32))) for i in range(N)])
        K = np.asarray(geo.build_K(
            jnp.full((N,), 120.0), jnp.full((N,), (W - 1) / 2.0),
            jnp.full((N,), (H - 1) / 2.0)))
        args = (jnp.asarray(imgs), jnp.asarray(fea), jnp.asarray(sizes),
                jnp.asarray(Rs), jnp.asarray(K))
        assert N < gain.GAIN_HOST_LOOP_MIN_N  # default picks the one-shot
        one_N, one_C = gain.overlap_statistics_imagespace(
            *args, stride=2, chunk=256)
        loop_N, loop_C = gain.overlap_statistics_imagespace(
            *args, stride=2, chunk=256, force_host_loop=True)
        assert np.asarray(one_N).sum() > 0
        np.testing.assert_array_equal(np.asarray(one_N), np.asarray(loop_N))
        np.testing.assert_allclose(
            np.asarray(one_C), np.asarray(loop_C), rtol=1e-6)

    def test_gain_oneshot_with_k1(self):
        # distortion-aware variant of the equivalence (the default config
        # runs with k1 from BA)
        from autopanostitch_tpu.ops import geometry as geo

        rng = np.random.default_rng(9)
        N, H, W = 3, 64, 96
        imgs = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
        fea = np.ones((N, H, W), np.float32)
        sizes = np.tile(np.array([H, W], np.int32), (N, 1))
        Rs = np.stack([np.asarray(geo.so3_exp(jnp.asarray(
            [0.0, 0.1 * i, 0.0], jnp.float32))) for i in range(N)])
        K = np.asarray(geo.build_K(
            jnp.full((N,), 120.0), jnp.full((N,), (W - 1) / 2.0),
            jnp.full((N,), (H - 1) / 2.0)))
        k1 = jnp.asarray(np.full((N,), -0.03, np.float32))
        args = (jnp.asarray(imgs), jnp.asarray(fea), jnp.asarray(sizes),
                jnp.asarray(Rs), jnp.asarray(K))
        one_N, one_C = gain.overlap_statistics_imagespace(
            *args, stride=2, chunk=256, k1=k1)
        loop_N, loop_C = gain.overlap_statistics_imagespace(
            *args, stride=2, chunk=256, k1=k1, force_host_loop=True)
        assert np.asarray(one_N).sum() > 0
        np.testing.assert_array_equal(np.asarray(one_N), np.asarray(loop_N))
        np.testing.assert_allclose(
            np.asarray(one_C), np.asarray(loop_C), rtol=1e-6)


class TestSolveGainsVectorized:
    def test_matches_loop_oracle(self):
        # the vectorized accumulation must equal the original O(N^2) loop
        rng = np.random.default_rng(11)
        N = 7
        Nij = rng.uniform(0, 400, (N, N))
        np.fill_diagonal(Nij, 0.0)
        sumC = rng.uniform(0, 200, (N, N, 3)) * Nij[..., None]
        cfg = GainConfig()
        got = gain.solve_gains(Nij, sumC, cfg)

        # loop oracle (the pre-vectorization implementation)
        sN2, sg2 = cfg.sigma_n**2, cfg.sigma_g**2
        iu, ju = np.triu_indices(N, 1)
        ok = np.minimum(Nij[iu, ju], Nij[ju, iu]) >= 50
        A = np.zeros((N, N, 3))
        b = np.zeros((N,))
        for i, j in zip(iu[ok], ju[ok]):
            Kij = 0.5 * (Nij[i, j] + Nij[j, i])
            Ibar_ij = sumC[i, j] / Nij[i, j]
            Ibar_ji = sumC[j, i] / Nij[j, i]
            wN, wG = Kij / sN2, Kij / sg2
            for c in range(3):
                A[i, i, c] += wN * Ibar_ij[c] ** 2 + wG
                A[j, j, c] += wN * Ibar_ji[c] ** 2 + wG
                A[i, j, c] += -wN * Ibar_ij[c] * Ibar_ji[c]
                A[j, i, c] += -wN * Ibar_ij[c] * Ibar_ji[c]
            b[i] += wG
            b[j] += wG
        want = np.ones((N, 3), np.float32)
        for c in range(3):
            x = np.linalg.solve(A[:, :, c] + 1e-8 * np.eye(N), b)
            want[:, c] = np.clip(x, cfg.clamp[0], cfg.clamp[1])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
