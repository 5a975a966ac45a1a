import jax.numpy as jnp
import numpy as np
import pytest

import synthdata
from autopanostitch_tpu.config import BundleConfig
from autopanostitch_tpu.models import bundle
from autopanostitch_tpu.ops import geometry as geo


def H_from_cams(f, R_rel, size):
    """Ground-truth homography i->j for pure rotation: K R_j R_i^T K^-1."""
    h, w = size
    K = np.array([[f, 0, (w - 1) / 2], [0, f, (h - 1) / 2], [0, 0, 1.0]])
    H = K @ R_rel @ np.linalg.inv(K)
    return H / H[2, 2]


class TestFocalEstimation:
    @pytest.mark.parametrize("method", ["wConstraint", "shumSzeliskiOneHPaper"])
    def test_recovers_focal_from_exact_H(self, method):
        f_true = 420.0
        size = (360, 480)
        rng = np.random.default_rng(0)
        pairs, Hs = [], []
        for k in range(4):
            w = rng.normal(size=3) * np.array([0.1, 0.45, 0.05])
            R_rel = np.asarray(geo.so3_exp(jnp.asarray(w, jnp.float32)))
            pairs.append((0, 1))
            Hs.append(H_from_cams(f_true, R_rel, size))
        f_est = bundle.estimate_focal(
            np.array(pairs), np.stack(Hs), np.array([size, size]), method
        )
        assert abs(f_est - f_true) / f_true < 0.05, f"{method}: {f_est} vs {f_true}"

    def test_fallback_focal(self):
        f = bundle.estimate_focal(np.zeros((0, 2), int), np.zeros((0, 3, 3)), np.array([[300, 400]]))
        assert f == pytest.approx(0.8 * 400)


class TestMST:
    def test_chain(self):
        counts = np.array([[0, 10, 1], [10, 0, 20], [1, 20, 0]])
        edges = bundle.max_spanning_tree(counts)
        assert sorted(tuple(sorted(e)) for e in edges) == [(0, 1), (1, 2)]

    def test_prefers_heavy_edges(self):
        counts = np.zeros((4, 4))
        counts[0, 1] = counts[1, 0] = 5
        counts[1, 2] = counts[2, 1] = 50
        counts[0, 2] = counts[2, 0] = 40
        counts[2, 3] = counts[3, 2] = 7
        edges = bundle.max_spanning_tree(counts)
        es = set(tuple(sorted(e)) for e in edges)
        assert (1, 2) in es and (0, 2) in es and (2, 3) in es


class TestRotationInit:
    def test_relative_rotation_roundtrip(self):
        f = 500.0
        size = (400, 600)
        w = np.array([0.05, 0.3, 0.02])
        R_rel = np.asarray(geo.so3_exp(jnp.asarray(w, jnp.float32)))  # R_j R_i^T
        H = H_from_cams(f, R_rel, size)
        R_est = bundle.relative_rotation(H, size, size, f)
        err = np.degrees(np.arccos(np.clip((np.trace(R_est.T @ R_rel) - 1) / 2, -1, 1)))
        assert err < 0.2

    def test_propagation_and_consistency_rotational(self):
        f = 450.0
        size = (360, 480)
        rng = np.random.default_rng(1)
        n = 4
        Rs = [np.eye(3)]
        for k in range(1, n):
            w = rng.normal(size=3) * np.array([0.05, 0.3, 0.02])
            Rs.append(np.asarray(geo.so3_exp(jnp.asarray(w, jnp.float32))) @ Rs[-1])
        pairs, Hs = [], []
        for i in range(n - 1):
            R_rel = Rs[i + 1] @ Rs[i].T
            pairs.append((i, i + 1))
            Hs.append(H_from_cams(f, R_rel, size))
        # extra loop-closure edge
        pairs.append((0, n - 1))
        Hs.append(H_from_cams(f, Rs[n - 1] @ Rs[0].T, size))
        pairs = np.array(pairs)
        Hs = np.stack(Hs)
        sizes = np.tile(size, (n, 1))
        pair_H = {tuple(map(int, p)): Hs[k] for k, p in enumerate(pairs)}
        tree = [(i, i + 1) for i in range(n - 1)]
        R0 = bundle.propagate_rotations(n, tree, pair_H, sizes, f, seed=0)
        no_rot, mean_ae, med_ae, max_ae = bundle.rotation_consistency(pairs, Hs, sizes, R0, f)
        assert not no_rot
        assert med_ae < 1.0
        for k in range(n):
            D = R0[k] @ Rs[k].T @ (R0[0] @ Rs[0].T).T  # up to global gauge
            err = np.degrees(np.arccos(np.clip((np.trace(D) - 1) / 2, -1, 1)))
            assert err < 1.0

    def test_planar_classified_no_rotation(self):
        """A long pure-translation scan with long-range edges cannot be
        explained by rotations: the atan nonlinearity makes chained vs
        direct relative rotations wildly inconsistent -> noRotation.
        (A short 3-4 image translation chain is genuinely rotation-like and
        the reference's thresholds would classify it rotational too.)"""
        n = 10
        size = (400, 500)
        sizes = np.tile(size, (n, 1))
        pairs, Hs = [], []
        for i in range(n):
            for j in range(i + 1, n):
                H = np.eye(3)
                H[0, 2] = 400.0 * (j - i)
                pairs.append((i, j))
                Hs.append(H.copy())
        pairs = np.array(pairs)
        Hs = np.stack(Hs)
        f = bundle.estimate_focal(pairs, Hs, sizes)
        pair_H = {tuple(map(int, p)): Hs[k] for k, p in enumerate(pairs)}
        tree = [(i, i + 1) for i in range(n - 1)]
        R0 = bundle.propagate_rotations(n, tree, pair_H, sizes, f, seed=0)
        no_rot, *_ = bundle.rotation_consistency(pairs, Hs, sizes, R0, f)
        assert no_rot


class TestBundleAdjustment:
    def _synthetic_graph(self, n=4, f=380.0, size=(300, 400), n_matches=60, noise=0.3, seed=0):
        """Exact rotational cameras + noisy reprojected matches."""
        rng = np.random.default_rng(seed)
        h, w = size
        Rs = [np.eye(3)]
        for k in range(1, n):
            ang = rng.normal(size=3) * np.array([0.03, 0.28, 0.02])
            Rs.append(np.asarray(geo.so3_exp(jnp.asarray(ang, jnp.float32))) @ Rs[-1])
        K = np.array([[f, 0, (w - 1) / 2], [0, f, (h - 1) / 2], [0, 0, 1.0]])
        Kinv = np.linalg.inv(K)

        pairs, Hs, u_is, u_js = [], [], [], []
        counts = np.zeros((n, n), int)
        M = 128
        for i in range(n):
            for j in range(i + 1, n):
                R_rel = Rs[j] @ Rs[i].T
                H = K @ R_rel @ Kinv
                # generate matches: points in i that land inside j
                pts = rng.uniform([10, 10], [w - 10, h - 10], size=(400, 2))
                ph = np.concatenate([pts, np.ones((400, 1))], -1) @ H.T
                pj = ph[:, :2] / ph[:, 2:3]
                ok = (ph[:, 2] > 0) & (pj[:, 0] > 5) & (pj[:, 0] < w - 5) & (pj[:, 1] > 5) & (pj[:, 1] < h - 5)
                if ok.sum() < 12:
                    continue
                sel = np.nonzero(ok)[0][:n_matches]
                pairs.append((i, j))
                Hs.append(H / H[2, 2])
                ui = np.zeros((M, 2), np.float32)
                uj = np.zeros((M, 2), np.float32)
                ui[: len(sel)] = pts[sel]
                uj[: len(sel)] = pj[sel] + noise * rng.normal(size=(len(sel), 2))
                u_is.append(ui)
                u_js.append(uj)
                counts[i, j] = counts[j, i] = len(sel)
        pairs = np.array(pairs)
        return Rs, K, pairs, np.stack(Hs), np.stack(u_is), np.stack(u_js), counts, M

    def test_ba_refines_to_subpixel(self):
        f_true = 380.0
        n = 4
        size = (300, 400)
        Rs, K, pairs, Hs, u_i, u_j, counts, M = self._synthetic_graph(n=n, f=f_true, size=size)
        sizes = np.tile(size, (n, 1))

        # build the pipeline-level inputs for run_bundle_adjustment
        P = len(pairs)
        nm = (u_i[..., 0] > 0) | (u_i[..., 1] > 0)
        pair_mask = nm
        inliers = nm
        # fake per-pair keypoint table: store coords directly
        K_cap = M
        xy = np.zeros((n, P * K_cap, 2), np.float32)
        pair_idx = np.zeros((P, K_cap, 2), np.int32)
        for p in range(P):
            i, j = pairs[p]
            sl = slice(p * K_cap, (p + 1) * K_cap)
            xy[i, sl] = u_i[p]
            xy[j, sl] = u_j[p]
            pair_idx[p, :, 0] = np.arange(p * K_cap, (p + 1) * K_cap)
            pair_idx[p, :, 1] = np.arange(p * K_cap, (p + 1) * K_cap)

        cfg = BundleConfig(incremental_lm_iters=6, max_iter_lm=15, max_matches=64)
        res = bundle.run_bundle_adjustment(
            np.arange(n), pairs, pair_idx, pair_mask, inliers, Hs, xy, counts, sizes, cfg
        )
        assert not res["no_rotation"]
        cams = res["cameras"]
        f_est = np.asarray(cams.f)
        assert np.all(np.abs(f_est - f_true) / f_true < 0.08), f_est

        # relative rotations must match ground truth up to gauge
        R_est = np.asarray(cams.R)
        for a in range(n):
            for b in range(a + 1, n):
                D_est = R_est[b] @ R_est[a].T
                D_true = Rs[b] @ Rs[a].T
                err = np.degrees(np.arccos(np.clip((np.trace(D_est.T @ D_true) - 1) / 2, -1, 1)))
                assert err < 0.5, f"pair {a},{b}: {err} deg"

    def test_ba_full_ring_360(self):
        """A full 360-degree yaw ring (rotation angles pass through pi)
        converges — regression test for the SO(3) log instability at pi and
        the bf16-matmul drift (the optimizer now carries rotation matrices
        and linearizes at theta=0)."""
        n, f_true, w, h, M = 12, 400.0, 400, 300, 80
        r = np.random.default_rng(3)
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        K = np.array([[f_true, 0, cx], [0, f_true, cy], [0, 0, 1.0]])
        Rs = []
        for i in range(n):
            yaw = 2 * np.pi * i / n
            c, s = np.cos(yaw), np.sin(yaw)
            Rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]).T)
        pair_list = sorted({(min(i, (i + 1) % n), max(i, (i + 1) % n)) for i in range(n)})
        P = len(pair_list)
        u_i = np.zeros((P, M, 2), np.float32)
        u_j = np.zeros((P, M, 2), np.float32)
        wgt = np.zeros((P, M), np.float32)
        counts = np.zeros((n, n), int)
        for p, (i, j) in enumerate(pair_list):
            H = K @ Rs[j] @ Rs[i].T @ np.linalg.inv(K)
            pts = r.uniform([0, 0], [w - 1, h - 1], size=(M * 3, 2))
            ph = np.concatenate([pts, np.ones((len(pts), 1))], -1) @ H.T
            q = ph[:, :2] / ph[:, 2:]
            ok = (ph[:, 2] > 0) & (q[:, 0] >= 0) & (q[:, 0] <= w - 1) & (q[:, 1] >= 0) & (q[:, 1] <= h - 1)
            take = min(M, int(ok.sum()))
            u_i[p, :take] = pts[ok][:take]
            u_j[p, :take] = q[ok][:take] + r.normal(0, 0.3, (take, 2))
            wgt[p, :take] = 1.0
            counts[i, j] = counts[j, i] = take
        data = bundle.BAData(
            pair_ij=jnp.asarray(np.array(pair_list, np.int32)),
            u_i=jnp.asarray(u_i), u_j=jnp.asarray(u_j), w=jnp.asarray(wgt),
            pair_valid=jnp.ones((P,), bool),
        )
        R_init = np.stack(
            [np.asarray(geo.so3_exp(jnp.asarray(r.normal(0, 0.01, 3), jnp.float32))) @ Rs[k] for k in range(n)]
        ).astype(np.float32)
        f_init = np.full(n, f_true * 0.95, np.float32)
        order = bundle.incremental_order(counts, np.arange(n), 0)
        Rr, fr, _, cost = bundle.run_incremental_ba(
            R_init, f_init, np.full(n, cx, np.float32), np.full(n, cy, np.float32),
            data, np.array(pair_list), order, 0, BundleConfig(),
        )
        fr = np.asarray(fr)
        assert np.all(np.isfinite(fr)) and np.all(np.isfinite(np.asarray(Rr)))
        assert np.all(np.abs(fr - f_true) / f_true < 0.01), fr

    def test_ba_estimates_radial_distortion(self):
        """5-param BA (estimate_distortion) recovers f AND k1 from matches
        observed through a barrel lens, where the 4-param model is forced
        into a biased focal (the robustness sweep's dominant artifact class:
        the focal bias turns into an arc-length error on near-360 rings)."""
        n, f_true, w, h, M = 12, 400.0, 400, 300, 80
        k1_true = -0.04
        r = np.random.default_rng(7)
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        norm2 = cx * cx + cy * cy
        K = np.array([[f_true, 0, cx], [0, f_true, cy], [0, 0, 1.0]])

        def distort(pts):
            """Pinhole coords -> observed (distorted-image) coords: invert
            s = p (1 + k1 |p-c|^2 / norm2) by fixed point."""
            d = pts - [cx, cy]
            rp2 = np.sum(d * d, -1) / norm2
            for _ in range(6):
                rp2 = (np.sum(d * d, -1) / norm2) / (1 + k1_true * rp2) ** 2
            return [cx, cy] + d / (1 + k1_true * rp2)[:, None]

        Rs = []
        for i in range(n):
            yaw = 2 * np.pi * i / n
            c, s = np.cos(yaw), np.sin(yaw)
            Rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]).T)
        pair_list = sorted({(min(i, (i + 1) % n), max(i, (i + 1) % n)) for i in range(n)})
        P = len(pair_list)
        u_i = np.zeros((P, M, 2), np.float32)
        u_j = np.zeros((P, M, 2), np.float32)
        wgt = np.zeros((P, M), np.float32)
        counts = np.zeros((n, n), int)
        for p, (i, j) in enumerate(pair_list):
            H = K @ Rs[j] @ Rs[i].T @ np.linalg.inv(K)
            pts = r.uniform([0, 0], [w - 1, h - 1], size=(M * 3, 2))
            ph = np.concatenate([pts, np.ones((len(pts), 1))], -1) @ H.T
            q = ph[:, :2] / ph[:, 2:]
            ok = (ph[:, 2] > 0) & (q[:, 0] >= 0) & (q[:, 0] <= w - 1) & (q[:, 1] >= 0) & (q[:, 1] <= h - 1)
            take = min(M, int(ok.sum()))
            u_i[p, :take] = distort(pts[ok][:take])
            u_j[p, :take] = distort(q[ok][:take]) + r.normal(0, 0.3, (take, 2))
            wgt[p, :take] = 1.0
            counts[i, j] = counts[j, i] = take
        data = bundle.BAData(
            pair_ij=jnp.asarray(np.array(pair_list, np.int32)),
            u_i=jnp.asarray(u_i), u_j=jnp.asarray(u_j), w=jnp.asarray(wgt),
            pair_valid=jnp.ones((P,), bool),
        )
        R_init = np.stack(
            [np.asarray(geo.so3_exp(jnp.asarray(r.normal(0, 0.01, 3), jnp.float32))) @ Rs[k] for k in range(n)]
        ).astype(np.float32)
        f_init = np.full(n, f_true * 0.95, np.float32)
        order = bundle.incremental_order(counts, np.arange(n), 0)
        cxa = np.full(n, cx, np.float32)
        cya = np.full(n, cy, np.float32)
        args = (R_init, f_init, cxa, cya, data, np.array(pair_list), order, 0,
                BundleConfig())
        _, f4, _, _ = bundle.run_incremental_ba(*args)
        _, f5, k1_5, _ = bundle.run_incremental_ba(*args, with_k1=True)
        f4, f5, k1_5 = np.asarray(f4), np.asarray(f5), np.asarray(k1_5)
        err4 = float(np.abs(f4 - f_true).max() / f_true)
        err5 = float(np.abs(f5 - f_true).max() / f_true)
        # pinhole model is biased by the lens; the 5-param model is not
        assert err4 > 0.02, f"4-param unexpectedly unbiased: {err4}"
        assert err5 < 0.01, f"5-param focal error {err5}, f={f5}"
        assert np.all(np.abs(k1_5 - k1_true) < 0.01), k1_5

    def test_ba_robust_to_outliers_and_weak_graph(self):
        """Stress test (VERDICT round-1 item 5): 25 percent gross outliers
        in every edge's match list plus one degenerate all-zero pair must
        not NaN-stall the LM — the NaN-guarded solve + accept test keep the
        optimizer finite and the focals near truth."""
        f_true = 380.0
        n = 4
        Rs, K, pairs, Hs, u_i, u_j, counts, M = self._synthetic_graph(n=n, f=f_true)
        r = np.random.default_rng(11)
        # corrupt 25% of each pair's matches with uniform garbage
        for p in range(len(pairs)):
            valid = np.nonzero((u_i[p, :, 0] > 0) | (u_i[p, :, 1] > 0))[0]
            bad = r.choice(valid, max(1, len(valid) // 4), replace=False)
            u_j[p, bad] = r.uniform([0, 0], [400, 300], size=(len(bad), 2))
        P = len(pairs)
        wgt = ((u_i[..., 0] > 0) | (u_i[..., 1] > 0)).astype(np.float32)
        # append a fully-degenerate pair (no valid matches)
        pairs2 = np.concatenate([pairs, [[0, 3]]], 0)
        u_i2 = np.concatenate([u_i, np.zeros((1, M, 2), np.float32)], 0)
        u_j2 = np.concatenate([u_j, np.zeros((1, M, 2), np.float32)], 0)
        wgt2 = np.concatenate([wgt, np.zeros((1, M), np.float32)], 0)
        data = bundle.BAData(
            pair_ij=jnp.asarray(pairs2.astype(np.int32)),
            u_i=jnp.asarray(u_i2), u_j=jnp.asarray(u_j2), w=jnp.asarray(wgt2),
            pair_valid=jnp.ones((P + 1,), bool),
        )
        R_init = np.stack(Rs).astype(np.float32)
        f_init = np.full(n, f_true * 1.1, np.float32)
        order = bundle.incremental_order(counts, np.arange(n), 0)
        cx = np.full(n, (400 - 1) / 2.0, np.float32)
        cy = np.full(n, (300 - 1) / 2.0, np.float32)
        Rr, fr, _, cost = bundle.run_incremental_ba(
            R_init, f_init, cx, cy, data, pairs2, order, 0, BundleConfig(),
        )
        fr = np.asarray(fr)
        assert np.isfinite(float(np.asarray(cost)))
        assert np.all(np.isfinite(fr)) and np.all(np.isfinite(np.asarray(Rr)))
        # Huber IRLS downweights the outliers: focals still land near truth
        assert np.all(np.abs(fr - f_true) / f_true < 0.10), fr

    def test_planar_component_skips_device_ba(self):
        """A long translation scan is classified noRotation and bypasses the
        R,K,f device BA (the homography-BA path handles it instead)."""
        n = 10
        size = (400, 500)
        sizes = np.tile(size, (n, 1))
        pairs, Hs = [], []
        for i in range(n):
            for j in range(i + 1, n):
                H = np.eye(3)
                H[0, 2] = 400.0 * (j - i)
                pairs.append((i, j))
                Hs.append(H.copy())
        pairs = np.array(pairs)
        Hs = np.stack(Hs)
        P = len(pairs)
        counts = np.zeros((n, n), int)
        for i, j in pairs:
            # adjacent views overlap most -> MST becomes the chain (like a
            # real linear scan); long-range edges exist but are weaker
            counts[i, j] = counts[j, i] = 100 if j - i == 1 else 30
        pair_idx = np.zeros((P, 8, 2), np.int32)
        pair_mask = np.ones((P, 8), bool)
        xy = np.zeros((n, 8, 2), np.float32)
        res = bundle.run_bundle_adjustment(
            np.arange(n), pairs, pair_idx, pair_mask, pair_mask, Hs, xy, counts, sizes
        )
        assert res["no_rotation"]
        assert "final_cost" not in res


class TestIncrementalOrder:
    def test_matches_greedy_oracle(self):
        """The O(N^2) score-update ordering must equal the naive greedy
        re-sum oracle (ties broken to the lowest index in both)."""
        r = np.random.default_rng(3)
        for n in (2, 5, 17, 40):
            counts = r.integers(0, 50, (n, n))
            counts = np.triu(counts, 1)
            counts = counts + counts.T
            seed = int(r.integers(0, n))
            got = bundle.incremental_order(counts, np.arange(n), seed)
            # oracle: naive greedy, first-max (lowest index) on ties
            added, order = [seed], [seed]
            remaining = [c for c in range(n) if c != seed]
            while remaining:
                scores = [sum(int(counts[c, a]) for a in added) for c in remaining]
                b = remaining[int(np.argmax(scores))]
                order.append(b)
                added.append(b)
                remaining.remove(b)
            assert got == order

    def test_cpinv_focal_matches_loop_oracle(self):
        """Vectorized focal-coupling block equals the per-pair loop form
        (`buildBrownLowePrior`, bundleAdjustmentRKf.m:1560-1637)."""
        r = np.random.default_rng(5)
        for k, nb in ((1, 8), (4, 8), (9, 16)):
            act = np.sort(r.choice(40, k, replace=False))
            sw, mw = 2.5, 0.7
            got = bundle._cpinv_focal(act, nb, sw, mw)
            C = np.zeros((nb, nb), np.float32)
            for a in range(k):
                for b in range(a + 1, k):
                    if abs(int(act[a]) - int(act[b])) <= 2:
                        C[a, a] += sw
                        C[b, b] += sw
                        C[a, b] -= sw
                        C[b, a] -= sw
            if k > 1:
                C[:k, :k] += mw * (np.eye(k) - 1.0 / k)
            np.testing.assert_allclose(got, C, atol=1e-5)

    def test_scales_to_1000(self):
        """O(N^3) host greedy cost 22 s at N=1000; the vectorized form
        must stay sub-second."""
        import time

        r = np.random.default_rng(4)
        counts = r.integers(0, 30, (1000, 1000))
        counts = np.triu(counts, 1)
        counts = counts + counts.T
        t0 = time.time()
        order = bundle.incremental_order(counts, np.arange(1000), 0)
        assert time.time() - t0 < 1.0
        assert sorted(order) == list(range(1000))


class TestStratifiedSubsample:
    def _clustered_pts(self):
        rng = np.random.default_rng(0)
        # 90% of matches cluster in one corner, 10% spread over the image
        dense = rng.uniform(0, 80, (900, 2))
        sparse = rng.uniform(0, 400, (100, 2))
        return np.concatenate([dense, sparse]).astype(np.float32)

    def test_grid_covers_overlap(self):
        from autopanostitch_tpu.models.bundle import stratified_subsample

        pts = self._clustered_pts()
        rng = np.random.default_rng(1)
        # reference semantics: quota proportional to bin occupancy with a
        # MINIMUM of one pick per non-empty bin — every occupied grid cell
        # must appear in the subsample (coverage), which plain uniform
        # sampling does not guarantee
        idx = stratified_subsample(pts, (400, 400), 100, "grid", rng)
        assert len(idx) <= 100 and len(set(idx.tolist())) == len(idx)
        cell = lambda p: (int(p[1] // 100), int(p[0] // 100))  # noqa: E731
        occupied = {cell(p) for p in pts}
        covered = {cell(p) for p in pts[idx]}
        assert covered == occupied
        idx_p = stratified_subsample(pts, (400, 400), 100, "polar", rng)
        assert len(idx_p) <= 100 and len(set(idx_p.tolist())) == len(idx_p)
        # polar keeps at least one pick at large radius
        assert (np.hypot(*(pts[idx_p] - 200).T) > 150).any()

    def test_under_cap_identity(self):
        from autopanostitch_tpu.models.bundle import stratified_subsample

        pts = np.zeros((10, 2), np.float32)
        idx = stratified_subsample(pts, (100, 100), 50, "grid",
                                   np.random.default_rng(0))
        np.testing.assert_array_equal(idx, np.arange(10))

    def test_more_bins_than_cap(self):
        from autopanostitch_tpu.models.bundle import stratified_subsample

        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 400, (400, 2)).astype(np.float32)
        # polar 12x5 = 60 bins, cap 30 < occupied bins
        idx = stratified_subsample(pts, (400, 400), 30, "polar",
                                   np.random.default_rng(0))
        assert len(idx) == 30
        assert len(set(idx.tolist())) == 30
        # picks span the angular range, not just the first sectors
        d = pts[idx] - 200
        ang = np.mod(np.arctan2(d[:, 1], d[:, 0]), 2 * np.pi)
        assert ang.min() < np.pi / 3 and ang.max() > 5 * np.pi / 3


def test_ba_narrow_fov_two_row_rig_no_focal_drift():
    """Regression: captured from a randomized-sweep scene (2-row rig,
    f=402, 22-deg yaw steps, 0.3-deg jitter) where BA walked the focal
    from a near-perfect init (398.6) to 558 (+40%) at 100x the attainable
    cost — the classic partial-graph focal random-walk the reference
    documents as its BA-divergence artifact class (README.md:194). With
    the tight incremental focal cap (BundleConfig.incremental_focal_frac)
    BA must stay at the data optimum. Inputs are the captured BA arrays
    (goldens/ba_narrowfov_2row.npz): real SIFT matches, real propagated
    rotation init."""
    import os

    z = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "ba_narrowfov_2row.npz"))
    data = bundle.BAData(
        pair_ij=jnp.asarray(z["pair_ij"]),
        u_i=jnp.asarray(z["u_i"]), u_j=jnp.asarray(z["u_j"]),
        w=jnp.asarray(z["w"]), pair_valid=jnp.asarray(z["pair_valid"]),
    )
    f_true = float(z["f_true"])
    _, f, _, cost = bundle.run_incremental_ba(
        z["R_init"], z["f_init"], z["cx"], z["cy"], data, z["pairs"],
        z["order"].tolist(), int(z["seed"]), BundleConfig(),
    )
    f = np.asarray(f)
    ferr = np.abs(f - f_true).max() / f_true
    assert ferr < 0.01, (ferr, f)
    assert float(cost) < 200.0, float(cost)  # drifted run measured 2184
