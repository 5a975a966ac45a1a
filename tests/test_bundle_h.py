import numpy as np

from autopanostitch_tpu.config import BundleConfig
from autopanostitch_tpu.models import bundle_h


def make_planar_problem(n=4, n_matches=40, noise=0.4, seed=0):
    """Ground-truth absolute homographies (translations + mild affine) and
    noisy pairwise observations."""
    rng = np.random.default_rng(seed)
    G_true = [np.eye(3)]
    for k in range(1, n):
        G = np.eye(3)
        G[0, 2] = 300.0 * k + rng.normal() * 2
        G[1, 2] = rng.normal() * 10
        G[0, 0] = 1 + 0.01 * rng.normal()
        G_true.append(G)
    # pairwise matches between consecutive (and one skip) pairs
    pairs = [(i, i + 1) for i in range(n - 1)] + [(0, 2)]
    M = 64
    u_i = np.zeros((len(pairs), M, 2), np.float32)
    u_j = np.zeros((len(pairs), M, 2), np.float32)
    w = np.zeros((len(pairs), M), np.float32)
    Hs = []
    for p, (i, j) in enumerate(pairs):
        # H maps i -> j : G_j^-1 G_i
        H = np.linalg.inv(G_true[j]) @ G_true[i]
        H /= H[2, 2]
        Hs.append(H)
        pts = rng.uniform(20, 380, size=(n_matches, 2))
        ph = np.concatenate([pts, np.ones((n_matches, 1))], -1) @ H.T
        pj = ph[:, :2] / ph[:, 2:3]
        u_i[p, :n_matches] = pts
        u_j[p, :n_matches] = pj + noise * rng.normal(size=pj.shape)
        w[p, :n_matches] = 1.0
    return np.array(pairs), np.stack(Hs), (u_i, u_j, w), G_true


def canvas_rms(G_est, G_true, anchor, n, rng):
    """Point discrepancy of est vs true mappings, both re-gauged so the
    anchor frame is identity."""
    errs = []
    pts = rng.uniform(0, 400, size=(50, 2))
    ph = np.concatenate([pts, np.ones((50, 1))], -1)
    for k in range(n):
        e = ph @ (np.linalg.inv(G_est[anchor]) @ G_est[k]).T
        t = ph @ (np.linalg.inv(G_true[anchor]) @ G_true[k]).T
        e = e[:, :2] / e[:, 2:3]
        t = t[:, :2] / t[:, 2:3]
        errs.append(np.sqrt(((e - t) ** 2).sum(-1)))
    return np.concatenate(errs)


def test_hba_refines_chained_homographies():
    pairs, Hs, coords, G_true = make_planar_problem(noise=0.5)
    n = 4
    rng = np.random.default_rng(1)
    # corrupt the chain slightly: noisy pairwise Hs accumulate drift
    Hs_noisy = Hs.copy()
    for p in range(len(Hs)):
        Hs_noisy[p][0, 2] += rng.normal() * 3.0
        Hs_noisy[p][1, 2] += rng.normal() * 3.0
    res = bundle_h.run_bundle_adjustment_h(
        pairs, Hs_noisy, coords, n, BundleConfig(max_iter_lm=30)
    )
    assert res["reachable"].all()
    anchor = res["anchor"]
    err_init = canvas_rms(res["H_init"], np.stack(G_true), anchor, n, np.random.default_rng(2))
    err_ref = canvas_rms(res["H_abs"], np.stack(G_true), anchor, n, np.random.default_rng(2))
    # refinement must beat the drifted chain substantially
    assert err_ref.mean() < err_init.mean()
    assert err_ref.mean() < 1.5, (err_init.mean(), err_ref.mean())


def test_hba_bidirectional_chain_residual():
    """The bidirectional chain residual (`bundleAdjustmentH.m:592-683`,
    h_one_direction=False) refines the drifted chain at least as well as
    the default unidirectional canvas residual."""
    pairs, Hs, coords, G_true = make_planar_problem(noise=0.5, seed=5)
    n = 4
    rng = np.random.default_rng(6)
    Hs_noisy = Hs.copy()
    for p in range(len(Hs)):
        Hs_noisy[p][0, 2] += rng.normal() * 3.0
        Hs_noisy[p][1, 2] += rng.normal() * 3.0
    res = bundle_h.run_bundle_adjustment_h(
        pairs, Hs_noisy, coords, n,
        BundleConfig(max_iter_lm=30, h_one_direction=False),
    )
    anchor = res["anchor"]
    err_init = canvas_rms(res["H_init"], np.stack(G_true), anchor, n, np.random.default_rng(2))
    err_ref = canvas_rms(res["H_abs"], np.stack(G_true), anchor, n, np.random.default_rng(2))
    assert err_ref.mean() < err_init.mean()
    assert err_ref.mean() < 1.5, (err_init.mean(), err_ref.mean())


def test_hba_regdet_keeps_scale():
    """RegDet (`bundleAdjustmentH.m:437-499`) penalizes log|det 2x2|: with
    a strong weight the refined homographies keep near-unit determinant."""
    pairs, Hs, coords, G_true = make_planar_problem(noise=0.3, seed=7)
    res = bundle_h.run_bundle_adjustment_h(
        pairs, Hs, coords, 4, BundleConfig(max_iter_lm=20, reg_det=10.0)
    )
    for k in range(4):
        H = res["H_abs"][k]
        det2 = H[0, 0] * H[1, 1] - H[0, 1] * H[1, 0]
        assert 0.5 < abs(det2) < 2.0


def test_hba_gauge_anchor_identity():
    pairs, Hs, coords, G_true = make_planar_problem(noise=0.2, seed=3)
    res = bundle_h.run_bundle_adjustment_h(pairs, Hs, coords, 4, BundleConfig(max_iter_lm=10))
    anchor = res["anchor"]
    np.testing.assert_allclose(res["H_abs"][anchor], np.eye(3), atol=1e-5)
