import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autopanostitch_tpu.ops import geometry as geo
from autopanostitch_tpu.ops import ransac as rs


def make_problem(seed, n_inliers=60, n_outliers=40, noise=0.5, cap=128):
    r = np.random.default_rng(seed)
    H_true = np.eye(3) + 0.2 * r.normal(size=(3, 3)) * np.array(
        [[0.1, 0.1, 20.0], [0.1, 0.1, 20.0], [1e-4, 1e-4, 0.0]]
    )
    H_true /= H_true[2, 2]
    src_in = r.uniform(0, 400, size=(n_inliers, 2))
    dh = np.concatenate([src_in, np.ones((n_inliers, 1))], -1) @ H_true.T
    dst_in = dh[:, :2] / dh[:, 2:3] + noise * r.normal(size=(n_inliers, 2))
    src_out = r.uniform(0, 400, size=(n_outliers, 2))
    dst_out = r.uniform(0, 400, size=(n_outliers, 2))
    src = np.concatenate([src_in, src_out]).astype(np.float32)
    dst = np.concatenate([dst_in, dst_out]).astype(np.float32)
    n = n_inliers + n_outliers
    mask = np.zeros(cap, bool)
    mask[:n] = True
    src_p = np.zeros((cap, 2), np.float32)
    dst_p = np.zeros((cap, 2), np.float32)
    src_p[:n] = src
    dst_p[:n] = dst
    return H_true, jnp.array(src_p), jnp.array(dst_p), jnp.array(mask)


@pytest.mark.parametrize("method", ["ransac", "mlesac"])
def test_recovers_homography_with_outliers(method):
    H_true, src, dst, mask = make_problem(0)
    res = rs.ransac_fit(src, dst, mask, jax.random.PRNGKey(0), threshold=3.0, method=method)
    assert bool(res.success)
    assert int(res.num_inliers) >= 50
    # inliers should be (mostly) the true inliers
    inl = np.array(res.inliers)
    assert inl[:60].sum() >= 52
    assert inl[60:100].sum() <= 3
    # model accuracy on true inliers
    err = geo.transfer_error(res.H, src[:60], dst[:60])
    assert float(jnp.median(err)) < 2.0


def test_all_outliers_fails_acceptance():
    r = np.random.default_rng(1)
    cap = 64
    src = jnp.array(r.uniform(0, 400, size=(cap, 2)), jnp.float32)
    dst = jnp.array(r.uniform(0, 400, size=(cap, 2)), jnp.float32)
    mask = jnp.ones(cap, bool)
    res = rs.ransac_fit(src, dst, mask, jax.random.PRNGKey(1), threshold=2.0)
    # random correspondences: few inliers; Brown-Lowe acceptance would reject
    ni, nf = int(res.num_inliers), int(res.num_putative)
    assert ni <= 8 + 0.3 * nf


def test_too_few_points_not_successful():
    src = jnp.zeros((16, 2))
    dst = jnp.zeros((16, 2))
    mask = jnp.zeros(16, bool).at[0].set(True).at[1].set(True)
    res = rs.ransac_fit(src, dst, mask, jax.random.PRNGKey(2))
    assert not bool(res.success)
    assert int(res.num_inliers) == 0


def test_rigid_model():
    r = np.random.default_rng(3)
    th = 0.3
    A = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    src = r.uniform(0, 100, size=(50, 2)).astype(np.float32)
    dst = (src @ A.T + np.array([10.0, -5.0])).astype(np.float32)
    dst[40:] += r.uniform(-60, 60, size=(10, 2)).astype(np.float32)  # outliers
    mask = jnp.ones(50, bool)
    res = rs.ransac_fit(
        jnp.array(src), jnp.array(dst), mask, jax.random.PRNGKey(3), threshold=1.0, model="rigid"
    )
    assert bool(res.success)
    assert int(res.num_inliers) >= 38


def test_verify_pairs_batched():
    problems = [make_problem(s) for s in range(5)]
    # pair 5: pure noise (should be rejected)
    r = np.random.default_rng(99)
    cap = 128
    noise_src = np.zeros((cap, 2), np.float32)
    noise_dst = np.zeros((cap, 2), np.float32)
    noise_src[:100] = r.uniform(0, 400, size=(100, 2))
    noise_dst[:100] = r.uniform(0, 400, size=(100, 2))
    nm = np.zeros(cap, bool)
    nm[:100] = True

    src = jnp.stack([p[1] for p in problems] + [jnp.array(noise_src)])
    dst = jnp.stack([p[2] for p in problems] + [jnp.array(noise_dst)])
    mask = jnp.stack([p[3] for p in problems] + [jnp.array(nm)])
    keys = jax.random.split(jax.random.PRNGKey(7), 6)
    out = rs.verify_pairs(src, dst, mask, keys, threshold=3.0, chunk=4)
    acc = np.array(out["accepted"])
    assert acc[:5].all()
    assert not acc[5]
    # H_inv is a real inverse
    eye = np.array(jnp.einsum("pij,pjk->pik", out["H"], out["H_inv"]))
    np.testing.assert_allclose(eye[:5], np.tile(np.eye(3), (5, 1, 1)), atol=1e-2)


def test_translation_median_refit_robust():
    # weighted-median refit (estimateTransformationRANSAC.m:410-439): a few
    # huge-residual points with small positive IRLS weight must not drag the
    # translation the way a weighted mean would
    src = jnp.array(np.random.default_rng(3).uniform(0, 100, (16, 2)), jnp.float32)
    dst = src + jnp.array([5.0, -3.0])
    dst = dst.at[0].add(jnp.array([500.0, 500.0]))  # gross outlier
    w = jnp.ones(16).at[0].set(0.2)
    H = geo.fit_translation(src, dst, w)
    np.testing.assert_allclose(np.array(H[:2, 2]), [5.0, -3.0], atol=1e-4)


def test_degenerate_minimal_sets_masked():
    # collinear triples / coincident pairs flagged; spread sets pass
    pts_ok = jnp.array([[[0.0, 0], [100, 0], [0, 100], [100, 100]]])
    pts_col = jnp.array([[[0.0, 0], [50, 50], [100, 100], [30, 90]]])  # 3 collinear
    assert not bool(rs._minimal_set_degenerate(pts_ok)[0])
    assert bool(rs._minimal_set_degenerate(pts_col)[0])
    two_same = jnp.array([[[10.0, 10], [10.0, 10.4]]])
    two_apart = jnp.array([[[10.0, 10], [90.0, 10]]])
    assert bool(rs._minimal_set_degenerate(two_same)[0])
    assert not bool(rs._minimal_set_degenerate(two_apart)[0])


def test_recovers_homography_with_collinear_contamination():
    # 30% of the matches lie on one line with inconsistent mappings
    # (estimateTransformationRANSAC.m:537-574 motivation): degeneracy
    # rejection keeps the estimator on the true model
    H_true, src, dst, mask = make_problem(7, n_inliers=60, n_outliers=10)
    r = np.random.default_rng(8)
    t = r.uniform(0, 1, 30)
    line = np.stack([t * 400, t * 400 * 0.5 + 20], -1).astype(np.float32)
    src_np, dst_np = np.array(src), np.array(dst)
    src_np[70:100] = line
    dst_np[70:100] = r.uniform(0, 400, (30, 2))
    res = rs.ransac_fit(
        jnp.array(src_np), jnp.array(dst_np), mask, jax.random.PRNGKey(2),
        threshold=3.0,
    )
    assert bool(res.success)
    err = geo.transfer_error(res.H, src[:60], dst[:60])
    assert float(jnp.median(err)) < 2.0


def test_num_trials_observed():
    # adaptive trial-count formula (estimateTransformationRANSAC.m:124-131)
    n = rs.num_trials_observed(99.9, "projective", np.array([0.3, 0.6, 0.9]), 500)
    assert n[0] == 500  # w=0.3 needs ~849, capped at max_iter
    assert 40 <= n[1] <= 60  # w=0.6 -> ~50
    assert n[2] <= 12  # w=0.9 -> ~9
    assert (np.diff(n) <= 0).all()  # monotone in w
    # degenerate ratios: zero ratio burns the full budget
    assert rs.num_trials_observed(99.9, "projective", np.array([0.0]), 256)[0] == 256
    assert rs.num_trials_observed(100.0, "projective", np.array([0.5]), 256)[0] == 256


def _verify_np(srcs, dsts, masks, keys, **kw):
    return rs.verify_pairs(
        np.asarray(srcs), np.asarray(dsts), np.asarray(masks),
        np.asarray(keys), threshold=3.0, **kw,
    )


def test_adaptive_exact_when_all_pairs_continue():
    """Hard pairs (inlier ratio ~0.3) never satisfy the confidence bound at
    the first-phase budget, so the adaptive path runs phase B for every
    pair — and must then be BIT-IDENTICAL to a single run of the full
    budget with the same sub-batch size (the continued-stream guarantee)."""
    problems = [make_problem(s, n_inliers=30, n_outliers=70) for s in range(4)]
    srcs = np.stack([np.asarray(p[1]) for p in problems])
    dsts = np.stack([np.asarray(p[2]) for p in problems])
    masks = np.stack([np.asarray(p[3]) for p in problems])
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(11), 4))
    single = _verify_np(srcs, dsts, masks, keys, batch=64, total=256,
                        adaptive_first=None)
    adaptive = _verify_np(srcs, dsts, masks, keys, batch=64, total=256,
                          adaptive_first=64, confidence=99.9)
    for k in single:
        np.testing.assert_array_equal(single[k], adaptive[k], err_msg=k)


def test_adaptive_same_acceptance_mixed_difficulty():
    """Easy pairs stop at the first-phase budget; the adaptive accepted set
    and inlier counts still match the full-budget run (easy pairs have
    already found the dominant consensus — extra hypotheses cannot flip
    Brown-Lowe acceptance)."""
    easy = [make_problem(s, n_inliers=80, n_outliers=20) for s in range(3)]
    # hard = low-but-acceptable inlier ratio: w ~ 0.45 needs ~165 trials at
    # 99.9% (> the 64 first-phase budget, so phase B runs) while still
    # passing Brown-Lowe acceptance (45 > 8 + 0.3 * 100)
    hard = [make_problem(s + 50, n_inliers=45, n_outliers=55) for s in range(2)]
    r = np.random.default_rng(4)
    noise_src = np.zeros((128, 2), np.float32)
    noise_dst = np.zeros((128, 2), np.float32)
    noise_src[:100] = r.uniform(0, 400, (100, 2))
    noise_dst[:100] = r.uniform(0, 400, (100, 2))
    nm = np.zeros(128, bool)
    nm[:100] = True
    probs = easy + hard
    srcs = np.stack([np.asarray(p[1]) for p in probs] + [noise_src])
    dsts = np.stack([np.asarray(p[2]) for p in probs] + [noise_dst])
    masks = np.stack([np.asarray(p[3]) for p in probs] + [nm])
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(13), 6))
    single = _verify_np(srcs, dsts, masks, keys, batch=64, total=256,
                        adaptive_first=None)
    adaptive = _verify_np(srcs, dsts, masks, keys, batch=64, total=256,
                          adaptive_first=64, confidence=99.9)
    np.testing.assert_array_equal(single["accepted"], adaptive["accepted"])
    assert adaptive["accepted"][:5].all() and not adaptive["accepted"][5]
    # inlier counts equal where phase B ran (hard + noise continue); easy
    # pairs may differ by the hypotheses they skipped, but only marginally
    assert (np.abs(single["num_inliers"].astype(int)
                   - adaptive["num_inliers"].astype(int)) <= 3).all()


def test_small_sample_perfect_consensus_acceptance():
    """A starved-texture pair with 10 putative matches, ALL inliers, fails
    the Brown-Lowe linear rule (10 < 8 + 0.3*10) but is overwhelming
    evidence of a true match (P(Binom(10, p0=0.1) >= 10) ~ 1e-10): the
    small-sample branch accepts it, a pure-noise small pair stays
    rejected, and accept_small_min=None reproduces exact reference
    behavior (imageMatching.m:150)."""
    cap = 128
    _, src, dst, _ = make_problem(11, n_inliers=10, n_outliers=0, noise=0.3)
    mask = np.zeros(cap, bool)
    mask[:10] = True
    # pure-noise small pair: 10 random correspondences
    r = np.random.default_rng(5)
    nsrc = np.zeros((cap, 2), np.float32)
    ndst = np.zeros((cap, 2), np.float32)
    nsrc[:10] = r.uniform(0, 400, (10, 2))
    ndst[:10] = r.uniform(0, 400, (10, 2))
    srcs = jnp.stack([src, jnp.array(nsrc)])
    dsts = jnp.stack([dst, jnp.array(ndst)])
    masks = jnp.stack([jnp.array(mask)] * 2)
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    with_branch = rs.verify_pairs(
        srcs, dsts, masks, keys, threshold=3.0,
        accept_small_min=8, accept_small_ratio=0.9,
    )
    acc = np.array(with_branch["accepted"])
    assert acc[0], np.array(with_branch["num_inliers"])
    assert not acc[1]
    reference = rs.verify_pairs(
        srcs, dsts, masks, keys, threshold=3.0, accept_small_min=None,
    )
    assert not np.array(reference["accepted"]).any()
