import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.ops import matching as mt


def make_descriptors(r, n, d=128):
    x = r.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestPairwiseSqdist:
    def test_matches_numpy(self):
        r = np.random.default_rng(0)
        a = make_descriptors(r, 40)
        b = make_descriptors(r, 30)
        d = np.array(mt.pairwise_sqdist(jnp.array(a), jnp.array(b)))
        ref = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, ref, atol=1e-4)


class TestMatchPair:
    def test_identical_descriptors_match(self):
        r = np.random.default_rng(1)
        da = make_descriptors(r, 64)
        perm = r.permutation(64)
        db = da[perm]  # image B has same features permuted
        mask = jnp.ones(64, bool)
        idx, m, n = mt.match_pair(jnp.array(da), mask, jnp.array(db), mask, ratio=0.8, max_matches=64)
        assert int(n) == 64
        idx = np.array(idx)[np.array(m)]
        # every match must map a -> its permuted position
        assert (perm[idx[:, 0]] == perm[idx[:, 0]]).all()
        for ia, ib in idx:
            assert perm[ib] == ia or np.allclose(da[ia], db[ib])

    def test_ratio_test_rejects_ambiguous(self):
        # two identical descriptors in target -> d1 == d2 -> ratio fails
        da = np.zeros((4, 8), np.float32)
        da[0, 0] = 1.0
        da[1, 1] = 1.0
        da[2, 2] = 1.0
        da[3, 3] = 1.0
        db = np.zeros((4, 8), np.float32)
        db[0, 0] = 1.0
        db[1, 0] = 1.0  # duplicate of db[0] -> queries matching it are ambiguous
        db[2, 2] = 1.0
        db[3, 3] = 1.0
        mask = jnp.ones(4, bool)
        idx, m, n = mt.match_pair(jnp.array(da), mask, jnp.array(db), mask, ratio=0.6, max_matches=4)
        matched_a = set(np.array(idx)[np.array(m)][:, 0].tolist())
        assert 0 not in matched_a  # ambiguous
        assert 2 in matched_a and 3 in matched_a

    def test_masked_rows_never_match(self):
        r = np.random.default_rng(2)
        da = make_descriptors(r, 16)
        db = da.copy()
        mask_a = jnp.array([True] * 8 + [False] * 8)
        mask_b = jnp.ones(16, bool)
        idx, m, n = mt.match_pair(jnp.array(da), mask_a, jnp.array(db), mask_b, ratio=0.9, max_matches=16)
        matched_a = np.array(idx)[np.array(m)][:, 0]
        assert (matched_a < 8).all()


class TestGlobalMatching:
    def _pooled(self, r, n_shared=2, n_images=3, per_image=32, d=32):
        """First n_shared images share (noisy copies of) the same features;
        remaining images get unrelated random features."""
        descs, ids, locs = [], [], []
        base = make_descriptors(r, per_image, d)
        for i in range(n_images):
            if i < n_shared:
                noisy = base + 0.01 * r.normal(size=base.shape).astype(np.float32)
                noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
            else:
                noisy = make_descriptors(r, per_image, d)
            descs.append(noisy)
            ids.append(np.full(per_image, i))
            locs.append(np.arange(per_image))
        return (
            np.concatenate(descs),
            np.concatenate(ids).astype(np.int32),
            np.concatenate(locs).astype(np.int32),
        )

    def test_knn_excludes_same_image(self):
        r = np.random.default_rng(3)
        desc, ids, locs = self._pooled(r)
        nn_idx, nn_dist = mt.global_knn(
            jnp.array(desc), jnp.ones(len(desc), bool), jnp.array(ids), k=4, block=32
        )
        nn_imgs = ids[np.array(nn_idx)]
        assert (nn_imgs != ids[:, None]).all()

    def test_global_pipeline_finds_pairs(self):
        r = np.random.default_rng(4)
        desc, ids, locs = self._pooled(r)
        mask = jnp.ones(len(desc), bool)
        nn_idx, nn_dist = mt.global_knn(jnp.array(desc), mask, jnp.array(ids), k=4, block=32)
        best, accepted = mt.global_ratio_test(nn_idx, nn_dist, ratio=0.8)
        pairs, pidx, pmask, counts = mt.global_matches_to_pairs(
            np.array(best), np.array(accepted), ids, locs, 3, max_matches=64
        )
        # the shared pair (0,1) must dominate
        assert counts[0, 1] > 16
        p01 = [p for p in range(len(pairs)) if tuple(pairs[p]) == (0, 1)][0]
        mi = pidx[p01][pmask[p01]]
        frac_same = (mi[:, 0] == mi[:, 1]).mean()
        assert frac_same > 0.9
        # unrelated image 2 contributes far fewer accepted matches
        assert counts[0, 2] + counts[1, 2] < counts[0, 1]

    def test_streaming_blocks_equal_single_block(self):
        r = np.random.default_rng(5)
        desc, ids, _ = self._pooled(r, n_images=2, per_image=48)
        mask = jnp.ones(len(desc), bool)
        i1, d1 = mt.global_knn(jnp.array(desc), mask, jnp.array(ids), k=2, block=16)
        i2, d2 = mt.global_knn(jnp.array(desc), mask, jnp.array(ids), k=2, block=96)
        np.testing.assert_array_equal(np.array(i1), np.array(i2))
        np.testing.assert_allclose(np.array(d1), np.array(d2), atol=1e-5)


class TestMatchAllPairs:
    def test_pairwise_mode_matches_pair_kernel(self):
        r = np.random.default_rng(7)
        N, K, D = 4, 48, 32
        base = make_descriptors(r, K, D)
        descs = np.stack([
            (base + 0.01 * r.normal(size=base.shape)).astype(np.float32)
            for _ in range(N)
        ])
        descs /= np.linalg.norm(descs, axis=-1, keepdims=True)
        mask = np.ones((N, K), bool)
        pairs, idx, m, n = mt.match_all_pairs(
            jnp.asarray(descs), jnp.asarray(mask), ratio=0.85, max_matches=K, chunk=4
        )
        pairs, n = np.asarray(pairs), np.asarray(n)
        assert pairs.shape == (6, 2)
        # each pair individually via match_pair must agree on counts
        for p, (i, j) in enumerate(pairs):
            _, _, n_ref = mt.match_pair(
                jnp.asarray(descs[i]), jnp.asarray(mask[i]),
                jnp.asarray(descs[j]), jnp.asarray(mask[j]),
                ratio=0.85, max_matches=K,
            )
            assert int(n_ref) == n[p]
        assert (n > K // 2).all()


class TestMatchPairList:
    def test_explicit_list_matches_all_pairs(self):
        """match_pair_list on the full triu list == match_all_pairs."""
        r = np.random.default_rng(9)
        N, K, D = 5, 32, 32
        descs = np.stack([make_descriptors(r, K, D) for _ in range(N)])
        mask = r.random((N, K)) < 0.9
        iu, ju = np.triu_indices(N, 1)
        plist = np.stack([iu, ju], 1).astype(np.int32)
        idx_l, m_l, n_l = mt.match_pair_list(
            jnp.asarray(descs), jnp.asarray(mask), jnp.asarray(plist),
            ratio=0.9, max_matches=K, chunk=4,
        )
        pairs, idx_a, m_a, n_a = mt.match_all_pairs(
            jnp.asarray(descs), jnp.asarray(mask), ratio=0.9, max_matches=K, chunk=4
        )
        np.testing.assert_array_equal(np.asarray(pairs), plist)
        np.testing.assert_array_equal(np.asarray(n_l), np.asarray(n_a))
        np.testing.assert_array_equal(np.asarray(m_l), np.asarray(m_a))
        np.testing.assert_array_equal(np.asarray(idx_l), np.asarray(idx_a))

    def test_subset_rows_align_with_input_order(self):
        r = np.random.default_rng(10)
        N, K, D = 4, 24, 16
        descs = np.stack([make_descriptors(r, K, D) for _ in range(N)])
        mask = np.ones((N, K), bool)
        plist = np.array([[2, 3], [0, 1]], np.int32)  # arbitrary order
        idx, m, n = mt.match_pair_list(
            jnp.asarray(descs), jnp.asarray(mask), jnp.asarray(plist),
            ratio=0.95, max_matches=K,
        )
        for row, (i, j) in enumerate(plist):
            _, _, n_ref = mt.match_pair(
                jnp.asarray(descs[i]), jnp.asarray(mask[i]),
                jnp.asarray(descs[j]), jnp.asarray(mask[j]),
                ratio=0.95, max_matches=K,
            )
            assert int(n_ref) == int(np.asarray(n)[row])


class TestKnnVotes:
    def test_votes_count_cross_image_neighbours(self):
        # 2 images x 2 features; queries of image 0 both point at image 1
        nn_idx = np.array([[2, 3], [3, 2], [0, 1], [1, 3]], np.int32)
        nn_dist = np.full((4, 2), 0.5, np.float32)
        nn_dist[3, 1] = 1e18  # masked neighbour: no vote
        image_id = np.array([0, 0, 1, 1], np.int32)
        votes = mt.knn_votes(nn_idx, nn_dist, image_id, 2)
        # image0->image1: 4 votes; image1->image0: q2 both cols + q3 col0 = 3
        assert votes[0, 1] == votes[1, 0] == 4 + 3
        assert votes[0, 0] == 0 and votes[1, 1] == 0

    def test_starved_overlap_still_ranked(self):
        """Near-duplicate descriptors: ratio test would starve, votes don't."""
        r = np.random.default_rng(3)
        base = make_descriptors(r, 20, 16)
        # three images of the SAME content: every NN is cross-image identical
        desc = np.concatenate([base, base, base])
        ids = np.repeat(np.arange(3, dtype=np.int32), 20)
        mask = jnp.ones(60, bool)
        nn_idx, nn_dist = mt.global_knn(
            jnp.asarray(desc), mask, jnp.asarray(ids), k=2, block=60
        )
        _, accepted = mt.global_ratio_test(nn_idx, nn_dist, ratio=0.6)
        assert int(np.asarray(accepted).sum()) == 0  # fully starved
        votes = mt.knn_votes(nn_idx, nn_dist, ids, 3)
        assert (votes[np.triu_indices(3, 1)] > 0).all()


class TestPallasMatcher:
    def test_two_nn_pallas_matches_numpy(self):
        """Pallas streaming 2-NN kernel (interpret mode) is exact."""
        from autopanostitch_tpu.ops.pallas.match_kernel import two_nn_pallas

        r = np.random.default_rng(11)
        q = r.normal(size=(200, 128)).astype(np.float32)
        t = r.normal(size=(500, 128)).astype(np.float32)
        qid = r.integers(0, 3, 200).astype(np.int32)
        tid = r.integers(0, 3, 500).astype(np.int32)
        idx, d1, d2 = map(
            np.asarray,
            two_nn_pallas(
                jnp.asarray(q), jnp.asarray(qid), jnp.asarray(t), jnp.asarray(tid),
                interpret=True,
            ),
        )
        dist = ((q[:, None] - t[None]) ** 2).sum(-1)
        dist[qid[:, None] == tid[None, :]] = 1e18
        np.testing.assert_array_equal(idx, dist.argmin(1))
        np.testing.assert_allclose(d1, dist.min(1), atol=1e-3)
        np.testing.assert_allclose(d2, np.partition(dist, 1, axis=1)[:, 1], atol=1e-3)

    def test_self_exclusion(self):
        from autopanostitch_tpu.ops.pallas.match_kernel import two_nn_pallas

        r = np.random.default_rng(12)
        d = r.normal(size=(100, 128)).astype(np.float32)
        ids = np.arange(100, dtype=np.int32) % 50  # pairs share image ids
        idx, d1, _ = map(
            np.asarray,
            two_nn_pallas(
                jnp.asarray(d), jnp.asarray(ids), jnp.asarray(d), jnp.asarray(ids),
                jnp.arange(100, dtype=jnp.int32), interpret=True,
            ),
        )
        assert (idx != np.arange(100)).all()  # never self
        assert (ids[idx] != ids).all()  # never same image
