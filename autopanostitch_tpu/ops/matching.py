"""Descriptor matching as MXU matmuls + top-k, replacing the reference's
FLANN KD-tree / LSH / exhaustive MEX kernels.

On TPU, the exact all-pairs squared distance
    ||a - b||^2 = ||a||^2 + ||b||^2 - 2 a.b
is a single large matmul on the systolic array and beats approximate
structures outright — this is the TPU-native equivalent of:
- `mex/flann_knn.cpp` (FLANN KD-tree / LSH kNN)
- `featureMatching/matchFeaturesScratch.m:322-366` (blocked-GEMM SSD 2-NN)
- `mex/nearest2HammingExhaustiveMEX.cpp` (Hamming 2-NN, see `hamming.py`)

Two entry points mirroring the reference's two matching modes:
- :func:`match_pair` — pairwise 2-NN + Lowe ratio + mutual uniqueness
  (`featureMatching/featureMatchingPairwise.m`, `matchFeaturesScratch.m`)
- :func:`global_knn` + :func:`global_matches_to_pairs` — AutoStitch-style
  pooled global matching (`featureMatching/featureMatchingGlobal.m`).

All inputs are fixed-capacity padded tensors with boolean masks; invalid
rows never produce matches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# numpy scalar, not jnp: a module-level jnp constant compiles a tiny
# convert_element_type executable at import (one relay AOT round-trip)
_BIG = np.float32(1e18)


def pairwise_sqdist(a: Array, b: Array, compute_dtype=jnp.float32) -> Array:
    """Squared L2 distances (Ma, D) x (Mb, D) -> (Ma, Mb) on the MXU.

    The cross-term matmul may run in bf16 (`compute_dtype`) with f32
    accumulation; norms are always f32.
    """
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    na = jnp.sum(a32 * a32, axis=-1, keepdims=True)  # (Ma, 1)
    nb = jnp.sum(b32 * b32, axis=-1, keepdims=True).T  # (1, Mb)
    ab = jax.lax.dot_general(
        a.astype(compute_dtype),
        b.astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(na + nb - 2.0 * ab, 0.0)


def _top_k_small(x: Array, k: int):
    """Exact top-k over the last axis. Plain `lax.top_k` — measured best
    on-chip at (1024, 50k+): 70 ms/51 blocks vs 240 ms for k iterative
    (max, argmax, mask-out) passes (the scatter breaks fusion) and
    560 ms for a two-level 128-segment hierarchy (tiny sorts vectorize
    badly on the VPU)."""
    return jax.lax.top_k(x, k)


def two_nn(
    desc_q: Array,
    mask_q: Array,
    desc_t: Array,
    mask_t: Array,
    compute_dtype=jnp.float32,
):
    """Exact 2-nearest-neighbour in SSD space.

    Returns (idx1 (Mq,), d1 (Mq,), d2 (Mq,)) — best target index, best and
    second-best squared distances. Masked-out queries/targets get _BIG.
    """
    d = pairwise_sqdist(desc_q, desc_t, compute_dtype)
    d = jnp.where(mask_t[None, :], d, _BIG)
    neg_top2, idx_top2 = jax.lax.top_k(-d, 2)
    d1 = -neg_top2[:, 0]
    d2 = -neg_top2[:, 1]
    idx1 = idx_top2[:, 0]
    d1 = jnp.where(mask_q, d1, _BIG)
    d2 = jnp.where(mask_q, d2, _BIG)
    return idx1, d1, d2


@partial(jax.jit, static_argnames=("max_matches", "binary", "compute_dtype"))
def match_pair(
    desc_a: Array,
    mask_a: Array,
    desc_b: Array,
    mask_b: Array,
    ratio: float = 0.6,
    max_matches: int = 512,
    threshold: float = float("inf"),
    binary: bool = False,
    compute_dtype: str = "float32",
):
    """Match two descriptor sets: 2-NN, Lowe ratio + threshold, uniqueness.

    Float descriptors: the ratio test compares squared distances against
    ratio^2 and the threshold cuts raw SSD (the reference compares SSD
    against r^2 and `dBest <= MatchThreshold`,
    `matchFeaturesScratch.m:169-178`). Binary ({0,1}) descriptors: squared
    L2 IS the Hamming distance, so the ratio is applied linearly and the
    threshold is percent mismatched bits (`matchFeaturesScratch.m:171,120`).
    Uniqueness uses mutual-nearest consistency instead of the reference's
    greedy distance-sorted dedup (`matchFeaturesScratch.m:186-211`) — a
    stricter, fully-parallel criterion.

    Returns:
      idx:  (max_matches, 2) int32 [ia, ib] local index pairs (padded 0)
      m:    (max_matches,) bool validity
      n:    () int32 number of valid matches
    """
    cdt = jnp.dtype(compute_dtype)
    ia2b, d1_ab, d2_ab = two_nn(desc_a, mask_a, desc_b, mask_b, cdt)
    ib2a, _, _ = two_nn(desc_b, mask_b, desc_a, mask_a, cdt)

    if binary:
        pass_ratio = d1_ab <= ratio * d2_ab  # raw Hamming: linear ratio
        thresh_cut = (threshold / 100.0) * desc_a.shape[-1]
    else:
        pass_ratio = d1_ab < (ratio * ratio) * d2_ab
        thresh_cut = threshold
    mutual = ib2a[ia2b] == jnp.arange(desc_a.shape[0])
    ok = pass_ratio & (d1_ab <= thresh_cut) & mutual & mask_a & (d1_ab < _BIG)

    # compact accepted matches to the front, ordered by ascending distance
    order_key = jnp.where(ok, d1_ab, _BIG)
    order = jnp.argsort(order_key)
    Ma = desc_a.shape[0]
    take = min(max_matches, Ma)
    sel = order[:take]
    idx = jnp.stack([sel, ia2b[sel]], axis=-1).astype(jnp.int32)
    m = ok[sel]
    if take < max_matches:
        idx = jnp.pad(idx, ((0, max_matches - take), (0, 0)))
        m = jnp.pad(m, (0, max_matches - take))
    idx = jnp.where(m[:, None], idx, 0)
    return idx, m, jnp.sum(ok.astype(jnp.int32))


@partial(
    jax.jit,
    static_argnames=(
        "max_matches", "ratio", "chunk", "threshold", "binary", "compute_dtype",
    ),
)
def match_pair_list(
    desc: Array,  # (N, K, D)
    mask: Array,  # (N, K)
    pairs: Array,  # (P, 2) int32 image index pairs
    ratio: float = 0.6,
    max_matches: int = 512,
    chunk: int = 16,
    threshold: float = float("inf"),
    binary: bool = False,
    compute_dtype: str = "float32",
):
    """Pairwise matching restricted to an explicit (P, 2) pair list.

    The bounded-candidate form of :func:`match_all_pairs`: pair index
    arrays are gathered per chunk and matched with the vmapped 2-NN kernel
    under lax.scan (bounds memory to chunk x K x K). Used by the scalable
    pairwise rescue, which re-matches only the top-m kNN-vote neighbours
    per image instead of all N(N-1)/2 pairs — O(N*m) pairs at any N.

    Returns (idx (P, max_matches, 2), m (P, max_matches), counts (P,))
    aligned with the input pair list.
    """
    P = pairs.shape[0]
    nchunks = (P + chunk - 1) // chunk
    Ppad = nchunks * chunk
    ij = jnp.pad(pairs, ((0, Ppad - P), (0, 0)))

    def one(i, j):
        return match_pair(
            desc[i], mask[i], desc[j], mask[j], ratio=ratio,
            max_matches=max_matches, threshold=threshold, binary=binary,
            compute_dtype=compute_dtype,
        )

    def step(_, ij_c):
        idx, m, n = jax.vmap(one)(ij_c[:, 0], ij_c[:, 1])
        return None, (idx, m, n)

    _, (idx, m, n) = jax.lax.scan(step, None, ij.reshape(nchunks, chunk, 2))
    return (
        idx.reshape(Ppad, max_matches, 2)[:P],
        m.reshape(Ppad, max_matches)[:P],
        n.reshape(Ppad)[:P],
    )


def match_all_pairs(
    desc: Array,  # (N, K, D)
    mask: Array,  # (N, K)
    ratio: float = 0.6,
    max_matches: int = 512,
    chunk: int = 16,
    threshold: float = float("inf"),
    binary: bool = False,
    compute_dtype: str = "float32",
):
    """Pairwise matching over every (i < j) image pair in one program.

    The TPU replacement for the reference's parfor over upper-triangular
    pairs (`featureMatching/featureMatchingPairwise.m:47-59`).

    Returns (pairs (P,2) int32, idx (P, max_matches, 2), m (P, max_matches),
    counts (P,)) with P = N(N-1)/2 in lexicographic order.
    """
    N = desc.shape[0]
    iu, ju = np.triu_indices(N, 1)
    pairs = jnp.asarray(np.stack([iu, ju], -1).astype(np.int32))
    idx, m, n = match_pair_list(
        desc, mask, pairs, ratio=ratio, max_matches=max_matches, chunk=chunk,
        threshold=threshold, binary=binary, compute_dtype=compute_dtype,
    )
    return pairs, idx, m, n


def knn_votes(
    nn_idx: np.ndarray, nn_dist: np.ndarray, image_id: np.ndarray, n_images: int
) -> np.ndarray:
    """(N, N) symmetric cross-image kNN vote counts BEFORE the ratio test.

    votes[i, j] = how many (query feature in image i) x (one of its k
    nearest cross-image neighbours in image j) events the pooled kNN
    produced. The pooled ratio test starves near-duplicate / repeated-
    structure pairs precisely BECAUSE the top neighbours concentrate in
    the overlapping images (`featureMatchingGlobal.m:122-147` has the same
    failure mode), so the raw vote matrix remains a strong overlap signal
    when putative counts collapse — it ranks candidate pairs for the
    scalable pairwise rescue. Host numpy: O(F*k) control-plane work.
    """
    nn_idx = np.asarray(nn_idx)
    nn_dist = np.asarray(nn_dist)
    image_id = np.asarray(image_id)
    valid = nn_dist < 1e17  # masked queries/targets carry _BIG
    ti = image_id[nn_idx]
    qi = np.broadcast_to(image_id[:, None], ti.shape)
    votes = np.zeros((n_images, n_images), np.int64)
    np.add.at(votes, (qi[valid], ti[valid]), 1)
    votes = votes + votes.T
    np.fill_diagonal(votes, 0)
    return votes.astype(np.int32)


@partial(jax.jit, static_argnames=("k", "block", "method", "compute_dtype"))
def global_knn(
    desc: Array,
    mask: Array,
    image_id: Array,
    k: int = 4,
    block: int = 1024,
    method: str = "exhaustive",
    compute_dtype: str = "float32",
):
    """Pooled self-kNN over ALL images' descriptors (AutoStitch global match).

    Equivalent of the single global `flann_knn_win` query in
    `featureMatchingGlobal.m:104-120`: the pooled descriptor matrix is
    multiplied against itself in query blocks (streaming top-k so the full
    F x F distance matrix never materializes).

    method='exhaustive' (default, `inputs.m:48`) is exact.
    method='approximate' is the TPU analog of the reference's FLANN
    approximate mode: queries are first scored in a 32-d random-projection
    sketch (4x less MXU work for D=128), the top 8k sketch candidates per
    query are re-ranked with exact distances. Johnson-Lindenstrauss keeps
    the true neighbours in the candidate set with high probability; like
    FLANN, recall is high but not guaranteed.

    Self-matches and same-image neighbours are excluded BEFORE top-k (the
    reference filters after, `featureMatchingGlobal.m:122-147`; excluding
    first is equivalent given enough k but exact for the ratio test).

    Args:
      desc: (F, D) pooled descriptors. mask: (F,). image_id: (F,) int32.
      k: neighbours to keep. block: query rows per step.

    Returns:
      nn_idx (F, k) int32, nn_dist (F, k) f32 ascending (masked -> _BIG).
    """
    F, D = desc.shape
    cdt = jnp.dtype(compute_dtype)
    nblocks = (F + block - 1) // block
    Fpad = nblocks * block
    desc_q = jnp.pad(desc, ((0, Fpad - F), (0, 0)))
    id_q = jnp.pad(image_id, (0, Fpad - F), constant_values=-1)
    mask_q = jnp.pad(mask, (0, Fpad - F))

    approx = method == "approximate" and D > 32
    if approx:
        # fixed random projection (deterministic; data-independent)
        G = jax.random.normal(jax.random.PRNGKey(12345), (D, 32), desc.dtype)
        G = G / jnp.sqrt(32.0)
        desc_s = desc @ G  # (F, 32) sketch
        desc_qs = jnp.pad(desc_s, ((0, Fpad - F), (0, 0)))
        n_cand = min(8 * k, F)

    def step(carry, qb):
        dq, dqs, iq, mq = qb
        same_img = iq[:, None] == image_id[None, :]
        bad = same_img | ~mask[None, :] | ~mq[:, None]
        if approx:
            d_s = pairwise_sqdist(dqs, desc_s, cdt)  # (block, F) sketch
            d_s = jnp.where(bad, _BIG, d_s)
            _, cand = jax.lax.top_k(-d_s, n_cand)  # (block, C)
            dc = desc[cand]  # (block, C, D)
            qn = jnp.sum(dq.astype(jnp.float32) ** 2, -1, keepdims=True)
            tn = jnp.sum(dc.astype(jnp.float32) ** 2, -1)
            qt = jnp.einsum(
                "bd,bcd->bc", dq.astype(cdt), dc.astype(cdt),
                preferred_element_type=jnp.float32,
            )
            d_ex = jnp.maximum(qn + tn - 2.0 * qt, 0.0)
            cand_bad = jnp.take_along_axis(d_s, cand, 1) >= _BIG
            d_ex = jnp.where(cand_bad, _BIG, d_ex)
            neg_top, ii = jax.lax.top_k(-d_ex, k)
            idx = jnp.take_along_axis(cand, ii, 1)
        else:
            d = pairwise_sqdist(dq, desc, cdt)  # (block, F)
            d = jnp.where(bad, _BIG, d)
            neg_top, idx = _top_k_small(-d, k)
        return carry, (idx.astype(jnp.int32), -neg_top)

    q_blocks = (
        desc_q.reshape(nblocks, block, -1),
        (desc_qs if approx else desc_q[:, :1]).reshape(nblocks, block, -1),
        id_q.reshape(nblocks, block),
        mask_q.reshape(nblocks, block),
    )
    _, (nn_idx, nn_dist) = jax.lax.scan(step, None, q_blocks)
    return nn_idx.reshape(Fpad, k)[:F], nn_dist.reshape(Fpad, k)[:F]


@partial(jax.jit, static_argnames=(
    "k", "block", "method", "compute_dtype", "ratio", "binary"))
def global_match_stack(
    desc: Array,  # (N, K, D) per-image descriptor stack
    mask: Array,  # (N, K)
    k: int = 4,
    block: int = 1024,
    method: str = "exhaustive",
    compute_dtype: str = "float32",
    ratio: float = 0.6,
    binary: bool = False,
):
    """Pool + global kNN + ratio test in ONE executable.

    Fuses the eager glue around :func:`global_knn` (reshapes, image-id
    iota, ratio comparisons) that otherwise costs ~10 separate relay AOT
    round-trips per fresh (N, K, D) shape. Returns
    (nn_idx (F, k), nn_dist (F, k), best (F,), accepted (F,)) with
    F = N * K; the host keeps image_id/local_idx as numpy.
    """
    N, K, D = desc.shape
    image_id = jnp.repeat(jnp.arange(N, dtype=jnp.int32), K)
    nn_idx, nn_dist = global_knn(
        desc.reshape(N * K, D), mask.reshape(N * K), image_id,
        k=k, block=block, method=method, compute_dtype=compute_dtype,
    )
    best, accepted = global_ratio_test(nn_idx, nn_dist, ratio=ratio, binary=binary)
    return nn_idx, nn_dist, best, accepted


def global_ratio_test(
    nn_idx: Array, nn_dist: Array, ratio: float = 0.6, binary: bool = False
):
    """Per-query cross-image Lowe ratio test on global kNN results.

    Brown-Lowe global matching (`featureMatchingGlobal.m:123-147`): the best
    cross-image neighbour is accepted iff it beats the second-best
    cross-image neighbour by the ratio. Same-image neighbours were already
    excluded in :func:`global_knn`, so columns 0/1 are exactly the
    reference's post-filter best/second.

    The ratio is applied in Euclidean-distance space (d1 < r^2 * d2 on
    squared distances), matching `matchFeaturesScratch.m:169-175`. Note the
    reference's *global* path divides FLANN's squared distances by the raw
    ratio (`featureMatchingGlobal.m:145`), which silently corresponds to a
    Euclidean ratio of sqrt(0.6) ~ 0.77 — we treat that as a bug and use the
    consistent semantics.

    For binary ({0,1}) descriptors the squared L2 distances ARE raw Hamming
    distances, so the ratio is applied linearly (the reference binary path
    ratio-tests raw distances, `matchFeaturesScratch.m:171`).

    Returns (target (F,), accepted (F,)) — target feature index per query.
    """
    best = nn_idx[:, 0]
    d1 = nn_dist[:, 0]
    d2 = nn_dist[:, 1]
    r = ratio if binary else ratio * ratio
    accepted = (d1 < r * d2) & (d1 < _BIG)
    return best, accepted


def global_matches_to_pairs(
    best: np.ndarray,
    accepted: np.ndarray,
    image_id: np.ndarray,
    local_idx: np.ndarray,
    n_images: int,
    max_matches: int,
):
    """Host-side assembly of global matches into per-pair fixed-capacity lists.

    Mirrors the accumulation into the upper-triangular N x N cell array
    (`featureMatchingGlobal.m:149-160`). Control-plane work on O(F) data —
    numpy on host, not worth a device kernel.

    Returns:
      pairs:      (P, 2) int32 (i, j) with i < j, only pairs with >=1 match
      pair_idx:   (P, max_matches, 2) int32 local [idx_in_i, idx_in_j]
      pair_mask:  (P, max_matches) bool
      counts_full:(N, N) int32 symmetric putative counts
    """
    best = np.asarray(best)
    accepted = np.asarray(accepted).astype(bool)
    image_id = np.asarray(image_id)
    local_idx = np.asarray(local_idx)

    q = np.nonzero(accepted)[0]
    t = best[q]
    qi, ti = image_id[q], image_id[t]
    ql, tl = local_idx[q], local_idx[t]
    # orient each match to (i < j)
    swap = qi > ti
    i_img = np.where(swap, ti, qi)
    j_img = np.where(swap, qi, ti)
    i_loc = np.where(swap, tl, ql)
    j_loc = np.where(swap, ql, tl)
    keep = i_img != j_img
    i_img, j_img, i_loc, j_loc = i_img[keep], j_img[keep], i_loc[keep], j_loc[keep]

    key = i_img.astype(np.int64) * n_images + j_img
    # dedup (a match can be found from both directions)
    pair_and_feats = np.stack([key, i_loc, j_loc], axis=1)
    pair_and_feats = np.unique(pair_and_feats, axis=0)
    key, i_loc, j_loc = pair_and_feats.T

    uniq_keys, start_idx, counts = np.unique(key, return_index=True, return_counts=True)
    P = len(uniq_keys)
    pairs = np.stack([uniq_keys // n_images, uniq_keys % n_images], axis=1).astype(np.int32)
    pair_idx = np.zeros((P, max_matches, 2), np.int32)
    pair_mask = np.zeros((P, max_matches), bool)
    counts_full = np.zeros((n_images, n_images), np.int32)
    for p in range(P):
        s = start_idx[p]
        c = min(int(counts[p]), max_matches)
        pair_idx[p, :c, 0] = i_loc[s : s + c]
        pair_idx[p, :c, 1] = j_loc[s : s + c]
        pair_mask[p, :c] = True
        i, j = pairs[p]
        counts_full[i, j] = counts_full[j, i] = int(counts[p])
    return pairs, pair_idx, pair_mask, counts_full
