"""End-to-end stitching pipeline (the `main.m` equivalent).

Stage flow mirrors the reference driver (`main.m:83-138`):
  load -> extract features -> match features (global|pairwise) ->
  image matching (RANSAC/MLESAC + Brown-Lowe acceptance) ->
  panorama discovery (connected components) -> bundle adjust ->
  straighten -> render -> blend -> crop.

Device/host split: all O(pixels)/O(features) math is jitted JAX; the tiny
control plane (candidate pair selection, connected components, canvas
sizing) runs on host numpy, mirroring the reference's cheap MATLAB glue.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.config import StitchConfig
from autopanostitch_tpu.models import annotate as annotate_stage
from autopanostitch_tpu.models import bundle as bundle_stage
from autopanostitch_tpu.models import bundle_h as bundle_h_stage
from autopanostitch_tpu.models import crop as crop_stage
from autopanostitch_tpu.models import features as features_stage
from autopanostitch_tpu.models import gain as gain_stage
from autopanostitch_tpu.models import planar as planar_stage
from autopanostitch_tpu.models import render as render_stage
from autopanostitch_tpu.models import straighten as straighten_stage
from autopanostitch_tpu.ops import matching as mt
from autopanostitch_tpu.utils import buckets
from autopanostitch_tpu.ops import ransac as rs
from autopanostitch_tpu.ops import sampling as samp_ops
from autopanostitch_tpu.ops.sift import SiftFeatures
from autopanostitch_tpu.utils.image_io import ImageSet


@dataclasses.dataclass
class MatchGraph:
    """Verified image-match graph (reference `imageMatching.m` outputs)."""

    pairs: np.ndarray  # (P, 2) candidate pairs (i < j)
    pair_idx: np.ndarray  # (P, M, 2) local feature index pairs
    pair_mask: np.ndarray  # (P, M)
    H: np.ndarray  # (P, 3, 3) homography i -> j
    inliers: np.ndarray  # (P, M) bool
    num_inliers: np.ndarray  # (P,)
    accepted: np.ndarray  # (P,) bool
    counts: np.ndarray  # (N, N) putative counts


@jax.jit
def _to_float(raw):
    return raw.astype(jnp.float32) / 255.0


def host_prng_key(seed: int) -> jax.Array:
    """`jax.random.PRNGKey(seed)` built on HOST (value-identical threefry
    key data, `[seed >> 32, seed & 0xffffffff]`): the eager PRNGKey costs
    two compiled executables — two relay AOT round-trips per process."""
    return jnp.asarray(
        np.array([(seed >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF], np.uint32)
    )


@jax.jit
def _gather_members(images_dev, feathers_dev, members):
    """Member-row gather as ONE executable (the eager `x[idx]` pair cost
    ~8 tiny executables per fresh component shape)."""
    return images_dev[members], feathers_dev[members]


def _extract(image_set: ImageSet, cfg: StitchConfig):
    """(features, float image stack on device). Host numpy stacks go
    through the upload-overlapped streamed path (async per-group
    device_put hides part of the host->device transfer under extraction);
    already-device-resident stacks extract directly."""
    imgs_in = image_set.images
    if isinstance(imgs_in, np.ndarray):
        return features_stage.extract_features_streamed(
            imgs_in, image_set.sizes, cfg.detector
        )
    dev = _to_float(imgs_in) if imgs_in.dtype == jnp.uint8 else imgs_in
    return features_stage.extract_features(dev, image_set.sizes, cfg.detector), dev


def _matcher_semantics(cfg: StitchConfig):
    """(threshold, binary) for the descriptor type of cfg.detector.

    Binary corner detectors produce {0,1} descriptors whose squared L2 IS
    the Hamming distance, so the matchers switch to linear-ratio and
    percent-bits threshold semantics (`matchFeaturesScratch.m:93-100,
    169-178`). threshold=None maps to the scratch matcher's per-type
    defaults: no cut for float, 10 percent mismatched bits for binary."""
    binary = cfg.detector.detector.upper() in ("HARRIS", "FAST", "ORB", "BRISK")
    threshold = cfg.matching.threshold
    if threshold is None:
        threshold = 10.0 if binary else float("inf")
    return float(threshold), binary


def match_features(feats: SiftFeatures, cfg: StitchConfig, return_votes=False):
    """Feature matching stage producing per-pair putative match lists.

    Global pooled mode (`featureMatchingGlobal.m`, default) or pairwise mode
    (`featureMatchingPairwise.m`, `inputs.m:46 matchFeaturesPairwise`).
    Returns (pairs, pair_idx, pair_mask, counts); with return_votes=True a
    fifth element — the raw (N, N) pre-ratio kNN vote matrix
    (`ops.matching.knn_votes`) in global mode, the putative counts in
    pairwise mode (no pooled starvation there) — used by the scalable
    pairwise rescue's candidate selection."""
    N, K, D = feats.desc.shape
    threshold, binary = _matcher_semantics(cfg)

    if cfg.matching.match_pairwise:
        pairs, idx, m, n = mt.match_all_pairs(
            feats.desc,
            feats.mask,
            ratio=cfg.matching.ratio_threshold,
            max_matches=cfg.matching.max_matches_per_pair,
            threshold=threshold,
            binary=binary,
            compute_dtype=cfg.tpu.compute_dtype,
        )
        pairs = np.asarray(pairs)
        n = np.asarray(n)
        counts = np.zeros((N, N), np.int32)
        counts[pairs[:, 0], pairs[:, 1]] = n
        counts += counts.T
        keep = n > 0
        out = (pairs[keep], np.asarray(idx)[keep], np.asarray(m)[keep], counts)
        return out + (counts,) if return_votes else out

    # ONE fused executable for pool + kNN + ratio test; the id/index
    # bookkeeping stays host-side numpy (control plane, no device ops).
    # The image axis is padded to a shape BUCKET (utils/buckets.py) so
    # same-sized datasets share this — the most expensive matcher —
    # executable (a 38- and a 35-photo sheet both run the N=40 program);
    # padded rows carry mask=False and are excluded inside the kernel.
    Nb = buckets.bucket(N)
    desc_b, mask_b = feats.desc, feats.mask
    if Nb != N:
        desc_b = jnp.pad(desc_b, ((0, Nb - N), (0, 0), (0, 0)))
        mask_b = jnp.pad(mask_b, ((0, Nb - N), (0, 0)))
    nn_idx, nn_dist, best, accepted = mt.global_match_stack(
        desc_b, mask_b, k=cfg.matching.k, block=cfg.tpu.match_block,
        method=cfg.matching.method, compute_dtype=cfg.tpu.compute_dtype,
        ratio=cfg.matching.ratio_threshold, binary=binary,
    )
    F = N * K
    image_id = np.repeat(np.arange(N, dtype=np.int32), K)
    local_idx = np.tile(np.arange(K, dtype=np.int32), N)
    # neighbour indices can point at padded (masked) pool rows when a
    # query has fewer than k valid candidates; those entries carry _BIG
    # distance and never pass the ratio test — clip so host fancy
    # indexing stays in bounds
    best_h = np.clip(np.asarray(best)[:F], 0, max(F - 1, 0))
    out = mt.global_matches_to_pairs(
        best_h,
        np.asarray(accepted)[:F],
        image_id,
        local_idx,
        N,
        cfg.matching.max_matches_per_pair,
    )
    if return_votes:
        # LAZY: the vote matrix is only consulted when discovery
        # fragments (see _rescue_suspicious early-outs), and pulling the
        # (F, k) neighbour arrays through the relay costs ~0.1 s — so the
        # healthy-panorama path never pays for it
        memo = {}

        def votes_fn():
            if "v" not in memo:
                memo["v"] = mt.knn_votes(
                    np.clip(np.asarray(nn_idx)[:F], 0, max(F - 1, 0)),
                    np.asarray(nn_dist)[:F], image_id, N,
                )
            return memo["v"]

        return out + (votes_fn,)
    return out


def select_candidate_pairs(pairs, pair_idx, pair_mask, counts, m: int):
    """Brown-Lowe top-m candidate pair filter (`imageMatching.m:76-99`)."""
    n = counts.shape[0]
    sym = counts.copy()
    np.fill_diagonal(sym, 0)
    cand = np.zeros((n, n), bool)
    top = np.argsort(-sym, axis=1)[:, : min(m, n - 1)]
    for i in range(n):
        for j in top[i]:
            if sym[i, j] > 0:
                cand[i, j] = True
    cand = cand | cand.T
    keep = np.array([bool(cand[i, j]) for i, j in pairs])
    return pairs[keep], pair_idx[keep], pair_mask[keep]


# Brown-Lowe model-dependent acceptance constants `ni > alpha + beta * nf`
# (`imageMatching.m:38-42`), auto-dispatched on transformation_type when the
# config leaves accept_alpha/accept_beta at None.
_ACCEPT_CONSTANTS = {
    "projective": (8.0, 0.3),
    "affine": (5.0, 0.15),
    "similarity": (5.0, 0.025),
    "rigid": (5.0, 0.025),
    "translation": (5.0, 0.025),
}


def _acceptance(im) -> tuple:
    a, b = _ACCEPT_CONSTANTS[im.transformation_type]
    if im.accept_alpha is not None:
        a = im.accept_alpha
    if im.accept_beta is not None:
        b = im.accept_beta
    return a, b


def verify_matches(
    feats: SiftFeatures,
    pairs: np.ndarray,
    pair_idx: np.ndarray,
    pair_mask: np.ndarray,
    counts: np.ndarray,
    cfg: StitchConfig,
    key: jax.Array,
) -> MatchGraph:
    """RANSAC/MLESAC verification of candidate pairs (`imageMatching.m:121-166`)."""
    xy = np.asarray(feats.xy)  # (N, K, 2)
    P, M, _ = pair_idx.shape
    src = xy[pairs[:, 0][:, None], pair_idx[:, :, 0]]  # (P, M, 2)
    dst = xy[pairs[:, 1][:, None], pair_idx[:, :, 1]]
    # split to a BUCKETED count (threefry splits are prefix-stable, so the
    # first P keys are identical for any padded count) — one split
    # executable per bucket instead of per distinct pair count
    nb = max(64, ((P + 63) // 64) * 64)
    keys = np.asarray(jax.random.split(key, nb))[: max(P, 1)]
    im = cfg.image_match
    alpha, beta = _acceptance(im)
    out = rs.verify_pairs(
        src,
        dst,
        np.asarray(pair_mask),
        keys,
        threshold=im.max_distance,
        model=im.transformation_type,
        method=im.method,
        batch=im.ransac_batch,
        accept_alpha=alpha,
        accept_beta=beta,
        accept_small_min=im.accept_small_min,
        accept_small_ratio=im.accept_small_ratio,
        total=rs.num_trials(im.inliers_confidence, im.transformation_type,
                            im.max_iter),
        adaptive_first=im.adaptive_first_batch,
        confidence=im.inliers_confidence,
    )
    return MatchGraph(
        pairs=pairs,
        pair_idx=pair_idx,
        pair_mask=pair_mask,
        H=np.asarray(out["H"]),
        inliers=np.asarray(out["inliers"]),
        num_inliers=np.asarray(out["num_inliers"]),
        accepted=np.asarray(out["accepted"]),
        counts=counts,
    )


def _votes_arr(votes):
    """Resolve a votes argument: None | (N, N) ndarray | zero-arg callable
    returning one (the lazy global-matcher form — see match_features)."""
    if callable(votes):
        return votes()
    return votes


def _vote_candidate_pairs(votes: np.ndarray, m: int) -> np.ndarray:
    """Top-m neighbours per image by kNN votes -> (P, 2) i<j pair list."""
    n = votes.shape[0]
    cand = np.zeros((n, n), bool)
    top = np.argsort(-votes, axis=1)[:, : min(m, n - 1)]
    rows = np.repeat(np.arange(n), top.shape[1])
    cols = top.ravel()
    sel = votes[rows, cols] > 0
    cand[rows[sel], cols[sel]] = True
    cand = cand | cand.T
    iu, ju = np.nonzero(np.triu(cand, 1))
    return np.stack([iu, ju], 1).astype(np.int32)


def _rescue_suspicious(
    comps: np.ndarray, votes, graph: "MatchGraph"
) -> bool:
    """True when the component split looks like ratio starvation.

    Two independent signals:
    (a) a weak shard exists — a singleton or 2-member component.
        Starvation leaves fragments; a real multi-panorama folder splits
        into solid groups.
    (b) solid components whose raw kNN vote affinity ACROSS the split
        rivals the votes along accepted pairs. Genuinely separate scenes
        share no structure, so their cross-component votes are near the
        random-kNN noise floor; a connected scene the ratio test cut
        apart (e.g. a dense ring fragmenting into 3+ solid arcs) keeps
        strong votes across the cut.
    A false positive only costs the rescue's re-match time — the rescued
    graph is adopted only if it connects more images."""
    _, cnt = np.unique(comps, return_counts=True)
    if len(cnt) <= 1:
        return False
    if bool((cnt <= 2).any()):
        return True
    votes = _votes_arr(votes)
    if votes is None:
        return False
    cross = comps[:, None] != comps[None, :]
    inter_max = int(votes[cross].max()) if cross.any() else 0
    acc = np.asarray(graph.pairs)[np.asarray(graph.accepted, bool)]
    if len(acc) == 0:
        return inter_max >= 8
    med = float(np.median(votes[acc[:, 0], acc[:, 1]]))
    return inter_max >= max(8.0, 0.5 * med)


def pairwise_rescue(
    feats: SiftFeatures,
    graph: "MatchGraph",
    comps: np.ndarray,
    n: int,
    cfg: StitchConfig,
    key: jax.Array,
    votes=None,  # (N, N) ndarray | lazy zero-arg callable | None
):
    """Recover match graphs the pooled global ratio test starved.

    Repeated structure (a skyline's towers) and near-duplicate views (a
    dense capture ring) put a true correspondence's 2nd nearest neighbour
    at the SAME scene point in a third image, so the pooled ratio ~1
    rejects it. The reference's only remedy is the manual
    `matchFeaturesPairwise` flag (`inputs.m:46`); this fires automatically
    when discovery fragments SUSPICIOUSLY (see `_rescue_suspicious`:
    weak shards, or strong cross-component vote affinity — a clean
    multi-panorama split into unrelated >=3-view groups is left alone
    and pays nothing) — re-matches with the per-pair matcher, and keeps
    whichever graph connects more images. Up to pairwise_rescue_max_images every
    pair is re-matched; above it the candidate set is bounded to the top
    pairwise_rescue_m kNN-vote neighbours per image plus the accepted
    pairs (O(N*m) pairs at any N; `votes` comes from
    `match_features(..., return_votes=True)`).

    Measured on the reference's own capture sheets (real photos): CMU0
    7 fragments -> ONE ~360 deg panorama (37/38 photos); Shanghai
    16 pairs / 10 fragments -> 87 pairs / ONE 30-view panorama. On a
    synthetic 1000-view ring (0.36 deg spacing — total ratio starvation)
    the vote-bounded path consolidates 288 -> 1000 members.

    Shared by `stitch` and `parallel.stitch_multichip` (identical graphs
    on both paths by construction). Returns (graph, comps, adopted);
    graph/comps are unchanged (adopted=False) when the rescue does not
    fire or does not improve connectivity.
    """
    suspicious = _rescue_suspicious(comps, votes, graph)
    if not (
        cfg.matching.pairwise_rescue
        and not cfg.matching.match_pairwise
        and suspicious
    ):
        return graph, comps, False
    if n <= cfg.matching.pairwise_rescue_max_images:
        cfg_pw = cfg.replace(
            matching=dataclasses.replace(
                cfg.matching, match_pairwise=True,
                ratio_threshold=cfg.matching.pairwise_rescue_ratio,
            )
        )
        p2, pi2, pm2, c2 = match_features(feats, cfg_pw)
    else:
        votes_a = _votes_arr(votes)
        if votes_a is None:  # no vote signal (e.g. cached graph): skip
            return graph, comps, False
        cand = _vote_candidate_pairs(votes_a, cfg.matching.pairwise_rescue_m)
        acc = np.asarray(graph.pairs)[np.asarray(graph.accepted, bool)]
        if len(acc):
            cand = np.unique(np.concatenate([cand, acc.astype(np.int32)]), axis=0)
        P = len(cand)
        if P == 0:
            return graph, comps, False
        Pb = -(-P // 256) * 256  # shape bucket: bounded recompiles
        cand_pad = np.zeros((Pb, 2), np.int32)
        cand_pad[:P] = cand
        threshold, binary = _matcher_semantics(cfg)
        idx, m_, nm = mt.match_pair_list(
            feats.desc, feats.mask, jnp.asarray(cand_pad),
            ratio=cfg.matching.pairwise_rescue_ratio,
            max_matches=cfg.matching.max_matches_per_pair,
            threshold=threshold, binary=binary,
            compute_dtype=cfg.tpu.compute_dtype,
        )
        idx, m_, nm = np.asarray(idx)[:P], np.asarray(m_)[:P], np.asarray(nm)[:P]
        c2 = np.zeros((n, n), np.int32)
        c2[cand[:, 0], cand[:, 1]] = nm
        c2 += c2.T
        keep = nm > 0
        p2, pi2, pm2 = cand[keep], idx[keep], m_[keep]
    if len(p2) == 0:  # nothing matched: an empty graph can't be better
        return graph, comps, False
    p2, pi2, pm2 = select_candidate_pairs(
        p2, pi2, pm2, c2, cfg.image_match.m_brown_lowe
    )
    graph2 = verify_matches(feats, p2, pi2, pm2, c2, cfg,
                            jax.random.fold_in(key, 3))
    # union, not replacement: an edge the global pass verified can be
    # missing from the re-matched graph (the wider rescue ratio changes
    # nf, and `ni > 8 + 0.3 nf` is not monotone in nf) — both sides
    # passed identical RANSAC + acceptance, so their union is as
    # trustworthy as either
    graph2 = _merge_graphs(graph, graph2)
    comps2 = connected_components(n, graph2.pairs, graph2.accepted)

    def stitched(c):
        _, k = np.unique(c, return_counts=True)
        return int(k[k >= 2].sum())

    better = stitched(comps2) > stitched(comps) or (
        stitched(comps2) == stitched(comps)
        and len(np.unique(comps2)) < len(np.unique(comps))
    )
    return (graph2, comps2, True) if better else (graph, comps, False)


def _merge_graphs(g1: "MatchGraph", g2: "MatchGraph") -> "MatchGraph":
    """Union of two verified graphs: all of g2, plus g1's accepted pairs
    that g2 did not accept (their verified H/inliers ride along). Putative
    counts take the elementwise max."""
    acc2 = {
        (int(i), int(j))
        for (i, j), a in zip(np.asarray(g2.pairs), np.asarray(g2.accepted))
        if a
    }
    g1_acc = np.asarray(g1.accepted, bool)
    keep = [
        q for q in range(len(g1.pairs))
        if g1_acc[q] and (int(g1.pairs[q][0]), int(g1.pairs[q][1])) not in acc2
    ]
    if not keep:
        return g2
    M = max(g1.pair_idx.shape[1], g2.pair_idx.shape[1])

    def padM(x):
        if x.shape[1] == M:
            return np.asarray(x)
        pads = [(0, 0)] * x.ndim
        pads[1] = (0, M - x.shape[1])
        return np.pad(np.asarray(x), pads)

    cat = lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)])
    return MatchGraph(
        pairs=cat(g2.pairs, np.asarray(g1.pairs)[keep]),
        pair_idx=cat(padM(g2.pair_idx), padM(np.asarray(g1.pair_idx)[keep])),
        pair_mask=cat(padM(g2.pair_mask), padM(np.asarray(g1.pair_mask)[keep])),
        H=cat(g2.H, np.asarray(g1.H)[keep]),
        inliers=cat(padM(g2.inliers), padM(np.asarray(g1.inliers)[keep])),
        num_inliers=cat(g2.num_inliers, np.asarray(g1.num_inliers)[keep]),
        accepted=cat(g2.accepted, np.ones(len(keep), bool)),
        counts=np.maximum(np.asarray(g1.counts), np.asarray(g2.counts)),
    )


def connected_components(n: int, pairs: np.ndarray, accepted: np.ndarray) -> np.ndarray:
    """Union-find panorama discovery (`imageMatchingPanoramaConComps.m:43-44`).

    Returns (n,) component label per image."""
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (i, j), ok in zip(pairs, accepted):
        if ok:
            ri, rj = find(int(i)), find(int(j))
            if ri != rj:
                parent[ri] = rj
    return np.array([find(i) for i in range(n)])


@dataclasses.dataclass
class StitchResult:
    panoramas: List[Dict]  # one dict per discovered panorama
    graph: MatchGraph
    components: np.ndarray
    features: SiftFeatures


def _stage(timer, name: str):
    """timer.stage(name) when a StageTimer is passed, else a no-op context."""
    import contextlib

    return timer.stage(name) if timer is not None else contextlib.nullcontext()


def stitch(
    image_set: ImageSet,
    cfg: StitchConfig = StitchConfig(),
    seed: int = 0,
    cache_dir: Optional[str] = None,
    timer=None,
) -> StitchResult:
    """Stitch an unordered image set into one or more panoramas.

    Full pipeline: feature extraction (SIFT or binary corner detectors),
    global or pairwise matching, RANSAC/MLESAC verification with Brown-Lowe
    acceptance, multi-panorama discovery, optional per-component second-pass
    re-matching, bundle adjustment (R,K,f incremental LM or 8-DOF
    homography BA for planar scans), straightening, gain compensation,
    rendering in the requested projections with linear/multiband blending,
    and border / inscribed-rectangle cropping.
    """
    key = host_prng_key(seed)
    images = None  # set by the streamed path or the plain upload below

    def _upload():
        raw = jnp.asarray(image_set.images)  # uint8 = 4x cheaper upload
        return _to_float(raw) if raw.dtype == jnp.uint8 else raw
    cache = None
    key_feat = key_graph = key_ba = None
    if cache_dir:
        from autopanostitch_tpu.utils.cache import StageCache, fingerprint

        cache = StageCache(cache_dir)
        key_feat = fingerprint(image_set.names, image_set.sizes, repr(cfg.detector))
        key_graph = fingerprint(
            image_set.names, image_set.sizes,
            repr(cfg.detector) + repr(cfg.matching) + repr(cfg.image_match)
            + str(seed),
        )
        key_ba = fingerprint(
            image_set.names, image_set.sizes,
            repr(cfg.detector) + repr(cfg.matching) + repr(cfg.image_match)
            + repr(cfg.bundle) + str(seed),
        )
        cached = cache.load(key_feat, "features")
        if cached is not None:
            from autopanostitch_tpu.ops.sift import SiftFeatures

            feats = SiftFeatures(**{k: jnp.asarray(v) for k, v in cached.items()})
            images = _upload()
        else:
            feats, images = _extract(image_set, cfg)
            cache.save(key_feat, "features",
                       **{f: np.asarray(getattr(feats, f)) for f in feats._fields})
    else:
        with _stage(timer, "features"):
            feats, images = _extract(image_set, cfg)
            if timer is not None:
                jax.block_until_ready(feats.desc)
    feathers = samp_ops.feather_stack(
        jnp.asarray(image_set.sizes, np.int32), images.shape[1], images.shape[2]
    )

    graph = None
    if cache is not None:
        cg = cache.load(key_graph, "graph")
        if cg is not None:
            graph = MatchGraph(**{k: cg[k] for k in MatchGraph.__dataclass_fields__})
    fresh_graph = graph is None
    votes = None
    if graph is None:
        with _stage(timer, "matching"):
            pairs, pair_idx, pair_mask, counts, votes = match_features(
                feats, cfg, return_votes=True
            )
            if len(pairs):
                pairs, pair_idx, pair_mask = select_candidate_pairs(
                    pairs, pair_idx, pair_mask, counts, cfg.image_match.m_brown_lowe
                )
        with _stage(timer, "ransac"):
            graph = verify_matches(feats, pairs, pair_idx, pair_mask, counts, cfg, key)

    comps = connected_components(image_set.n, graph.pairs, graph.accepted)

    rescue_adopted = False
    if fresh_graph:
        with _stage(timer, "pairwise_rescue"):
            graph, comps, rescue_adopted = pairwise_rescue(
                feats, graph, comps, image_set.n, cfg, key, votes=votes
            )
    if cache is not None and fresh_graph:
        # cache the POST-rescue graph so a resumed run skips the rescue
        cache.save(key_graph, "graph",
                   **{k: np.asarray(getattr(graph, k))
                      for k in MatchGraph.__dataclass_fields__})

    # when the graph is already per-pair dense (pairwise mode, or the
    # rescue adopted the pairwise graph), the second-pass pairwise
    # re-match would recompute the identical matcher on the same features
    # — skip it; the full re-resize second pass still applies (it changes
    # the FEATURES, and self-skips when the re-resize reproduces them)
    graph_is_pairwise = cfg.matching.match_pairwise or rescue_adopted

    panoramas = []
    for label in np.unique(comps):
        members = np.nonzero(comps == label)[0]
        if len(members) < 2:
            continue
        result = None
        if cfg.matching.second_pass and len(members) < image_set.n:
            if cfg.matching.resize_panorama_cluster:
                with _stage(timer, "second_pass"):
                    sp = second_pass_component(image_set, members, cfg,
                                               jax.random.fold_in(key, 2))
                if sp is not None and np.asarray(sp[3].accepted).any():
                    comp_set, comp_images, comp_feats, comp_graph = sp
                    comp_feathers = samp_ops.feather_stack(
                        jnp.asarray(comp_set.sizes, np.int32),
                        comp_set.images.shape[1], comp_set.images.shape[2],
                    )
                    result = stitch_component(
                        comp_set, comp_graph, comp_feats,
                        np.arange(len(members)), cfg,
                        images_dev=comp_images, feathers_dev=comp_feathers,
                        timer=timer,
                    )
                    result["members"] = members
            if result is None and not graph_is_pairwise:
                with _stage(timer, "second_pass"):
                    comp_graph = second_pass_matching(feats, members, graph,
                                                      cfg, key)
                result = stitch_component(image_set, comp_graph, feats, members, cfg,
                                          images_dev=images, feathers_dev=feathers,
                                          timer=timer)
        if result is None:
            result = stitch_component(image_set, graph, feats, members, cfg,
                                      images_dev=images, feathers_dev=feathers,
                                      cache=cache, cache_key=key_ba,
                                      cache_label=int(label), timer=timer)
        panoramas.append(result)

    return StitchResult(panoramas=panoramas, graph=graph, components=comps, features=feats)


def second_pass_component(
    image_set: ImageSet,
    members: np.ndarray,
    cfg: StitchConfig,
    key: jax.Array,
):
    """FULL reference second pass (`imageMatchingPanoramaConComps.m:48-90`):
    re-resize the component's ORIGINAL images into the configured limits,
    re-extract features, re-match pairwise and re-verify.

    The reference's first pass uniformizes the whole set to one common size
    (stage-2 of `resizeImagesToLimits.m`), which degrades components whose
    images are smaller than the set maximum; the per-cluster resize restores
    each component's own resolution. Our loader pads instead of upscaling,
    so the recovery shows up when the first-pass stack was built with
    tighter limits than the pipeline's render limits (mixed ingestion).

    Returns (comp_set, comp_images_dev, comp_feats, comp_graph) with
    MEMBER-LOCAL indices (0..len(members)-1), or None when the ImageSet
    carries neither originals nor source paths.
    """
    from autopanostitch_tpu.utils import image_io

    if image_set.originals is None and image_set.paths is None:
        return None
    orig = [image_set.original(int(k)) for k in members]
    if any(o is None for o in orig):
        return None
    if cfg.render.resize_image:
        limits = (cfg.render.height_limit, cfg.render.width_limit)
    else:  # native-resolution runs must stay native (inputs.m resizeImage)
        limits = (1 << 30, 1 << 30)
    imgs = [image_io.resize_fit(o, *limits) for o in orig]
    sizes = np.array([im.shape[:2] for im in imgs], np.int32)
    if np.array_equal(sizes, image_set.sizes[members]):
        # the re-resize reproduces the first-pass images exactly — the
        # expensive re-extract/re-verify can only rediscover the same
        # graph; fall back to the cheap pairwise re-match
        return None
    H = int(np.ceil(sizes[:, 0].max() / 32) * 32)
    W = int(np.ceil(sizes[:, 1].max() / 32) * 32)
    stack = np.stack([image_io._pad_to(im, H, W) for im in imgs])
    comp_set = ImageSet(
        images=stack, sizes=sizes,
        names=[image_set.names[int(k)] for k in members],
    )
    images_dev = _to_float(jnp.asarray(stack))
    feats = features_stage.extract_features(images_dev, sizes, cfg.detector)

    threshold, binary = _matcher_semantics(cfg)
    pairs_l, idx, m, nm = mt.match_all_pairs(
        feats.desc, feats.mask,
        ratio=cfg.matching.ratio_threshold,
        max_matches=cfg.matching.max_matches_per_pair,
        threshold=threshold, binary=binary,
        compute_dtype=cfg.tpu.compute_dtype,
    )
    pairs_l = np.asarray(pairs_l)
    nm = np.asarray(nm)
    keep = nm >= 4
    nc = len(members)
    counts = np.zeros((nc, nc), np.int32)
    for p in np.nonzero(keep)[0]:
        i, j = pairs_l[p]
        counts[i, j] = counts[j, i] = int(nm[p])
    sub_pairs, sub_idx, sub_mask = select_candidate_pairs(
        pairs_l[keep], np.asarray(idx)[keep], np.asarray(m)[keep], counts,
        cfg.image_match.m_brown_lowe,
    )
    comp_graph = verify_matches(feats, sub_pairs, sub_idx, sub_mask, counts, cfg, key)
    return comp_set, images_dev, feats, comp_graph


def second_pass_matching(
    feats: SiftFeatures,
    members: np.ndarray,
    graph: MatchGraph,
    cfg: StitchConfig,
    key: jax.Array,
) -> MatchGraph:
    """Second per-component matching pass (reference
    `imageMatchingPanoramaConComps.m:48-90`): re-match the component's
    members pairwise and re-verify. The reference re-resizes and
    re-extracts per component; we keep the original features (no resize in
    our loader) and instead upgrade global matches to dense pairwise ones.

    Returns a MatchGraph in GLOBAL image indices restricted to the member
    pairs."""
    mem_d = jnp.asarray(members)
    desc = feats.desc[mem_d]
    mask = feats.mask[mem_d]
    threshold, binary = _matcher_semantics(cfg)
    pairs_l, idx, m, n = mt.match_all_pairs(
        desc, mask,
        ratio=cfg.matching.ratio_threshold,
        max_matches=cfg.matching.max_matches_per_pair,
        threshold=threshold,
        binary=binary,
        compute_dtype=cfg.tpu.compute_dtype,
    )
    pairs_l = np.asarray(pairs_l)
    n = np.asarray(n)
    keep = n >= 4
    pairs_g = members[pairs_l[keep]]  # to global indices
    pair_idx = np.asarray(idx)[keep]
    pair_mask = np.asarray(m)[keep]
    counts = graph.counts.copy()
    for p, (i, j) in enumerate(pairs_g):
        counts[i, j] = counts[j, i] = int(n[keep][p])
    sub_pairs, sub_idx, sub_mask = select_candidate_pairs(
        pairs_g, pair_idx, pair_mask, counts, cfg.image_match.m_brown_lowe
    )
    return verify_matches(feats, sub_pairs, sub_idx, sub_mask, counts, cfg,
                          jax.random.fold_in(key, 1))


def stitch_component(
    image_set: ImageSet,
    graph: MatchGraph,
    feats: SiftFeatures,
    members: np.ndarray,
    cfg: StitchConfig,
    images_dev=None,
    feathers_dev=None,
    cache=None,
    cache_key=None,
    cache_label=None,
    timer=None,
    mesh=None,
) -> Dict:
    """Bundle-adjust, straighten, gain-compensate and render one panorama
    component (the per-component body of `recognizePanoramas` +
    `displayPanorama` in the reference).

    When a StageCache is provided, the BA stage result (cameras, planar
    classification) is cached per component so a re-run resumes directly at
    the render stage.

    When a `jax.sharding.Mesh` is provided, the gain statistics and the
    tile render — the two O(canvas)/O(grid) stages — run mesh-sharded
    (`parallel/sharded.sharded_gain_stats_imagespace` /
    `sharded_render_tiles`); BA stays replicated (O(N) cameras). The
    planar compositing path is single-chip regardless."""
    acc = graph.accepted
    ba = None
    if cache is not None:
        c = cache.load(cache_key, f"ba{cache_label}")
        if c is not None:
            ba = {
                "members": c["members"],
                "pairs": c["pairs"],
                "pair_sel": c["pair_sel"],
                "focal_init": float(c["focal_init"]),
                "seed": int(c["seed"]),
                "no_rotation": bool(c["no_rotation"]),
                "rot_consistency_deg": tuple(c["rot_consistency_deg"]),
                "cameras": bundle_stage.Cameras(
                    R=jnp.asarray(c["cam_R"]), f=jnp.asarray(c["cam_f"]),
                    cx=jnp.asarray(c["cam_cx"]), cy=jnp.asarray(c["cam_cy"]),
                ),
            }
    if ba is None:
        with _stage(timer, "bundle_adjustment"):
            ba = bundle_stage.run_bundle_adjustment(
                members,
                graph.pairs[acc],
                graph.pair_idx[acc],
                graph.pair_mask[acc],
                graph.inliers[acc],
                graph.H[acc],
                np.asarray(feats.xy),
                graph.counts,
                image_set.sizes,
                cfg.bundle,
                force_planar=cfg.straighten.force_planar_scan,
            )
        if cache is not None:
            cams = ba["cameras"]
            cache.save(
                cache_key, f"ba{cache_label}",
                members=np.asarray(ba["members"]),
                pairs=np.asarray(ba["pairs"]),
                pair_sel=np.asarray(ba["pair_sel"]),
                focal_init=np.float64(ba["focal_init"]),
                seed=np.int64(ba["seed"]),
                no_rotation=np.bool_(ba["no_rotation"]),
                rot_consistency_deg=np.asarray(ba["rot_consistency_deg"]),
                cam_R=np.asarray(cams.R), cam_f=np.asarray(cams.f),
                cam_cx=np.asarray(cams.cx), cam_cy=np.asarray(cams.cy),
            )

    sizes = image_set.sizes[members]
    n = len(members)
    mem_d = jnp.asarray(members)
    if images_dev is None:
        images_dev = jnp.asarray(image_set.images)
        if images_dev.dtype == jnp.uint8:
            images_dev = _to_float(images_dev)
    if feathers_dev is None:
        feathers_dev = samp_ops.feather_stack(
            jnp.asarray(image_set.sizes, np.int32),
            image_set.images.shape[1],
            image_set.images.shape[2],
        )
    # device gather, no host transfer; one fused executable
    images, feathers = _gather_members(images_dev, feathers_dev, mem_d)

    result: Dict = {"members": members, "ba": ba}

    if ba["no_rotation"] or cfg.straighten.force_planar_scan:
        # planar path: chain -> joint 8-DOF homography BA -> composite
        # (reference bundleAdjustmentH.m + pureNonRotationalPanoramas)
        remap = {int(g): k for k, g in enumerate(members)}
        keep = [
            p
            for p in range(len(graph.pairs))
            if acc[p] and int(graph.pairs[p, 0]) in remap and int(graph.pairs[p, 1]) in remap
        ]
        loc_pairs = np.array(
            [[remap[int(i)], remap[int(j)]] for i, j in graph.pairs[keep]], int
        )
        # inlier coordinates for the H-BA
        xy = np.asarray(feats.xy)
        P = len(keep)
        M = min(cfg.bundle.max_matches, graph.pair_mask.shape[1])
        u_i = np.zeros((P, M, 2), np.float32)
        u_j = np.zeros((P, M, 2), np.float32)
        w = np.zeros((P, M), np.float32)
        for k, p in enumerate(keep):
            ok_m = graph.pair_mask[p] & graph.inliers[p]
            idxs = np.nonzero(ok_m)[0]
            gi, gj = int(graph.pairs[p, 0]), int(graph.pairs[p, 1])
            if len(idxs) > M:
                # same stratified per-pair subsampling as the R,K,f path
                # (`bundleAdjustmentH.m:1020-1093` shares subsampleMatches),
                # so over-cap planar pairs keep spatially spread matches
                rng = np.random.default_rng(1000003 * gi + gj)
                pick = bundle_stage.stratified_subsample(
                    # gi is a GLOBAL image index; `sizes` here is the
                    # member-local slice, so use the full-set sizes
                    xy[gi, graph.pair_idx[p, idxs, 0]],
                    image_set.sizes[gi], M,
                    cfg.bundle.subsample_mode, rng,
                    grid_bins=cfg.bundle.subsample_grid_bins,
                    polar_bins=cfg.bundle.subsample_polar_bins,
                )
                idxs = idxs[pick]
            u_i[k, : len(idxs)] = xy[gi, graph.pair_idx[p, idxs, 0]]
            u_j[k, : len(idxs)] = xy[gj, graph.pair_idx[p, idxs, 1]]
            w[k, : len(idxs)] = 1.0
        hba = bundle_h_stage.run_bundle_adjustment_h(
            loc_pairs, graph.H[keep], (u_i, u_j, w), n, cfg.bundle
        )
        planar = planar_stage.composite_from_abs(
            images,
            feathers,
            sizes,
            hba["H_abs"],
            hba["reachable"],
            blend_mode=cfg.blend.mode,
            bands=cfg.blend.bands,
            max_megapixel=cfg.render.max_megapixel,
            gain_cfg=cfg.gain,
            interp=cfg.render.interpolation,
        )
        result.update(planar)
        result["hba"] = {k: hba[k] for k in ("H_abs", "anchor", "final_cost")}
        result["H_abs"] = hba["H_abs"]
        result["reachable"] = hba["reachable"]
        result["anchor"] = hba["anchor"]
        result["projections"] = {"planar": planar["panorama"]}
        result["coverage_by_mode"] = {"planar": planar["coverage"]}
        _apply_crop(result, cfg)
        if cfg.post.show_panorama_imgs_nums:
            boxes, centers = annotate_stage.warped_boxes_planar(
                hba["H_abs"], sizes, planar["offset"], planar["scale"]
            )
            result["projections_annotated"] = {
                "planar": annotate_stage.draw_annotations(
                    planar["panorama"], boxes, centers
                )
            }
        return result

    cams = ba["cameras"]
    R = np.asarray(cams.R)
    # build K on HOST (the device build_K costs ~6 eager executables and
    # the result is consumed by the host control plane anyway)
    f = np.asarray(cams.f)
    cx_ = np.asarray(cams.cx)
    cy_ = np.asarray(cams.cy)
    K = np.zeros((len(f), 3, 3), np.float32)
    K[:, 0, 0] = f
    K[:, 1, 1] = f
    K[:, 0, 2] = cx_
    K[:, 1, 2] = cy_
    K[:, 2, 2] = 1.0
    # per-camera radial distortion from BA (None = pinhole, the reference
    # model); the render/gain samplers map pinhole coords into the stored
    # (distorted) images so the composite is distortion-corrected
    k1 = None if cams.k1 is None else np.asarray(cams.k1, np.float32)

    # straightening (reference straightening.m, flag inputs.m:88)
    R, straightened, S = straighten_stage.straighten_rotations(R, cfg.straighten)
    result["straightened"] = straightened
    result["R_render"] = R  # rotations actually used by the renderer

    # per-image gains are projection-independent: the reference solves
    # them ONCE before rendering (`main.m` gain stage)
    with _stage(timer, "gain"):
        if mesh is not None and cfg.gain.enabled:
            from autopanostitch_tpu.parallel import sharded as _sharded

            Nij, sumC = _sharded.sharded_gain_stats_imagespace(
                images, feathers, sizes, R, K, mesh,
                stride=int(cfg.gain.grid_stride), k1=k1,
            )
            gains = gain_stage.solve_gains(
                np.asarray(Nij), np.asarray(sumC), cfg.gain
            )
        else:
            gains = gain_stage.compute_gains_rotational(
                images,
                feathers,
                R.astype(np.float32),  # host: padded to the N bucket inside
                K.astype(np.float32),
                sizes,
                cfg.gain,
                k1=k1,
            )
    projections: Dict[str, np.ndarray] = {}
    for mode in cfg.render.projections:
        canvas = render_stage.compute_canvas(
            R, K, sizes, mode, cfg.render, k1=k1
        )
        blend_mode = cfg.blend.mode
        if blend_mode == "none":
            blend_mode = f"none-{cfg.blend.compose_none_policy}"
        with _stage(timer, f"render:{mode}"):
            if mesh is not None:
                from autopanostitch_tpu.parallel import sharded as _sharded

                pano, cover = _sharded.sharded_render_tiles(
                    images, feathers, R, K, canvas, mesh,
                    gains=gains, blend_mode=blend_mode,
                    bands=cfg.blend.bands, tile=cfg.render.tile,
                    angle_power=cfg.render.angle_power, sizes=sizes,
                    max_contributors=cfg.render.max_contributors,
                    interp=cfg.render.interpolation, k1=k1,
                )
            else:
                pano, cover = render_stage.render_rotational(
                    images,
                    feathers,
                    R,
                    K,
                    canvas,
                    gains=gains,
                    blend_mode=blend_mode,
                    bands=cfg.blend.bands,
                    tile=cfg.render.tile,
                    angle_power=cfg.render.angle_power,
                    sizes=sizes,
                    interp=cfg.render.interpolation,
                    max_contributors=cfg.render.max_contributors,
                    k1=k1,
                )
        projections[mode] = pano
        result.setdefault("canvas", {})[mode] = canvas
        result.setdefault("gains", {})[mode] = gains
        result.setdefault("coverage_by_mode", {})[mode] = cover
    result["projections"] = projections
    result["panorama"] = next(iter(projections.values()))
    # headline coverage matches result["panorama"] (the first projection)
    result["coverage"] = result["coverage_by_mode"][cfg.render.projections[0]]
    _apply_crop(result, cfg)
    if cfg.post.show_panorama_imgs_nums:
        annotated = {}
        for mode, pano_img in projections.items():
            boxes, centers = annotate_stage.warped_boxes_rotational(
                result["canvas"][mode], R, K, sizes, k1=k1
            )
            annotated[mode] = annotate_stage.draw_annotations(pano_img, boxes, centers)
        result["projections_annotated"] = annotated
    return result


def _apply_crop(result: Dict, cfg: StitchConfig) -> None:
    """Border/bbox crop + optional inscribed-rectangle crop (reference
    `cropNonzeroBbox` + `panoramaCropper`)."""
    by_mode = result.get("coverage_by_mode")
    if not by_mode:
        # no renderer coverage (externally produced panoramas fed through
        # the crop stage): threshold against the canvas color like the
        # reference (`panoramaCropper.m:73-88`, `inputs.m:116-118`)
        by_mode = {
            m: crop_stage.mask_from_color(
                p, cfg.render.canvas_color,
                cfg.post.black_range, cfg.post.white_range,
            )
            for m, p in result.get("projections", {}).items()
        }
        if not by_mode:
            return
        result["coverage_by_mode"] = by_mode
    cropped = {}
    bbox_vis = {}
    for mode, pano in result["projections"].items():
        # each projection has its own canvas size -> its own coverage mask
        cover = by_mode[mode]
        if cfg.render.canvas_color != "black":
            pano = crop_stage.fill_canvas_color(pano, cover, cfg.render.canvas_color)
            result["projections"][mode] = pano
        if cfg.render.crop_border:
            pano_c, rect = crop_stage.crop_bbox(pano, cover)
        else:
            pano_c, rect = pano, None
        if cfg.post.crop_panorama:
            r = rect or (0, pano.shape[0], 0, pano.shape[1])
            sub_mask = cover[r[0] : r[1], r[2] : r[3]] if rect else cover
            pano_uncropped = pano_c
            pano_c, inner = crop_stage.crop_panorama(pano_c, sub_mask)
            if cfg.post.show_crop_bounding_box and inner is not None:
                bbox_vis[mode] = crop_stage.draw_rect(pano_uncropped, inner)
        cropped[mode] = pano_c
    result["projections_cropped"] = cropped
    if bbox_vis:
        result["projections_crop_bbox"] = bbox_vis
