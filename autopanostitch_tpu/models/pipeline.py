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
from autopanostitch_tpu.models import bundle as bundle_stage
from autopanostitch_tpu.models import features as features_stage
from autopanostitch_tpu.models import gain as gain_stage
from autopanostitch_tpu.models import planar as planar_stage
from autopanostitch_tpu.models import render as render_stage
from autopanostitch_tpu.models import straighten as straighten_stage
from autopanostitch_tpu.ops import matching as mt
from autopanostitch_tpu.ops import ransac as rs
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


def match_features(feats: SiftFeatures, cfg: StitchConfig):
    """Global pooled matching (`featureMatchingGlobal.m`) producing per-pair
    putative match lists. Returns (pairs, pair_idx, pair_mask, counts)."""
    N, K, D = feats.desc.shape
    desc = feats.desc.reshape(N * K, D)
    mask = feats.mask.reshape(N * K)
    image_id = jnp.repeat(jnp.arange(N, dtype=jnp.int32), K)
    local_idx = jnp.tile(jnp.arange(K, dtype=jnp.int32), N)

    nn_idx, nn_dist = mt.global_knn(
        desc, mask, image_id, k=cfg.matching.k, block=cfg.tpu.match_block
    )
    best, accepted = mt.global_ratio_test(nn_idx, nn_dist, ratio=cfg.matching.ratio_threshold)
    return mt.global_matches_to_pairs(
        np.asarray(best),
        np.asarray(accepted),
        np.asarray(image_id),
        np.asarray(local_idx),
        N,
        cfg.matching.max_matches_per_pair,
    )


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
    keys = jax.random.split(key, max(P, 1))
    im = cfg.image_match
    out = rs.verify_pairs(
        jnp.asarray(src),
        jnp.asarray(dst),
        jnp.asarray(pair_mask),
        keys,
        threshold=im.max_distance,
        model=im.transformation_type,
        method=im.method,
        batch=im.ransac_batch,
        accept_alpha=im.accept_alpha,
        accept_beta=im.accept_beta,
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


def stitch(
    image_set: ImageSet,
    cfg: StitchConfig = StitchConfig(),
    seed: int = 0,
) -> StitchResult:
    """Stitch an unordered image set into one or more panoramas.

    Current coverage: feature extraction, global matching, geometric
    verification, multi-panorama discovery, planar compositing. The
    rotational (R, K, f bundle-adjusted) render path plugs in at the marked
    point as stages land.
    """
    key = jax.random.PRNGKey(seed)
    images = jnp.asarray(image_set.images)
    feats = features_stage.extract_features(images, image_set.sizes, cfg.detector)

    pairs, pair_idx, pair_mask, counts = match_features(feats, cfg)
    if len(pairs):
        pairs, pair_idx, pair_mask = select_candidate_pairs(
            pairs, pair_idx, pair_mask, counts, cfg.image_match.m_brown_lowe
        )
    graph = verify_matches(feats, pairs, pair_idx, pair_mask, counts, cfg, key)

    comps = connected_components(image_set.n, graph.pairs, graph.accepted)

    panoramas = []
    for label in np.unique(comps):
        members = np.nonzero(comps == label)[0]
        if len(members) < 2:
            continue
        result = stitch_component(image_set, graph, feats, members, cfg)
        panoramas.append(result)

    return StitchResult(panoramas=panoramas, graph=graph, components=comps, features=feats)


def stitch_component(
    image_set: ImageSet,
    graph: MatchGraph,
    feats: SiftFeatures,
    members: np.ndarray,
    cfg: StitchConfig,
) -> Dict:
    """Bundle-adjust, straighten, gain-compensate and render one panorama
    component (the per-component body of `recognizePanoramas` +
    `displayPanorama` in the reference)."""
    acc = graph.accepted
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

    images = image_set.images[members]
    sizes = image_set.sizes[members]
    n = len(members)
    feathers = np.zeros(images.shape[:3], np.float32)
    for k in range(n):
        h, w = int(sizes[k][0]), int(sizes[k][1])
        feathers[k, :h, :w] = planar_stage._feather_np(h, w)

    result: Dict = {"members": members, "ba": ba}

    if ba["no_rotation"] or cfg.straighten.force_planar_scan:
        # planar path: chained homographies + planar composite
        sel = acc.copy()
        remap = {int(g): k for k, g in enumerate(members)}
        keep = [
            p
            for p in range(len(graph.pairs))
            if sel[p] and int(graph.pairs[p, 0]) in remap and int(graph.pairs[p, 1]) in remap
        ]
        loc_pairs = np.array(
            [[remap[int(i)], remap[int(j)]] for i, j in graph.pairs[keep]], int
        )
        planar = planar_stage.render_planar(
            images,
            sizes,
            loc_pairs,
            graph.H[keep],
            blend_mode=cfg.blend.mode if cfg.blend.mode != "multiband" else "linear",
            max_megapixel=cfg.render.max_megapixel,
        )
        result.update(planar)
        result["projections"] = {"planar": planar["panorama"]}
        return result

    cams = ba["cameras"]
    R = np.asarray(cams.R)
    K = np.asarray(cams.K())

    # straightening (reference straightening.m, flag inputs.m:88)
    R, straightened, S = straighten_stage.straighten_rotations(R, cfg.straighten)
    result["straightened"] = straightened
    result["R_render"] = R  # rotations actually used by the renderer

    projections: Dict[str, np.ndarray] = {}
    for mode in cfg.render.projections:
        canvas = render_stage.compute_canvas(R, K, sizes, mode, cfg.render)
        gains = gain_stage.compute_gains_rotational(
            jnp.asarray(images),
            jnp.asarray(feathers),
            jnp.asarray(R.astype(np.float32)),
            jnp.asarray(K.astype(np.float32)),
            mode,
            canvas["f_pan"],
            canvas["x0"],
            canvas["y0"],
            jnp.asarray(canvas["R_ref"]),
            (canvas["Hc"], canvas["Wc"]),
            cfg.gain,
        )
        pano, cover = render_stage.render_rotational(
            images,
            feathers,
            R,
            K,
            canvas,
            gains=gains,
            blend_mode=cfg.blend.mode,
            bands=cfg.blend.bands,
            tile=cfg.render.tile,
            angle_power=cfg.render.angle_power,
        )
        projections[mode] = pano
        result.setdefault("canvas", {})[mode] = canvas
        result.setdefault("gains", {})[mode] = gains
        result["coverage"] = cover
    result["projections"] = projections
    result["panorama"] = next(iter(projections.values()))
    return result
