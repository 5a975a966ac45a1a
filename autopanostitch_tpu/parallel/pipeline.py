"""Multi-chip end-to-end stitching over a `jax.sharding.Mesh`.

`stitch_multichip` mirrors `models/pipeline.stitch` but runs the
O(pixels)/O(features)/O(pairs) stages sharded across the mesh
(`parallel/sharded.py`):

  SIFT            -> images data-parallel over chips
  global kNN      -> query axis sharded (pool replicated, no collectives)
  RANSAC verify   -> pair axis sharded
  BA / discovery  -> replicated (tiny: O(N) cameras), identical on chips
  gain stats      -> grid-point chunks sharded, (N, N) stats psum over ICI
  render          -> canvas tiles sharded across chips (same fitted tile
                     grid + contributor culling + interp as single-chip)

This is the reference's parpool/parfor concurrency (`main.m:39-47`,
SURVEY.md §2.2) re-expressed as SPMD over ICI: identical results to the
single-chip path (verified in tests/test_parallel.py on a virtual mesh),
with the heavy stages' wall time divided by the mesh size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.config import StitchConfig
from autopanostitch_tpu.models import features as features_stage
from autopanostitch_tpu.models import pipeline as pl
from autopanostitch_tpu.ops import matching as mt
from autopanostitch_tpu.ops import ransac as rs
from autopanostitch_tpu.ops import sampling as samp_ops
from autopanostitch_tpu.ops import sift
from autopanostitch_tpu.parallel import mesh as pmesh
from autopanostitch_tpu.parallel import sharded
from autopanostitch_tpu.utils.image_io import ImageSet


def stitch_multichip(
    image_set: ImageSet,
    cfg: StitchConfig = StitchConfig(),
    mesh=None,
    seed: int = 0,
) -> pl.StitchResult:
    """Stitch an unordered image set with the heavy stages mesh-sharded.

    Drop-in equivalent of `pipeline.stitch` (same StitchResult); requires
    the SIFT detector (the corner/DoH detectors run through the
    single-chip path). The pooled-matching global mode is used regardless
    of `matching.match_pairwise` (the pairwise matcher is not sharded).
    """
    if cfg.detector.detector.upper() not in ("SIFT", "VL_SIFT"):
        raise ValueError(
            "stitch_multichip shards the SIFT extractor; detector="
            f"{cfg.detector.detector!r} runs through pipeline.stitch"
        )
    mesh = mesh if mesh is not None else pmesh.make_mesh()
    n_dev = int(mesh.devices.size)
    key = jax.random.PRNGKey(seed)

    raw = jnp.asarray(image_set.images)
    images = raw.astype(jnp.float32) / 255.0 if raw.dtype == jnp.uint8 else raw
    feathers = samp_ops.feather_stack(
        jnp.asarray(image_set.sizes, np.int32), images.shape[1], images.shape[2]
    )

    # ---- sharded extraction (images DP over chips) ----
    gray = sift.rgb_to_gray(images)
    sizes_det = np.asarray(image_set.sizes)
    scale_back = 1.0
    levels = features_stage.upsample_levels(cfg.detector, sizes_det)
    if levels:  # Lowe octave -1 / -2
        N_, H_, W_ = gray.shape
        s_ = 1 << levels
        gray = jax.image.resize(gray, (N_, s_ * H_, s_ * W_), "linear")
        sizes_det = sizes_det * s_
        scale_back = 1.0 / s_
    N = image_set.n
    pad = (-N) % n_dev
    gray_p = jnp.pad(gray, ((0, pad), (0, 0), (0, 0)))
    feats = sharded.sharded_extract(gray_p, mesh, cfg.detector)
    feats = jax.tree_util.tree_map(lambda x: x[:N], feats)
    feats = features_stage.mask_borders(feats, sizes_det)
    if scale_back != 1.0:
        feats = feats._replace(
            xy=feats.xy * scale_back, scale=feats.scale * scale_back
        )

    # ---- sharded pooled global matching ----
    K = feats.desc.shape[1]
    desc = feats.desc.reshape(N * K, -1)
    mask = feats.mask.reshape(N * K)
    image_id = jnp.repeat(jnp.arange(N, dtype=jnp.int32), K)
    local_idx = jnp.tile(jnp.arange(K, dtype=jnp.int32), N)
    nn_idx, nn_dist = sharded.sharded_global_knn(
        desc, mask, image_id, mesh, k=cfg.matching.k
    )
    _, binary = pl._matcher_semantics(cfg)
    best, accepted = mt.global_ratio_test(
        nn_idx, nn_dist, ratio=cfg.matching.ratio_threshold, binary=binary
    )
    pairs, pair_idx, pair_mask, counts = mt.global_matches_to_pairs(
        np.asarray(best), np.asarray(accepted), np.asarray(image_id),
        np.asarray(local_idx), N, cfg.matching.max_matches_per_pair,
    )
    votes = mt.knn_votes(nn_idx, nn_dist, np.asarray(image_id), N)
    if len(pairs):
        pairs, pair_idx, pair_mask = pl.select_candidate_pairs(
            pairs, pair_idx, pair_mask, counts, cfg.image_match.m_brown_lowe
        )

    # ---- sharded RANSAC verification (pair axis over chips) ----
    xy = np.asarray(feats.xy)
    P = len(pairs)
    src = xy[pairs[:, 0][:, None], pair_idx[:, :, 0]] if P else np.zeros((0, 1, 2))
    dst = xy[pairs[:, 1][:, None], pair_idx[:, :, 1]] if P else np.zeros((0, 1, 2))
    keys = jax.random.split(key, max(P, 1))
    im = cfg.image_match
    alpha, beta = pl._acceptance(im)
    if P:
        out = sharded.sharded_verify_pairs(
            jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
            jnp.asarray(pair_mask), keys, mesh,
            threshold=im.max_distance, model=im.transformation_type,
            method=im.method, batch=im.ransac_batch,
            accept_alpha=alpha, accept_beta=beta,
            accept_small_min=im.accept_small_min,
            accept_small_ratio=im.accept_small_ratio,
            total=rs.num_trials(im.inliers_confidence, im.transformation_type,
                                im.max_iter),
        )
    else:
        out = {k: np.zeros((0,) + s, d) for k, s, d in [
            ("H", (3, 3), np.float32), ("inliers", (pair_mask.shape[1] if pair_mask.ndim == 2 else 0,), bool),
            ("num_inliers", (), np.int32), ("accepted", (), bool)]}
    graph = pl.MatchGraph(
        pairs=pairs, pair_idx=pair_idx, pair_mask=pair_mask,
        H=np.asarray(out["H"]), inliers=np.asarray(out["inliers"]),
        num_inliers=np.asarray(out["num_inliers"]),
        accepted=np.asarray(out["accepted"]), counts=counts,
    )

    # ---- discovery + per-component BA/render (replicated control plane),
    # including the same second-pass logic as the single-chip path ----
    comps = pl.connected_components(N, graph.pairs, graph.accepted)

    # same pairwise rescue as pipeline.stitch (shared helper, so the
    # trigger/tiebreak policy cannot desynchronize between paths); the
    # rescue matcher itself runs single-chip — it only fires on
    # suspicious fragmentation, and parity with the single-chip result
    # requires identical graphs
    graph, comps, rescue_adopted = pl.pairwise_rescue(feats, graph, comps, N,
                                                      cfg, key, votes=votes)
    graph_is_pairwise = cfg.matching.match_pairwise or rescue_adopted
    panoramas = []
    for label in np.unique(comps):
        members = np.nonzero(comps == label)[0]
        if len(members) < 2:
            continue
        result = None
        if cfg.matching.second_pass and len(members) < N:
            if cfg.matching.resize_panorama_cluster:
                sp = pl.second_pass_component(image_set, members, cfg,
                                              jax.random.fold_in(key, 2))
                if sp is not None and np.asarray(sp[3].accepted).any():
                    comp_set, comp_images, comp_feats, comp_graph = sp
                    comp_feathers = samp_ops.feather_stack(
                        jnp.asarray(comp_set.sizes, np.int32),
                        comp_set.images.shape[1], comp_set.images.shape[2],
                    )
                    result = pl.stitch_component(
                        comp_set, comp_graph, comp_feats,
                        np.arange(len(members)), cfg,
                        images_dev=comp_images, feathers_dev=comp_feathers,
                        mesh=mesh,
                    )
                    result["members"] = members
            if result is None and not graph_is_pairwise:
                comp_graph = pl.second_pass_matching(feats, members, graph,
                                                     cfg, key)
                result = pl.stitch_component(image_set, comp_graph, feats,
                                             members, cfg, images_dev=images,
                                             feathers_dev=feathers, mesh=mesh)
        if result is None:
            result = pl.stitch_component(image_set, graph, feats, members, cfg,
                                         images_dev=images,
                                         feathers_dev=feathers, mesh=mesh)
        panoramas.append(result)
    return pl.StitchResult(
        panoramas=panoramas, graph=graph, components=comps, features=feats
    )
