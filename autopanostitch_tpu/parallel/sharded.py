"""Multi-chip sharded pipeline stages (shard_map + collectives over ICI).

Mapping of the reference's parallelism (SURVEY.md section 2.2) to the mesh:
- parfor over images  (`loadImages.m:82-99`)      -> images sharded on axis 0
- global kNN matching (`featureMatchingGlobal.m`) -> query-block sharding,
  each chip streams the full pooled matrix (replicated) against its queries;
  the pooled matrix is small (<= a few hundred MB) so replication beats an
  all-gather per block
- parfor over pairs   (`imageMatching.m:121-156`) -> pair axis sharded
- gain-comp overlap statistics                     -> psum over ICI
- canvas tiles                                     -> tile rows sharded
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from autopanostitch_tpu.config import DetectorConfig
from autopanostitch_tpu.ops import matching as mt
from autopanostitch_tpu.ops import ransac as rs
from autopanostitch_tpu.ops import sift


def sharded_extract(images, mesh: Mesh, cfg: DetectorConfig, axis: str = "data"):
    """SIFT over images sharded across chips (data parallelism).

    images: (N, H, W) gray, N divisible by mesh size.
    """
    sharding = NamedSharding(mesh, P(axis))

    @partial(jax.jit, out_shardings=None)
    def run(imgs):
        imgs = jax.lax.with_sharding_constraint(imgs, sharding)
        return sift.extract_batch(imgs, cfg)

    return run(jax.device_put(images, sharding))


def sharded_global_knn(desc, mask, image_id, mesh: Mesh, k: int = 4, axis: str = "data"):
    """Global kNN with the query axis sharded over chips.

    Each chip owns a contiguous slice of queries and scans the (replicated)
    pooled descriptor matrix — the communication-optimal layout when the
    pool fits in HBM (F x 128 f32 = 0.5 MB per 1k features).
    """
    F = desc.shape[0]
    n = mesh.devices.size
    pad = (-F) % n
    descp = jnp.pad(desc, ((0, pad), (0, 0)))
    maskp = jnp.pad(mask, (0, pad))
    idp = jnp.pad(image_id, (0, pad), constant_values=-1)

    def local(desc_q, mask_q, id_q, desc_all, mask_all, id_all):
        d = mt.pairwise_sqdist(desc_q, desc_all)
        bad = (id_q[:, None] == id_all[None, :]) | ~mask_all[None, :] | ~mask_q[:, None]
        d = jnp.where(bad, jnp.float32(1e18), d)
        neg, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32), -neg

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    nn_idx, nn_dist = jax.jit(fn)(descp, maskp, idp, descp, maskp, idp)
    return nn_idx[:F], nn_dist[:F]


def sharded_verify_pairs(pair_src, pair_dst, pair_mask, keys, mesh: Mesh,
                         axis: str = "data", **kw):
    """RANSAC pair verification with the pair axis sharded across chips."""
    P_, M = pair_mask.shape
    n = mesh.devices.size
    pad = (-P_) % n

    def padp(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    ps, pd, pm, ks = padp(pair_src), padp(pair_dst), padp(pair_mask), padp(keys)
    sharding = NamedSharding(mesh, P(axis))

    @jax.jit
    def run(s, d, m, k):
        s = jax.lax.with_sharding_constraint(s, sharding)
        return rs.verify_pairs(s, d, m, k, chunk=max(1, min(8, s.shape[0])), **kw)

    out = run(
        jax.device_put(ps, sharding),
        jax.device_put(pd, sharding),
        jax.device_put(pm, sharding),
        jax.device_put(ks, sharding),
    )
    return {key: v[:P_] for key, v in out.items()}


def multichip_pipeline_step(mesh: Mesh, cfg: DetectorConfig, axis: str = "data"):
    """One fully-sharded pipeline step as a single jitted function.

    This is the framework's "training step" analogue: per-image SIFT (DP
    over images), pooled global kNN (query sharding, shard_map), batched
    RANSAC verification (pair sharding), and a psum reduction of
    gain-compensation statistics — all inside one jit over the mesh.

    Returns a function (images, pair_src, pair_dst, pair_mask, keys,
    gain_overlap, gain_colors) -> dict of outputs.
    """
    img_sh = NamedSharding(mesh, P(axis))

    def knn_local(desc_q, mask_q, id_q, desc_all, mask_all, id_all):
        d = mt.pairwise_sqdist(desc_q, desc_all)
        bad = (id_q[:, None] == id_all[None, :]) | ~mask_all[None, :] | ~mask_q[:, None]
        d = jnp.where(bad, jnp.float32(1e18), d)
        neg, idx = jax.lax.top_k(-d, 2)
        return idx.astype(jnp.int32), -neg

    knn = jax.shard_map(
        knn_local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
    )

    psum2 = jax.shard_map(
        lambda a, b: (jax.lax.psum(a, axis), jax.lax.psum(b, axis)),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P()),
    )

    @jax.jit
    def step(images, pair_src, pair_dst, pair_mask, keys, gain_overlap, gain_colors):
        images = jax.lax.with_sharding_constraint(images, img_sh)
        feats = sift.extract_batch(images, cfg)
        N, K, D = feats.desc.shape
        desc = feats.desc.reshape(N * K, D)
        mask = feats.mask.reshape(N * K)
        ids = jnp.repeat(jnp.arange(N, dtype=jnp.int32), K)
        nn_idx, nn_dist = knn(desc, mask, ids, desc, mask, ids)

        pair_src = jax.lax.with_sharding_constraint(pair_src, img_sh)
        ver = rs.verify_pairs(
            pair_src, pair_dst, pair_mask, keys, chunk=max(1, pair_mask.shape[0] // mesh.devices.size)
        )
        ov, cs = psum2(gain_overlap, gain_colors)
        return {
            "n_keypoints": jnp.sum(mask),
            "nn_idx": nn_idx,
            "nn_dist": nn_dist,
            "H": ver["H"],
            "accepted": ver["accepted"],
            "gain_overlap": ov,
            "gain_colors": cs,
        }

    return step


def sharded_render_bands(
    images, feathers, R, K, gains, canvas: dict, mesh: Mesh,
    blend_mode: str = "linear", bands: int = 3, angle_power: float = 1.0,
    axis: str = "data",
):
    """Rotational render with canvas row-bands sharded across chips.

    Each chip renders Hc/n_devices rows of the panorama (images replicated —
    they are small; the canvas is what scales). This is the pipeline's
    'context parallelism' analogue (SURVEY.md section 5): no communication
    at all except the final gather of bands.

    Returns (panorama (Hc_pad, Wc, 3) uint8, coverage) with Hc_pad the
    band-aligned height (trim to canvas['Hc']).
    """
    from autopanostitch_tpu.models.render import render_tile

    n = mesh.devices.size
    Hc, Wc = canvas["Hc"], canvas["Wc"]
    band_h = -(-Hc // n)
    band_h = ((band_h + 7) // 8) * 8  # sublane-align
    N = images.shape[0]
    sel = jnp.arange(N, dtype=jnp.int32)
    sel_ok = jnp.ones((N,), bool)
    R_ref = jnp.asarray(canvas["R_ref"])

    def local(images, feathers, R, K, gains):
        b = jax.lax.axis_index(axis)
        origin = jnp.stack([0.0, b.astype(jnp.float32) * band_h])
        tile, cov = render_tile(
            images, feathers, R, K, gains, sel, sel_ok, origin,
            canvas["f_pan"], canvas["x0"], canvas["y0"], R_ref,
            canvas["mode"], band_h, Wc, blend_mode, bands, angle_power,
        )
        return tile, cov

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    pano, cover = jax.jit(fn)(
        jnp.asarray(images), jnp.asarray(feathers),
        jnp.asarray(R, jnp.float32).reshape(-1, 3, 3),
        jnp.asarray(K, jnp.float32).reshape(-1, 3, 3),
        jnp.asarray(gains, jnp.float32),
    )
    return pano, cover


def psum_gain_stats(local_overlap, local_colorsum, mesh: Mesh, axis: str = "data"):
    """Reduce gain-compensation overlap statistics across chips.

    The canvas grid is sharded over chips; each computes partial (N, N)
    overlap counts and (N, N, 3) color sums; a psum over ICI yields the
    global normal-equation inputs (`gainCompensationRKf.m:138-147` parfor
    reduction -> psum).
    """
    fn = jax.shard_map(
        lambda a, b: (jax.lax.psum(a, axis), jax.lax.psum(b, axis)),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(fn)(local_overlap, local_colorsum)
