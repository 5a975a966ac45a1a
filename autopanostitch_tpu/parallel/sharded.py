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


def sharded_render_tiles(
    images, feathers, R, K, canvas: dict, mesh: Mesh,
    gains=None, blend_mode: str = "multiband", bands: int = 3,
    tile=(512, 512), angle_power: float = 1.0, sizes=None,
    max_contributors=None, interp: str = "bicubic", axis: str = "data",
    k1=None,
):
    """Rotational render with the TILE axis sharded across chips.

    Same host control plane as the single-chip `render_rotational` (fitted
    tile grid + per-tile contributor culling, `renderPanorama.m:342-406`
    tiling), but the per-tile kernel map is a shard_map over the tile axis:
    chip d renders tiles d, d+n, d+2n, ... with the full interp/blend
    options of the single-chip kernel. Inputs (images, cameras, gains) are
    replicated — they are O(N x view) while the canvas is what scales; the
    only cross-chip data motion is the final gather of rendered tiles.

    Full-width canvas bands (the previous `sharded_render_bands`) defeat
    contributor culling — every image intersects a full-width band, so the
    cost reverts to O(canvas x N). 2-D tiles keep the single-chip cost
    model O(canvas x C).

    Returns (panorama (Hc, Wc, 3) uint8, coverage (Hc, Wc) bool) on host —
    bit-identical to `render_rotational` (same kernel, same tile grid; only
    the tile -> chip assignment differs, which touches no arithmetic).
    """
    import numpy as np

    from autopanostitch_tpu.models.render import (
        _render_tile_impl, assemble_tiles, tile_contributors,
    )

    Hc, Wc = canvas["Hc"], canvas["Wc"]
    # FIXED tile shape — must match render_rotational's grid exactly (the
    # single-chip/sharded bit-identical guarantee rides on identical tiles)
    th, tw = tile
    N = images.shape[0]
    if gains is None:
        gains = np.ones((N, 3), np.float32)
    if sizes is None:
        sizes = np.tile(np.array(images.shape[1:3], np.int32), (N, 1))
    C_arg = None if max_contributors is None else min(max_contributors, N)
    sel, sel_ok, origins = tile_contributors(
        canvas, np.asarray(R, np.float32), np.asarray(K, np.float32),
        np.asarray(sizes), (th, tw), C_arg, k1=k1,
    )
    T = sel.shape[0]
    n = mesh.devices.size
    padT = (-T) % n
    if padT:  # padded tiles: no contributors, origin past the canvas
        sel = np.concatenate([sel, np.zeros((padT, sel.shape[1]), sel.dtype)])
        sel_ok = np.concatenate(
            [sel_ok, np.zeros((padT, sel_ok.shape[1]), bool)]
        )
        origins = np.concatenate(
            [origins, np.full((padT, 2), float(max(Hc, Wc) + th + tw))]
        )

    imgs_d = jnp.asarray(images)
    fea_d = jnp.asarray(feathers)
    R_d = jnp.asarray(np.asarray(R, np.float32).reshape(-1, 3, 3))
    K_d = jnp.asarray(np.asarray(K, np.float32).reshape(-1, 3, 3))
    g_d = jnp.asarray(np.asarray(gains, np.float32))
    R_ref = jnp.asarray(canvas["R_ref"])
    f_pan, x0, y0 = canvas["f_pan"], canvas["x0"], canvas["y0"]
    mode = canvas["mode"]

    # strided tile -> chip assignment (chip d gets tiles d::n): adjacent
    # tiles land on different chips so a hot canvas region load-balances
    order = np.arange(T + padT).reshape(-1, n).T.reshape(-1)
    inv = np.argsort(order)

    k1_d = (
        None if k1 is None
        else jnp.asarray(np.asarray(k1, np.float32).reshape(-1))
    )

    def local(imgs, fea, R_, K_, g_, k1_, sel_l, ok_l, org_l):
        imgs4 = jnp.concatenate([imgs, fea[..., None]], axis=-1)

        def one(args):
            s, ok, org = args
            return _render_tile_impl(
                imgs4, R_, K_, g_, s, ok, org, f_pan, x0, y0, R_ref,
                mode, th, tw, blend_mode, bands, angle_power, interp, k1_,
            )

        return jax.lax.map(one, (sel_l, ok_l, org_l))

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    tiles, covs = jax.jit(fn)(
        imgs_d, fea_d, R_d, K_d, g_d, k1_d,
        jnp.asarray(sel[order]), jnp.asarray(sel_ok[order]),
        jnp.asarray(origins[order], jnp.float32),
    )
    tiles = np.asarray(tiles)[inv][:T]
    covs = np.asarray(covs)[inv][:T]
    return assemble_tiles(tiles, covs, origins[:T], Hc, Wc)


def sharded_gain_stats_imagespace(
    images, feathers, sizes, R, K, mesh: Mesh,
    stride: int = 5, chunk: int = 512, axis: str = "data", k1=None,
):
    """Image-space gain statistics with the grid-point chunk axis sharded.

    Identical math to `gain.overlap_statistics_imagespace` (the single-chip
    gather-free formulation): every chip evaluates the visibility geometry
    for a slice of the strided grid points and the (N, N) / (N, N, 3)
    partial statistics psum over ICI — the SPMD form of the reference's
    parfor reduction variables (`gainCompensationRKf.m:138-147`).

    Returns (Nij (N, N), sumC (N, N, 3)) replicated, for `solve_gains`.
    """
    import numpy as np

    from autopanostitch_tpu.models import gain as gain_stage
    from autopanostitch_tpu.ops import geometry as geo

    images = jnp.asarray(images)
    feathers = jnp.asarray(feathers)
    sizes_d = jnp.asarray(np.asarray(sizes), jnp.int32)
    R = jnp.asarray(np.asarray(R, np.float32))
    K = jnp.asarray(np.asarray(K, np.float32))
    N, H, W, _ = images.shape
    n = mesh.devices.size

    # host-side precompute mirrors overlap_statistics_imagespace exactly
    col_all = images[:, ::stride, ::stride].reshape(N, -1, 3) * 255.0
    wf_own = feathers[:, ::stride, ::stride].reshape(N, -1)
    ys, xs = jnp.mgrid[0:H:stride, 0:W:stride]
    xs = xs.astype(jnp.float32).reshape(-1)
    ys = ys.astype(jnp.float32).reshape(-1)
    Pn = xs.shape[0]
    margin = 1.0
    h_v = sizes_d[:, 0].astype(jnp.float32)[:, None]
    w_v = sizes_d[:, 1].astype(jnp.float32)[:, None]
    own = (
        (xs[None, :] >= margin) & (xs[None, :] <= w_v - 1 - margin)
        & (ys[None, :] >= margin) & (ys[None, :] <= h_v - 1 - margin)
        & (wf_own > 1e-4)
    )
    hi = jax.lax.Precision.HIGHEST
    Rt_Kinv = jnp.matmul(jnp.swapaxes(R, 1, 2), geo.invert_K(K), precision=hi)
    if k1 is None:
        pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
        rays = jnp.einsum("iab,pb->ipa", Rt_Kinv, pix, precision=hi)
        k1_d = None
    else:
        from autopanostitch_tpu.ops import projections as proj

        k1_d = jnp.asarray(np.asarray(k1, np.float32))
        xu, yu = proj.undistort_pixels(
            xs[None, :], ys[None, :], k1_d[:, None],
            K[:, 0, 2][:, None], K[:, 1, 2][:, None],
        )
        pix = jnp.stack([xu, yu, jnp.ones_like(xu)], axis=-1)  # (N, P, 3)
        rays = jnp.einsum("iab,ipb->ipa", Rt_Kinv, pix, precision=hi)

    # chunk the grid axis; pad chunk count to a multiple of the mesh size
    nchunks = ((Pn + chunk - 1) // chunk + n - 1) // n * n
    Ppad = nchunks * chunk

    def padP(x, axis_=1):
        pads = [(0, 0)] * x.ndim
        pads[axis_] = (0, Ppad - Pn)
        return jnp.pad(x, pads)

    rays_p = padP(rays).reshape(N, nchunks, chunk, 3).transpose(1, 0, 2, 3)
    col_p = padP(col_all).reshape(N, nchunks, chunk, 3).transpose(1, 0, 2, 3)
    own_p = padP(own).reshape(N, nchunks, chunk).transpose(1, 0, 2)
    KR = jnp.matmul(K, R, precision=hi)

    def local(rays_l, col_l, own_l):
        def step(carry, inp):
            Nij, sumC = carry
            r_c, col_c, own_c = inp
            prj = jnp.einsum("jab,icb->ijca", KR, r_c)
            z = prj[..., 2]
            zi = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
            u = prj[..., 0] / zi
            v = prj[..., 1] / zi
            if k1_d is not None:
                from autopanostitch_tpu.ops import projections as proj

                u, v = proj.distort_pixels(
                    u, v, k1_d[None, :, None],
                    K[:, 0, 2][None, :, None], K[:, 1, 2][None, :, None],
                )
            vis = (
                (z > 1e-6)
                & (u >= margin) & (u <= w_v[None, :] - 1 - margin)
                & (v >= margin) & (v <= h_v[None, :] - 1 - margin)
            )
            V = (own_c[:, None, :] & vis).astype(jnp.float32)
            Nij = Nij + jnp.sum(V, axis=-1)
            sumC = sumC + jnp.einsum("ijp,ipc->ijc", V, col_c, precision=hi)
            return (Nij, sumC), None

        # scan carry must be marked device-varying inside shard_map (the
        # body mixes it with sharded operands)
        init = jax.lax.pcast(
            (jnp.zeros((N, N)), jnp.zeros((N, N, 3))), (axis,), to="varying"
        )
        (Nij, sumC), _ = jax.lax.scan(step, init, (rays_l, col_l, own_l))
        return jax.lax.psum(Nij, axis), jax.lax.psum(sumC, axis)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(fn)(rays_p, col_p, own_p)


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
