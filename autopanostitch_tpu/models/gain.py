"""Gain compensation (Brown-Lowe Eq. 29), rotational and planar paths.

TPU-native redesign of `gainCompensation/gainCompensationRKf.m`:
- the reference loops tiles, projecting a stride-5 subsampled pano grid into
  every camera and accumulating pairwise overlap counts and color sums with
  parfor reduction variables (`:126-159,319-365`);
- here the whole grid is one device program: validity (N, G) and color
  (N, G, 3) tensors reduce to the (N, N) statistics via MXU matmuls
  (Nij = V V^T), chunked over G by lax.scan so memory stays bounded.
  On a multi-chip mesh the grid axis shards and the statistics psum over
  ICI (parallel/sharded.py psum_gain_stats).

The tiny (N, N) per-channel solve (`:180-234`) runs on host numpy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.config import GainConfig
from autopanostitch_tpu.utils import buckets
from autopanostitch_tpu.ops import projections as proj
from autopanostitch_tpu.ops import sampling as samp

Array = jax.Array

# N at and above which the image-space gain statistics fall back to the
# host-dispatched chunk loop: the single-program (lax.scan) form crashes
# the TPU runtime at N >= 160 on the 2026-08 toolchain (bisection:
# tools/repro_gain_fault.py; docs/ROUND4.md "N>=160 gain-statistics
# kernel fault"). 128 leaves margin below the smallest crashing N.
GAIN_HOST_LOOP_MIN_N = 129
# camera-block size for the N >= GAIN_HOST_LOOP_MIN_N block-pair path:
# every dispatched tensor keeps the (<=128, <=128, chunk) footprint the
# one-shot path runs proven-safe (the r4 grid-chunk host loop alone still
# faulted at pano200 scale, N=256 x 288x384 — 2026-08-21 repro)
GAIN_BLOCK = 128


def overlap_statistics_imagespace(
    images: Array,  # (N, H, W, 3)
    feathers: Array,  # (N, H, W)
    sizes: Array,  # (N, 2) valid (h, w)
    R: Array,  # (N, 3, 3) world -> cam
    K: Array,  # (N, 3, 3)
    stride: int,
    chunk: int = 512,
    margin: float = 1.0,
    k1: Array | None = None,  # (N,) radial distortion (None = pinhole)
    force_host_loop: bool = False,  # test hook: exercise the N>=160 path
):
    """Overlap statistics sampled on each image's OWN strided pixel grid.

    Gather-free formulation (the TPU has no gather hardware; point
    gathers measured ~65 M taps/s and dominated the canvas-grid variant):
    colors come from a static strided slice of each image, and only the
    GEOMETRY of visibility in every other camera is evaluated — ray
    per grid point, project into all N cameras (one MXU einsum), bounds
    test. This is also the reference's own measure: `Ibar_ij` is the mean
    of image i's pixels over overlap(i, j)
    (`gainCompensationRKf.m:126-159`).

    The j-side feather test is approximated by a `margin`-pixel inset of
    j's valid rectangle (the feather ramp is nonzero strictly inside it).

    Structure for N < `GAIN_HOST_LOOP_MIN_N`: ONE prep executable + ONE
    scan-over-chunks executable (two dispatches total). At N >=
    `GAIN_HOST_LOOP_MIN_N` the scan body is dispatched from a host loop
    instead (chunk index a traced scalar, so every dispatch reuses the
    same program): the single-program form — lax.scan OR fully unrolled —
    reproducibly CRASHES the TPU runtime ("kernel fault") for N >= 160 on
    the 2026-08 toolchain, while the identical math dispatched
    chunk-by-chunk runs fine (repro: `tools/repro_gain_fault.py`; numeric
    equivalence of the two paths is pinned by
    `tests/test_gain.py::test_gain_oneshot_matches_host_loop`). The loop
    costs nchunks x ~27 ms of relay sync.

    Returns (Nij (N, N), sumC (N, N, 3)); Nij is ASYMMETRIC (counts on
    image i's grid) — `solve_gains` consumes both directions.
    """
    use_k1 = k1 is not None
    k1_arr = jnp.zeros((images.shape[0],), jnp.float32) if k1 is None else k1
    N = images.shape[0]
    if N < GAIN_HOST_LOOP_MIN_N and not force_host_loop:
        return _overlap_imagespace_oneshot(
            images, feathers, sizes, R, K, stride, chunk, margin, k1_arr,
            use_k1,
        )
    # N above the one-shot scale: EVERYTHING — including the prep — runs
    # per CAMERA BLOCK of GAIN_BLOCK cameras, and the statistics
    # accumulate over block pairs (plus the grid-chunk axis) dispatched
    # from the host. Bisection on the chip (2026-08-21): the r4 host loop
    # over grid chunks alone still faults the TPU runtime at pano200
    # scale, and the faulting kernel is `_overlap_prep` itself at
    # (256, 288, 384) — while every tensor at the (<=128 cameras) block
    # footprint is exactly what the proven N<=128 one-shot path runs.
    # Block index arguments are traced, so one executable serves every
    # block / block pair.
    B = GAIN_BLOCK
    nblk = (N + B - 1) // B
    Np = nblk * B
    if Np != N:  # pad camera axis so blocks are uniform (masked: size 0)
        padn = Np - N
        images = jnp.pad(images, ((0, padn),) + ((0, 0),) * 3)
        feathers = jnp.pad(feathers, ((0, padn), (0, 0), (0, 0)))
        sizes = jnp.pad(sizes, ((0, padn), (0, 0)))
        R = jnp.pad(R, ((0, padn), (0, 0), (0, 0)))
        R = R.at[N:].set(jnp.eye(3, dtype=R.dtype))
        K = jnp.pad(K, ((0, padn), (0, 0), (0, 0)))
        K = K.at[N:].set(jnp.eye(3, dtype=K.dtype))
        k1_arr = jnp.pad(k1_arr, (0, padn))
    preps = []
    for ib in range(nblk):
        blk = _slice_camera_block(
            images, feathers, sizes, R, K, k1_arr, jnp.int32(ib * B), B
        )
        img_b, fea_b, sz_b, R_b, K_b, k1_b = blk
        rays_b, col_b, own_b, KR_b = _overlap_prep(
            img_b, fea_b, sz_b, R_b, K_b, stride, chunk, margin, k1_b,
            use_k1,
        )
        preps.append((rays_b, col_b, own_b, KR_b, K_b, sz_b, k1_b))
    nchunks = preps[0][0].shape[0]
    acc = (jnp.zeros((Np, Np)), jnp.zeros((Np, Np, 3)))
    for c in range(nchunks):
        for ib in range(nblk):
            rays_i, col_i, own_i = preps[ib][0], preps[ib][1], preps[ib][2]
            for jb in range(nblk):
                _, _, _, KR_j, K_j, sz_j, k1_j = preps[jb]
                acc = _overlap_block_acc(
                    acc[0], acc[1], rays_i, col_i, own_i, KR_j, K_j, sz_j,
                    k1_j, jnp.int32(c), jnp.int32(ib * B), jnp.int32(jb * B),
                    margin, use_k1,
                )
    if Np != N:
        return acc[0][:N, :N], acc[1][:N, :N]
    return acc


@partial(jax.jit, static_argnames=("B",))
def _slice_camera_block(images, feathers, sizes, R, K, k1, i0, B):
    """One GAIN_BLOCK-camera slice of the stack (traced start index: one
    executable serves every block)."""
    return (
        jax.lax.dynamic_slice_in_dim(images, i0, B, 0),
        jax.lax.dynamic_slice_in_dim(feathers, i0, B, 0),
        jax.lax.dynamic_slice_in_dim(sizes, i0, B, 0),
        jax.lax.dynamic_slice_in_dim(R, i0, B, 0),
        jax.lax.dynamic_slice_in_dim(K, i0, B, 0),
        jax.lax.dynamic_slice_in_dim(k1, i0, B, 0),
    )


@partial(jax.jit, static_argnames=("margin", "use_k1"))
def _overlap_block_acc(
    Nij, sumC, rays_pi, col_pi, own_pi, KR_j, K_j, sz_j, k1_j, c, i0, j0,
    margin, use_k1,
):
    """Accumulate one (grid chunk, i-block, j-block) cell of the overlap
    statistics. Same math as `_overlap_chunk_acc` restricted to a
    (B, B, chunk) tensor footprint (see the block-pair rationale at the
    call site); the chunk index and block starts are traced, so one
    executable serves every cell."""
    r_i = jax.lax.dynamic_index_in_dim(rays_pi, c, 0, keepdims=False)
    col_i = jax.lax.dynamic_index_in_dim(col_pi, c, 0, keepdims=False)
    own_i = jax.lax.dynamic_index_in_dim(own_pi, c, 0, keepdims=False)
    B = r_i.shape[0]
    h_v = sz_j[:, 0].astype(jnp.float32)[:, None]  # (B, 1)
    w_v = sz_j[:, 1].astype(jnp.float32)[:, None]
    prj = jnp.einsum("jab,icb->ijca", KR_j, r_i)  # (B, B, chunk, 3)
    z = prj[..., 2]
    zi = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = prj[..., 0] / zi
    v = prj[..., 1] / zi
    if use_k1:
        u, v = proj.distort_pixels(
            u, v, k1_j[None, :, None],
            K_j[:, 0, 2][None, :, None], K_j[:, 1, 2][None, :, None],
        )
    vis = (
        (z > 1e-6)
        & (u >= margin) & (u <= w_v[None, :] - 1 - margin)
        & (v >= margin) & (v <= h_v[None, :] - 1 - margin)
    )
    V = (own_i[:, None, :] & vis).astype(jnp.float32)
    dN = jnp.sum(V, axis=-1)  # (B, B)
    dC = jnp.einsum("ijp,ipc->ijc", V, col_i,
                    precision=jax.lax.Precision.HIGHEST)
    blkN = jax.lax.dynamic_slice(Nij, (i0, j0), (B, B))
    blkC = jax.lax.dynamic_slice(sumC, (i0, j0, 0), (B, B, 3))
    Nij = jax.lax.dynamic_update_slice(Nij, blkN + dN, (i0, j0))
    sumC = jax.lax.dynamic_update_slice(sumC, blkC + dC, (i0, j0, 0))
    return Nij, sumC


@partial(jax.jit, static_argnames=("stride", "chunk", "margin", "use_k1"))
def _overlap_imagespace_oneshot(
    images, feathers, sizes, R, K, stride, chunk, margin, k1, use_k1,
):
    """Single-executable form of `overlap_statistics_imagespace`: the prep
    plus a lax.scan over grid chunks running the SAME accumulate body as
    the host-loop path (bit-identical accumulation order)."""
    N = images.shape[0]
    rays_p, col_p, own_p, KR = _overlap_prep(
        images, feathers, sizes, R, K, stride, chunk, margin, k1, use_k1
    )

    def step(acc, c):
        return (
            _overlap_chunk_acc(
                acc[0], acc[1], rays_p, col_p, own_p, KR, K, sizes,
                c, margin, k1, use_k1,
            ),
            None,
        )

    acc0 = (jnp.zeros((N, N)), jnp.zeros((N, N, 3)))
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(rays_p.shape[0], dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("stride", "chunk", "margin", "use_k1"))
def _overlap_prep(
    images, feathers, sizes, R, K, stride, chunk, margin, k1, use_k1,
):
    """Grid colors, world rays, own-validity — chunked along the grid axis
    (nchunks, N, chunk, ...) for the dispatch loop."""
    from autopanostitch_tpu.ops import geometry as geo

    N, H, W, _ = images.shape
    col_all = images[:, ::stride, ::stride].reshape(N, -1, 3) * 255.0
    wf_own = feathers[:, ::stride, ::stride].reshape(N, -1)
    ys, xs = jnp.mgrid[0:H:stride, 0:W:stride]
    xs = xs.astype(jnp.float32).reshape(-1)
    ys = ys.astype(jnp.float32).reshape(-1)
    P = xs.shape[0]
    h_v = sizes[:, 0].astype(jnp.float32)[:, None]  # (N, 1)
    w_v = sizes[:, 1].astype(jnp.float32)[:, None]
    own = (
        (xs[None, :] >= margin) & (xs[None, :] <= w_v - 1 - margin)
        & (ys[None, :] >= margin) & (ys[None, :] <= h_v - 1 - margin)
        & (wf_own > 1e-4)
    )  # (N, P)

    Rt_Kinv = jnp.matmul(
        jnp.swapaxes(R, 1, 2), geo.invert_K(K),
        precision=jax.lax.Precision.HIGHEST,
    )
    if not use_k1:
        pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (P, 3)
        rays = jnp.einsum(
            "iab,pb->ipa", Rt_Kinv, pix, precision=jax.lax.Precision.HIGHEST
        )  # (N, P, 3) world rays per image grid point
    else:
        # grid pixels live in each DISTORTED image; rays exist for pinhole
        # coords, so undistort per image first (exact direction)
        cxs = K[:, 0, 2][:, None]
        cys = K[:, 1, 2][:, None]
        xu, yu = proj.undistort_pixels(
            xs[None, :], ys[None, :], k1[:, None], cxs, cys
        )  # (N, P)
        pix = jnp.stack([xu, yu, jnp.ones_like(xu)], axis=-1)  # (N, P, 3)
        rays = jnp.einsum(
            "iab,ipb->ipa", Rt_Kinv, pix, precision=jax.lax.Precision.HIGHEST
        )
    KR = jnp.matmul(K, R, precision=jax.lax.Precision.HIGHEST)  # (N, 3, 3)

    nchunks = (P + chunk - 1) // chunk
    Ppad = nchunks * chunk

    def padP(x, axis=1):
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, Ppad - P)
        return jnp.pad(x, pads)

    rays_p = padP(rays).reshape(N, nchunks, chunk, 3).transpose(1, 0, 2, 3)
    col_p = padP(col_all).reshape(N, nchunks, chunk, 3).transpose(1, 0, 2, 3)
    own_p = padP(own).reshape(N, nchunks, chunk).transpose(1, 0, 2)
    return rays_p, col_p, own_p, KR


@partial(jax.jit, static_argnames=("margin", "use_k1"))
def _overlap_chunk_acc(
    Nij, sumC, rays_p, col_p, own_p, KR, K, sizes, c, margin, k1, use_k1,
):
    """Accumulate one grid chunk's visibility counts / color sums."""
    r_c = jax.lax.dynamic_index_in_dim(rays_p, c, 0, keepdims=False)
    col_c = jax.lax.dynamic_index_in_dim(col_p, c, 0, keepdims=False)
    own_c = jax.lax.dynamic_index_in_dim(own_p, c, 0, keepdims=False)
    h_v = sizes[:, 0].astype(jnp.float32)[:, None]  # (N, 1)
    w_v = sizes[:, 1].astype(jnp.float32)[:, None]
    prj = jnp.einsum("jab,icb->ijca", KR, r_c)  # (i, j, C, 3)
    z = prj[..., 2]
    zi = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = prj[..., 0] / zi
    v = prj[..., 1] / zi
    if use_k1:
        # bounds live in j's DISTORTED image: map pinhole -> distorted
        u, v = proj.distort_pixels(
            u, v, k1[None, :, None],
            K[:, 0, 2][None, :, None], K[:, 1, 2][None, :, None],
        )
    vis = (
        (z > 1e-6)
        & (u >= margin) & (u <= w_v[None, :] - 1 - margin)
        & (v >= margin) & (v <= h_v[None, :] - 1 - margin)
    )  # (i, j, C) with j's bounds broadcast
    V = (own_c[:, None, :] & vis).astype(jnp.float32)
    return Nij + jnp.sum(V, axis=-1), sumC + jnp.einsum(
        "ijp,ipc->ijc", V, col_c, precision=jax.lax.Precision.HIGHEST
    )


@partial(jax.jit, static_argnames=("mode", "grid_h", "grid_w", "chunk"))
def overlap_statistics(
    images: Array,  # (N, H, W, 3)
    feathers: Array,  # (N, H, W)
    R: Array,  # (N, 3, 3)
    K: Array,  # (N, 3, 3)
    mode: str,
    f_pan,
    x0,
    y0,
    R_ref: Array,
    stride,
    grid_h: int,
    grid_w: int,
    chunk: int = 16384,
):
    """Accumulate (N,N) overlap counts and (N,N,3) color sums over the
    subsampled panorama grid (reference `:100-159,319-365`).

    grid_h/grid_w: static subsampled grid shape; stride maps it to canvas px.
    """
    N = images.shape[0]
    ys, xs = jnp.mgrid[0:grid_h, 0:grid_w]
    xp = (xs * stride).astype(jnp.float32).reshape(-1)
    yp = (ys * stride).astype(jnp.float32).reshape(-1)
    G = xp.shape[0]
    d = proj.pano_to_ray(mode, xp, yp, f_pan, x0, y0, R_ref)  # (G, 3)

    nchunks = (G + chunk - 1) // chunk
    Gpad = nchunks * chunk
    d = jnp.pad(d, ((0, Gpad - G), (0, 0)))
    pad_valid = jnp.pad(jnp.ones((G,), bool), (0, Gpad - G))

    def step(carry, inputs):
        Nij, sumC = carry
        dd, pv = inputs
        # project the chunk's rays into EVERY camera (small math, vmapped),
        # then one fused flat-batch gather over the image stack (a vmapped
        # per-image sample_bilinear lowered to a ~20 M samples/s gather;
        # the flat batch runs at full gather throughput)
        u, v, front, _ = jax.vmap(
            lambda Rk, Kk: proj.project_ray_to_camera(dd, Rk, Kk)
        )(R, K)  # (N, chunk) each
        col, ok = samp.sample_bilinear_batch(images, u, v)
        wf, _ = samp.sample_bilinear_batch(feathers[..., None], u, v)
        valid = ok & front & (wf[..., 0] > 1e-4)
        # Brown-Lowe Eq.29 sigmas (sigmaN=10, sigmag=0.1, inputs.m:95-96)
        # are calibrated for 0-255 intensities (the reference samples
        # single(uint8) without dividing); our images are [0,1]
        col = col * 255.0  # (N, chunk, 3)
        V = (valid & pv[None, :]).astype(jnp.float32)
        Nij = Nij + jax.lax.dot_general(
            V, V, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # sumC[i, j, c] = sum_g V_i V_j col_i  -> per channel (V*col_c) @ V^T
        for c in range(3):
            vc = V * col[:, :, c]
            sumC = sumC.at[:, :, c].add(
                jax.lax.dot_general(
                    vc, V, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
        return (Nij, sumC), None

    init = (jnp.zeros((N, N)), jnp.zeros((N, N, 3)))
    (Nij, sumC), _ = jax.lax.scan(
        step,
        init,
        (d.reshape(nchunks, chunk, 3), pad_valid.reshape(nchunks, chunk)),
    )
    return Nij, sumC


@partial(jax.jit, static_argnames=("grid_h", "grid_w", "chunk"))
def overlap_statistics_planar(
    images: Array,  # (N, H, W, 3)
    feathers: Array,  # (N, H, W)
    H_inv: Array,  # (N, 3, 3) canvas coord -> source pixel
    x0,
    y0,
    stride,
    grid_h: int,
    grid_w: int,
    chunk: int = 16384,
):
    """Planar-path overlap statistics (reference `gainCompensationH.m`):
    the canvas subgrid maps into each image through its inverse homography
    instead of ray projection; the reference instead recomputes stats from
    already-warped canvas images (`:44-149`) — mapping the grid is the same
    math without materializing N warped canvases."""
    N = images.shape[0]
    ys, xs = jnp.mgrid[0:grid_h, 0:grid_w]
    xp = (xs * stride).astype(jnp.float32).reshape(-1) + x0
    yp = (ys * stride).astype(jnp.float32).reshape(-1) + y0
    G = xp.shape[0]
    nchunks = (G + chunk - 1) // chunk
    Gpad = nchunks * chunk
    xp = jnp.pad(xp, (0, Gpad - G))
    yp = jnp.pad(yp, (0, Gpad - G))
    pad_valid = jnp.pad(jnp.ones((G,), bool), (0, Gpad - G))

    def per_image(img, feather, Hi, xx, yy):
        den = Hi[2, 0] * xx + Hi[2, 1] * yy + Hi[2, 2]
        den = jnp.where(jnp.abs(den) < 1e-10, 1e-10, den)
        u = (Hi[0, 0] * xx + Hi[0, 1] * yy + Hi[0, 2]) / den
        v = (Hi[1, 0] * xx + Hi[1, 1] * yy + Hi[1, 2]) / den
        col, ok = samp.sample_bilinear(img, u, v)
        wf, _ = samp.sample_bilinear(feather[..., None], u, v)
        valid = ok & (wf[..., 0] > 1e-4) & (den > 0)
        return col * 255.0, valid  # 0-255 scale, see overlap_statistics

    def step(carry, inputs):
        Nij, sumC = carry
        xx, yy, pv = inputs
        col, valid = jax.vmap(lambda im, fe, Hi: per_image(im, fe, Hi, xx, yy))(
            images, feathers, H_inv
        )
        V = (valid & pv[None, :]).astype(jnp.float32)
        Nij = Nij + jax.lax.dot_general(
            V, V, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        for c in range(3):
            vc = V * col[:, :, c]
            sumC = sumC.at[:, :, c].add(
                jax.lax.dot_general(
                    vc, V, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
        return (Nij, sumC), None

    init = (jnp.zeros((N, N)), jnp.zeros((N, N, 3)))
    (Nij, sumC), _ = jax.lax.scan(
        step,
        init,
        (
            xp.reshape(nchunks, chunk),
            yp.reshape(nchunks, chunk),
            pad_valid.reshape(nchunks, chunk),
        ),
    )
    return Nij, sumC


def compute_gains_planar(
    images, feathers, H_inv, x0, y0, canvas_hw, cfg: GainConfig = GainConfig()
):
    """Planar-path gain compensation (reference `gainCompensationH.m`)."""
    n = images.shape[0]
    if not cfg.enabled:
        return np.ones((n, 3), np.float32)
    Hc, Wc = canvas_hw
    stride = cfg.grid_stride
    gh = max(1, int(np.ceil(Hc / stride)))
    gw = max(1, int(np.ceil(Wc / stride)))
    Nij, sumC = overlap_statistics_planar(
        jnp.asarray(images), jnp.asarray(feathers), jnp.asarray(H_inv),
        x0, y0, jnp.float32(stride), gh, gw,
    )
    return solve_gains(np.asarray(Nij), np.asarray(sumC), cfg)


def solve_gains(
    Nij: np.ndarray,
    sumC: np.ndarray,
    cfg: GainConfig = GainConfig(),
    min_overlap: int = 50,
    lambda_diag: float = 1e-8,
) -> np.ndarray:
    """Per-channel (N, N) gain solve (reference `gainCompensationRKf.m:180-234`).

    Data term: Nij * (g_i Ibar_ij - g_j Ibar_ji)^2 / sigmaN^2;
    prior:     Nij * (g_i - 1)^2 / sigmag^2. Clamped to cfg.clamp.

    Accepts asymmetric counts (image-space statistics count on image i's
    own grid): means use each direction's own count, the pair weight uses
    their mean; symmetric canvas-grid inputs reduce to the original form.
    """
    N = Nij.shape[0]
    gains = np.ones((N, 3), np.float32)
    sN2 = cfg.sigma_n**2
    sg2 = cfg.sigma_g**2
    iu, ju = np.triu_indices(N, 1)
    ok = np.minimum(Nij[iu, ju], Nij[ju, iu]) >= min_overlap
    if not ok.any():
        return gains
    ii, jj = iu[ok], ju[ok]
    Kij = 0.5 * (Nij[ii, jj] + Nij[jj, ii])  # (P,)
    Ibar_ij = sumC[ii, jj] / Nij[ii, jj, None]  # (P, 3) mean of i over overlap
    Ibar_ji = sumC[jj, ii] / Nij[jj, ii, None]
    wN = Kij / sN2
    wG = Kij / sg2
    A = np.zeros((N, N, 3))
    b = np.zeros((N,))
    np.add.at(A, (ii, ii), wN[:, None] * Ibar_ij**2 + wG[:, None])
    np.add.at(A, (jj, jj), wN[:, None] * Ibar_ji**2 + wG[:, None])
    cross = -wN[:, None] * Ibar_ij * Ibar_ji
    np.add.at(A, (ii, jj), cross)
    np.add.at(A, (jj, ii), cross)
    np.add.at(b, ii, wG)
    np.add.at(b, jj, wG)
    for c in range(3):
        x = np.linalg.solve(A[:, :, c] + lambda_diag * np.eye(N), b)
        gains[:, c] = np.clip(x, cfg.clamp[0], cfg.clamp[1])
    return gains


def compute_gains_rotational(
    images, feathers, R, K, sizes, cfg: GainConfig = GainConfig(), k1=None,
):
    """Full rotational-path gain compensation (device stats + host solve).

    Statistics are sampled on each image's own strided grid
    (:func:`overlap_statistics_imagespace` — gather-free and the
    reference's own measure); the canvas-grid variant remains available
    as :func:`overlap_statistics` for the sharded psum path."""
    if not cfg.enabled:
        return np.ones((images.shape[0], 3), np.float32)
    # N-bucket (utils/buckets.py): padded cameras carry size (0, 0) — they
    # contribute no grid points and pass no bounds test, so their stats
    # rows/cols stay zero and the N x N host solve simply ignores them.
    # K pads to identity so the padded-camera math stays finite.
    N = int(images.shape[0])
    # floor 64 so all small datasets share the stats executable; the
    # per-point camera-projection einsum is O(N) so a wide rung is cheap
    Nb = buckets.coarse(N, (64, 128, 256, 512, 1024))
    if Nb != N:
        pad = Nb - N
        images = jnp.pad(images, ((0, pad), (0, 0), (0, 0), (0, 0)))
        feathers = jnp.pad(feathers, ((0, pad), (0, 0), (0, 0)))
        sizes = np.pad(np.asarray(sizes), ((0, pad), (0, 0)))
        R = np.concatenate(
            [np.asarray(R, np.float32),
             np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))])
        K = np.concatenate(
            [np.asarray(K, np.float32),
             np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))])
        if k1 is not None:
            k1 = np.pad(np.asarray(k1, np.float32), (0, pad))
    Nij, sumC = overlap_statistics_imagespace(
        images, feathers, jnp.asarray(np.asarray(sizes), jnp.int32),
        jnp.asarray(np.asarray(R, np.float32)),
        jnp.asarray(np.asarray(K, np.float32)),
        int(cfg.grid_stride),
        k1=None if k1 is None else jnp.asarray(np.asarray(k1, np.float32)),
    )
    return solve_gains(np.asarray(Nij)[:N, :N], np.asarray(sumC)[:N, :N], cfg)
