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
from autopanostitch_tpu.ops import projections as proj
from autopanostitch_tpu.ops import sampling as samp

Array = jax.Array


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

    def per_image(img, feather, R_k, K_k, dd):
        u, v, front, _ = proj.project_ray_to_camera(dd, R_k, K_k)
        col, ok = samp.sample_bilinear(img, u, v)
        wf, _ = samp.sample_bilinear(feather[..., None], u, v)
        valid = ok & front & (wf[..., 0] > 1e-4)
        # Brown-Lowe Eq.29 sigmas (sigmaN=10, sigmag=0.1, inputs.m:95-96)
        # are calibrated for 0-255 intensities (the reference samples
        # single(uint8) without dividing); our images are [0,1]
        return col * 255.0, valid

    def step(carry, inputs):
        Nij, sumC = carry
        dd, pv = inputs
        col, valid = jax.vmap(lambda im, fe, Rk, Kk: per_image(im, fe, Rk, Kk, dd))(
            images, feathers, R, K
        )  # (N, chunk, 3), (N, chunk)
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
    """
    N = Nij.shape[0]
    gains = np.ones((N, 3), np.float32)
    sN2 = cfg.sigma_n**2
    sg2 = cfg.sigma_g**2
    iu, ju = np.triu_indices(N, 1)
    ok = Nij[iu, ju] >= min_overlap
    if not ok.any():
        return gains
    A = np.zeros((N, N, 3))
    b = np.zeros((N,))
    for i, j in zip(iu[ok], ju[ok]):
        Kij = Nij[i, j]
        Ibar_ij = sumC[i, j] / Kij  # mean of image i's colors over overlap
        Ibar_ji = sumC[j, i] / Kij
        wN = Kij / sN2
        wG = Kij / sg2
        for c in range(3):
            A[i, i, c] += wN * Ibar_ij[c] ** 2 + wG
            A[j, j, c] += wN * Ibar_ji[c] ** 2 + wG
            A[i, j, c] += -wN * Ibar_ij[c] * Ibar_ji[c]
            A[j, i, c] += -wN * Ibar_ij[c] * Ibar_ji[c]
        b[i] += wG
        b[j] += wG
    for c in range(3):
        x = np.linalg.solve(A[:, :, c] + lambda_diag * np.eye(N), b)
        gains[:, c] = np.clip(x, cfg.clamp[0], cfg.clamp[1])
    return gains


def compute_gains_rotational(
    images, feathers, R, K, mode, f_pan, x0, y0, R_ref, canvas_hw,
    cfg: GainConfig = GainConfig(),
):
    """Full rotational-path gain compensation (device stats + host solve)."""
    if not cfg.enabled:
        return np.ones((images.shape[0], 3), np.float32)
    Hc, Wc = canvas_hw
    stride = cfg.grid_stride
    gh = max(1, int(np.ceil(Hc / stride)))
    gw = max(1, int(np.ceil(Wc / stride)))
    Nij, sumC = overlap_statistics(
        images, feathers, R, K, mode, f_pan, x0, y0, R_ref,
        jnp.float32(stride), gh, gw,
    )
    return solve_gains(np.asarray(Nij), np.asarray(sumC), cfg)
