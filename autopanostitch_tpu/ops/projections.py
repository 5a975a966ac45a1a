"""Panorama surface projections: pano pixel <-> world unit ray.

Five projections matching the reference renderer:
  planar (= perspective), cylindrical, spherical, equirectangular (alias of
  spherical with full-range bounds), stereographic.

Forward map (ray -> surface coordinates) mirrors the reference bounds
functions (`renderPanorama/renderPanorama.m:1507-1754`); inverse map (pano
pixel -> world unit ray) mirrors the tile loop
(`renderPanorama/renderPanorama.m:349-390`).

Coordinate conventions: world->camera rotation R, camera looks down +Z,
x right, y down. Pano pixel (xp, yp) is 0-based. Surface coordinate of
pixel xp is `origin + xp / f_pan`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST  # TPU matmuls default to bf16; geometry must be exact

PROJECTIONS = ("planar", "cylindrical", "spherical", "equirectangular", "stereographic")


def normalize_rays(d: Array) -> Array:
    n = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    return d / jnp.maximum(n, 1e-8)


def pano_to_ray(mode: str, xp: Array, yp: Array, f_pan, x0, y0, R_ref: Array | None = None) -> Array:
    """Pano pixel grid -> unit world rays.

    Args:
      mode: one of PROJECTIONS.
      xp, yp: pixel coordinates, any broadcastable shape (...,).
      f_pan: panorama focal (pixels per surface unit).
      x0, y0: surface-coordinate origin (theta0/h0, theta0/phi0, u0/v0, a0/b0).
      R_ref: 3x3 world->ref rotation (planar & stereographic only).

    Returns:
      (..., 3) unit world direction vectors.
    """
    u = x0 + xp / f_pan
    v = y0 + yp / f_pan
    if mode == "cylindrical":
        # renderPanorama.m:353-356
        d = jnp.stack([jnp.sin(u), v, jnp.cos(u)], axis=-1)
    elif mode in ("spherical", "equirectangular"):
        # renderPanorama.m:358-362
        cphi = jnp.cos(v)
        d = jnp.stack([cphi * jnp.sin(u), jnp.sin(v), cphi * jnp.cos(u)], axis=-1)
    elif mode in ("planar", "perspective"):
        # renderPanorama.m:364-371: d_world = R_ref^T @ [u, v, 1]
        d = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)
        d = jnp.einsum("ji,...j->...i", R_ref, d, precision=_HI)  # R^T @ d
    elif mode == "stereographic":
        # renderPanorama.m:373-383: inverse stereographic from plane tangent at +Z
        r2 = u * u + v * v
        denom = 1.0 + r2
        d = jnp.stack([2.0 * u / denom, 2.0 * v / denom, (1.0 - r2) / denom], axis=-1)
        d = jnp.einsum("ji,...j->...i", R_ref, d, precision=_HI)
    else:
        raise ValueError(f"unknown projection mode {mode!r}")
    return normalize_rays(d)


def ray_to_pano(mode: str, d: Array, R_ref: Array | None = None):
    """World rays -> surface coordinates (u, v) plus validity mask.

    For planar/stereographic, rays are first rotated into the reference frame.
    Mirrors the bounds functions (`renderPanorama.m:1507-1754`).

    Returns (u, v, valid) with the same leading shape as d[..., 0].
    """
    if mode in ("planar", "perspective", "stereographic"):
        d = jnp.einsum("ij,...j->...i", R_ref, d, precision=_HI)  # into ref frame
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    if mode == "cylindrical":
        u = jnp.arctan2(x, z)
        rho = jnp.sqrt(x * x + z * z)
        v = y / jnp.maximum(rho, 1e-8)
        valid = rho > 1e-8
    elif mode in ("spherical", "equirectangular"):
        u = jnp.arctan2(x, z)
        v = jnp.arctan2(y, jnp.sqrt(x * x + z * z))
        valid = jnp.ones_like(u, bool)
    elif mode in ("planar", "perspective"):
        z_eps = 1e-4
        valid = z > z_eps
        zs = jnp.maximum(z, z_eps)
        u = x / zs
        v = y / zs
    elif mode == "stereographic":
        n = jnp.sqrt(x * x + y * y + z * z)
        xn, yn, zn = x / n, y / n, z / n
        denom = 1.0 + zn
        valid = denom > 1e-6
        ds = jnp.maximum(denom, 1e-6)
        u = xn / ds
        v = yn / ds
    else:
        raise ValueError(f"unknown projection mode {mode!r}")
    return u, v, valid


def undistort_pixels(u: Array, v: Array, k1, cx, cy):
    """Distorted-image pixel -> pinhole pixel, Brown one-term model.

    The distorted image shows, at pixel p, the pinhole content at
    p*(1 + k1*r^2) with r = |p - c| / half-diagonal — the same forward map
    as `utils.perturb.radial_distort`. Exact (no iteration) in this
    direction. k1 is a capability the reference does NOT have (see
    `models.bundle.Cameras.k1`); k1 = 0 is the identity."""
    dx = u - cx
    dy = v - cy
    r2 = (dx * dx + dy * dy) / (cx * cx + cy * cy + 1e-12)
    fac = 1.0 + k1 * r2
    return cx + dx * fac, cy + dy * fac


def distort_pixels(u: Array, v: Array, k1, cx, cy, iters: int = 6):
    """Pinhole pixel -> distorted-image pixel (inverse of undistort_pixels).

    Solves r_p^2 = r_q^2 / (1 + k1 r_p^2)^2 by fixed point (converges in a
    few iterations for |k1| << 1, the consumer-lens regime; clamped so a
    pathological k1 cannot produce a negative magnification). This is the
    sampling direction: the renderer projects to PINHOLE coords and must
    gather from the stored (distorted) image."""
    dx = u - cx
    dy = v - cy
    rq2 = (dx * dx + dy * dy) / (cx * cx + cy * cy + 1e-12)
    rp2 = rq2
    for _ in range(iters):
        rp2 = rq2 / jnp.maximum(1.0 + k1 * rp2, 0.25) ** 2
    fac = jnp.maximum(1.0 + k1 * rp2, 0.25)
    # Far-outside queries have NO preimage inside the frame (the stored
    # image's largest radius is the corner, r_p = 1, so r_q <= 1 + k1):
    # the fixed point oscillates there and can FOLD a huge pinhole
    # projection (a camera ~90 deg off-axis, |u| ~ f/eps_z) back inside
    # the image bounds, making the sampler fuse garbage content with a
    # small-but-nonzero weight. Pass those through undistorted so the
    # downstream bounds masks reject them.
    fac = jnp.where(rq2 > 2.25, 1.0, fac)
    return cx + dx / fac, cy + dy / fac


def camera_pixel_rays(
    K_inv: Array, R: Array, xp: Array, yp: Array, k1=None, cx=None, cy=None
) -> Array:
    """Image pixel grid of one camera -> world rays (not normalized).

    d_world = R^T @ K^-1 @ [x, y, 1]   (reference bounds fns: `R' * (K \\ xy1)`).
    With `k1`, pixels are first mapped distorted -> pinhole (the stored
    image is distorted; rays only exist for pinhole coords)."""
    if k1 is not None:
        xp, yp = undistort_pixels(xp, yp, k1, cx, cy)
    p = jnp.stack([xp, yp, jnp.ones_like(xp)], axis=-1)
    cam = jnp.einsum("ij,...j->...i", K_inv, p, precision=_HI)
    return jnp.einsum("ji,...j->...i", R, cam, precision=_HI)  # R^T @ cam


def project_ray_to_camera(
    d_world: Array, R: Array, K: Array, eps_z: float = 1e-6, k1=None
):
    """World unit rays -> camera pixel coords + front-facing mask + cosine.

    Mirrors `renderPanorama.m sampleOneTile` (`:1100-1146`):
      dirc = R @ d;  u = fx*dx/dz + cx; front = dz > eps.
    With `k1`, the pinhole projection is mapped into the stored (distorted)
    image's coordinates before return (see distort_pixels).

    Returns (u, v, front, cos_angle) each with leading shape of d_world.
    """
    dirc = jnp.einsum("ij,...j->...i", R, d_world, precision=_HI)
    dx, dy, dz = dirc[..., 0], dirc[..., 1], dirc[..., 2]
    front = dz > eps_z
    dz_safe = jnp.maximum(dz, eps_z)
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    u = fx * (dx / dz_safe) + cx
    v = fy * (dy / dz_safe) + cy
    if k1 is not None:
        u, v = distort_pixels(u, v, k1, cx, cy)
    # view-angle cosine: dot(d_world, camera forward in world) = dz for unit d
    cos_angle = jnp.maximum(dz, 0.0)
    return u, v, front, cos_angle
