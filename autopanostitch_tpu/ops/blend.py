"""Blending: per-pixel linear weighted average and Burt-Adelson multiband.

TPU-native equivalents of:
- `blending/linearBlending.m:64-115` (accumulate I*W and W, guarded divide)
- `blending/multiBandBlending.m:71-167` (Laplacian-pyramid streaming blend)

Everything operates on stacked contributors (N, H, W, ...) — the reference's
per-image accumulation loop becomes a reduction over the leading axis, and
the pyramid levels are built with XLA convs + jax.image.resize.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from autopanostitch_tpu.ops.sift import gaussian_blur

Array = jax.Array

_EPS = 1e-8


def linear_blend(colors: Array, weights: Array) -> Array:
    """Weighted average across contributors.

    Args:
      colors: (N, H, W, C); weights: (N, H, W) — zero where invalid.

    Returns (H, W, C). Pixels with no contributors are 0.
    """
    wsum = jnp.sum(weights, axis=0)  # (H, W)
    acc = jnp.sum(colors * weights[..., None], axis=0)
    return acc / jnp.maximum(wsum, _EPS)[..., None]


def _blur_nc(x: Array, sigma: float) -> Array:
    """Gaussian blur over the spatial dims of (..., H, W).

    One depthwise conv over all leading dims as channels (vmapping
    per-image convs issues N*C tiny convolutions; a single grouped conv
    keeps the VPU busy)."""
    from autopanostitch_tpu.ops.sift import _gaussian_kernel1d

    if sigma <= 0:
        return x
    k = _gaussian_kernel1d(sigma)
    r = k.shape[0] // 2
    C = 1
    for d in x.shape[:-2]:
        C *= d
    flat = x.reshape((1, C) + x.shape[-2:])
    flat = jnp.pad(flat, ((0, 0), (0, 0), (r, r), (r, r)), mode="edge")
    kh = jnp.broadcast_to(k.reshape(1, 1, 1, -1), (C, 1, 1, k.shape[0]))
    kv = jnp.broadcast_to(k.reshape(1, 1, -1, 1), (C, 1, k.shape[0], 1))
    flat = jax.lax.conv_general_dilated(
        flat, kh, (1, 1), "VALID", feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )
    flat = jax.lax.conv_general_dilated(
        flat, kv, (1, 1), "VALID", feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )
    return flat.reshape(x.shape)


def _down2(x: Array) -> Array:
    """(..., H, W) -> (..., ceil(H/2), ceil(W/2)) by linear resize."""
    H, W = x.shape[-2:]
    return jax.image.resize(x, x.shape[:-2] + ((H + 1) // 2, (W + 1) // 2), "linear")


def _up2(x: Array, h: int, w: int) -> Array:
    return jax.image.resize(x, x.shape[:-2] + (h, w), "linear")


@partial(jax.jit, static_argnames=("bands",))
def multiband_blend(colors: Array, weights: Array, bands: int = 3, sigma: float = 1.0) -> Array:
    """Burt-Adelson Laplacian-pyramid blend across contributors.

    Mirrors `blending/multiBandBlending.m`: weights normalized to sum to ~1
    per pixel (`:71-89`), per band: Gaussian blur -> 2x downsample ->
    upsample -> Laplacian, accumulated against the weight pyramid
    (`:118-160`), coarsest Gaussian accumulated directly (`:162-167`),
    collapse by upsample+add, clamp to [0, 1].

    Args:
      colors: (N, H, W, C) in [0, 1]; weights: (N, H, W).
      bands: pyramid levels (`inputs.m:100` default 3).
      sigma: pyramid blur (`inputs.m:101`).

    Returns (H, W, C).
    """
    N, H, W, C = colors.shape
    # cap levels like the reference (`multiBandBlending.m:97-99`)
    import math

    max_levels = max(1, int(math.floor(math.log2(max(min(H, W), 2)))) - 1)
    bands = max(1, min(bands, max_levels))

    wsum = jnp.sum(weights, axis=0)
    wnorm = jnp.where(wsum[None] > _EPS, weights / jnp.maximum(wsum[None], _EPS), 0.0)

    # move channels next to N for uniform (N*C, H, W) blurs
    g_c = jnp.moveaxis(colors, -1, 1)  # (N, C, H, W)
    g_w = wnorm  # (N, H, W)

    num_levels = []  # blended Laplacian per level
    shapes = []
    for _ in range(bands - 1):
        shapes.append(g_c.shape[-2:])
        g_c_blur = _blur_nc(g_c, sigma)
        g_w_blur = _blur_nc(g_w, sigma)
        g_c_down = _down2(g_c_blur)
        g_w_down = _down2(g_w_blur)
        lap = g_c - _up2(g_c_down, *g_c.shape[-2:])  # (N, C, h, w)
        den = jnp.maximum(jnp.sum(g_w, axis=0), _EPS)  # (h, w)
        num = jnp.sum(lap * g_w[:, None], axis=0)  # (C, h, w)
        num_levels.append(num / den[None])
        g_c, g_w = g_c_down, g_w_down

    # coarsest: Gaussian level blended directly
    den = jnp.maximum(jnp.sum(g_w, axis=0), _EPS)
    out = jnp.sum(g_c * g_w[:, None], axis=0) / den[None]  # (C, h, w)

    for lvl in range(bands - 2, -1, -1):
        out = _up2(out, *shapes[lvl]) + num_levels[lvl]

    out = jnp.moveaxis(out, 0, -1)  # (H, W, C)
    covered = wsum > _EPS
    return jnp.clip(out, 0.0, 1.0) * covered[..., None]
