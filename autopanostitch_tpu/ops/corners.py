"""Corner detectors (Harris, FAST) + oriented binary descriptors (ORB-style).

The reference dispatches to MATLAB CVT detectors
(`featureMatching/getFeaturePoints.m:33-64`): HARRIS / FAST / ORB / BRISK
produce binary descriptors matched under Hamming distance. This module
provides the TPU-native equivalents:

- Harris corner response (structure tensor, `detectHarrisFeatures` analog)
- FAST-9 segment-test score (`detectFASTFeatures` analog), fully
  vectorized via 16 shifted comparisons + circular run detection
- intensity-centroid orientation (ORB)
- rotated-BRIEF 256-bit descriptor (ORB's steered BRIEF; stands in for the
  reference's ORB/BRISK/FREAK binary descriptors)

Descriptors are returned as unpacked {0,1} float vectors so the existing
matching stack applies unchanged: squared L2 of {0,1} vectors IS the
Hamming distance, so the MXU GEMM matcher, ratio test, and RANSAC all work
without a separate code path (pack with ops.hamming.pack_bits for storage
or the native host matcher).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.config import DetectorConfig
from autopanostitch_tpu.ops.sift import SiftFeatures, gaussian_blur

Array = jax.Array

# 16-point Bresenham circle of radius 3 (FAST)
_FAST_OFFSETS = [
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
]


def harris_response(img: Array, sigma: float = 1.5, k: float = 0.04) -> Array:
    """Harris corner response det(M) - k tr(M)^2 over a blurred structure
    tensor (reference detector option 'HARRIS')."""
    dx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    dy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    Ixx = gaussian_blur(dx * dx, sigma)
    Iyy = gaussian_blur(dy * dy, sigma)
    Ixy = gaussian_blur(dx * dy, sigma)
    det = Ixx * Iyy - Ixy * Ixy
    tr = Ixx + Iyy
    return det - k * tr * tr


def fast_score(img: Array, threshold: float = 0.05, arc: int = 9) -> Array:
    """FAST segment-test score: a pixel is a corner if `arc` contiguous
    circle points are all brighter (or all darker) than center +- t.
    Returns a response map (sum of absolute differences over the best arc
    proxy: count of qualifying arcs times mean excess)."""
    shifted = [jnp.roll(img, (-dy, -dx), (0, 1)) for (dx, dy) in _FAST_OFFSETS]
    stack = jnp.stack(shifted)  # (16, H, W)
    brighter = stack > img[None] + threshold
    darker = stack < img[None] - threshold

    def has_run(mask):
        run = jnp.zeros_like(img, bool)
        for start in range(16):
            seg = jnp.ones_like(img, bool)
            for o in range(arc):
                seg = seg & mask[(start + o) % 16]
            run = run | seg
        return run

    corner = has_run(brighter) | has_run(darker)
    strength = jnp.sum(jnp.abs(stack - img[None]), axis=0)
    return jnp.where(corner, strength, 0.0)


def _nms(resp: Array, radius: int = 1) -> Array:
    """Non-maximum suppression: keep strict local maxima."""
    m = resp
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx == 0 and dy == 0:
                continue
            m = jnp.maximum(m, jnp.roll(resp, (dy, dx), (0, 1)))
    return (resp >= m) & (resp > 0)


def _select_corners(resp: Array, cap: int, border: int = 16):
    keep = _nms(resp)
    H, W = resp.shape
    keep = keep.at[:border].set(False).at[-border:].set(False)
    keep = keep.at[:, :border].set(False).at[:, -border:].set(False)
    score = jnp.where(keep, resp, -1.0).reshape(-1)
    vals, flat = jax.lax.top_k(score, cap)
    ys = flat // W
    xs = flat % W
    return xs.astype(jnp.float32), ys.astype(jnp.float32), vals, vals > 0


def intensity_centroid_orientation(img: Array, x: Array, y: Array, radius: int = 7):
    """ORB orientation: atan2 of the patch intensity centroid."""
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    circle = (ox**2 + oy**2) <= radius**2
    H, W = img.shape

    def one(xi, yi):
        xs = jnp.clip((xi + ox).astype(jnp.int32), 0, W - 1)
        ys = jnp.clip((yi + oy).astype(jnp.int32), 0, H - 1)
        patch = img[ys, xs] * circle
        m10 = jnp.sum(patch * ox)
        m01 = jnp.sum(patch * oy)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(x, y)


def _brief_pattern(n_bits: int = 256, patch: float = 24.0, seed: int = 7):
    """Fixed Gaussian-distributed BRIEF point pairs (host constant)."""
    r = np.random.default_rng(seed)
    pts = np.clip(r.normal(scale=patch / 5.0, size=(n_bits, 4)), -patch / 2, patch / 2)
    return jnp.asarray(pts.astype(np.float32))


_PATTERN = _brief_pattern()


def rotated_brief(img_blur: Array, x: Array, y: Array, theta: Array) -> Array:
    """Steered-BRIEF 256-bit descriptor as unpacked {0,1} float vector."""
    H, W = img_blur.shape
    pat = _PATTERN  # (256, 4) [x1 y1 x2 y2]

    def one(xi, yi, th):
        c, s = jnp.cos(th), jnp.sin(th)
        rx1 = c * pat[:, 0] - s * pat[:, 1] + xi
        ry1 = s * pat[:, 0] + c * pat[:, 1] + yi
        rx2 = c * pat[:, 2] - s * pat[:, 3] + xi
        ry2 = s * pat[:, 2] + c * pat[:, 3] + yi

        def sample(px, py):
            xi0 = jnp.clip(px.astype(jnp.int32), 0, W - 1)
            yi0 = jnp.clip(py.astype(jnp.int32), 0, H - 1)
            return img_blur[yi0, xi0]

        return (sample(rx1, ry1) < sample(rx2, ry2)).astype(jnp.float32)

    return jax.vmap(one)(x, y, theta)


@partial(jax.jit, static_argnames=("cfg", "method"))
def extract_corners(
    img: Array, cfg: DetectorConfig = DetectorConfig(), method: str = "harris"
) -> SiftFeatures:
    """Corner detection + oriented binary description of one gray image.

    method: 'harris' | 'fast' | 'orb' (FAST detector + Harris ordering) |
            'brisk' (alias of 'fast' with the same rotated-BRIEF bits).
    Returns SiftFeatures whose desc is a 256-d {0,1} vector (Hamming via
    plain squared L2).
    """
    if method == "harris":
        resp = harris_response(img, sigma=cfg.sigma)
    elif method in ("fast", "brisk"):
        resp = fast_score(img)
    elif method == "orb":
        # ORB: FAST corners ranked by Harris response
        fr = fast_score(img)
        hr = harris_response(img, sigma=cfg.sigma)
        resp = jnp.where(fr > 0, jnp.maximum(hr, 0.0), 0.0)
    else:
        raise ValueError(f"unknown corner method {method!r}")

    K = cfg.max_keypoints
    x, y, score, valid = _select_corners(resp, K)
    blur = gaussian_blur(img, 2.0)
    theta = intensity_centroid_orientation(blur, x, y)
    desc = rotated_brief(blur, x, y, theta)
    desc = desc * valid[:, None]
    return SiftFeatures(
        xy=jnp.stack([x, y], -1) * valid[:, None],
        scale=jnp.full((K,), cfg.sigma),
        orientation=theta * valid,
        response=jnp.where(valid, score, 0.0),
        desc=desc,
        mask=valid,
    )


def extract_corners_batch(imgs: Array, cfg: DetectorConfig, method: str) -> SiftFeatures:
    return jax.vmap(lambda im: extract_corners(im, cfg, method))(imgs)
