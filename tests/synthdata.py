"""Synthetic multi-view test data with known ground truth.

The reference repo ships only already-stitched result panoramas, so E2E
tests synthesize their own inputs:
- rich multi-scale textures (enough structure for SIFT),
- planar view sets = overlapping crops with known translations,
- rotational view sets = pinhole renders of an equirectangular environment
  with known R and f (pure numpy, independent of the JAX code under test).
"""

from __future__ import annotations

import numpy as np


def texture(seed: int, h: int, w: int) -> np.ndarray:
    """Multi-octave value-noise RGB texture in [0, 1], rich in corners."""
    r = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for octave, amp in [(8, 0.5), (16, 0.25), (32, 0.15), (64, 0.1)]:
        gh, gw = max(2, h // octave), max(2, w // octave)
        grid = r.uniform(size=(gh, gw, 3)).astype(np.float32)
        # nearest-neighbour upsample keeps hard edges -> corners for SIFT
        ys = np.minimum((np.arange(h) * gh // h), gh - 1)
        xs = np.minimum((np.arange(w) * gw // w), gw - 1)
        img += amp * grid[ys][:, xs]
    img -= img.min()
    img /= img.max()
    return img


def planar_crops(env: np.ndarray, boxes):
    """Crops [(x, y, w, h), ...] of env. Ground-truth H_i->j is translation
    by (xi - xj, yi - yj)."""
    views = [env[y : y + h, x : x + w].copy() for (x, y, w, h) in boxes]
    return views


def _bilinear_np(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    x = np.clip(x, 0, w - 1.001)
    y = np.clip(y, 0, h - 1.001)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )
    return v.astype(np.float32)


def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def render_pinhole_from_equirect(
    env: np.ndarray, R: np.ndarray, f: float, w: int, h: int
) -> np.ndarray:
    """Render one pinhole view (world->cam rotation R, focal f px) from an
    equirectangular environment image (theta in [-pi, pi] -> width,
    phi in [-pi/2, pi/2] -> height). Pure numpy ground-truth renderer."""
    eh, ew = env.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    d = np.stack([(xs - cx) / f, (ys - cy) / f, np.ones_like(xs)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dw = d @ R  # R^T applied to rows: world dirs
    theta = np.arctan2(dw[..., 0], dw[..., 2])
    phi = np.arctan2(dw[..., 1], np.hypot(dw[..., 0], dw[..., 2]))
    ex = (theta + np.pi) / (2 * np.pi) * (ew - 1)
    ey = (phi + np.pi / 2) / np.pi * (eh - 1)
    return _bilinear_np(env, ex, ey)


def rotational_views(seed: int, n_views: int = 4, f: float = 350.0, size=(480, 360),
                     yaw_step: float = 0.35, pitch: float = 0.0):
    """n pinhole views sweeping in yaw across a synthetic environment.

    Returns (views [n](h,w,3), Rs (n,3,3) world->cam, f)."""
    env = texture(seed, 1024, 2048)
    w, h = size
    views, Rs = [], []
    start = -(n_views - 1) / 2.0 * yaw_step
    for i in range(n_views):
        R = (rot_x(pitch) @ rot_y(start + i * yaw_step)).T  # world->cam
        views.append(render_pinhole_from_equirect(env, R, f, w, h))
        Rs.append(R)
    return env, views, np.stack(Rs), f
