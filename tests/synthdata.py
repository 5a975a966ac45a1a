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


def smooth_texture(seed: int, h: int, w: int, cutoff: float = 0.08) -> np.ndarray:
    """Band-limited RGB texture in [0, 1]: FFT low-pass of white noise.

    Unlike :func:`texture` (hard NN-upsampled edges), this is smooth enough
    that resampling error is dominated by alignment, not interpolation —
    the right target for PSNR gates near 40 dB.
    """
    r = np.random.default_rng(seed)
    noise = r.standard_normal((h, w, 3)).astype(np.float32)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    keep = (np.hypot(fy, fx) <= cutoff).astype(np.float32)
    img = np.real(np.fft.ifft2(np.fft.fft2(noise, axes=(0, 1)) * keep[..., None], axes=(0, 1)))
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


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


def _cubic_np(t: np.ndarray, a: float = -0.5) -> np.ndarray:
    at = np.abs(t)
    at2, at3 = at * at, at * at * at
    w1 = (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0
    w2 = a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a
    return np.where(at <= 1.0, w1, np.where(at < 2.0, w2, 0.0))


def _bicubic_np(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Keys bicubic (a=-0.5) sampler, clamped borders — numpy ground truth."""
    h, w = img.shape[:2]
    x = np.clip(x, 0, w - 1.001)
    y = np.clip(y, 0, h - 1.001)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx, fy = x - x0, y - y0
    out = np.zeros(x.shape + (img.shape[-1],), np.float64)
    for j in range(-1, 3):
        wy = _cubic_np(fy - j)[..., None]
        row = np.zeros_like(out)
        for i in range(-1, 3):
            wx = _cubic_np(fx - i)[..., None]
            xi = np.clip(x0 + i, 0, w - 1)
            yj = np.clip(y0 + j, 0, h - 1)
            row += wx * img[yj, xi]
        out += wy * row
    return out.astype(np.float32)


def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def env_lookup(env: np.ndarray, d_world: np.ndarray, interp: str = "bilinear") -> np.ndarray:
    """Sample an equirect environment along world unit rays (..., 3)."""
    eh, ew = env.shape[:2]
    theta = np.arctan2(d_world[..., 0], d_world[..., 2])
    phi = np.arctan2(d_world[..., 1], np.hypot(d_world[..., 0], d_world[..., 2]))
    ex = (theta + np.pi) / (2 * np.pi) * (ew - 1)
    ey = (phi + np.pi / 2) / np.pi * (eh - 1)
    fn = _bicubic_np if interp == "bicubic" else _bilinear_np
    return fn(env, ex, ey)


def render_pinhole_from_equirect(
    env: np.ndarray, R: np.ndarray, f: float, w: int, h: int, interp: str = "bilinear"
) -> np.ndarray:
    """Render one pinhole view (world->cam rotation R, focal f px) from an
    equirectangular environment image (theta in [-pi, pi] -> width,
    phi in [-pi/2, pi/2] -> height). Pure numpy ground-truth renderer."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    d = np.stack([(xs - cx) / f, (ys - cy) / f, np.ones_like(xs)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dw = d @ R  # R^T applied to rows: world dirs
    return env_lookup(env, dw, interp)


def rotational_views(seed: int, n_views: int = 4, f: float = 350.0, size=(480, 360),
                     yaw_step: float = 0.35, pitch: float = 0.0,
                     env: np.ndarray | None = None, interp: str = "bilinear"):
    """n pinhole views sweeping in yaw across a synthetic environment.

    Returns (views [n](h,w,3), Rs (n,3,3) world->cam, f)."""
    if env is None:
        env = texture(seed, 1024, 2048)
    w, h = size
    views, Rs = [], []
    start = -(n_views - 1) / 2.0 * yaw_step
    for i in range(n_views):
        R = (rot_x(pitch) @ rot_y(start + i * yaw_step)).T  # world->cam
        views.append(render_pinhole_from_equirect(env, R, f, w, h, interp))
        Rs.append(R)
    return env, views, np.stack(Rs), f
