"""Panorama annotations: per-image warped boundary polygons + index labels.

Host-side equivalent of the reference's debugging annotations
(`renderPanorama.m allWarpedBoxes :1148-1280`, `brightColors :502-517`,
insertShape/insertText drawing `:437-477`), toggled by
`showPanoramaImgsNums` / `showCropBoundingBox` (`inputs.m:121-122`).
"""

from __future__ import annotations

import numpy as np

from autopanostitch_tpu.ops import geometry as geo
from autopanostitch_tpu.ops import projections as proj

import jax.numpy as jnp


def bright_colors(n: int, seed: int = 0) -> np.ndarray:
    """N vivid RGB colors (uint8), reference `brightColors`."""
    r = np.random.default_rng(seed)
    c = r.uniform(size=(n, 3))
    c /= np.maximum(c.max(axis=1, keepdims=True), 1e-6)
    return (255 * c).astype(np.uint8)


def warped_boxes_rotational(canvas: dict, R: np.ndarray, K: np.ndarray,
                            sizes: np.ndarray, n_boundary: int = 64):
    """Project each image's boundary onto the panorama surface.

    Returns list of (n_pts, 2) float arrays in canvas pixel coords (NaN
    where invalid) plus (N, 2) centers."""
    mode = canvas["mode"]
    f_pan, x0, y0 = canvas["f_pan"], canvas["x0"], canvas["y0"]
    R_ref = jnp.asarray(canvas["R_ref"])
    boxes, centers = [], []
    for k in range(len(sizes)):
        h, w = int(sizes[k][0]), int(sizes[k][1])
        t = np.linspace(0, 1, n_boundary)
        xs = t * (w - 1)
        ys = t * (h - 1)
        bx = np.concatenate([xs, np.full_like(ys, w - 1.0), xs[::-1], np.zeros_like(ys)])
        by = np.concatenate([np.zeros_like(xs), ys, np.full_like(xs, h - 1.0), ys[::-1]])
        d = proj.camera_pixel_rays(
            geo.invert_K(jnp.asarray(K[k])), jnp.asarray(R[k]),
            jnp.asarray(bx, jnp.float32), jnp.asarray(by, jnp.float32),
        )
        d = proj.normalize_rays(d)
        u, v, valid = proj.ray_to_pano(mode, d, R_ref)
        px = (np.asarray(u) - x0) * f_pan
        py = (np.asarray(v) - y0) * f_pan
        ok = np.asarray(valid)
        px[~ok] = np.nan
        py[~ok] = np.nan
        boxes.append(np.stack([px, py], -1))
        centers.append(np.nanmedian(np.stack([px, py], -1), axis=0))
    return boxes, np.stack(centers)


def warped_boxes_planar(H_abs: np.ndarray, sizes: np.ndarray, offset, scale: float,
                        n_boundary: int = 64):
    """Boundary polygons for the planar path (through absolute homographies)."""
    x0, y0 = offset
    boxes, centers = [], []
    for k in range(len(sizes)):
        h, w = int(sizes[k][0]), int(sizes[k][1])
        t = np.linspace(0, 1, n_boundary)
        xs = t * (w - 1)
        ys = t * (h - 1)
        bx = np.concatenate([xs, np.full_like(ys, w - 1.0), xs[::-1], np.zeros_like(ys)])
        by = np.concatenate([np.zeros_like(xs), ys, np.full_like(xs, h - 1.0), ys[::-1]])
        ph = np.stack([bx, by, np.ones_like(bx)], -1) @ H_abs[k].T
        z = ph[:, 2]
        ok = np.abs(z) > 1e-9
        px = np.where(ok, ph[:, 0] / np.where(ok, z, 1), np.nan) * scale - x0
        py = np.where(ok, ph[:, 1] / np.where(ok, z, 1), np.nan) * scale - y0
        boxes.append(np.stack([px, py], -1))
        centers.append(np.nanmedian(np.stack([px, py], -1), axis=0))
    return boxes, np.stack(centers)


def draw_annotations(pano: np.ndarray, boxes, centers, labels=None, crop_rect=None):
    """Draw polygons + labels (+ crop box) on a uint8 panorama copy."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(pano if pano.dtype == np.uint8 else
                          (np.clip(pano, 0, 1) * 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    colors = bright_colors(len(boxes))
    for k, box in enumerate(boxes):
        pts = box[np.isfinite(box).all(axis=1)]
        if len(pts) < 3:
            continue
        draw.line([tuple(p) for p in pts] + [tuple(pts[0])],
                  fill=tuple(int(c) for c in colors[k]), width=2)
        if np.isfinite(centers[k]).all():
            label = str(labels[k]) if labels is not None else str(k)
            draw.text(tuple(centers[k]), label, fill=(255, 255, 255))
    if crop_rect is not None:
        r0, r1, c0, c1 = crop_rect
        draw.rectangle([c0, r0, c1 - 1, r1 - 1], outline=(255, 0, 0), width=2)
    return np.asarray(img)
