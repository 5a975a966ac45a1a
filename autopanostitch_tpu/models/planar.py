"""Planar compositing: warp verified images onto a common canvas.

TPU-native equivalent of the reference's non-rotational path
(`renderPanorama.m pureNonRotationalPanoramas :519-822`):
  output limits over all images -> canvas extent -> inverse-map warp of each
  image + its feather weights -> gain -> linear/multiband blend.

The canvas extent is data-dependent, so bounds are pulled to host once per
panorama and the jitted warp+blend runs with static canvas shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.ops import sampling as samp
from autopanostitch_tpu.ops import blend as blend_ops

Array = jax.Array


def _feather_np(h: int, w: int) -> np.ndarray:
    """Host-side feather ramp (avoids a device roundtrip per image)."""
    wx = np.maximum(1.0 - np.abs(np.linspace(-1.0, 1.0, w, dtype=np.float32)), 1e-4)
    wy = np.maximum(1.0 - np.abs(np.linspace(-1.0, 1.0, h, dtype=np.float32)), 1e-4)
    return wy[:, None] * wx[None, :]


def chain_to_anchor(pairs: np.ndarray, Hs: np.ndarray, n: int, anchor: int | None = None):
    """Chain pairwise homographies to absolute ones via BFS on the match graph.

    Args:
      pairs: (P, 2) int (i, j), i < j; Hs: (P, 3, 3) with H mapping
             points of i into j's frame.
      anchor: index whose frame becomes the canvas (default: max-degree node,
              like the reference's seed choice `bundleAdjustmentRKf.m:94-104`).

    Returns (H_abs (n, 3, 3) mapping image k -> anchor frame, reachable (n,)).
    """
    deg = np.zeros(n, int)
    adj: list[list[tuple[int, np.ndarray]]] = [[] for _ in range(n)]
    for p, (i, j) in enumerate(pairs):
        H_ij = Hs[p]  # i -> j
        H_ji = np.linalg.inv(H_ij)
        H_ji /= H_ji[2, 2]
        adj[i].append((j, H_ji))  # from node i, neighbour j enters via H_{j->i}
        adj[j].append((i, H_ij))  # from node j, neighbour i enters via H_{i->j}
        deg[i] += 1
        deg[j] += 1
    if anchor is None:
        anchor = int(np.argmax(deg))
    H_abs = np.tile(np.eye(3, dtype=np.float64), (n, 1, 1))
    reachable = np.zeros(n, bool)
    reachable[anchor] = True
    queue = [anchor]
    while queue:
        u = queue.pop(0)
        for v, H_vu in adj[u]:
            # H_vu maps points of v into u's frame
            if not reachable[v]:
                reachable[v] = True
                Hv = H_abs[u] @ H_vu
                H_abs[v] = Hv / Hv[2, 2]
                queue.append(v)
    return H_abs.astype(np.float32), reachable, anchor


def planar_canvas_bounds(
    H_abs: np.ndarray,
    sizes: np.ndarray,
    reachable: np.ndarray,
    max_megapixel: float = 50.0,
    pad: int = 8,
):
    """Canvas extent from per-image output limits (host-side control plane).

    Mirrors `renderPanorama.m:551-569` + the 50 MP cap (`:167-176`).
    Returns (Hc, Wc, x0, y0, scale).
    """
    lims = np.asarray(
        samp.output_limits_batch(jnp.asarray(H_abs), jnp.asarray(sizes, np.int32))
    )  # (N, 4) in one device call
    lims = lims[reachable]
    x0, x1 = lims[:, 0].min(), lims[:, 1].max()
    y0, y1 = lims[:, 2].min(), lims[:, 3].max()
    x0 -= pad
    y0 -= pad
    x1 += pad
    y1 += pad
    Wc = int(np.ceil(x1 - x0))
    Hc = int(np.ceil(y1 - y0))
    scale = 1.0
    cap = max_megapixel * 1e6
    if Hc * Wc > cap:
        scale = float(np.sqrt(cap / (Hc * Wc)))
        Hc = max(1, int(np.ceil(Hc * scale)))
        Wc = max(1, int(np.ceil(Wc * scale)))
    # bucket canvas shape to multiples of 128 so XLA executables are reused
    # across datasets (extra area stays uncovered and is cropped later)
    Hc = int(np.ceil(Hc / 128) * 128)
    Wc = int(np.ceil(Wc / 128) * 128)
    return Hc, Wc, float(x0), float(y0), scale


@partial(jax.jit, static_argnames=("out_h", "out_w", "blend_mode", "bands"))
def composite_planar(
    images: Array,  # (N, H, W, 3)
    feathers: Array,  # (N, H, W) feather weights (0 in padding)
    H_inv_canvas: Array,  # (N, 3, 3): canvas world coord -> source pixel
    valid: Array,  # (N,) include image or not
    gains: Array,  # (N, 3) per-channel gains
    out_h: int,
    out_w: int,
    x0: float,
    y0: float,
    blend_mode: str = "linear",
    bands: int = 3,
):
    """Warp all images onto the canvas and blend.

    Returns (panorama (out_h, out_w, 3), coverage (out_h, out_w) bool).
    """

    def warp_one(img, feather, Hi, ok, gain):
        col, _ = samp.warp_homography(img * gain[None, None, :], Hi, out_h, out_w, x0, y0)
        w, _ = samp.warp_homography(feather[..., None], Hi, out_h, out_w, x0, y0)
        w = w[..., 0] * ok
        return col * ok, w

    colors, weights = jax.vmap(warp_one)(images, feathers, H_inv_canvas, valid.astype(images.dtype), gains)
    if blend_mode == "multiband":
        pano = blend_ops.multiband_blend(colors, weights, bands=bands)
    elif blend_mode == "linear":
        pano = blend_ops.linear_blend(colors, weights)
    else:  # 'none' -> last writer wins (reference composeNonePolicy 'last')
        covered_any = weights > 0
        pano = jnp.zeros((out_h, out_w, 3), images.dtype)
        for k in range(images.shape[0]):
            pano = jnp.where(covered_any[k][..., None], colors[k], pano)
    coverage = jnp.sum(weights, axis=0) > 0
    return pano, coverage


def render_planar(
    images: np.ndarray,
    sizes: np.ndarray,
    pairs: np.ndarray,
    Hs: np.ndarray,
    gains: np.ndarray | None = None,
    blend_mode: str = "linear",
    bands: int = 3,
    max_megapixel: float = 50.0,
    anchor: int | None = None,
):
    """Full planar panorama from verified pairwise homographies.

    Returns dict(panorama, coverage, H_abs, reachable, offset).
    """
    n = images.shape[0]
    H_abs, reachable, anchor = chain_to_anchor(pairs, Hs, n, anchor)
    Hc, Wc, x0, y0, scale = planar_canvas_bounds(H_abs, sizes, reachable, max_megapixel)
    # scale canvas coords: canvas pixel -> world = (x/scale... ) fold scale into H
    S = np.diag([scale, scale, 1.0]).astype(np.float32)
    H_inv = np.stack([np.linalg.inv(S @ H_abs[k]) for k in range(n)])
    H_inv /= H_inv[:, 2:3, 2:3]
    # canvas origin in scaled coords
    x0s, y0s = x0 * scale, y0 * scale

    feathers = np.zeros(images.shape[:3], np.float32)
    for k in range(n):
        h, w = int(sizes[k][0]), int(sizes[k][1])
        feathers[k, :h, :w] = _feather_np(h, w)
    if gains is None:
        gains = np.ones((n, 3), np.float32)

    pano, cover = composite_planar(
        jnp.asarray(images),
        jnp.asarray(feathers),
        jnp.asarray(H_inv),
        jnp.asarray(reachable),
        jnp.asarray(gains),
        Hc,
        Wc,
        x0s,
        y0s,
        blend_mode,
        bands,
    )
    return {
        "panorama": np.asarray(pano),
        "coverage": np.asarray(cover),
        "H_abs": H_abs,
        "reachable": reachable,
        "anchor": anchor,
        "offset": (x0s, y0s),
        "scale": scale,
    }
