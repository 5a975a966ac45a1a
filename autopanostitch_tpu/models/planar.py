"""Planar compositing: warp verified images onto a common canvas.

TPU-native equivalent of the reference's non-rotational path
(`renderPanorama.m pureNonRotationalPanoramas :519-822`):
  output limits over all images -> canvas extent -> inverse-map warp of each
  image + its feather weights -> gain -> linear/multiband blend.

Memory/bandwidth design:
- the canvas is rendered in row bands by ONE jitted band kernel (static band
  shape) — a python loop over bands, like the reference's streaming tile
  loop (`renderPanorama.m:342-406`);
- within a band, 'linear'/'none' blending streams over images with lax.scan
  (memory independent of N); 'multiband' stacks per-image bands;
- images/feathers are device-resident arrays passed in by the pipeline (the
  TPU relay moves ~20 MB/s, so nothing is re-uploaded per stage).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.ops import blend as blend_ops
from autopanostitch_tpu.ops import sampling as samp

from autopanostitch_tpu.config import GainConfig

Array = jax.Array


def _feather_np(h: int, w: int) -> np.ndarray:
    """Host-side feather ramp (tests / standalone use)."""
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

    Returns (H_abs (n, 3, 3) mapping image k -> anchor frame, reachable (n,),
    anchor).
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


@partial(
    jax.jit, static_argnames=("band_h", "out_w", "blend_mode", "bands", "interp")
)
def composite_band(
    images: Array,  # (N, H, W, 3)
    feathers: Array,  # (N, H, W)
    H_inv_canvas: Array,  # (N, 3, 3) canvas world coord -> source pixel
    valid: Array,  # (N,)
    gains: Array,  # (N, 3)
    band_h: int,
    out_w: int,
    x0,
    y0,
    blend_mode: str = "linear",
    bands: int = 3,
    interp: str = "bilinear",
):
    """One canvas row band: warp every image into the band and blend."""

    def warp_one(img, feather, Hi, ok, gain):
        # feather rides as the 4th channel so it shares the color taps
        # (gather cost scales with tap positions, not channels — same
        # optimization as the rotational tile kernel); interpolation
        # overshoot on the ramp is clamped at 0
        img4 = jnp.concatenate(
            [img * gain[None, None, :], feather[..., None]], axis=-1
        )
        col4, _ = samp.warp_homography(
            img4, Hi, band_h, out_w, x0, y0, method=interp
        )
        w = jnp.maximum(col4[..., 3], 0.0) * ok
        return col4[..., :3] * ok, w

    okf = valid.astype(images.dtype)
    if blend_mode == "multiband":
        cols, ws = jax.vmap(warp_one)(images, feathers, H_inv_canvas, okf, gains)
        band = blend_ops.multiband_blend(cols, ws, bands=bands)
        wsum = jnp.sum(ws, axis=0)
    elif blend_mode == "linear":
        def body(carry, inp):
            acc, wsum = carry
            img, feather, Hi, ok, gain = inp
            col, w = warp_one(img, feather, Hi, ok, gain)
            return (acc + col * w[..., None], wsum + w), None

        (acc, wsum), _ = jax.lax.scan(
            body,
            (jnp.zeros((band_h, out_w, 3)), jnp.zeros((band_h, out_w))),
            (images, feathers, H_inv_canvas, okf, gains),
        )
        band = acc / jnp.maximum(wsum, 1e-8)[..., None]
    else:  # 'none' -> last writer wins (reference composeNonePolicy 'last')
        def body(carry, inp):
            band, wsum = carry
            img, feather, Hi, ok, gain = inp
            col, w = warp_one(img, feather, Hi, ok, gain)
            band = jnp.where((w > 0)[..., None], col, band)
            return (band, wsum + w), None

        (band, wsum), _ = jax.lax.scan(
            body,
            (jnp.zeros((band_h, out_w, 3)), jnp.zeros((band_h, out_w))),
            (images, feathers, H_inv_canvas, okf, gains),
        )
    # threshold, not >0: bilinear tails at image borders contribute
    # hairline weights (~1e-5) with near-black colors; counting them as
    # coverage breaks border cropping and dims edges
    covered = wsum > 1e-3
    band = band * covered[..., None]
    band_u8 = (jnp.clip(band, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    return band_u8, covered


def composite_from_abs(
    images,
    feathers,
    sizes: np.ndarray,
    H_abs: np.ndarray,
    reachable: np.ndarray,
    gains: np.ndarray | None = None,
    blend_mode: str = "linear",
    bands: int = 3,
    max_megapixel: float = 50.0,
    band_h: int = 512,
    gain_cfg: GainConfig | None = None,
    interp: str = "bilinear",
):
    """Composite given absolute homographies (image k -> canvas frame).

    images/feathers may be device arrays (preferred) or numpy.
    If gains is None and gain_cfg given, planar-path gain compensation runs
    first (reference `gainCompensationH.m`).
    Returns dict(panorama, coverage, offset, scale, gains).
    """
    if interp == "bicubic2x":
        # the band compositor warps every FULL image once per canvas band,
        # so bicubic2x's per-call 2x upsample would redo the dense resize
        # of the whole stack for every band (pure recompute, 4x the HBM).
        # True bicubic has the same quality here; bicubic2x only pays off
        # in the tile kernel where the upsample is per-contributor-subset.
        interp = "bicubic"
    n = len(sizes)
    Hc, Wc, x0, y0, scale = planar_canvas_bounds(H_abs, sizes, reachable, max_megapixel)
    S = np.diag([scale, scale, 1.0]).astype(np.float32)
    H_inv = np.stack([np.linalg.inv(S @ H_abs[k]) for k in range(n)])
    H_inv /= H_inv[:, 2:3, 2:3]
    x0s, y0s = x0 * scale, y0 * scale
    if gains is None and gain_cfg is not None and gain_cfg.enabled:
        from autopanostitch_tpu.models import gain as gain_stage

        gains = gain_stage.compute_gains_planar(
            images, feathers, H_inv.astype(np.float32), x0s, y0s, (Hc, Wc), gain_cfg
        )
    if gains is None:
        gains = np.ones((n, 3), np.float32)

    imgs_d = jnp.asarray(images)
    fea_d = jnp.asarray(feathers)
    Hi_d = jnp.asarray(H_inv.astype(np.float32))
    ok_d = jnp.asarray(reachable)
    g_d = jnp.asarray(gains.astype(np.float32))

    pano = np.zeros((Hc, Wc, 3), np.uint8)
    cover = np.zeros((Hc, Wc), bool)
    bands_out = []
    for r0 in range(0, Hc, band_h):
        band, cov = composite_band(
            imgs_d, fea_d, Hi_d, ok_d, g_d, band_h, Wc,
            x0s, y0s + float(r0), blend_mode, bands, interp,
        )
        bands_out.append((r0, band, cov))
    for r0, band, cov in bands_out:
        h = min(band_h, Hc - r0)
        pano[r0 : r0 + h] = np.asarray(band)[:h]
        cover[r0 : r0 + h] = np.asarray(cov)[:h]
    return {
        "panorama": pano,
        "coverage": cover,
        "offset": (x0s, y0s),
        "scale": scale,
        "gains": gains,
    }


def render_planar(
    images,
    sizes: np.ndarray,
    pairs: np.ndarray,
    Hs: np.ndarray,
    feathers=None,
    gains: np.ndarray | None = None,
    blend_mode: str = "linear",
    bands: int = 3,
    max_megapixel: float = 50.0,
    anchor: int | None = None,
):
    """Full planar panorama from verified pairwise homographies (chained,
    no joint refinement — see bundle_h.run_bundle_adjustment_h for the
    refined path the pipeline uses).

    Returns dict(panorama, coverage, H_abs, reachable, anchor, offset).
    """
    n = np.asarray(images).shape[0]
    H_abs, reachable, anchor = chain_to_anchor(pairs, Hs, n, anchor)
    if feathers is None:
        feathers = samp.feather_stack(
            jnp.asarray(sizes, np.int32), images.shape[1], images.shape[2]
        )
    out = composite_from_abs(
        images, feathers, sizes, H_abs, reachable, gains, blend_mode, bands, max_megapixel
    )
    out.update({"H_abs": H_abs, "reachable": reachable, "anchor": anchor})
    return out
