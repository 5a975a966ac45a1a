"""Rotational panorama renderer: tiled inverse-map compositing.

TPU-native redesign of `renderPanorama/renderPanorama.m`:
- per-projection bounds from sampled camera rays (`cylindricalBounds` etc.,
  `:1507-1754`) — one vmapped device call over all cameras;
- canvas sizing with margins / pixel pad / MP cap (`:126-232`);
- auto reference selection minimizing canvas area for planar/stereographic
  (`:84-122`) — all candidate refs evaluated in a single vmap;
- streaming tile loop (`:342-406`): a python loop over tiles calling ONE
  jitted tile kernel (static tile shape -> one XLA executable regardless of
  canvas size); per tile: pano pixel -> world unit ray -> per camera
  project/sample/weight (`sampleOneTile`, `:1063-1146`) -> blend
  (`fuseTile`, `:825-1044`).

Blend policies: 'linear' and 'none' stream over images with lax.scan
(memory independent of N); 'multiband' stacks per-image tiles (vmap) and
runs the Laplacian pyramid per tile like the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.config import RenderConfig
from autopanostitch_tpu.ops import blend as blend_ops
from autopanostitch_tpu.ops import geometry as geo
from autopanostitch_tpu.ops import projections as proj
from autopanostitch_tpu.ops import sampling as samp

Array = jax.Array

# tiles per render dispatch: fixed, so the tile-render executable's shape
# key is independent of the canvas/tile count (see render_rotational)
TILE_BLOCK = 8


# ---------------------------------------------------------------------------
# Bounds & canvas sizing
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("mode", "nx", "ny"))
def _bounds_per_camera(
    R: Array, K: Array, sizes: Array, mode: str, R_ref: Array,
    uv_abs_cap: float, nx: int = 48, ny: int = 32,
    pct_lo: float = 1.0, pct_hi: float = 99.0, k1: Array | None = None,
):
    """(N,4) [umin,umax,vmin,vmax] per camera on the given surface.

    Mirrors the reference bounds functions: sample each camera's pixel grid,
    push rays to the surface, take robust extents. For planar/stereographic
    a percentile clip (`RenderConfig.robust_pct`, default 1-99) + hard cap
    mirrors `planarBounds` (`:1583-1671`). With `k1` (per-camera radial
    distortion, see `models.bundle.Cameras.k1`) the sampled boundary pixels
    are undistorted first so the bounds describe the true field of view.
    """
    tx = jnp.linspace(0.0, 1.0, nx)
    ty = jnp.linspace(0.0, 1.0, ny)
    gy, gx = jnp.meshgrid(ty, tx, indexing="ij")
    k1a = jnp.zeros((R.shape[0],), R.dtype) if k1 is None else k1

    def one(R_k, K_k, hw, k1_k):
        h = hw[0].astype(jnp.float32) - 1.0
        w = hw[1].astype(jnp.float32) - 1.0
        xp = gx * w
        yp = gy * h
        d = proj.camera_pixel_rays(
            geo.invert_K(K_k), R_k, xp, yp,
            k1=k1_k, cx=K_k[0, 2], cy=K_k[1, 2],
        )
        d = proj.normalize_rays(d)
        u, v, valid = proj.ray_to_pano(mode, d, R_ref)
        if mode in ("planar", "perspective", "stereographic"):
            u = jnp.clip(u, -uv_abs_cap, uv_abs_cap)
            v = jnp.clip(v, -uv_abs_cap, uv_abs_cap)
            un = jnp.where(valid, u, jnp.nan)
            vn = jnp.where(valid, v, jnp.nan)
            lo_u = jnp.nanpercentile(un, pct_lo)
            hi_u = jnp.nanpercentile(un, pct_hi)
            lo_v = jnp.nanpercentile(vn, pct_lo)
            hi_v = jnp.nanpercentile(vn, pct_hi)
        else:
            # angular modes: measure azimuth extents RELATIVE to the
            # camera's central azimuth, so a camera straddling the u = +-pi
            # seam gets its true ~FOV-wide bounds instead of degenerating
            # to (-pi, pi) — degenerate bounds made seam cameras look like
            # they overlap EVERY tile, poisoning contributor selection
            # (coverage collapsed to 0.24 on a 100-view ring)
            big = jnp.float32(1e9)
            fwd = proj.normalize_rays(R_k[2, :][None, None, :])  # +Z world
            u_c, _, _ = proj.ray_to_pano(mode, fwd, R_ref)
            u_cen = u_c.reshape(())
            du = jnp.mod(u - u_cen + jnp.pi, 2 * jnp.pi) - jnp.pi
            lo_u = u_cen + jnp.min(jnp.where(valid, du, big))
            hi_u = u_cen + jnp.max(jnp.where(valid, du, -big))
            lo_v = jnp.min(jnp.where(valid, v, big))
            hi_v = jnp.max(jnp.where(valid, v, -big))
        return jnp.stack([lo_u, hi_u, lo_v, hi_v])

    return jax.vmap(one)(R, K, sizes, k1a)


@partial(jax.jit, static_argnames=("mode", "nx", "ny"))
def _auto_ref_areas(
    R: Array, K: Array, sizes: Array, mode: str, uv_abs_cap: float,
    nx: int = 48, ny: int = 32, pct_lo: float = 1.0, pct_hi: float = 99.0,
    k1: Array | None = None, valid: Array | None = None,
):
    """(N,) canvas area with camera n as the reference — ONE executable.

    The reference's autoRef loop (`renderPanorama.m:84-122`) evaluates each
    candidate's bounds separately; a host loop over `_bounds_per_camera`
    paid one relay dispatch per candidate (~25 ms x N). vmap over the
    candidate axis folds the whole search into one dispatch.

    `valid` marks real cameras when the stack is padded to an N bucket
    (`_pad_cameras`): padded rows are excluded from the extent max/min and
    their own candidate areas come out as garbage — the caller slices/
    masks them before the argmin."""
    if valid is None:
        valid = jnp.ones((R.shape[0],), bool)

    def one_ref(R_ref):
        b = _bounds_per_camera(
            R, K, sizes, mode, R_ref, uv_abs_cap, nx, ny, pct_lo, pct_hi, k1
        )
        du = (jnp.max(jnp.where(valid, b[:, 1], -jnp.inf))
              - jnp.min(jnp.where(valid, b[:, 0], jnp.inf)))
        dv = (jnp.max(jnp.where(valid, b[:, 3], -jnp.inf))
              - jnp.min(jnp.where(valid, b[:, 2], jnp.inf)))
        return du * dv

    return jax.vmap(one_ref)(R)


def _pad_cameras(R, K, sizes, k1):
    """Host-pad a camera stack to its N bucket (utils/buckets.py) so the
    bounds/auto-ref executables are shared across same-bucket datasets.
    Padded cameras carry identity R/K and size (0, 0); callers slice the
    results back to the real N. Returns (Rp, Kp, sizesp, k1p, N, Nb)."""
    from autopanostitch_tpu.utils import buckets

    R = np.asarray(R, np.float32)
    K = np.asarray(K, np.float32)
    sizes = np.asarray(sizes)
    N = int(R.shape[0])
    # wide rungs: the bounds grid math is O(N x samples), trivial — share
    # one executable across every <=64-camera dataset
    Nb = buckets.coarse(N, (64, 128, 256, 512, 1024))
    if Nb == N:
        return R, K, sizes, k1, N, Nb
    pad = Nb - N
    eye = np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))
    Rp = np.concatenate([R, eye])
    Kp = np.concatenate([K, eye])
    sizesp = np.pad(sizes, ((0, pad), (0, 0)))
    k1p = None if k1 is None else np.pad(np.asarray(k1, np.float32), (0, pad))
    return Rp, Kp, sizesp, k1p, N, Nb


def _memory_fit_pixels(margin_bytes: float = 256e6, frac: float = 0.8):
    """Canvas pixels that fit the device's free memory (None = unknown).

    The renderer's O(canvas) buffers are the uint8 panorama + bool coverage
    (4 B/px) plus transient tile stacks; `frac` of the free HBM after
    `margin_bytes` slack is the budget (`renderPanorama.m:236-266`)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        free = stats["bytes_limit"] - stats["bytes_in_use"]
    except Exception:
        return None  # backend without memory stats (CPU): no constraint
    return max(1e6, (free - margin_bytes) * frac / 4.0)


def compute_canvas(
    R: np.ndarray,
    K: np.ndarray,
    sizes: np.ndarray,
    mode: str,
    cfg: RenderConfig = RenderConfig(),
    ref_idx: int | None = None,
    k1: np.ndarray | None = None,
):
    """Host control plane: pick reference, compute canvas geometry.

    Returns dict(f_pan, x0, y0, Hc, Wc, R_ref, ref_idx, mode).
    Mirrors `renderPanorama.m:84-232`.
    """
    N = len(sizes)
    f_pan = float(K[ref_idx if ref_idx is not None else 0][0, 0])
    needs_ref = mode in ("planar", "perspective", "stereographic")
    Rp, Kp, sizesp, k1p, _, Nb = _pad_cameras(R, K, sizes, k1)
    k1_d = None if k1p is None else jnp.asarray(k1p)
    valid_d = jnp.asarray(np.arange(Nb) < N)

    if needs_ref and cfg.auto_ref and ref_idx is None:
        areas = np.asarray(
            _auto_ref_areas(
                jnp.asarray(Rp), jnp.asarray(Kp), jnp.asarray(sizesp, np.int32),
                mode, cfg.uv_abs_cap,
                pct_lo=cfg.robust_pct[0], pct_hi=cfg.robust_pct[1],
                k1=k1_d, valid=valid_d,
            )
        )[:N]
        # first finite minimum, index 0 if none finite — same pick as the
        # old per-candidate host loop
        areas = np.where(np.isfinite(areas), areas, np.inf)
        ref_idx = int(np.argmin(areas)) if np.isfinite(areas).any() else 0
    if ref_idx is None:
        ref_idx = 0
    R_ref = R[ref_idx]
    f_pan = float(K[ref_idx][0, 0])

    b = np.asarray(
        _bounds_per_camera(
            jnp.asarray(Rp), jnp.asarray(Kp), jnp.asarray(sizesp, np.int32),
            mode, jnp.asarray(R_ref), cfg.uv_abs_cap,
            pct_lo=cfg.robust_pct[0], pct_hi=cfg.robust_pct[1],
            k1=k1_d,
        )
    )[:N]
    u0, u1 = float(b[:, 0].min()), float(b[:, 1].max())
    v0, v1 = float(b[:, 2].min()), float(b[:, 3].max())

    if mode in ("cylindrical", "spherical", "equirectangular") and u1 - u0 > 2 * np.pi:
        # camera-centered azimuth bounds can overhang +-pi on closed rings;
        # the canvas itself is at most one full turn
        u0, u1 = -np.pi, np.pi

    if mode == "equirectangular":
        # fitted bounds clipped to the full sphere (a 60-degree panorama no
        # longer allocates the whole 360x180 canvas; the reference treats
        # equirectangular as a spherical alias with fitted bounds)
        u0, u1 = max(u0, -np.pi), min(u1, np.pi)
        v0, v1 = max(v0, -np.pi / 2), min(v1, np.pi / 2)

    du, dv = u1 - u0, v1 - v0
    u0 -= cfg.margin * du
    u1 += cfg.margin * du
    v0 -= cfg.margin * dv
    v1 += cfg.margin * dv
    if mode == "stereographic":
        ext = max(abs(u0), abs(u1), abs(v0), abs(v1))
        u0, u1, v0, v1 = -ext, ext, -ext, ext
    if mode in ("planar", "perspective", "stereographic"):
        u0 -= cfg.pixel_pad / f_pan
        u1 += cfg.pixel_pad / f_pan
        v0 -= cfg.pixel_pad / f_pan
        v1 += cfg.pixel_pad / f_pan

    scale = 1.0
    Wc = max(1, int(np.ceil(f_pan * (u1 - u0))))
    Hc = max(1, int(np.ceil(f_pan * (v1 - v0))))
    cap = cfg.max_megapixel * 1e6
    # device-memory preflight (`renderPanorama.m:236-266` canFit): shrink
    # the canvas like the MP cap instead of the reference's skip-and-warn —
    # on TPU the canvas is uint8+bool so the budget is the HBM headroom
    mem_px = _memory_fit_pixels()
    if mem_px is not None and mem_px < cap:
        import warnings

        warnings.warn(
            f"render: HBM headroom limits the canvas to ~{mem_px / 1e6:.0f} "
            f"MPix (configured cap {cfg.max_megapixel} MPix); downscaling",
            RuntimeWarning,
        )
        cap = mem_px
    if Hc * Wc > cap:
        scale = float(np.sqrt(cap / (Hc * Wc)))
        Wc = max(1, int(np.ceil(Wc * scale)))
        Hc = max(1, int(np.ceil(Hc * scale)))
    return {
        "mode": mode,
        "f_pan": f_pan * scale,
        "x0": u0,
        "y0": v0,
        "Hc": Hc,
        "Wc": Wc,
        "R_ref": R_ref.astype(np.float32),
        "ref_idx": int(ref_idx),
        "uv_abs_cap": float(cfg.uv_abs_cap),
    }


# ---------------------------------------------------------------------------
# Tile kernel
# ---------------------------------------------------------------------------

def _render_tile_impl(
    images4: Array,  # (N, H, W, 4) FULL stack: RGB + feather channel
    R: Array,  # (N, 3, 3)
    K: Array,  # (N, 3, 3)
    gains: Array,  # (N, 3)
    sel: Array,  # (C,) int32 image indices contributing to this tile
    sel_ok: Array,  # (C,) bool
    origin: Array,  # (2,) [x, y] tile origin in canvas pixels
    f_pan,
    x0,
    y0,
    R_ref: Array,
    mode: str,
    tile_h: int,
    tile_w: int,
    blend_mode: str = "linear",
    bands: int = 3,
    angle_power: float = 1.0,
    interp: str = "bilinear",
    k1: Array | None = None,  # (N,) per-camera radial distortion
):
    """Render one canvas tile (reference `fuseTile`/`sampleOneTile`).

    Per-tile image culling: only the C images whose projected bounds
    intersect the tile are sampled (host-selected) — render cost is
    O(tile x C) instead of O(tile x N), the tiled analogue of the
    reference's per-tile contributor logic.

    The feather rides as the stack's 4th channel so it shares the color
    taps: gather cost on TPU scales with tap POSITIONS, not channels, so
    the separate bilinear feather lookup (4 extra taps per sample, 20% of
    the sampling work under bicubic) is free. Interpolation overshoot on
    the feather ramp is clamped at 0.
    """
    ty, tx = jnp.mgrid[0:tile_h, 0:tile_w]
    xp = tx.astype(jnp.float32) + origin[0]
    yp = ty.astype(jnp.float32) + origin[1]
    d = proj.pano_to_ray(mode, xp, yp, f_pan, x0, y0, R_ref)  # (th, tw, 3)

    # gather the contributing subset (device gather from the resident stack)
    images4 = images4[sel]
    R = R[sel]
    K = K[sel]
    gains = gains[sel] * sel_ok[:, None]
    # k1 = None keeps the pinhole fast path bit-identical (no distortion
    # fixed-point math in the sampler); with k1 the projected pinhole coords
    # are mapped into the stored (distorted) image before the gather
    use_k1 = k1 is not None
    k1 = jnp.zeros((R.shape[0],), R.dtype) if k1 is None else k1[sel]

    if interp == "bicubic2x":
        # bicubic quality at bilinear tap cost: bicubic-UPSAMPLE the C
        # contributing images 2x (dense separable resize — no gathers),
        # then take 4 bilinear taps on the fine grid instead of 16 cubic
        # taps on the original. Gather cost on TPU scales with tap
        # POSITIONS (~70 M taps/s measured), so quartering the taps is
        # the whole win; the dense upsample is ~free by comparison.
        C_, H_, W_, ch_ = images4.shape
        images4 = jax.image.resize(images4, (C_, 2 * H_, 2 * W_, ch_), "cubic")
        base = samp._SAMPLERS["bilinear"]

        def sampler(img4, u, v):
            # jax.image.resize convention: out[j] = in((j + 0.5)/s - 0.5),
            # so original coordinate u lands at 2u + 0.5 on the fine grid;
            # validity is judged in ORIGINAL bounds (the fine grid loses a
            # half-pixel rim to clamping, inside the feather ramp anyway)
            col4, _ = base(
                img4,
                jnp.clip(2.0 * u + 0.5, 0.0, 2 * W_ - 1.0),
                jnp.clip(2.0 * v + 0.5, 0.0, 2 * H_ - 1.0),
            )
            valid = (u >= 0.0) & (u <= W_ - 1.0) & (v >= 0.0) & (v <= H_ - 1.0)
            return col4 * valid[..., None], valid
    else:
        sampler = samp._SAMPLERS[interp]

    def sample_one(img4, R_k, K_k, gain, ok, k1_k):
        u, v, front, cosang = proj.project_ray_to_camera(
            d, R_k, K_k, k1=k1_k if use_k1 else None
        )
        col4, valid = sampler(img4, u, v)
        col = col4[..., :3]
        wf = jnp.maximum(col4[..., 3], 0.0)  # clamp ramp overshoot
        w_ang = jnp.where(front, cosang, 0.0) ** angle_power
        w = w_ang * jnp.maximum(wf, 1e-4) * valid * front * ok
        return col * gain[None, None, :], w

    if blend_mode == "multiband":
        cols, ws = jax.vmap(sample_one)(
            images4, R, K, gains, sel_ok.astype(images4.dtype), k1
        )
        tile = blend_ops.multiband_blend(cols, ws, bands=bands)
        wsum = jnp.sum(ws, axis=0)
    elif blend_mode == "linear":
        def body(carry, inp):
            acc, wsum = carry
            img4, R_k, K_k, gain, ok, k1_k = inp
            col, w = sample_one(img4, R_k, K_k, gain, ok, k1_k)
            return (acc + col * w[..., None], wsum + w), None

        # carry init references `origin` so it is device-varying under
        # shard_map (an invariant zeros init trips the scan vma check)
        z3 = jnp.zeros((tile_h, tile_w, 3)) + 0.0 * origin[0]
        z2 = jnp.zeros((tile_h, tile_w)) + 0.0 * origin[0]
        (acc, wsum), _ = jax.lax.scan(
            body,
            (z3, z2),
            (images4, R, K, gains, sel_ok.astype(images4.dtype), k1),
        )
        tile = acc / jnp.maximum(wsum, 1e-8)[..., None]
    else:
        # 'none' with the reference's overwrite policies
        # (`fuseTile` :863-914): none-last | none-first | none-maxangle
        policy = blend_mode.split("-")[1] if "-" in blend_mode else "last"

        def body(carry, inp):
            tile, wsum, best = carry
            img4, R_k, K_k, gain, ok, k1_k = inp
            col, w = sample_one(img4, R_k, K_k, gain, ok, k1_k)
            valid = w > 1e-6
            if policy == "first":
                write = valid & (wsum <= 1e-6)
            elif policy == "maxangle":
                write = valid & (w > best)
            else:  # 'last'
                write = valid
            tile = jnp.where(write[..., None], col, tile)
            best = jnp.where(write, w, best)
            return (tile, wsum + w, best), None

        z3 = jnp.zeros((tile_h, tile_w, 3)) + 0.0 * origin[0]
        z2 = jnp.zeros((tile_h, tile_w)) + 0.0 * origin[0]
        (tile, wsum, _), _ = jax.lax.scan(
            body,
            (z3, z2, z2),
            (images4, R, K, gains, sel_ok.astype(images4.dtype), k1),
        )
    # threshold, not >0 (see planar.composite_band): hairline bilinear
    # tails at image borders otherwise count as coverage
    covered = wsum > 1e-3
    tile = tile * covered[..., None]
    # uint8 output: the device->host link is the bottleneck (a float32
    # canvas is 12 B/px; uint8 is 3)
    tile_u8 = (jnp.clip(tile, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    return tile_u8, covered


@partial(
    jax.jit,
    static_argnames=("mode", "tile_h", "tile_w", "blend_mode", "bands", "interp"),
)
def render_tile(
    images, feathers, R, K, gains, sel, sel_ok, origin, f_pan, x0, y0,
    R_ref, mode, tile_h, tile_w, blend_mode="linear", bands=3,
    angle_power=1.0, interp="bilinear", k1=None,
):
    """Single-tile entry point (images and feathers as separate arrays;
    the batched path pre-concatenates the 4-channel stack once)."""
    images4 = jnp.concatenate([images, feathers[..., None]], axis=-1)
    return _render_tile_impl(
        images4, R, K, gains, sel, sel_ok, origin, f_pan, x0, y0, R_ref,
        mode, tile_h, tile_w, blend_mode, bands, angle_power, interp, k1,
    )


@partial(
    jax.jit,
    static_argnames=(
        "mode", "tile_h", "tile_w", "blend_mode", "bands", "interp",
    ),
)
def _render_tiles_batched(
    images: Array,  # (N, H, W, 3)
    feathers: Array,  # (N, H, W) border feather ramps
    R: Array,
    K: Array,
    gains: Array,
    sel: Array,  # (T, C)
    sel_ok: Array,  # (T, C)
    origins: Array,  # (T, 2)
    real_t: Array,  # (T,) bool — False = T-bucket padding tile (skipped)
    f_pan,
    x0,
    y0,
    R_ref: Array,
    mode: str,
    tile_h: int,
    tile_w: int,
    blend_mode: str,
    bands: int,
    angle_power,
    interp: str,
    k1: Array | None = None,
):
    """ALL canvas tiles in one dispatch: lax.map over the tile kernel.

    One executable + ONE uint8 device->host pull per panorama instead of
    one dispatch + pull per tile (each pull through the TPU relay costs
    ~27 ms of sync; at 100-image scale the per-tile version spent more
    time syncing than sampling). Memory stays bounded: lax.map runs tiles
    sequentially, the only O(canvas) buffers are the uint8 tile stack and
    bool coverage. The feather concat happens inside this executable (a
    separate eager concat cost one more relay AOT round-trip per fresh
    shape).

    SHAPE BUCKETS (utils/buckets.py): this program's key is
    (N, H, W, C, T_bucket, tile, mode, blend...) — the CANVAS dimensions
    are deliberately absent. Tiles come back as a (T, th, tw) stack and
    the canvas is assembled on HOST (same bytes pulled either way), so
    datasets that differ only in panorama extent share the one expensive
    render program. The tile count is padded to a bucket; padding tiles
    are lax.cond-skipped at ~zero runtime."""
    images4 = jnp.concatenate([images, feathers[..., None]], axis=-1)

    def one(args):
        s, ok, org, real = args

        def run(_):
            return _render_tile_impl(
                images4, R, K, gains, s, ok, org, f_pan, x0, y0, R_ref,
                mode, tile_h, tile_w, blend_mode, bands, angle_power,
                interp, k1,
            )

        def skip(_):
            return (jnp.zeros((tile_h, tile_w, 3), jnp.uint8),
                    jnp.zeros((tile_h, tile_w), bool))

        return jax.lax.cond(real, run, skip, 0)

    return jax.lax.map(one, (sel, sel_ok, origins, real_t))


@jax.jit
def _concat_feather(images: Array, feathers: Array) -> Array:
    return jnp.concatenate([images, feathers[..., None]], axis=-1)




def tile_contributors(
    canvas: dict,
    R: np.ndarray,
    K: np.ndarray,
    sizes: np.ndarray,
    tile: tuple,
    max_contributors: int | None = None,
    k1: np.ndarray | None = None,
):
    """Host control plane: for every tile, pick the <= C images whose
    projected bounds intersect it (with wrap-around handling for the
    angular projections). max_contributors=None sizes C automatically from
    the tiles' needs (see below). Returns (sel (T, C) int32,
    sel_ok (T, C) bool, tile_origins (T, 2) int)."""
    mode = canvas["mode"]
    Hc, Wc = canvas["Hc"], canvas["Wc"]
    th, tw = tile
    f_pan, x0, y0 = canvas["f_pan"], canvas["x0"], canvas["y0"]
    Rp, Kp, sizesp, k1p, N_real, _ = _pad_cameras(R, K, sizes, k1)
    b = np.asarray(
        _bounds_per_camera(
            jnp.asarray(Rp),
            jnp.asarray(Kp),
            jnp.asarray(sizesp, np.int32),
            mode,
            jnp.asarray(canvas["R_ref"]),
            # same cap the canvas was computed with, so contributor bounds
            # stay consistent with canvas bounds under a configured cap
            float(canvas.get("uv_abs_cap", 8.0)),
            k1=None if k1p is None else jnp.asarray(k1p),
        )
    )[:N_real]  # (N, 4) surface coords
    # to canvas pixels
    px = (b[:, :2] - x0) * f_pan  # (N, 2) [umin, umax]
    py = (b[:, 2:] - y0) * f_pan
    wrap = 2 * np.pi * f_pan if mode in ("cylindrical", "spherical", "equirectangular") else None

    # vectorized tile x image x shift overlap (the loop form was O(T*N*S)
    # pure python — measurable at 100 images x large canvases)
    r0s = np.arange(0, Hc, th, dtype=np.float64)
    c0s = np.arange(0, Wc, tw, dtype=np.float64)
    R0, C0 = np.meshgrid(r0s, c0s, indexing="ij")
    origins = np.stack([C0.ravel(), R0.ravel()], -1)  # (T, 2) [x, y]
    shifts = np.array([0.0] if wrap is None else [0.0, wrap, -wrap])  # (S,)
    tx0 = origins[:, 0][:, None, None]  # (T, 1, 1)
    ty0 = origins[:, 1][:, None, None]
    oy = np.clip(
        np.minimum(py[None, :, 1, None], ty0 + th)
        - np.maximum(py[None, :, 0, None], ty0),
        0, None,
    )  # (T, N, S)

    def seg_overlap(seg_x0, seg_w, seg_y0, seg_h):
        ox = np.minimum(px[None, :, 1, None] + shifts, seg_x0 + seg_w) - np.maximum(
            px[None, :, 0, None] + shifts, seg_x0
        )
        oy_s = np.minimum(py[None, :, 1, None], seg_y0 + seg_h) - np.maximum(
            py[None, :, 0, None], seg_y0
        )
        return (np.clip(ox, 0, None) * np.clip(oy_s, 0, None)).max(-1)  # (T, N)

    areas = seg_overlap(tx0, tw, ty0, th)  # whole-tile overlap (T, N)
    if max_contributors is None:
        # auto cap: probe a fine 4x4 grid per tile and size C to the
        # largest number of DISTINCT best-cameras any tile needs, so a
        # yaw ring stays cheap (~6) while a multi-row rig gets the ~12 it
        # needs for full coverage (measured: fixed C=6 left lens-shaped
        # holes at a 4-row rig's row boundaries)
        fine = []
        fw, fh = tw / 4.0, th / 4.0
        for r in range(4):
            for c in range(4):
                o = seg_overlap(tx0 + c * fw, fw, ty0 + r * fh, fh)
                fine.append(np.where(o.max(1) > 0, np.argmax(o, 1), -1))
        fine = np.stack(fine, axis=1)  # (T, 16) best camera per fine cell
        need = max(
            int(len(set(row[row >= 0].tolist()))) for row in fine
        ) if fine.size else 4
        # COVERAGE lower bound: the probe's distinct-best count saturates
        # at its grid resolution, and on a ring much denser than one tile
        # (camera footprint << tile span) it under-counts — the selected
        # cameras' feather ramps then die before the next one starts
        # (measured: 48-view ring, fixed 384-px tiles, probe said C=4 and
        # whole columns went uncovered). A contributor roughly every HALF
        # camera footprint keeps adjacent feathers overlapping.
        wm = float(np.median(px[:, 1] - px[:, 0]))
        hm = float(np.median(py[:, 1] - py[:, 0]))
        need_h = int(np.ceil(tw / max(wm * 0.5, 1.0)))
        need_v = int(np.ceil(th / max(hm * 0.5, 1.0)))
        need = max(need, need_h * need_v)
        need = int(np.clip(need, 4, 16))
        # ladder, not exact: C keys the tile-render executable, so nearby
        # needs (6 vs 7) should share a program (utils/buckets.py)
        max_contributors = next(c for c in (4, 6, 8, 12, 16) if c >= need)
    C = max_contributors
    tile_contributors.last_C = C  # consumed by bench MFU accounting
    # Per-SEGMENT selection: a tile can span more of the panorama than one
    # camera's FOV, and the top-C cameras by WHOLE-TILE overlap then
    # cluster on one side, leaving the rest of the tile uncovered
    # (measured: 100-view ring coverage collapsed to 0.24 with tile-level
    # top-6). Picking the best camera for each cell of an sr x sc grid
    # over the tile (sr*sc = C, split by aspect so multi-row rigs spread
    # vertically too) guarantees contributors cover the whole tile.
    sr = int(np.clip(round(np.sqrt(C * th / tw)), 1, C))
    while C % sr:
        sr -= 1
    sc = C // sr
    seg_w = tw / sc
    seg_h = th / sr
    cells = [(r, c) for r in range(sr) for c in range(sc)]
    seg_ov = [
        seg_overlap(tx0 + c * seg_w, seg_w, ty0 + r * seg_h, seg_h)
        for r, c in cells
    ]
    seg_best = np.stack([np.argmax(o, axis=1) for o in seg_ov], axis=1)  # (T, C)
    seg_area = np.stack([o.max(axis=1) for o in seg_ov], axis=1)
    rank = np.argsort(-areas, axis=1)  # (T, N) whole-tile fallback order
    T = origins.shape[0]
    sel = np.zeros((T, C), np.int64)
    ok = np.zeros((T, C), bool)
    for t in range(T):
        chosen = []
        for s in range(C):
            cand = int(seg_best[t, s])
            if seg_area[t, s] > 0 and cand not in chosen:
                chosen.append(cand)
        for cand in rank[t]:  # fill remaining slots by whole-tile overlap
            if len(chosen) >= C:
                break
            cand = int(cand)
            if areas[t, cand] > 0 and cand not in chosen:
                chosen.append(cand)
        sel[t, : len(chosen)] = chosen
        ok[t, : len(chosen)] = True
    return sel.astype(np.int32), ok, origins.astype(np.float32)


def render_rotational(
    images: np.ndarray,
    feathers: np.ndarray,
    R: np.ndarray,
    K: np.ndarray,
    canvas: dict,
    gains: np.ndarray | None = None,
    blend_mode: str = "multiband",
    bands: int = 3,
    tile: tuple = (512, 512),
    angle_power: float = 1.0,
    sizes: np.ndarray | None = None,
    max_contributors: int | None = None,
    interp: str = "bilinear",
    k1: np.ndarray | None = None,
):
    """Full rotational panorama: ONE jitted dispatch mapping the tile
    kernel over all canvas tiles, with per-tile contributor culling (cost
    O(canvas x C), C <= 8, instead of O(canvas x N)) and a single uint8
    device->host pull (the tile stack; the canvas is assembled on host so
    the render program's shape key is canvas-independent — see
    `_render_tiles_batched`).

    Returns (panorama (Hc, Wc, 3) uint8, coverage (Hc, Wc) bool).
    """
    Hc, Wc = canvas["Hc"], canvas["Wc"]

    th, tw = tile  # FIXED tile shape: shared executable across canvases
    n = images.shape[0]
    if gains is None:
        gains = np.ones((n, 3), np.float32)
    if sizes is None:
        sizes = np.tile(np.array(images.shape[1:3], np.int32), (n, 1))
    C_arg = None if max_contributors is None else min(max_contributors, n)
    sel, sel_ok, origins = tile_contributors(
        canvas, R, K, sizes, (th, tw), C_arg, k1=k1
    )
    T = sel.shape[0]

    # shape buckets (utils/buckets.py): N to a coarse rung (gather source
    # only); tiles dispatch in fixed blocks of TILE_BLOCK so the tile
    # count never enters the executable's shape key
    from autopanostitch_tpu.utils import buckets

    Nc = buckets.coarse(n)
    if Nc != n:
        pad = Nc - n
        eye = np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))
        # images/feathers are usually DEVICE-resident: pad on device (one
        # tiny eager executable) — pulling the stack to host would cost a
        # full relay round-trip of O(100 MB)
        if isinstance(images, np.ndarray):
            images = np.pad(images, ((0, pad),) + ((0, 0),) * (images.ndim - 1))
            feathers = np.pad(feathers, ((0, pad),) + ((0, 0),) * (feathers.ndim - 1))
        else:
            images = jnp.pad(images, ((0, pad),) + ((0, 0),) * (images.ndim - 1))
            feathers = jnp.pad(feathers, ((0, pad),) + ((0, 0),) * (feathers.ndim - 1))
        R = np.concatenate([np.asarray(R, np.float32), eye])
        K = np.concatenate([np.asarray(K, np.float32), eye])
        gains = np.concatenate([gains, np.ones((pad, 3), np.float32)])
        if k1 is not None:
            k1 = np.pad(np.asarray(k1, np.float32), (0, pad))
    # fixed TILE_BLOCK-tile dispatches: the tile count never enters the
    # executable key (a coarse T rung was tried first, but its
    # "cond-skipped" padding tiles measured ~3-8 ms each — the branches
    # lower to both-sides select under the tile map — so wide rungs taxed
    # small canvases hard). <= TILE_BLOCK-1 padding tiles total, and the
    # per-block device->host pulls overlap block compute.
    nblocks = (T + TILE_BLOCK - 1) // TILE_BLOCK
    Tp = nblocks * TILE_BLOCK
    if Tp != T:
        sel = np.pad(sel, ((0, Tp - T), (0, 0)))
        sel_ok = np.pad(sel_ok, ((0, Tp - T), (0, 0)))
        origins = np.pad(origins, ((0, Tp - T), (0, 0)))
    real_t = np.arange(Tp) < T

    R_d = jnp.asarray(np.asarray(R, np.float32))
    K_d = jnp.asarray(np.asarray(K, np.float32))
    g_d = jnp.asarray(gains.astype(np.float32))
    R_ref = jnp.asarray(canvas["R_ref"])
    k1_d = None if k1 is None else jnp.asarray(np.asarray(k1, np.float32))
    img_d = jnp.asarray(images)
    fea_d = jnp.asarray(feathers)

    blocks = []
    for bstart in range(0, Tp, TILE_BLOCK):
        bsl = slice(bstart, bstart + TILE_BLOCK)
        blocks.append(_render_tiles_batched(
            img_d, fea_d, R_d, K_d, g_d,
            jnp.asarray(sel[bsl]), jnp.asarray(sel_ok[bsl]),
            jnp.asarray(origins[bsl]), jnp.asarray(real_t[bsl]),
            canvas["f_pan"], canvas["x0"], canvas["y0"], R_ref,
            canvas["mode"], th, tw, blend_mode, bands, angle_power,
            interp, k1_d,
        ))
    tiles = np.concatenate([np.asarray(t) for t, _ in blocks])[:T]
    covs = np.concatenate([np.asarray(c) for _, c in blocks])[:T]
    return assemble_tiles(tiles, covs, origins[:T], Hc, Wc)


def assemble_tiles(tiles: np.ndarray, covs: np.ndarray, origins: np.ndarray,
                   Hc: int, Wc: int):
    """Host canvas assembly from the pulled tile stack (same bytes as a
    device-assembled canvas; keeps canvas dims out of the render
    executable's shape key)."""
    th, tw = covs.shape[1:3]
    pano = np.zeros((Hc, Wc, 3), np.uint8)
    cover = np.zeros((Hc, Wc), bool)
    for t in range(len(origins)):  # tiles may carry T-bucket padding rows
        ox, oy = int(origins[t, 0]), int(origins[t, 1])
        h = min(th, Hc - oy)
        w = min(tw, Wc - ox)
        if h <= 0 or w <= 0:
            continue
        pano[oy : oy + h, ox : ox + w] = tiles[t, :h, :w]
        cover[oy : oy + h, ox : ox + w] = covs[t, :h, :w]
    return pano, cover
