"""Feature-extraction stage: images -> batched SIFT features.

Mirrors the reference stage `loadImages.m:82-99` (parfor over images calling
`getFeaturePoints`), replaced by one vmapped SIFT over the padded image
stack. Keypoints that fall in the zero-padding (or hug the valid border,
where the pad edge creates false gradients) are masked out.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.config import DetectorConfig
from autopanostitch_tpu.ops import sift
from autopanostitch_tpu.ops.sift import SiftFeatures


def extract_features_streamed(
    images_np: np.ndarray,
    sizes: np.ndarray,
    cfg: DetectorConfig = DetectorConfig(),
    group: int = 16,
):
    """Upload-overlapped extraction from a HOST image stack.

    Queues one async `device_put` per `group` images, then dispatches the
    per-group extraction — later uploads overlap earlier groups' compute
    (0.4 s of the ~1.1 s relay upload hides under extraction at 100
    images). Returns (features, images (N, H, W, 3) float32 on device) so
    the caller reuses the uploaded stack for gain/render.

    The tail group is padded on HOST (numpy) so every group hits the SAME
    jitted extraction executable; uploads stay uint8 (4x cheaper) and the
    float conversion happens inside that executable.
    """
    N = images_np.shape[0]
    if N <= group:
        dev = jax.device_put(images_np)
        feats = extract_features(dev, sizes, cfg)
        return feats, _assemble_float((dev,), N)
    sizes = np.asarray(sizes)
    handles, szs = [], []
    for g0 in range(0, N, group):
        blk = images_np[g0 : g0 + group]
        sz = sizes[g0 : g0 + group]
        if blk.shape[0] < group:  # host-side pad: no extra executable
            pad = group - blk.shape[0]
            blk = np.pad(blk, ((0, pad), (0, 0), (0, 0), (0, 0)))
            sz = np.pad(sz, ((0, pad), (0, 0)))
        handles.append(jax.device_put(blk))
        szs.append(sz)
    outs = [extract_features(h, sz, cfg) for h, sz in zip(handles, szs)]
    feats = _concat_feats(tuple(outs), N)
    images = _assemble_float(tuple(handles), N)
    return feats, images


@partial(jax.jit, static_argnames=("n",))
def _concat_feats(outs: tuple, n: int) -> SiftFeatures:
    """Concat + trim the per-group feature pytrees in ONE executable (the
    eager tree_map form cost 2 executables per SiftFeatures field)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs)[:n], *outs)


@partial(jax.jit, static_argnames=("n",))
def _assemble_float(handles: tuple, n: int) -> jax.Array:
    """Concat + trim + uint8->float in ONE executable (the eager form cost
    four relay AOT round-trips per fresh shape)."""
    x = handles[0] if len(handles) == 1 else jnp.concatenate(handles)
    x = x[:n]
    return x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x


def _to_float_any(raw: jax.Array) -> jax.Array:
    if raw.dtype == jnp.uint8:
        return raw.astype(jnp.float32) / 255.0
    return raw


def upsample_levels(cfg: DetectorConfig, sizes) -> int:
    """Resolve the upsample_input tri-state into a number of 2x upsample
    levels (Lowe octave -1, -2). None = auto: one level when the largest
    valid image dimension is under cfg.upsample_below px — the regime
    where the reference's always-upsampling detectSIFTFeatures materially
    out-detects a non-upsampled pyramid — and a second level under
    cfg.upsample_second_below px (the thumbnail regime): measured on the
    reference's Rio sheet (56 real 78 px photos), one level connects
    41/56 images, two levels 52/56 (accepted pairs 49 -> 97) —
    scale-space resolution, not matching, is the binding constraint.
    The second level costs 4x the first, so it is reserved for inputs
    where one level still leaves the detection grid under ~200 px."""
    if cfg.upsample_input is not None:
        return 1 if cfg.upsample_input else 0
    maxdim = int(np.asarray(sizes).max())
    if maxdim < int(cfg.upsample_second_below):
        return 2
    return 1 if maxdim < int(cfg.upsample_below) else 0


def extract_features(
    images: jax.Array,
    sizes: np.ndarray,
    cfg: DetectorConfig = DetectorConfig(),
    border: int = 6,
) -> SiftFeatures:
    """Feature extraction on an (N, H, W, 3) padded stack.

    Dispatches on cfg.detector like `getFeaturePoints.m:33-64`: 'SIFT'
    (default, float descriptors) or the binary corner detectors
    'HARRIS' | 'FAST' | 'ORB' | 'BRISK' (256-bit rotated-BRIEF as {0,1}
    vectors — Hamming == squared L2, so matching is unchanged).
    Returns batched SiftFeatures with padding/border keypoints masked.

    The whole stage (uint8->float, gray, optional upsample, detector,
    border mask, coordinate scale-back) is ONE jitted executable: on the
    TPU relay each separate eager op costs an AOT round-trip, and the
    eager form burned ~12 executables per fresh image shape.
    """
    levels = upsample_levels(cfg, sizes)  # host decision on numpy sizes
    return _extract_impl(
        images, jnp.asarray(np.asarray(sizes), jnp.int32), cfg, levels, border
    )


@partial(jax.jit, static_argnames=("cfg", "levels", "border"))
def _extract_impl(
    images: jax.Array,
    sizes: jax.Array,
    cfg: DetectorConfig,
    levels: int,
    border: int,
) -> SiftFeatures:
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    gray = sift.rgb_to_gray(images)
    det = cfg.detector.upper()
    scale_back = 1.0
    if levels:
        # Lowe's octave -1 (and -2 for ultra-small inputs): detect on the
        # 2^levels linearly-upsampled image (halves the smallest resolvable
        # scale per level; keypoint coordinates and scales are mapped back
        # to input pixels below)
        N, H, W = gray.shape
        s = 1 << levels
        gray = jax.image.resize(gray, (N, s * H, s * W), "linear")
        sizes = sizes * s
        scale_back = 1.0 / s
    if det in ("HARRIS", "FAST", "ORB", "BRISK"):
        from autopanostitch_tpu.ops import corners

        feats = corners.extract_corners_batch(gray, cfg, det.lower())
    elif det == "SURF":
        # SURF -> exact Gaussian determinant-of-Hessian blobs + SIFT
        # descriptors (ops/doh.py)
        from autopanostitch_tpu.ops import doh

        feats = doh.extract_doh_batch(gray, cfg)
    elif det == "KAZE":
        # KAZE -> det-Hessian maxima of the Perona-Malik NONLINEAR scale
        # space (FED evolution, ops/kaze.py), sharing the DoH detection +
        # descriptor core (reference getFeaturePoints.m:33-64 ->
        # detectKAZEFeatures)
        from autopanostitch_tpu.ops import kaze

        feats = kaze.extract_kaze_batch(gray, cfg)
    else:  # SIFT / vl_SIFT
        feats = sift.extract_batch(gray, cfg)
    feats = mask_borders(feats, sizes, border)
    if scale_back != 1.0:
        feats = feats._replace(
            xy=feats.xy * scale_back, scale=feats.scale * scale_back
        )
    return feats


def mask_borders(feats: SiftFeatures, sizes, border: int = 6) -> SiftFeatures:
    """Mask keypoints in the zero-padding or hugging the valid border
    (where the pad edge creates false gradients)."""
    sizes = jnp.asarray(sizes)
    h_valid = sizes[:, 0][:, None].astype(jnp.float32)
    w_valid = sizes[:, 1][:, None].astype(jnp.float32)
    x = feats.xy[..., 0]
    y = feats.xy[..., 1]
    in_valid = (
        (x >= border)
        & (x <= w_valid - 1 - border)
        & (y >= border)
        & (y <= h_valid - 1 - border)
    )
    return feats._replace(mask=feats.mask & in_valid)
