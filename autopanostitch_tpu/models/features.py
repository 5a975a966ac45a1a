"""Feature-extraction stage: images -> batched SIFT features.

Mirrors the reference stage `loadImages.m:82-99` (parfor over images calling
`getFeaturePoints`), replaced by one vmapped SIFT over the padded image
stack. Keypoints that fall in the zero-padding (or hug the valid border,
where the pad edge creates false gradients) are masked out.
"""

from __future__ import annotations

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
    """
    N = images_np.shape[0]
    if N <= group:
        dev = _to_float_any(jax.device_put(images_np))
        return extract_features(dev, sizes, cfg), dev
    handles = [
        jax.device_put(images_np[g0 : g0 + group]) for g0 in range(0, N, group)
    ]
    floats = [_to_float_any(h) for h in handles]
    outs = []
    for k, imgs in enumerate(floats):
        sz = np.asarray(sizes)[k * group : (k + 1) * group]
        if imgs.shape[0] < group:
            pad = group - imgs.shape[0]
            imgs = jnp.pad(imgs, ((0, pad), (0, 0), (0, 0), (0, 0)))
            sz = np.pad(sz, ((0, pad), (0, 0)))
        outs.append(extract_features(imgs, sz, cfg))
    feats = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs)[:N], *outs)
    images = jnp.concatenate(floats)[:N]
    return feats, images


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
    """
    gray = sift.rgb_to_gray(images)
    det = cfg.detector.upper()
    scale_back = 1.0
    levels = upsample_levels(cfg, sizes)
    if levels:
        # Lowe's octave -1 (and -2 for ultra-small inputs): detect on the
        # 2^levels linearly-upsampled image (halves the smallest resolvable
        # scale per level; keypoint coordinates and scales are mapped back
        # to input pixels below)
        N, H, W = gray.shape
        s = 1 << levels
        gray = jax.image.resize(gray, (N, s * H, s * W), "linear")
        sizes = np.asarray(sizes) * s
        scale_back = 1.0 / s
    if det in ("HARRIS", "FAST", "ORB", "BRISK"):
        from autopanostitch_tpu.ops import corners

        feats = corners.extract_corners_batch(gray, cfg, det.lower())
    elif det in ("SURF", "KAZE"):
        # SURF -> exact Gaussian determinant-of-Hessian blobs + SIFT
        # descriptors (ops/doh.py); KAZE maps to the same detector (its
        # nonlinear scale space is not reproduced - documented)
        from autopanostitch_tpu.ops import doh

        feats = doh.extract_doh_batch(gray, cfg)
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
