"""Determinant-of-Hessian blob detector (the 'SURF' detector option).

The reference's SURF option (`getFeaturePoints.m` -> `detectSURFFeatures`)
finds blobs as maxima of the determinant of the Hessian over a box-filter
scale space. On TPU the box-filter approximation buys nothing (separable
Gaussian convs are already MXU/VPU-friendly), so this implements the exact
Gaussian DoH:

    DoH(x, sigma) = sigma^4 (L_xx L_yy - L_xy^2)

over a geometric scale ladder, with 3x3x(scale) non-max suppression and
top-k capacity selection like the SIFT path. Descriptors reuse the SIFT
dense-window machinery at the detected scale (documented substitution for
SURF's Haar descriptor — descriptors only need to be matched against
themselves, so the family choice is internal).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from autopanostitch_tpu.config import DetectorConfig
from autopanostitch_tpu.ops import sift as sift_ops
from autopanostitch_tpu.ops.sift import SiftFeatures, gaussian_blur

Array = jax.Array


def hessian_response(L: Array, sigma: float) -> Array:
    """Scale-normalized determinant of Hessian of one (already-smoothed)
    scale-space level."""
    # central second differences
    Lxx = jnp.roll(L, -1, 1) + jnp.roll(L, 1, 1) - 2 * L
    Lyy = jnp.roll(L, -1, 0) + jnp.roll(L, 1, 0) - 2 * L
    Lx = 0.5 * (jnp.roll(L, -1, 1) - jnp.roll(L, 1, 1))
    Lxy = 0.5 * (jnp.roll(Lx, -1, 0) - jnp.roll(Lx, 1, 0))
    return (sigma**4) * (Lxx * Lyy - Lxy * Lxy)


def doh_sigmas(cfg: DetectorConfig, n_scales: int = 8) -> list:
    k = 2.0 ** 0.5
    return [cfg.sigma * (k**i) for i in range(n_scales)]


@partial(jax.jit, static_argnames=("cfg",))
def extract_doh(img: Array, cfg: DetectorConfig = DetectorConfig()) -> SiftFeatures:
    """DoH blobs + SIFT descriptors on one grayscale image."""
    sigmas = doh_sigmas(cfg)
    Ls = jnp.stack([gaussian_blur(img, s) for s in sigmas])  # (S, H, W)
    return extract_from_levels(Ls, tuple(sigmas), cfg)


def extract_from_levels(
    Ls: Array, sigmas: tuple, cfg: DetectorConfig, resp_fn=None, border: int = 8
) -> SiftFeatures:
    """Shared detection + descriptor core over a precomputed scale-space
    stack `Ls` (S, H, W) — Gaussian levels for SURF/DoH, nonlinear
    (Perona-Malik diffused) levels for KAZE (`ops/kaze.py`).

    resp_fn(level, sigma) -> response map; defaults to the unit-step
    `hessian_response` (correct for Gaussian levels, whose unit-step
    differences approximate true derivatives). KAZE passes its
    sigma-stepped variant (see `kaze.hessian_response_sigma_step`)."""
    if resp_fn is None:
        resp_fn = hessian_response
    resp = jnp.stack(
        [resp_fn(Ls[i], s) for i, s in enumerate(sigmas)]
    )  # (S, H, W)

    # 3x3x3 scale-space non-max suppression (interior scales only) — one
    # reduce_window like the SIFT extrema (26 rolls copied the full
    # response volume 26 times)
    center = resp[1:-1]
    mx = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
    )[1:-1]
    thr = 1e-6
    is_max = (center >= mx) & (center > thr)
    b = border
    is_max = is_max.at[:, :b, :].set(False).at[:, -b:, :].set(False)
    is_max = is_max.at[:, :, :b].set(False).at[:, :, -b:].set(False)

    K = cfg.max_keypoints
    S, H, W = is_max.shape
    score = jnp.where(is_max, center, -1.0).reshape(-1)
    vals, flat = jax.lax.top_k(score, K)
    valid = vals > 0
    si = (flat // (H * W)).astype(jnp.int32) + 1  # back to resp scale index
    rem = flat % (H * W)
    y = (rem // W).astype(jnp.float32)
    x = (rem % W).astype(jnp.float32)
    sigma_kp = jnp.asarray(sigmas, jnp.float32)[si]

    # gradients of the scale-space levels for descriptor sampling
    dx_s = 0.5 * (jnp.roll(Ls, -1, 2) - jnp.roll(Ls, 1, 2))
    dy_s = 0.5 * (jnp.roll(Ls, -1, 1) - jnp.roll(Ls, 1, 1))
    # magnitude/angle hoisted per scale (see sift._orientation_hist_dense)
    mag_s = jnp.sqrt(dx_s * dx_s + dy_s * dy_s)
    ang_s = jnp.arctan2(dy_s, dx_s)

    Wwin = min(80, (min(H, W) // 8) * 8)

    def per_kp(xi, yi, lev, srel):
        wmag, cx_, cy_ = sift_ops._slice_window(mag_s, lev, xi, yi, Wwin)
        wang, _, _ = sift_ops._slice_window(ang_s, lev, xi, yi, Wwin)
        lx = xi - cx_.astype(jnp.float32)
        ly = yi - cy_.astype(jnp.float32)
        hist = sift_ops._orientation_hist_dense(wmag, wang, lx, ly, srel)
        thetas, th_ok = sift_ops._dominant_orientations(hist)
        desc = sift_ops._descriptor_dense(
            wmag, wang, lx, ly, srel, thetas[0],
            cfg.descriptor_width, cfg.descriptor_bins,
        )
        return thetas[0], th_ok[0], desc

    chunk = 256
    cap_pad = ((K + chunk - 1) // chunk) * chunk

    def pad_to(v):
        return jnp.pad(v, (0, cap_pad - K))

    xs_in = (pad_to(x), pad_to(y), pad_to(si), pad_to(sigma_kp))
    xs_in = tuple(v.reshape(cap_pad // chunk, chunk) for v in xs_in)
    theta, th_ok, desc = jax.lax.map(lambda t: jax.vmap(per_kp)(*t), xs_in)
    Dd = cfg.descriptor_width**2 * cfg.descriptor_bins
    theta = theta.reshape(cap_pad)[:K]
    th_ok = th_ok.reshape(cap_pad)[:K]
    desc = desc.reshape(cap_pad, Dd)[:K]

    mask = valid & th_ok
    return SiftFeatures(
        xy=jnp.stack([x, y], -1) * mask[:, None],
        scale=jnp.where(mask, sigma_kp, 1.0),
        orientation=theta * mask,
        response=jnp.where(mask, vals, 0.0),
        desc=desc * mask[:, None],
        mask=mask,
    )


def extract_doh_batch(imgs: Array, cfg: DetectorConfig, group: int = 8) -> SiftFeatures:
    N = imgs.shape[0]
    G = max(1, min(group, N))
    ngroups = (N + G - 1) // G
    Npad = ngroups * G
    imgs_p = jnp.pad(imgs, ((0, Npad - N), (0, 0), (0, 0)))
    feats = jax.lax.map(
        lambda ims: jax.vmap(lambda im: extract_doh(im, cfg))(ims),
        imgs_p.reshape(ngroups, G, *imgs.shape[1:]),
    )
    return jax.tree_util.tree_map(lambda v: v.reshape((Npad,) + v.shape[2:])[:N], feats)
