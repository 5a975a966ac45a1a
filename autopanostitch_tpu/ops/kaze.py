"""KAZE nonlinear (anisotropic-diffusion) scale space.

The reference's KAZE option (`getFeaturePoints.m:33-64` ->
`detectKAZEFeatures`) finds blobs in a NONLINEAR scale space built by
Perona-Malik diffusion (Alcantarilla et al., ECCV 2012): instead of the
Gaussian ladder, the image evolves by

    dL/dt = div( g(|grad L_sigma|) * grad L ),   g2(s) = 1 / (1 + s^2/k^2)

so smoothing is suppressed across strong edges and blob boundaries stay
sharp while interiors diffuse. Rounds 1-4 mapped KAZE onto the Gaussian
DoH detector (the documented substitution); this module closes that gap.

TPU-first design:
  - The evolution runs as FED (Fast Explicit Diffusion, Grewenig et al.)
    cycles: per scale-space level one conductivity image g is computed,
    then a `lax.scan` over a STATIC list of explicit steps with the FED
    step sizes tau_j = tau_max / (2 cos^2(pi (2j+1) / (4n+2))). Every
    step is a 5-point stencil of rolls — pure VPU element-wise work, no
    gathers, no data-dependent shapes.
  - Level times follow the same geometric sigma ladder as the DoH/SURF
    detector (t_i = sigma_i^2 / 2), so detection, non-max suppression and
    the SIFT-window descriptors are SHARED with `ops/doh.py`
    (`extract_from_levels`): the only difference between SURF and KAZE is
    how the level stack is produced — exactly the relationship the
    reference's two detector options have.
  - The contrast parameter k is the 70th percentile of smoothed gradient
    magnitudes (KAZE's default), computed on-device with `jnp.percentile`.

Neumann boundaries (edge replication) make the evolution conservative:
the image mean is preserved to float tolerance (tested).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from autopanostitch_tpu.config import DetectorConfig
from autopanostitch_tpu.ops import doh
from autopanostitch_tpu.ops.sift import SiftFeatures, gaussian_blur

Array = jax.Array

TAU_MAX = 0.25  # 2-D explicit-scheme stability limit


def contrast_k(img: Array, sigma: float = 1.0, perc: float = 70.0) -> Array:
    """KAZE contrast factor: percentile of |grad (G_sigma * L)| over the
    pixels with NON-ZERO gradient (Alcantarilla et al. build the histogram
    from nonzero gradients only — a plain percentile collapses toward 0 on
    images with flat backgrounds, making the diffusion needlessly stiff)."""
    L = gaussian_blur(img, sigma)
    gx = 0.5 * (jnp.roll(L, -1, 1) - jnp.roll(L, 1, 1))
    gy = 0.5 * (jnp.roll(L, -1, 0) - jnp.roll(L, 1, 0))
    mag = jnp.sqrt(gx * gx + gy * gy).reshape(-1)
    F = mag.shape[0]
    srt = jnp.sort(mag)  # ascending: zeros first
    n_nz = jnp.sum(mag > 1e-6)
    pos = (F - n_nz) + (perc / 100.0) * n_nz
    k = srt[jnp.clip(pos.astype(jnp.int32), 0, F - 1)]
    return jnp.maximum(k, 1e-3)


def _conductivity(L: Array, k: Array) -> Array:
    """PM g2 conductivity from the sigma=1-smoothed gradient of L."""
    Ls = gaussian_blur(L, 1.0)
    gx = 0.5 * (jnp.roll(Ls, -1, 1) - jnp.roll(Ls, 1, 1))
    gy = 0.5 * (jnp.roll(Ls, -1, 0) - jnp.roll(Ls, 1, 0))
    return 1.0 / (1.0 + (gx * gx + gy * gy) / (k * k))


def fed_tau(T: float, tau_max: float = TAU_MAX) -> list:
    """FED step sizes covering total diffusion time T in one cycle.

    n steps with tau_j = tau_max / (2 cos^2(pi (2j+1)/(4n+2))) sum to
    tau_max * n(n+1)/3; n is the smallest count reaching T, and the list
    is rescaled so the cycle hits T exactly."""
    if T <= 0:
        return []
    n = int(math.ceil(0.5 * (math.sqrt(1.0 + 12.0 * T / tau_max) - 1.0)))
    n = max(n, 1)
    taus = [
        tau_max / (2.0 * math.cos(math.pi * (2 * j + 1) / (4 * n + 2)) ** 2)
        for j in range(n)
    ]
    s = sum(taus)
    return [t * T / s for t in taus]


def fed_cycles(T: float, tau_max: float = TAU_MAX, n_max: int = 12) -> list:
    """T split into FED cycles of at most n_max inner steps each.

    FED's whole-cycle stability argument is exact only for LINEAR
    constant-coefficient diffusion; with a spatially-varying conductivity
    long cycles (whose largest tau_j grows ~ n^2 tau_max) can blow up.
    Bounding the cycle length and REFRESHING g between cycles (the AKAZE
    practice) keeps the evolution stable while still taking ~n/3 fewer
    steps than the plain explicit scheme."""
    if T <= 0:
        return []
    n_full = int(math.ceil(0.5 * (math.sqrt(1.0 + 12.0 * T / tau_max) - 1.0)))
    m = max(1, int(math.ceil(max(n_full, 1) / n_max)))
    return [fed_tau(T / m, tau_max) for _ in range(m)]


def _diffusion_step(L: Array, g: Array, tau: Array) -> Array:
    """One explicit step of div(g grad L) with half-point conductivities
    and Neumann (edge-replicate) boundaries."""

    def sh(a, d, ax):  # edge-replicating shift
        if ax == 0:
            return jnp.roll(a, d, 0).at[0 if d > 0 else -1, :].set(
                a[0 if d > 0 else -1, :]
            )
        return jnp.roll(a, d, 1).at[:, 0 if d > 0 else -1].set(
            a[:, 0 if d > 0 else -1]
        )

    flux = jnp.zeros_like(L)
    for d, ax in ((-1, 1), (1, 1), (-1, 0), (1, 0)):  # E, W, S, N
        Ln = sh(L, d, ax)
        gn = sh(g, d, ax)
        flux = flux + 0.5 * (g + gn) * (Ln - L)
    return L + tau * flux


def nonlinear_scale_space(
    img: Array, sigmas: tuple, k_sigma: float = 1.0
) -> Array:
    """(S, H, W) Perona-Malik evolved levels at times t_i = sigma_i^2/2.

    Level 0 is the Gaussian base L_0 = G_{sigma_0} * img; each following
    level advances the evolution by one FED cycle whose conductivity is
    fixed at the cycle start (the FED validity condition)."""
    k = contrast_k(img, k_sigma)
    L = gaussian_blur(img, float(sigmas[0]))
    levels = [L]
    t_prev = 0.5 * float(sigmas[0]) ** 2
    for s in sigmas[1:]:
        t = 0.5 * float(s) ** 2
        for cycle in fed_cycles(t - t_prev):
            g = _conductivity(L, k)  # refreshed per cycle (FED validity)
            L = jax.lax.scan(
                lambda carry, tau: (_diffusion_step(carry, g, tau), None),
                L,
                jnp.asarray(cycle, jnp.float32),
            )[0]
        levels.append(L)
        t_prev = t
    return jnp.stack(levels)


def hessian_response_scharr(L: Array, sigma: float) -> Array:
    """Scale-normalized det-Hessian with SIGMA-SIZED derivative operators.

    On the nonlinear scale space, unit-step differences at a PRESERVED
    edge stay O(1) at every level, so the sigma^4 normalization would grow
    monotonically with scale and scale-NMS would never fire. KAZE computes
    its derivatives with sigma-sized (Scharr) kernels — smoothed
    derivative operators at the level's own scale; the separable-Gaussian
    analog is detH of G_sigma * L with unit-step differences. Structures
    smaller than sigma average away inside the operator window, restoring
    the decay past the blob scale that scale selection needs, while the
    LEVELS stay edge-preserved for descriptor sampling."""
    return doh.hessian_response(gaussian_blur(L, sigma), sigma)


@partial(jax.jit, static_argnames=("cfg",))
def extract_kaze(img: Array, cfg: DetectorConfig = DetectorConfig()) -> SiftFeatures:
    """KAZE blobs (det-Hessian maxima of the nonlinear scale space) +
    SIFT-window descriptors on one grayscale image."""
    sigmas = tuple(doh.doh_sigmas(cfg))
    Ls = nonlinear_scale_space(img, sigmas)
    return doh.extract_from_levels(
        Ls, sigmas, cfg, resp_fn=hessian_response_scharr
    )


def extract_kaze_batch(imgs: Array, cfg: DetectorConfig, group: int = 8) -> SiftFeatures:
    N = imgs.shape[0]
    G = max(1, min(group, N))
    ngroups = (N + G - 1) // G
    Npad = ngroups * G
    imgs_p = jnp.pad(imgs, ((0, Npad - N), (0, 0), (0, 0)))
    feats = jax.lax.map(
        lambda ims: jax.vmap(lambda im: extract_kaze(im, cfg))(ims),
        imgs_p.reshape(ngroups, G, *imgs.shape[1:]),
    )
    return jax.tree_util.tree_map(lambda v: v.reshape((Npad,) + v.shape[2:])[:N], feats)
