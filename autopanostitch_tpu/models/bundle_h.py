"""Joint 8-DOF homography bundle adjustment (planar-scan path).

TPU-native redesign of `bundleAdjustment/bundleAdjustmentH.m`: refines
absolute homographies G_i (image i -> common canvas) with gauge G_seed = I,
minimizing the canvas-space residual
    r = Pi(G_i u_i) - Pi(G_j u_j)
(`computeUnidirResiduals`, `bundleAdjustmentH.m:512-590`) with Huber
weights, a projective-parameter regularizer on (g, h) = (H31, H32)
(`RegProj`, `:437-499`), and adaptive gain-ratio LM (`:147-279`).

Same scatter-added dense-normal-equation machinery as the R,K,f optimizer
(bundle.py), with 8 parameters per camera and autodiff Jacobians. One
jitted executable.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.config import BundleConfig
from autopanostitch_tpu.models.planar import chain_to_anchor

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


class HBAData(NamedTuple):
    pair_ij: Array  # (P, 2) int32
    u_i: Array  # (P, M, 2)
    u_j: Array  # (P, M, 2)
    w: Array  # (P, M)
    pair_valid: Array  # (P,)


def _params_to_H(p: Array) -> Array:
    """(8,) -> 3x3 with H33 = 1."""
    return jnp.concatenate([p, jnp.ones((1,), p.dtype)]).reshape(3, 3)


def _proj_pt(H: Array, u: Array) -> Array:
    ph = H @ jnp.concatenate([u, jnp.ones((1,), u.dtype)])
    z = ph[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    return ph[:2] / z_safe


def _match_residual_unidir(p_i: Array, p_j: Array, u_i: Array, u_j: Array) -> Array:
    """(2,) canvas-space residual of one match (unidirectional, the
    reference default `bundleAdjustmentH.m:512-590`, OneDirection=true)."""
    return _proj_pt(_params_to_H(p_i), u_i) - _proj_pt(_params_to_H(p_j), u_j)


def _match_residual_bidir(p_i: Array, p_j: Array, u_i: Array, u_j: Array) -> Array:
    """(4,) bidirectional chain residual (`computeBidirResiduals`,
    `bundleAdjustmentH.m:592-683`): u_i mapped through G_j^-1 G_i into
    image j vs u_j, and symmetrically back. Differentiable closed-form
    (adjugate) inverse so autodiff reaches both homographies."""
    Hi = _params_to_H(p_i)
    Hj = _params_to_H(p_j)

    def adj_inv(H):
        return jnp.stack([
            jnp.cross(H[:, 1], H[:, 2]),
            jnp.cross(H[:, 2], H[:, 0]),
            jnp.cross(H[:, 0], H[:, 1]),
        ])  # rows of adjugate: inv(H) up to det scale (projective ok)

    fwd = u_j - _proj_pt(adj_inv(Hj) @ Hi, u_i)
    bwd = u_i - _proj_pt(adj_inv(Hi) @ Hj, u_j)
    return jnp.concatenate([fwd, bwd])


def _reg_residual(p: Array, sq_proj: Array, sq_det: Array) -> Array:
    """(3,) per-camera regularizer residuals (`bundleAdjustmentH.m:437-499`):
    sqrt(RegProj) * (H31, H32) and sqrt(RegDet) * log|det(2x2)|. These are
    TRUE residuals in the objective (cost + gradient + GN curvature), not
    diagonal damping."""
    det2 = p[0] * p[4] - p[1] * p[3]
    return jnp.stack([
        sq_proj * p[6],
        sq_proj * p[7],
        sq_det * jnp.log(jnp.maximum(jnp.abs(det2), 1e-8)),
    ])


@partial(jax.jit, static_argnames=("cfg", "n_cameras", "iters", "bidir"))
def bundle_adjust_h(
    params0: Array,  # (N, 8)
    data: HBAData,
    seed_idx: Array,
    cfg: BundleConfig = BundleConfig(),
    n_cameras: int = 0,
    iters: int = 40,
    bidir: bool = False,
):
    """Joint LM over all homographies. Returns ((N, 8) params, final cost)."""
    N = n_cameras
    P, M = data.w.shape
    sigma = cfg.sigma_huber
    match_residual = _match_residual_bidir if bidir else _match_residual_unidir

    jac_fn = jax.vmap(
        # 2 (or 4) residual outputs vs 16 params: reverse mode is cheaper
        jax.jacrev(lambda pp, ui, uj: match_residual(pp[:8], pp[8:], ui, uj)),
        in_axes=(None, 0, 0),
    )
    res_fn = jax.vmap(match_residual, in_axes=(None, None, 0, 0))

    sq_proj = jnp.sqrt(jnp.float32(cfg.reg_proj))
    sq_det = jnp.sqrt(jnp.float32(cfg.reg_det))
    reg_jac = jax.vmap(jax.jacrev(_reg_residual), in_axes=(0, None, None))
    reg_res = jax.vmap(_reg_residual, in_axes=(0, None, None))

    def pair_system(params, p):
        i = data.pair_ij[p, 0]
        j = data.pair_ij[p, 1]
        pp = jnp.concatenate([params[i], params[j]])
        r = res_fn(params[i], params[j], data.u_i[p], data.u_j[p])  # (M, 2|4)
        J = jac_fn(pp, data.u_i[p], data.u_j[p])  # (M, 2|4, 16)
        rn2 = jnp.sum(r * r, -1)
        w_h = jnp.minimum(1.0, sigma / jnp.sqrt(rn2 + 1e-12))
        wm = data.w[p] * data.pair_valid[p] * w_h
        Jw = J * wm[:, None, None]
        JtJ = jnp.einsum("mab,mac->bc", Jw, J, precision=_HI)
        Jtg = jnp.einsum("mab,ma->b", Jw, r, precision=_HI)
        cost = jnp.sum(wm[:, None] * r * r)
        return JtJ, Jtg, cost

    def build(params):
        JtJ_p, Jtg_p, cost_p = jax.vmap(lambda p: pair_system(params, p))(jnp.arange(P))
        H = jnp.zeros((8 * N, 8 * N), params.dtype)
        g = jnp.zeros((8 * N,), params.dtype)
        ii = data.pair_ij[:, 0]
        jj = data.pair_ij[:, 1]

        def scatter(H, rows, cols, vals):
            return H.at[
                rows[:, None, None] * 8 + jnp.arange(8)[None, :, None],
                cols[:, None, None] * 8 + jnp.arange(8)[None, None, :],
            ].add(vals)

        H = scatter(H, ii, ii, JtJ_p[:, :8, :8])
        H = scatter(H, ii, jj, JtJ_p[:, :8, 8:])
        H = scatter(H, jj, ii, JtJ_p[:, 8:, :8])
        H = scatter(H, jj, jj, JtJ_p[:, 8:, 8:])
        g = g.at[(ii[:, None] * 8 + jnp.arange(8)[None, :]).reshape(-1)].add(
            Jtg_p[:, :8].reshape(-1)
        )
        g = g.at[(jj[:, None] * 8 + jnp.arange(8)[None, :]).reshape(-1)].add(
            Jtg_p[:, 8:].reshape(-1)
        )
        # per-camera regularizer residuals (RegProj / RegDet) enter the
        # objective: Gauss-Newton blocks on the diagonal + gradient + cost
        Jr = reg_jac(params, sq_proj, sq_det)  # (N, 3, 8)
        rr = reg_res(params, sq_proj, sq_det)  # (N, 3)
        rows = jnp.arange(N)
        H = H.at[
            rows[:, None, None] * 8 + jnp.arange(8)[None, :, None],
            rows[:, None, None] * 8 + jnp.arange(8)[None, None, :],
        ].add(jnp.einsum("nab,nac->nbc", Jr, Jr, precision=_HI))
        g = g.at[(rows[:, None] * 8 + jnp.arange(8)[None, :]).reshape(-1)].add(
            jnp.einsum("nab,na->nb", Jr, rr, precision=_HI).reshape(-1)
        )
        return H, g, jnp.sum(cost_p) + jnp.sum(rr * rr)

    col_mask = jnp.ones((8 * N,))
    seed_cols = seed_idx * 8 + jnp.arange(8)
    col_mask = col_mask.at[seed_cols].set(0.0)

    def lm_iter(carry, _):
        params, lam, _ = carry
        H, g, cost = build(params)
        H = H * col_mask[:, None] * col_mask[None, :]
        g = g * col_mask
        Hd = H + jnp.diag(lam * (jnp.diag(H) + 1e-6))
        Hd = Hd + jnp.diag(jnp.where(col_mask > 0, 0.0, 1.0))
        L = jax.scipy.linalg.cho_factor(Hd)
        delta = -jax.scipy.linalg.cho_solve(L, g)
        # NaN guard (solver-robustness fallback, cf. bundle.lm_phase_group)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        cand = params + delta.reshape(N, 8)
        _, _, cost_new = build(cand)
        d = delta
        # predicted reduction must use the SAME damping as the solved
        # system (lam * (diag(H)+1e-6), not identity — the 8-DOF params
        # mix pixel-scale translations with ~1e-4 projective terms, so
        # diag(H) spans many orders of magnitude)
        pred = 0.5 * (lam * jnp.sum(d * (jnp.diag(H) + 1e-6) * d) - jnp.sum(d * g))
        rho = (cost - cost_new) / jnp.maximum(pred, 1e-12)
        accept = (cost_new < cost) & jnp.isfinite(cost_new)
        params = jnp.where(accept, cand, params)
        lam = jnp.where(
            accept, lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3), lam * 4.0
        )
        lam = jnp.clip(lam, 1e-9, 1e6)
        return (params, lam, cost_new), None

    (params, _, cost), _ = jax.lax.scan(
        lm_iter, (params0, jnp.float32(cfg.lambda0), jnp.float32(0.0)), None, length=iters
    )
    return params, cost


def run_bundle_adjustment_h(
    loc_pairs: np.ndarray,
    Hs: np.ndarray,
    pair_coords,  # (u_i (P,M,2), u_j (P,M,2), w (P,M)) inlier coords
    n: int,
    cfg: BundleConfig = BundleConfig(),
    anchor: int | None = None,
):
    """Chain-init + joint homography refinement of one planar component.

    Hs[p] maps loc_pairs[p,0] -> loc_pairs[p,1]. Returns dict with refined
    absolute H (n, 3, 3) mapping each image into the anchor frame.
    """
    H_abs, reachable, anchor = chain_to_anchor(loc_pairs, Hs, n, anchor)
    u_i, u_j, w = pair_coords
    # mask out pairs with unreachable endpoints
    pv = reachable[loc_pairs[:, 0]] & reachable[loc_pairs[:, 1]]
    data = HBAData(
        pair_ij=jnp.asarray(loc_pairs.astype(np.int32)),
        u_i=jnp.asarray(u_i.astype(np.float32)),
        u_j=jnp.asarray(u_j.astype(np.float32)),
        w=jnp.asarray(w.astype(np.float32)),
        pair_valid=jnp.asarray(pv),
    )
    params0 = (H_abs.reshape(n, 9)[:, :8] / H_abs.reshape(n, 9)[:, 8:9]).astype(np.float32)
    params, cost = bundle_adjust_h(
        jnp.asarray(params0),
        data,
        jnp.int32(anchor),
        cfg=cfg,
        n_cameras=n,
        iters=cfg.max_iter_lm,
        bidir=not cfg.h_one_direction,
    )
    params = np.asarray(params)
    H_ref = np.concatenate([params, np.ones((n, 1), np.float32)], -1).reshape(n, 3, 3)
    return {
        "H_abs": H_ref,
        "H_init": H_abs,
        "reachable": reachable,
        "anchor": anchor,
        "final_cost": float(cost),
    }
