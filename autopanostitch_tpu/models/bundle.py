"""Brown-Lowe bundle adjustment over rotation + focal (the core optimizer).

TPU-native redesign of `bundleAdjustment/bundleAdjustmentRKf.m` (1950 lines
of MATLAB LM machinery) and `initializeCameraMatrices.m`:

Host control plane (tiny, numpy):
- focal estimation from homographies: 'wConstraint' (omega constraints,
  MAD filtering, `initializeCameraMatrices.m:176-270`) and
  'shumSzeliskiOneHPaper' (per-H closed form incl. inverted Hs, `:272-307,
  630-696`), fallback 0.8*max(H,W) (`:264-269`)
- Kruskal maximum spanning tree on match counts (`:405-455`)
- BFS rotation propagation R_j = projectToSO3(Rrel^T R_i) with
  Rrel = SO3(K0^-1 Hc K0) (`:336-380,595-628`)
- rotation-consistency classifier -> noRotation (`:524-573`)
- incremental camera ordering (best-connected-first,
  `bundleAdjustmentRKf.m:146-177`)

Device compute plane (one jitted executable):
- residual r = u_obs - Pi(K_o R_o R_s^T K_s^-1 u_s), bidirectional
  (`computeSingleResidual`, `bundleAdjustmentRKf.m:1641-1782`), with
  Jacobians from JAX autodiff instead of the hand-derived Eq. 20-23
- per-residual Huber IRLS weights sigma=2px (`:1806-1829`)
- dense normal equations: per-pair 8x8 blocks scatter-added into the
  (4N, 4N) system (the reference builds sparse + symamd/chol `:609-791,
  901-982`; at panorama scale N <= few hundred a dense MXU solve wins)
- Brown-Lowe priors: theta prior pi/16, focal prior fbar/20, focal
  smoothness over MST edges (`buildBrownLowePrior`, `:1503-1637`)
- LM with gain-ratio lambda schedule, per-camera step caps (5 deg,
  staged focal fractions) and SO(3) re-projection (`:512-600,984-1045`)
- the incremental schedule runs as a lax.scan over a precomputed
  initialized-mask schedule — one compiled executable for the whole BA.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.config import BundleConfig
from autopanostitch_tpu.ops import geometry as geo

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


class Cameras(NamedTuple):
    """Camera set (reference `cameras(i)` struct, `bundleAdjustmentRKf.m:34-41`)."""

    R: Array  # (N, 3, 3) world -> camera
    f: Array  # (N,)
    cx: Array  # (N,)
    cy: Array  # (N,)

    def K(self) -> Array:
        return geo.build_K(self.f, self.cx, self.cy)


# ===========================================================================
# Host control plane
# ===========================================================================

def center_normalize_H(H: np.ndarray, size_i, size_j) -> np.ndarray:
    """Shift principal points to zero and normalize det to 1
    (`initializeCameraMatrices.m centerNormalizeH`). H maps i -> j."""
    hi, wi = size_i
    hj, wj = size_j
    Ci = np.array([[1, 0, (wi - 1) / 2.0], [0, 1, (hi - 1) / 2.0], [0, 0, 1.0]])
    Cj = np.array([[1, 0, (wj - 1) / 2.0], [0, 1, (hj - 1) / 2.0], [0, 0, 1.0]])
    Hc = np.linalg.inv(Cj) @ H @ Ci
    d = np.linalg.det(Hc)
    if not np.isfinite(d) or d == 0:
        return None
    s = np.sign(d) * np.abs(d) ** (1.0 / 3.0)
    return Hc / s


def _focal_w_constraint(Hcs) -> float | None:
    """'wConstraint' focal from centered Hs (`initializeCameraMatrices.m:176-270`)."""
    ws = []
    for Hn in Hcs:
        h1, h2 = Hn[:, 0], Hn[:, 1]
        denA = h1[0] * h2[0] + h1[1] * h2[1]
        if abs(denA) > 1e-12:
            wA = -(h1[2] * h2[2]) / denA
            if np.isfinite(wA) and wA > 0:
                ws.append(wA)
        denB = (h1[0] ** 2 + h1[1] ** 2) - (h2[0] ** 2 + h2[1] ** 2)
        if abs(denB) > 1e-12:
            wB = (h2[2] ** 2 - h1[2] ** 2) / denB
            if np.isfinite(wB) and wB > 0:
                ws.append(wB)
    ws = np.array([w for w in ws if np.isfinite(w) and w > 0])
    if len(ws) == 0:
        return None
    medw = np.median(ws)
    madw = np.median(np.abs(ws - medw))
    keep = (
        np.abs(ws - medw) <= 3 * madw
        if madw > 0
        else np.abs(ws - medw) <= 1e-6 * max(1.0, medw)
    )
    ws = ws[keep]
    if len(ws) == 0:
        return None
    return 1.0 / np.sqrt(ws)


def _focal_shum_szeliski_one(H: np.ndarray) -> float:
    """Closed-form focal from one centered H (`focalsHomographyShumsz`,
    `initializeCameraMatrices.m:630-696`). The reference stores pair
    homographies in column form (x_i ~ H x_j) like we do, so the index
    pattern applies directly: for H = K R K^-1, orthogonality of R's
    columns/rows gives v1 = f^2 in each constraint."""
    d1 = H[2, 0] * H[2, 1]
    d2 = (H[2, 1] - H[2, 0]) * (H[2, 1] + H[2, 0])
    v1 = -(H[0, 0] * H[0, 1] + H[1, 0] * H[1, 1]) / d1 if d1 != 0 else -np.inf
    v2 = (H[0, 0] ** 2 + H[1, 0] ** 2 - H[0, 1] ** 2 - H[1, 1] ** 2) / d2 if d2 != 0 else -np.inf
    if v1 < v2:
        v1, v2 = v2, v1
    if v1 > 0 and v2 > 0:
        f1 = np.sqrt(v1 if abs(d1) > abs(d2) else v2)
    elif v1 > 0:
        f1 = np.sqrt(v1)
    else:
        return np.nan
    d1 = H[0, 0] * H[1, 0] + H[0, 1] * H[1, 1]
    d2 = H[0, 0] ** 2 + H[0, 1] ** 2 - H[1, 0] ** 2 - H[1, 1] ** 2
    v1 = -H[0, 2] * H[1, 2] / d1 if d1 != 0 else -np.inf
    v2 = (H[1, 2] ** 2 - H[0, 2] ** 2) / d2 if d2 != 0 else -np.inf
    if v1 < v2:
        v1, v2 = v2, v1
    if v1 > 0 and v2 > 0:
        f0 = np.sqrt(v1 if abs(d1) > abs(d2) else v2)
    elif v1 > 0:
        f0 = np.sqrt(v1)
    else:
        return np.nan
    return float(np.sqrt(f1 * f0))


def estimate_focal(pairs, Hs, sizes, method: str = "shumSzeliskiOneHPaper") -> float:
    """Global focal estimate from verified pair homographies.

    Hs[p] maps image pairs[p,0] -> pairs[p,1] (our convention).
    """
    Hcs = []
    for p, (i, j) in enumerate(pairs):
        Hc = center_normalize_H(Hs[p], sizes[i], sizes[j])
        if Hc is not None:
            Hcs.append(Hc)
    base = float(np.median(np.max(sizes, axis=1)))
    fallback = 0.8 * base
    if not Hcs:
        return fallback
    if method == "wConstraint":
        f_cands = _focal_w_constraint(Hcs)
        if f_cands is None:
            return fallback
        f_cands = f_cands[(f_cands >= 0.3 * base) & (f_cands <= 6.0 * base)]
        return float(np.median(f_cands)) if len(f_cands) else fallback
    # shumSzeliskiOneHPaper: both directions, per-H closed form, median
    both = Hcs + [np.linalg.inv(h) for h in Hcs]
    fv = np.array([_focal_shum_szeliski_one(h) for h in both])
    fv = fv[np.isfinite(fv) & (fv > 0) & (fv < 5e4)]
    return float(np.median(fv)) if len(fv) else fallback


def max_spanning_tree(counts: np.ndarray):
    """Kruskal maximum spanning forest on symmetric match counts
    (`initializeCameraMatrices.m:405-455`). Returns list of (i, j) edges."""
    n = counts.shape[0]
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    iu, ju = np.triu_indices(n, 1)
    order = np.argsort(-counts[iu, ju])
    edges = []
    for k in order:
        if counts[iu[k], ju[k]] <= 0:
            break
        i, j = int(iu[k]), int(ju[k])
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
            edges.append((i, j))
    return edges


def relative_rotation(H: np.ndarray, size_i, size_j, f: float) -> np.ndarray:
    """Rrel ~ R_j R_i^T from H mapping i -> j (`relativeRotHij`,
    `initializeCameraMatrices.m:595-628`)."""
    Hc = center_normalize_H(H, size_i, size_j)
    if Hc is None:
        return np.eye(3)
    K0 = np.diag([f, f, 1.0])
    M = np.linalg.inv(K0) @ Hc @ K0
    U, _, Vt = np.linalg.svd(M)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = U @ np.diag([1, 1, -1.0]) @ Vt
    return R


def propagate_rotations(n, tree_edges, pair_H: dict, sizes, f: float, seed: int):
    """BFS rotation propagation over the MST (`initializeCameraMatrices.m:336-380`).

    pair_H[(i, j)] maps i -> j. Returns (N, 3, 3) world->cam rotations."""
    R = np.tile(np.eye(3), (n, 1, 1))
    visited = np.zeros(n, bool)
    visited[seed] = True
    adj = {k: [] for k in range(n)}
    for i, j in tree_edges:
        adj[i].append(j)
        adj[j].append(i)
    queue = [seed]
    while queue:
        u = queue.pop(0)
        for v in adj[u]:
            if visited[v]:
                continue
            if (u, v) in pair_H:
                # Rrel = R_v R_u^T ; R_v = Rrel @ R_u
                Rrel = relative_rotation(pair_H[(u, v)], sizes[u], sizes[v], f)
                R[v] = Rrel @ R[u]
            elif (v, u) in pair_H:
                Rrel = relative_rotation(pair_H[(v, u)], sizes[v], sizes[u], f)
                R[v] = Rrel.T @ R[u]
            visited[v] = True
            queue.append(v)
    return R


def rotation_consistency(pairs, Hs, sizes, R: np.ndarray, f: float):
    """Angular error of propagated rotations vs per-pair relative rotations
    (`rotationConsistency`, `initializeCameraMatrices.m:524-573`).

    Returns (noRotation, mean_deg, med_deg, max_deg)."""
    errs = []
    for p, (i, j) in enumerate(pairs):
        Rrel = relative_rotation(Hs[p], sizes[i], sizes[j], f)  # ~ R_j R_i^T
        D = R[j] @ R[i].T
        c = np.clip((np.trace(D.T @ Rrel) - 1) / 2.0, -1.0, 1.0)
        errs.append(np.degrees(np.arccos(c)))
    if not errs:
        return False, 0.0, 0.0, 0.0
    errs = np.array(errs)
    med, mx = float(np.median(errs)), float(errs.max())
    no_rotation = med > 0.6 and mx > 100.0
    return no_rotation, float(errs.mean()), med, mx


def initialize_cameras_summary(pairs, Hs, counts, sizes,
                               method: str = "shumSzeliskiOneHPaper"):
    """Standalone camera initialization (the reference's
    `initializeCameraMatrices.m` as one call): focal estimate, max spanning
    tree, BFS rotation propagation, rotation-consistency classification.

    Returns dict(f, R (N,3,3), seed, tree, no_rotation, consistency_deg).
    """
    n = len(sizes)
    f0 = estimate_focal(pairs, Hs, sizes, method)
    tree = max_spanning_tree(counts)
    deg = np.bincount(np.asarray(pairs).reshape(-1), minlength=n) if len(pairs) else np.zeros(n, int)
    seed = int(np.argmax(deg))
    pair_H = {(int(i), int(j)): Hs[p] for p, (i, j) in enumerate(pairs)}
    R0 = propagate_rotations(n, tree, pair_H, sizes, f0, seed)
    no_rotation, mean_ae, med_ae, max_ae = rotation_consistency(pairs, Hs, sizes, R0, f0)
    return {
        "f": f0,
        "R": R0,
        "seed": seed,
        "tree": tree,
        "no_rotation": no_rotation,
        "consistency_deg": (mean_ae, med_ae, max_ae),
    }


def incremental_order(counts: np.ndarray, members: np.ndarray, seed: int):
    """Best-connected-first camera addition order
    (`bundleAdjustmentRKf.m:146-177`). Returns ordered list starting at seed."""
    n = counts.shape[0]
    added = {seed}
    order = [seed]
    remaining = set(int(m) for m in members) - added
    while remaining:
        best, best_score = None, -1
        for c in remaining:
            score = sum(counts[c, a] for a in added)
            if score > best_score:
                best, best_score = c, score
        order.append(best)
        added.add(best)
        remaining.remove(best)
    return order


# ===========================================================================
# Device compute plane
# ===========================================================================

class BAData(NamedTuple):
    """Fixed-shape pair observations for the optimizer."""

    pair_ij: Array  # (P, 2) int32 camera indices
    u_i: Array  # (P, M, 2) keypoint coords in image i
    u_j: Array  # (P, M, 2) keypoint coords in image j
    w: Array  # (P, M) match validity / weights
    pair_valid: Array  # (P,) bool


def _project(params_src, params_dst, cx_s, cy_s, cx_d, cy_d, u_src):
    """Map a point of the source camera into the destination camera.

    params = [theta(3), f]; rotation = exp(theta) applied to the INITIAL R
    outside — here theta is the full rotation log (we re-log after each
    accepted step, so exp(theta) IS the rotation)."""
    R_s = geo.so3_exp(params_src[:3])
    R_d = geo.so3_exp(params_dst[:3])
    f_s = params_src[3]
    f_d = params_dst[3]
    x = (u_src[0] - cx_s) / f_s
    y = (u_src[1] - cy_s) / f_s
    ray = jnp.stack([x, y, 1.0])
    ray_w = R_s.T @ ray
    p = R_d @ ray_w
    z = p[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
    u = f_d * p[0] / z_safe + cx_d
    v = f_d * p[1] / z_safe + cy_d
    return jnp.stack([u, v]), z


def _pair_residual(p_i, p_j, cx_i, cy_i, cx_j, cy_j, u_i, u_j):
    """Bidirectional residual of one match (Brown-Lowe Eq. 14/15, both
    directions as in `jacobianPair`, `bundleAdjustmentRKf.m:793-899`).
    Returns (4,) [r_ij (2), r_ji (2)] and the two depths."""
    pred_j, z_j = _project(p_i, p_j, cx_i, cy_i, cx_j, cy_j, u_i)
    pred_i, z_i = _project(p_j, p_i, cx_j, cy_j, cx_i, cy_i, u_j)
    r = jnp.concatenate([u_j - pred_j, u_i - pred_i])
    return r, jnp.stack([z_j, z_i])


def _huber_w(r2: Array, sigma: float) -> Array:
    """IRLS weight of a squared residual norm under Huber (sigma=2px,
    `bundleAdjustmentRKf.m:1806-1829`)."""
    rn = jnp.sqrt(r2 + 1e-12)
    return jnp.minimum(1.0, sigma / rn)


@partial(jax.jit, static_argnames=("cfg", "n_cameras", "lm_iters", "final_iters"))
def bundle_adjust_rkf(
    params0: Array,  # (N, 4) [theta, f] initial
    cx: Array,
    cy: Array,
    data: BAData,
    schedule: Array,  # (S, N) bool initialized-mask schedule
    seed_idx: Array,  # () int32 — gauge: seed rotation pinned
    cfg: BundleConfig = BundleConfig(),
    n_cameras: int = 0,
    lm_iters: int = 10,
    final_iters: int = 20,
):
    """Incremental Brown-Lowe BA as one compiled program.

    For each schedule step s (a growing set of initialized cameras), run
    `lm_iters` LM iterations on the active subgraph; finish with
    `final_iters` on the full set. Inactive cameras are frozen by masking
    their Jacobian columns and pinning their normal-equation diagonal.
    """
    N = n_cameras
    P, M = data.w.shape
    sigma = cfg.sigma_huber
    f_lo, f_hi = cfg.focal_clamp

    jac_fn = jax.vmap(  # over matches
        jax.jacrev(  # 4 residual outputs vs 8 params: reverse mode is 2x
            # cheaper than jacfwd's 8 tangent passes
            lambda pp, cxi, cyi, cxj, cyj, ui, uj: _pair_residual(
                pp[:4], pp[4:], cxi, cyi, cxj, cyj, ui, uj
            )[0],
        ),
        in_axes=(None, None, None, None, None, 0, 0),
    )
    res_fn = jax.vmap(_pair_residual, in_axes=(None, None, None, None, None, None, 0, 0))

    def pair_system(params, p):
        """8x8 JtJ block, (8,) Jtg, and robust cost for pair p."""
        i = data.pair_ij[p, 0]
        j = data.pair_ij[p, 1]
        pp = jnp.concatenate([params[i], params[j]])
        r, z = res_fn(params[i], params[j], cx[i], cy[i], cx[j], cy[j], data.u_i[p], data.u_j[p])
        J = jac_fn(pp, cx[i], cy[i], cx[j], cy[j], data.u_i[p], data.u_j[p])  # (M, 4, 8)
        # robust weights per direction (2 residual blocks of 2)
        w_ij = _huber_w(jnp.sum(r[:, :2] ** 2, -1), sigma)
        w_ji = _huber_w(jnp.sum(r[:, 2:] ** 2, -1), sigma)
        front = (z[:, 0] > 1e-4) & (z[:, 1] > 1e-4)
        wm = data.w[p] * front * data.pair_valid[p]
        w4 = jnp.stack([w_ij, w_ij, w_ji, w_ji], -1) * wm[:, None]  # (M, 4)
        Jw = J * w4[:, :, None]
        JtJ = jnp.einsum("mab,mac->bc", Jw, J, precision=_HI)
        Jtg = jnp.einsum("mab,ma->b", Jw, r, precision=_HI)
        cost = jnp.sum(w4 * r * r)
        n_res = jnp.sum(wm) * 4.0
        return JtJ, Jtg, cost, n_res

    def pair_cost(params, p):
        """Robust cost of one pair — residuals only, no Jacobians (used for
        the LM accept test; linearizing the candidate would double BA time)."""
        i = data.pair_ij[p, 0]
        j = data.pair_ij[p, 1]
        r, z = res_fn(params[i], params[j], cx[i], cy[i], cx[j], cy[j], data.u_i[p], data.u_j[p])
        w_ij = _huber_w(jnp.sum(r[:, :2] ** 2, -1), sigma)
        w_ji = _huber_w(jnp.sum(r[:, 2:] ** 2, -1), sigma)
        front = (z[:, 0] > 1e-4) & (z[:, 1] > 1e-4)
        wm = data.w[p] * front * data.pair_valid[p]
        w4 = jnp.stack([w_ij, w_ij, w_ji, w_ji], -1) * wm[:, None]
        return jnp.sum(w4 * r * r)

    def build_cost(params, active):
        cost_p = jax.vmap(lambda p: pair_cost(params, p))(jnp.arange(P))
        act = active[data.pair_ij[:, 0]] & active[data.pair_ij[:, 1]]
        return jnp.sum(cost_p * act.astype(params.dtype))

    def build_normal_eqns(params, active):
        JtJ_p, Jtg_p, cost_p, n_p = jax.vmap(lambda p: pair_system(params, p))(
            jnp.arange(P)
        )
        # mask pairs whose endpoints are not both active
        act = active[data.pair_ij[:, 0]] & active[data.pair_ij[:, 1]]
        actf = act.astype(params.dtype)
        JtJ_p = JtJ_p * actf[:, None, None]
        Jtg_p = Jtg_p * actf[:, None]
        cost = jnp.sum(cost_p * actf)
        n_res = jnp.sum(n_p * actf)

        H = jnp.zeros((4 * N, 4 * N), params.dtype)
        g = jnp.zeros((4 * N,), params.dtype)
        idx_i = data.pair_ij[:, 0]
        idx_j = data.pair_ij[:, 1]

        def block(JtJ, a, b):
            return JtJ[a * 4 : a * 4 + 4, b * 4 : b * 4 + 4]

        # scatter-add the four 4x4 blocks of each pair
        def scatter(H, rows, cols, vals):
            return H.at[rows[:, None, None] * 4 + jnp.arange(4)[None, :, None],
                        cols[:, None, None] * 4 + jnp.arange(4)[None, None, :]].add(vals)

        H = scatter(H, idx_i, idx_i, JtJ_p[:, :4, :4])
        H = scatter(H, idx_i, idx_j, JtJ_p[:, :4, 4:])
        H = scatter(H, idx_j, idx_i, JtJ_p[:, 4:, :4])
        H = scatter(H, idx_j, idx_j, JtJ_p[:, 4:, 4:])
        g = g.at[(idx_i[:, None] * 4 + jnp.arange(4)[None, :]).reshape(-1)].add(
            Jtg_p[:, :4].reshape(-1)
        )
        g = g.at[(idx_j[:, None] * 4 + jnp.arange(4)[None, :]).reshape(-1)].add(
            Jtg_p[:, 4:].reshape(-1)
        )
        return H, g, cost, n_res

    theta_prior_w = 1.0 / (cfg.theta_prior**2)

    def lm_phase(carry, active, iters, focal_frac):
        params, lam = carry
        fbar = jnp.sum(params[:, 3] * active) / jnp.maximum(jnp.sum(active), 1.0)
        f_prior_w = 1.0 / ((fbar / cfg.focal_prior_frac) ** 2 + 1e-12)
        prior_diag = jnp.tile(jnp.array([theta_prior_w] * 3 + [0.0]), N)
        prior_diag = prior_diag + jnp.tile(jnp.array([0.0] * 3 + [1.0]), N) * f_prior_w

        activef = active.astype(params.dtype)
        col_mask = jnp.repeat(activef, 4)
        # gauge: pin the seed camera's rotation (3 params)
        seed_cols = seed_idx * 4 + jnp.arange(3)
        col_mask = col_mask.at[seed_cols].set(0.0)

        def lm_iter(carry, _):
            params, lam, _ = carry
            H, g, cost, n_res = build_normal_eqns(params, active)
            H = H * col_mask[:, None] * col_mask[None, :]
            g = g * col_mask
            Hd = H + jnp.diag(prior_diag * col_mask + lam * (jnp.diag(H) + 1e-6))
            # pin frozen params
            Hd = Hd + jnp.diag(jnp.where(col_mask > 0, 0.0, 1.0))
            L, low = jax.scipy.linalg.cho_factor(Hd)
            # Gauss-Newton step: (JtWJ + lam D) delta = -JtWr
            delta = -jax.scipy.linalg.cho_solve((L, low), g)
            delta = delta.reshape(N, 4)
            # per-camera caps (capPerCameraStep, :984-1045)
            max_rot = jnp.radians(cfg.max_rotation_step_deg)
            rot_norm = jnp.linalg.norm(delta[:, :3], axis=-1)
            rot_scale = jnp.minimum(1.0, max_rot / jnp.maximum(rot_norm, 1e-12))
            f_cap = focal_frac * jnp.maximum(params[:, 3], 1.0)
            f_scale = jnp.minimum(1.0, f_cap / jnp.maximum(jnp.abs(delta[:, 3]), 1e-12))
            delta = jnp.concatenate(
                [delta[:, :3] * rot_scale[:, None], (delta[:, 3] * f_scale)[:, None]], -1
            )

            # candidate update: left-multiplicative SO(3), clamp f
            R_new = geo.so3_exp(delta[:, :3]) @ geo.so3_exp(params[:, :3])
            theta_new = geo.so3_log(R_new)
            f_new = jnp.clip(params[:, 3] + delta[:, 3], f_lo, f_hi)
            cand = jnp.concatenate([theta_new, f_new[:, None]], -1)
            cand = jnp.where(active[:, None], cand, params)

            cost_new = build_cost(cand, active)
            # gain-ratio lambda schedule (:557-597); with delta = -H^-1 g the
            # predicted reduction 0.5*(delta^T lam delta - delta^T g) is >= 0
            d = delta.reshape(-1)
            pred = 0.5 * (lam * jnp.sum(d * d) - jnp.sum(d * g))
            rho = (cost - cost_new) / jnp.maximum(pred, 1e-12)
            accept = cost_new < cost
            params = jnp.where(accept, cand, params)
            lam = jnp.where(
                accept,
                lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
                lam * 4.0,
            )
            lam = jnp.clip(lam, 1e-9, 1e6)
            return (params, lam, cost_new), None

        (params, lam, cost), _ = jax.lax.scan(
            lm_iter, (params, lam, jnp.float32(0.0)), None, length=iters
        )
        return (params, lam), cost

    # incremental schedule
    def sched_step(carry, active):
        carry, _ = lm_phase(carry, active, lm_iters, cfg.focal_step_fracs[1])
        return carry, None

    carry = (params0, jnp.float32(cfg.lambda0))
    carry, _ = jax.lax.scan(sched_step, carry, schedule)

    # final passes with staged focal caps (:512-600)
    full = schedule[-1]
    for frac in cfg.focal_step_fracs:
        carry, cost = lm_phase(carry, full, final_iters // len(cfg.focal_step_fracs) + 1, frac)
    (params, lam) = carry
    return params, cost


# ===========================================================================
# Orchestration
# ===========================================================================

def run_bundle_adjustment(
    members: np.ndarray,
    pairs: np.ndarray,
    pair_idx: np.ndarray,
    pair_mask: np.ndarray,
    inliers: np.ndarray,
    Hs: np.ndarray,
    xy: np.ndarray,
    counts: np.ndarray,
    sizes: np.ndarray,
    cfg: BundleConfig = BundleConfig(),
    force_planar: bool = False,
):
    """Bundle-adjust one connected component.

    Args mirror the match-graph outputs (global indices); `members` selects
    the component. Returns dict with Cameras (member-local), noRotation flag,
    focal, seed, and the member-local pair list.
    """
    members = np.asarray(members)
    n = len(members)
    remap = {int(g): k for k, g in enumerate(members)}
    sel = [p for p in range(len(pairs)) if int(pairs[p, 0]) in remap and int(pairs[p, 1]) in remap]
    sel = np.array(sel, int)
    loc_pairs = np.array([[remap[int(i)], remap[int(j)]] for i, j in pairs[sel]], int)
    loc_sizes = sizes[members]
    loc_counts = counts[np.ix_(members, members)]

    # ---- focal + rotations + classifier (host) ----
    f0 = estimate_focal(loc_pairs, Hs[sel], loc_sizes, cfg.focal_estimate_method)
    tree = max_spanning_tree(loc_counts)
    deg = np.bincount(loc_pairs.reshape(-1), minlength=n)
    seed = int(np.argmax(deg))
    pair_H = {(int(i), int(j)): Hs[sel[p]] for p, (i, j) in enumerate(loc_pairs)}
    R0 = propagate_rotations(n, tree, pair_H, loc_sizes, f0, seed)
    no_rotation, mean_ae, med_ae, max_ae = rotation_consistency(
        loc_pairs, Hs[sel], loc_sizes, R0, f0
    )
    no_rotation = no_rotation or force_planar  # inputs.m:91 forcePlanarScan

    cx = (loc_sizes[:, 1].astype(np.float32) - 1) / 2.0
    cy = (loc_sizes[:, 0].astype(np.float32) - 1) / 2.0

    result = {
        "members": members,
        "pairs": loc_pairs,
        "pair_sel": sel,
        "focal_init": f0,
        "seed": seed,
        "no_rotation": bool(no_rotation),
        "rot_consistency_deg": (mean_ae, med_ae, max_ae),
    }
    if no_rotation:
        result["cameras"] = Cameras(
            R=jnp.asarray(R0.astype(np.float32)),
            f=jnp.full((n,), f0, jnp.float32),
            cx=jnp.asarray(cx),
            cy=jnp.asarray(cy),
        )
        return result  # planar path: homography BA handles it (bundle_h)

    # ---- BA data (inlier coords, per-edge cap, device) ----
    P = len(sel)
    M = min(cfg.max_matches, pair_mask.shape[1])
    u_i = np.zeros((P, M, 2), np.float32)
    u_j = np.zeros((P, M, 2), np.float32)
    w = np.zeros((P, M), np.float32)
    for k, p in enumerate(sel):
        ok = pair_mask[p] & inliers[p]
        idxs = np.nonzero(ok)[0]
        if len(idxs) > M:  # deterministic per-pair subsample (:1047-1102)
            rng = np.random.default_rng(1000003 * int(pairs[p, 0]) + int(pairs[p, 1]))
            idxs = rng.choice(idxs, M, replace=False)
        c = len(idxs)
        gi, gj = int(pairs[p, 0]), int(pairs[p, 1])
        u_i[k, :c] = xy[gi, pair_idx[p, idxs, 0]]
        u_j[k, :c] = xy[gj, pair_idx[p, idxs, 1]]
        w[k, :c] = 1.0
    data = BAData(
        pair_ij=jnp.asarray(loc_pairs.astype(np.int32)),
        u_i=jnp.asarray(u_i),
        u_j=jnp.asarray(u_j),
        w=jnp.asarray(w),
        pair_valid=jnp.ones((P,), bool),
    )

    # ---- incremental schedule ----
    # cameras join best-connected-first; for large panoramas they join in
    # groups so the schedule stays O(n / group) LM phases (the reference
    # adds one camera per step, `bundleAdjustmentRKf.m:146-326` — at one
    # LM phase per camera a 100-camera panorama would pay 100x the solver
    # cost for negligible accuracy gain)
    order = incremental_order(loc_counts, np.arange(n), seed)
    group = max(1, n // 12)
    steps = list(range(2, n + 1, group))
    if not steps or steps[-1] != n:
        steps.append(n)
    S = max(1, len(steps))
    schedule = np.zeros((S, n), bool)
    for s_i, upto in enumerate(steps):
        schedule[s_i, order[:upto]] = True
    schedule[-1, :] = True

    theta0 = np.stack([np.asarray(geo.so3_log(jnp.asarray(R0[k : k + 1]))).reshape(3) for k in range(n)])
    params0 = np.concatenate([theta0, np.full((n, 1), f0)], -1).astype(np.float32)

    params, cost = bundle_adjust_rkf(
        jnp.asarray(params0),
        jnp.asarray(cx),
        jnp.asarray(cy),
        data,
        jnp.asarray(schedule),
        jnp.int32(seed),
        cfg=cfg,
        n_cameras=n,
        lm_iters=cfg.incremental_lm_iters,
        final_iters=cfg.max_iter_lm,
    )
    params = np.asarray(params)
    R = np.asarray(geo.so3_exp(jnp.asarray(params[:, :3])))
    result["cameras"] = Cameras(
        R=jnp.asarray(R.astype(np.float32)),
        f=jnp.asarray(params[:, 3].astype(np.float32)),
        cx=jnp.asarray(cx),
        cy=jnp.asarray(cy),
    )
    result["final_cost"] = float(cost)
    return result
