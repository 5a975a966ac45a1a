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
from autopanostitch_tpu.utils.buckets import coarse as _coarse

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST

# Radial-distortion (k1) estimation constants — k1 is in half-diagonal-
# normalized units (consumer lenses: |k1| ~ 0.01-0.1). Prior/coupling damp
# the STEP like the Brown-Lowe theta/f priors, they are not objective terms.
_K1_PRIOR_SIGMA = 0.05  # prior to 0: keeps k1 quiet when unconstrained
_K1_MEAN_WEIGHT = 1.0e4  # same-lens coupling (damps k1 steps that differ)
_K1_STEP_CAP = 0.02  # per-iteration |delta k1| cap (capPerCameraStep analog)
# during incremental growth k1 is as weakly observable as f (see
# BundleConfig.incremental_focal_frac) — same 10x tighter cap
_K1_INC_STEP_CAP = 0.002
_K1_CLAMP = 0.25  # hard clamp, like the focal clamp [100, 5000]


class Cameras(NamedTuple):
    """Camera set (reference `cameras(i)` struct, `bundleAdjustmentRKf.m:34-41`).

    `k1` is a capability the reference does NOT have: per-camera Brown
    radial distortion (r normalized by the half-diagonal), estimated
    jointly with R and f when `BundleConfig.estimate_distortion` is on.
    Without a distortion model, a barrel lens biases the focal estimate
    (peripheral matches sit compressed), which on near-360 arcs turns into
    an arc-length error whose ends collide on the canvas — the dominant
    artifact class in the robustness sweep. None = pinhole (reference
    behavior, bit-identical paths)."""

    R: Array  # (N, 3, 3) world -> camera
    f: Array  # (N,)
    cx: Array  # (N,)
    cy: Array  # (N,)
    k1: Array | None = None  # (N,) radial distortion, or None = pinhole

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


def stratified_subsample(
    pts: np.ndarray,
    size_i,
    cap: int,
    mode: str,
    rng: np.random.Generator,
    grid_bins=(4, 4),
    polar_bins=(12, 5),
) -> np.ndarray:
    """Pick `cap` of len(pts) matches, optionally stratified over image i.

    Host-side equivalent of `bundleAdjustmentRKf.m subsampleMatches
    :1047-1352`: 'random' draws from the caller's deterministic per-pair
    stream; 'grid' bins points over a rows x cols grid; 'polar' bins by
    angle/radius around the image center. Stratified modes distribute the
    cap proportionally to bin occupancy (min 1 per non-empty bin) so the
    kept matches cover the whole overlap instead of clustering.

    Returns int indices into pts (length <= cap).
    """
    Mp = len(pts)
    if Mp <= cap:
        return np.arange(Mp)
    h, w = int(size_i[0]), int(size_i[1])
    if mode == "grid":
        rows, cols = grid_bins
        rb = np.clip(np.ceil((pts[:, 1] + 1.0) * rows / h), 1, rows).astype(int)
        cb = np.clip(np.ceil((pts[:, 0] + 1.0) * cols / w), 1, cols).astype(int)
        bin_id = (rb - 1) * cols + (cb - 1)
        nbins = rows * cols
    elif mode == "polar":
        n_ang, n_rad = polar_bins
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        d = pts - np.array([cx, cy])
        ang = np.mod(np.arctan2(d[:, 1], d[:, 0]), 2 * np.pi)
        rmax = float(np.hypot(max(cx, w - 1 - cx), max(cy, h - 1 - cy)))
        rnorm = np.minimum(1.0, np.hypot(d[:, 0], d[:, 1]) / max(rmax, 1e-9))
        ab = np.minimum((ang / (2 * np.pi) * n_ang).astype(int), n_ang - 1)
        rb = np.minimum((rnorm * n_rad).astype(int), n_rad - 1)
        bin_id = ab * n_rad + rb
        nbins = n_ang * n_rad
    else:  # 'random'
        return rng.choice(Mp, cap, replace=False)

    counts = np.bincount(bin_id, minlength=nbins)
    nonempty = np.nonzero(counts)[0]
    q = np.zeros(nbins, int)
    if len(nonempty) > cap:
        # more occupied bins than the cap: the min-1-per-bin rule cannot
        # hold — take one point from `cap` evenly spaced bins instead of
        # letting the quota overshoot and truncating the high-index bins
        pick_bins = nonempty[np.linspace(0, len(nonempty) - 1, cap).astype(int)]
        q[pick_bins] = 1
    else:
        prop = counts[nonempty] / counts[nonempty].sum()
        q[nonempty] = np.maximum(1, np.round(prop * cap).astype(int))
        q = np.minimum(q, counts)  # a bin cannot give more than it has
    # trim overshoot from the largest quotas; fill shortfall from the
    # fullest bins (reference :1181-1216)
    while q.sum() > cap:
        b = nonempty[np.argmax(q[nonempty])]
        if q[b] <= 1:
            break
        q[b] -= 1
    room = counts - q
    while q.sum() < cap and room.sum() > 0:
        b = int(np.argmax(room))
        q[b] += 1
        room[b] -= 1

    idx = []
    for b in nonempty:
        mem = np.nonzero(bin_id == b)[0]
        if len(mem) <= q[b]:
            idx.extend(mem.tolist())
        else:
            # deterministic per-bin stream (reference :1229-1239)
            rb_rng = np.random.default_rng((2654435761 * (int(b) + 1)) & 0x7FFFFFFF)
            idx.extend(rb_rng.choice(mem, q[b], replace=False).tolist())
    return np.array(idx[:cap], int)


def incremental_order(counts: np.ndarray, members: np.ndarray, seed: int):
    """Best-connected-first camera addition order
    (`bundleAdjustmentRKf.m:146-177`). Returns ordered list starting at seed.

    Greedy max-connectivity-to-added-set; the running score vector is
    updated with one counts column per addition (O(N^2) total — the naive
    re-sum per candidate is O(N^3) host work: 22 s at N=1000, and this is
    pure control-plane cost the device never sees). Ties break to the
    lowest camera index (deterministic)."""
    in_rem = np.zeros(counts.shape[0], bool)
    in_rem[np.asarray(members, int)] = True
    in_rem[seed] = False
    score = counts[:, seed].astype(np.int64).copy()
    order = [seed]
    for _ in range(int(in_rem.sum())):
        b = int(np.argmax(np.where(in_rem, score, -1)))
        order.append(b)
        in_rem[b] = False
        score += counts[:, b]
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


def _undistort_point(u, k1, cx, cy):
    """Distorted-image pixel -> pinhole pixel, Brown one-term model.

    The distorted image shows, at pixel p, the pinhole content at
    p*(1 + k1*r^2) with r = |p - c| / half-diagonal (the same forward map
    as `utils.perturb.radial_distort`). Exact, no iteration — this is the
    direction BA needs: observations move INTO pinhole space, where the
    rotation+focal projection model is valid."""
    dx = u[0] - cx
    dy = u[1] - cy
    r2 = (dx * dx + dy * dy) / (cx * cx + cy * cy + 1e-12)
    fac = 1.0 + k1 * r2
    return jnp.stack([cx + dx * fac, cy + dy * fac])


def _project(params_src, params_dst, Rb_s, Rb_d, cx_s, cy_s, cx_d, cy_d, u_src):
    """Map a point of the source camera into the destination camera.

    params = [theta(3), f]; the rotation is exp(theta) @ R_base — theta is
    the LOCAL tangent step around the carried base rotation matrix (always
    evaluated at theta=0, so the SO(3) log never appears in the optimizer;
    the log map is ill-conditioned at angle pi, which a 360-degree ring of
    cameras inevitably contains).

    All 3x3 products run at HIGHEST precision: TPU matmuls default to bf16
    (~8-bit mantissa), which injects ~0.5-degree rotation noise per product
    and stalls BA convergence (measured: 100-camera ring ferr 3.2% in bf16
    vs 0.04% in f32)."""
    R_s = jnp.matmul(geo.so3_exp(params_src[:3]), Rb_s, precision=_HI)
    R_d = jnp.matmul(geo.so3_exp(params_dst[:3]), Rb_d, precision=_HI)
    f_s = params_src[3]
    f_d = params_dst[3]
    if params_src.shape[0] > 4:  # optional 5th param: radial distortion
        u_src = _undistort_point(u_src, params_src[4], cx_s, cy_s)
    x = (u_src[0] - cx_s) / f_s
    y = (u_src[1] - cy_s) / f_s
    ray = jnp.stack([x, y, 1.0])
    ray_w = jnp.matmul(R_s.T, ray, precision=_HI)
    p = jnp.matmul(R_d, ray_w, precision=_HI)
    z = p[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
    u = f_d * p[0] / z_safe + cx_d
    v = f_d * p[1] / z_safe + cy_d
    return jnp.stack([u, v]), z


def _pair_residual(p_i, p_j, Rb_i, Rb_j, cx_i, cy_i, cx_j, cy_j, u_i, u_j):
    """Bidirectional residual of one match (Brown-Lowe Eq. 14/15, both
    directions as in `jacobianPair`, `bundleAdjustmentRKf.m:793-899`).
    Returns (4,) [r_ij (2), r_ji (2)] and the two depths.

    With 5-param cameras the residual lives in PINHOLE space: both the
    projected source point (inside `_project`) and the destination
    observation are undistorted by the cameras' k1 first."""
    pred_j, z_j = _project(p_i, p_j, Rb_i, Rb_j, cx_i, cy_i, cx_j, cy_j, u_i)
    pred_i, z_i = _project(p_j, p_i, Rb_j, Rb_i, cx_j, cy_j, cx_i, cy_i, u_j)
    if p_i.shape[0] > 4:
        u_j = _undistort_point(u_j, p_j[4], cx_j, cy_j)
        u_i = _undistort_point(u_i, p_i[4], cx_i, cy_i)
    r = jnp.concatenate([u_j - pred_j, u_i - pred_i])
    return r, jnp.stack([z_j, z_i])


def _orthonormalize(R: Array) -> Array:
    """Re-project (..., 3, 3) onto SO(3) by Gram-Schmidt (the reference
    re-orthonormalizes by SVD after every accepted step,
    `bundleAdjustmentRKf.m:563-570`; tiny vmapped SVDs serialize on TPU, a
    closed-form GS is equivalent here since drift is O(eps))."""
    r0 = R[..., 0, :]
    r0 = r0 / jnp.linalg.norm(r0, axis=-1, keepdims=True)
    r1 = R[..., 1, :]
    r1 = r1 - jnp.sum(r1 * r0, -1, keepdims=True) * r0
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = jnp.cross(r0, r1)
    return jnp.stack([r0, r1, r2], axis=-2)


def _huber_w(r2: Array, sigma: float) -> Array:
    """IRLS weight of a squared residual norm under Huber (sigma=2px,
    `bundleAdjustmentRKf.m:1806-1829`)."""
    rn = jnp.sqrt(r2 + 1e-12)
    return jnp.minimum(1.0, sigma / rn)


@partial(
    jax.jit,
    static_argnames=("nb", "pb", "iters", "pd", "sigma", "f_lo", "f_hi",
                     "theta_prior", "focal_prior_frac", "max_rot_deg",
                     "one_direction"),
)
def lm_phase_group(
    R_full, f_full, k1_full, cx_full, cy_full, data,
    cam_take_g,  # (G, nb) int32
    cam_ok_g,  # (G, nb) bool
    pair_take_g,  # (G, pb) int32
    pair_ij_g,  # (G, pb, 2) int32
    pair_ok_g,  # (G, pb) bool
    cpinv_g,  # (G, nb, nb) f32
    seed_g,  # (G,) int32
    focal_frac_g,  # (G,) f32
    k1_cap_g,  # (G,) f32 — per-iteration |delta k1| cap (pd = 5 only)
    real_g,  # (G,) bool — False = shape-bucket padding phase (skipped)
    lam0,  # () f32 — lambda resets to this at every phase
    nb: int,
    pb: int,
    iters: int,
    pd: int = 4,
    **static,
):
    """A GROUP of same-shape LM phases as one executable (lax.scan).

    The incremental schedule's phases bucket to only a handful of distinct
    (nb, pb) shapes; dispatching each phase separately paid one relay
    round-trip per phase (~30 ms x 15 phases dominated BA wall time on
    this harness: 0.09 s of device compute inside 0.73 s of wall).

    pd = per-camera parameter count: 4 = [theta(3), f] (reference model),
    5 adds radial distortion k1 (see Cameras.k1).
    Returns (R_full, f_full, k1_full, costs (G,), naccs (G,))."""
    with jax.default_matmul_precision("highest"):

        def body(carry, xs):
            ct, co, pt, pij, po, cp, sl, frac, k1c, real = xs

            def run(st):
                Rf, ff, kf = st
                Rf, ff, kf, _, cost, nacc = _lm_phase_body(
                    Rf, ff, kf, cx_full, cy_full, data, ct, co, pt, pij, po,
                    cp, sl, lam0, nb=nb, pb=pb, iters=iters, pd=pd,
                    focal_frac=frac, k1_cap=k1c, **static,
                )
                return Rf, ff, kf, jnp.float32(cost), jnp.int32(nacc)

            def skip(st):  # padding phase: state unchanged, ~zero runtime
                Rf, ff, kf = st
                return Rf, ff, kf, jnp.float32(0.0), jnp.int32(0)

            Rf, ff, kf, cost, nacc = jax.lax.cond(real, run, skip, carry)
            return (Rf, ff, kf), (cost, nacc)

        (R_full, f_full, k1_full), (costs, naccs) = jax.lax.scan(
            body, (R_full, f_full, k1_full),
            (cam_take_g, cam_ok_g, pair_take_g, pair_ij_g, pair_ok_g,
             cpinv_g, seed_g, focal_frac_g, k1_cap_g, real_g),
        )
    return R_full, f_full, k1_full, costs, naccs


def _lm_phase_body(
    R_full: Array,  # (N, 3, 3) world->cam rotations — ALL component cameras
    f_full: Array,  # (N,) focals
    k1_full: Array,  # (N,) radial distortion (ignored unless pd == 5)
    cx_full: Array,  # (N,)
    cy_full: Array,  # (N,)
    data: BAData,  # full pair data, device-resident (uploaded once)
    cam_take: Array,  # (nb,) int32 active-camera indices into N (padded)
    cam_ok: Array,  # (nb,) bool
    pair_take: Array,  # (pb,) int32 active-pair indices into P (padded)
    pair_ij_local: Array,  # (pb, 2) int32 COMPACT camera indices of each pair
    pair_ok: Array,  # (pb,) bool
    cpinv_f: Array,  # (nb, nb) focal smoothness + mean coupling (host-built)
    seed_local: Array,  # () int32 compact index of the gauge camera
    lam: Array,  # () f32 LM damping, carried across phases
    nb: int,
    pb: int,
    iters: int,
    focal_frac: float,
    k1_cap: Array | float = _K1_STEP_CAP,  # per-iteration |delta k1| cap
    pd: int = 4,
    sigma: float = 2.0,
    f_lo: float = 100.0,
    f_hi: float = 5000.0,
    theta_prior: float = np.pi / 16.0,
    focal_prior_frac: float = 20.0,
    max_rot_deg: float = 5.0,
    one_direction: bool = False,
):
    """One LM phase on the COMPACT subsystem of the active cameras.

    TPU-native replacement for the reference's per-step global LM
    (`bundleAdjustmentRKf.m:438-607`): the incremental schedule is a host
    loop over calls to this one jitted phase; each call gathers only the
    active cameras/pairs on device (nb, pb are bucketed so executables are
    reused across phases and datasets). Early incremental phases therefore
    cost O(active) instead of O(N) — the round-1 version linearized every
    pair and solved the full 4Nx4N system at every step.

    Within a phase (all shapes static):
    - residual/Jacobian accumulation into the dense (4nb, 4nb) system
      (reference `accumulateNormalEqnsBlock` :609-791, Jacobians via
      jax.jacrev instead of hand-derived Eq. 20-23)
    - Brown-Lowe prior CpInv = theta/f diagonal + focal smoothness +
      global focal-mean coupling, added to the damped system and to the
      predicted-reduction term exactly like the reference (`:544,557`,
      `buildBrownLowePrior` :1503-1637 — the prior damps the STEP; it is
      not a penalty in the objective, in the reference either)
    - NaN-guarded solve: a non-finite Cholesky step becomes a zero step,
      which the accept test rejects and lambda x4 re-regularizes — the
      jit-friendly equivalent of the reference's chol->PCG->backslash
      fallback chain (`solveSpd` :901-982)
    - gain-ratio lambda schedule + per-camera step caps + SO(3)
      re-projection (`:512-600`, `capPerCameraStep` :984-1045)
    - Jacobians are NOT recomputed on rejected steps (lax.cond keeps the
      current linearization), halving the cost of reject-heavy phases.

    With pd = 5 each camera carries [theta(3), f, k1]; k1 joins the dense
    system like any other parameter (autodiff Jacobians), with a prior to
    0 and an in-jit mean-coupling across the active cameras (same-lens
    assumption, built like the focal-mean coupling but needing no host
    data: I - 11^T/k over active k1 slots).

    Returns (R_full, f_full, k1_full with active rows updated, lam, cost,
    n_accepts).
    """
    f32 = f_full.dtype
    Rb0 = R_full[cam_take]  # (nb, 3, 3) base rotations
    f0 = f_full[cam_take]  # (nb,)
    k10 = k1_full[cam_take]  # (nb,)
    cx = cx_full[cam_take]
    cy = cy_full[cam_take]
    u_i = data.u_i[pair_take]  # (pb, M, 2)
    u_j = data.u_j[pair_take]
    w_m = data.w[pair_take] * (data.pair_valid[pair_take] & pair_ok)[:, None]

    jac_fn = jax.vmap(  # over matches
        jax.jacrev(  # 4 residual outputs vs 2*pd params: reverse mode is
            # 2x cheaper than jacfwd's 2*pd tangent passes
            lambda pp, Rbi, Rbj, cxi, cyi, cxj, cyj, ui, uj: _pair_residual(
                pp[:pd], pp[pd:], Rbi, Rbj, cxi, cyi, cxj, cyj, ui, uj
            )[0],
        ),
        in_axes=(None, None, None, None, None, None, None, 0, 0),
    )
    res_fn = jax.vmap(
        _pair_residual, in_axes=(None, None, None, None, None, None, None, None, 0, 0)
    )

    def pair_weights(r, z, wp):
        """(M, 4) robust weights: Huber IRLS x validity x front-facing."""
        w_ij = _huber_w(jnp.sum(r[:, :2] ** 2, -1), sigma)
        w_ji = _huber_w(jnp.sum(r[:, 2:] ** 2, -1), sigma)
        if one_direction:  # inputs.m:84 residualOneDirection
            w_ji = jnp.zeros_like(w_ji)
        front = (z[:, 0] > 1e-4) & (z[:, 1] > 1e-4)
        return jnp.stack([w_ij, w_ij, w_ji, w_ji], -1) * (wp * front)[:, None]

    zero3 = jnp.zeros(3, f32)

    def cam_params(f, k1, i):
        """Per-camera parameter vector [theta=0 (3), f(, k1)]."""
        if pd == 5:
            return jnp.concatenate([zero3, f[i][None], k1[i][None]])
        return jnp.concatenate([zero3, f[i][None]])

    def pair_system(Rb, f, k1, p):
        """(2pd x 2pd) JtJ block, (2pd,) Jtg, and robust cost for pair p,
        linearized at theta = 0 around the base rotations."""
        i = pair_ij_local[p, 0]
        j = pair_ij_local[p, 1]
        p_i = cam_params(f, k1, i)
        p_j = cam_params(f, k1, j)
        pp = jnp.concatenate([p_i, p_j])
        r, z = res_fn(p_i, p_j, Rb[i], Rb[j], cx[i], cy[i], cx[j], cy[j], u_i[p], u_j[p])
        J = jac_fn(pp, Rb[i], Rb[j], cx[i], cy[i], cx[j], cy[j], u_i[p], u_j[p])  # (M, 4, 2pd)
        w4 = pair_weights(r, z, w_m[p])
        Jw = J * w4[:, :, None]
        JtJ = jnp.einsum("mab,mac->bc", Jw, J, precision=_HI)
        Jtg = jnp.einsum("mab,ma->b", Jw, r, precision=_HI)
        cost = jnp.sum(w4 * r * r)
        return JtJ, Jtg, cost

    def pair_cost(Rb, f, k1, p):
        """Robust cost of one pair — residuals only, no Jacobians (used for
        the LM accept test; linearizing the candidate would double BA time)."""
        i = pair_ij_local[p, 0]
        j = pair_ij_local[p, 1]
        p_i = cam_params(f, k1, i)
        p_j = cam_params(f, k1, j)
        r, z = res_fn(p_i, p_j, Rb[i], Rb[j], cx[i], cy[i], cx[j], cy[j], u_i[p], u_j[p])
        w4 = pair_weights(r, z, w_m[p])
        return jnp.sum(w4 * r * r)

    def build_cost(Rb, f, k1):
        return jnp.sum(
            jax.vmap(lambda p: pair_cost(Rb, f, k1, p))(jnp.arange(pb))
        )

    def build_normal_eqns(Rb, f, k1):
        JtJ_p, Jtg_p, cost_p = jax.vmap(lambda p: pair_system(Rb, f, k1, p))(
            jnp.arange(pb)
        )
        cost = jnp.sum(cost_p)

        H = jnp.zeros((pd * nb, pd * nb), f32)
        g = jnp.zeros((pd * nb,), f32)
        idx_i = pair_ij_local[:, 0]
        idx_j = pair_ij_local[:, 1]

        # scatter-add the four pd x pd blocks of each pair
        def scatter(H, rows, cols, vals):
            return H.at[rows[:, None, None] * pd + jnp.arange(pd)[None, :, None],
                        cols[:, None, None] * pd + jnp.arange(pd)[None, None, :]].add(vals)

        H = scatter(H, idx_i, idx_i, JtJ_p[:, :pd, :pd])
        H = scatter(H, idx_i, idx_j, JtJ_p[:, :pd, pd:])
        H = scatter(H, idx_j, idx_i, JtJ_p[:, pd:, :pd])
        H = scatter(H, idx_j, idx_j, JtJ_p[:, pd:, pd:])
        g = g.at[(idx_i[:, None] * pd + jnp.arange(pd)[None, :]).reshape(-1)].add(
            Jtg_p[:, :pd].reshape(-1)
        )
        g = g.at[(idx_j[:, None] * pd + jnp.arange(pd)[None, :]).reshape(-1)].add(
            Jtg_p[:, pd:].reshape(-1)
        )
        return H, g, cost

    # --- Brown-Lowe prior precision CpInv (buildBrownLowePrior) ---
    okf = cam_ok.astype(f32)
    fbar = jnp.sum(f0 * okf) / jnp.maximum(jnp.sum(okf), 1.0)
    theta_prior_w = 1.0 / (theta_prior**2)
    f_prior_w = 1.0 / ((fbar / focal_prior_frac) ** 2 + 1e-12)
    pat_theta = [theta_prior_w] * 3 + [0.0] * (pd - 3)
    pat_f = [0.0] * 3 + [1.0] + [0.0] * (pd - 4)
    prior_diag = jnp.tile(jnp.array(pat_theta, f32), nb)
    prior_diag = prior_diag + jnp.tile(jnp.array(pat_f, f32), nb) * f_prior_w
    if pd == 5:
        # k1 prior to 0 (sigma 0.05 in half-diagonal-normalized units)
        pat_k1 = [0.0] * 4 + [1.0 / _K1_PRIOR_SIGMA**2]
        prior_diag = prior_diag + jnp.tile(jnp.array(pat_k1, f32), nb)
    cp_full = jnp.diag(prior_diag)
    cp_full = cp_full.at[3::pd, 3::pd].add(cpinv_f)  # smoothness + mean coupling
    if pd == 5:
        # same-lens coupling: damp k1 steps that DIFFER across the active
        # cameras (mean coupling I - 11^T/k, like the focal one but
        # derivable in-jit from cam_ok — no host data needed)
        kact = jnp.maximum(jnp.sum(okf), 1.0)
        cp_k1 = _K1_MEAN_WEIGHT * (
            jnp.diag(okf) - jnp.outer(okf, okf) / kact
        )
        cp_full = cp_full.at[4::pd, 4::pd].add(cp_k1)

    col_mask = jnp.repeat(okf, pd)
    # gauge: pin the seed camera's rotation (3 params)
    seed_cols = seed_local * pd + jnp.arange(3)
    col_mask = col_mask.at[seed_cols].set(0.0)
    cp_full = cp_full * col_mask[:, None] * col_mask[None, :]

    max_rot = jnp.radians(max_rot_deg)

    def lm_iter(carry, _):
        Rb, f, k1, lam, H, g, cost = carry
        Hm = H * col_mask[:, None] * col_mask[None, :]
        gm = g * col_mask
        damp = jnp.diag(Hm) + 1e-6
        Hd = Hm + cp_full + jnp.diag(lam * damp)
        # pin frozen params
        Hd = Hd + jnp.diag(jnp.where(col_mask > 0, 0.0, 1.0))
        L, low = jax.scipy.linalg.cho_factor(Hd)
        delta = -jax.scipy.linalg.cho_solve((L, low), gm)
        # NaN guard: an indefinite system yields a non-finite step -> zero
        # step -> reject -> lambda x4 (the solver-robustness fallback)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        delta = delta.reshape(nb, pd)
        # per-camera caps (capPerCameraStep, :984-1045)
        rot_norm = jnp.linalg.norm(delta[:, :3], axis=-1)
        rot_scale = jnp.minimum(1.0, max_rot / jnp.maximum(rot_norm, 1e-12))
        f_cap = focal_frac * jnp.maximum(f, 1.0)
        f_scale = jnp.minimum(1.0, f_cap / jnp.maximum(jnp.abs(delta[:, 3]), 1e-12))
        dtheta = delta[:, :3] * rot_scale[:, None]
        df = delta[:, 3] * f_scale
        parts = [dtheta, df[:, None]]
        if pd == 5:
            k1_scale = jnp.minimum(
                1.0,
                k1_cap / jnp.maximum(jnp.abs(delta[:, 4]), 1e-12),
            )
            dk1 = delta[:, 4] * k1_scale
            parts.append(dk1[:, None])
        # the gain ratio must be computed for the step actually TAKEN —
        # the capped one (the uncapped solver step would overestimate pred
        # whenever a rotation/focal cap binds, corrupting the lambda
        # schedule in exactly the hard early phases where caps engage)
        d_flat = jnp.concatenate(parts, axis=1).reshape(-1)

        # candidate update: left-multiplicative SO(3) on the base rotation
        # (theta stays at 0 — the log map never runs), clamp f
        Rb_cand = _orthonormalize(jnp.matmul(geo.so3_exp(dtheta), Rb, precision=_HI))
        f_cand = jnp.clip(f + df, f_lo, f_hi)
        Rb_cand = jnp.where(cam_ok[:, None, None], Rb_cand, Rb)
        f_cand = jnp.where(cam_ok, f_cand, f)
        if pd == 5:
            k1_cand = jnp.clip(k1 + dk1, -_K1_CLAMP, _K1_CLAMP)
            k1_cand = jnp.where(cam_ok, k1_cand, k1)
        else:
            k1_cand = k1

        cost_new = build_cost(Rb_cand, f_cand, k1_cand)
        # gain-ratio lambda schedule (:557-597) with the prior in the
        # predicted reduction like the reference
        # (pred = 0.5 delta^T (lam*D delta - g + CpInv delta), :557)
        pred = 0.5 * (
            lam * jnp.sum(d_flat * damp * d_flat)
            + jnp.dot(d_flat, jnp.matmul(cp_full, d_flat, precision=_HI), precision=_HI)
            - jnp.sum(d_flat * gm)
        )
        rho = (cost - cost_new) / jnp.maximum(pred, 1e-12)
        accept = (cost_new < cost) & jnp.isfinite(cost_new)
        Rb = jnp.where(accept, Rb_cand, Rb)
        f = jnp.where(accept, f_cand, f)
        k1 = jnp.where(accept, k1_cand, k1)
        lam = jnp.where(
            accept,
            lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
            lam * 4.0,
        )
        lam = jnp.clip(lam, 1e-9, 1e6)
        # relinearize ONLY on accept; rejected steps reuse H, g, cost
        H, g, cost = jax.lax.cond(
            accept,
            lambda Rf: build_normal_eqns(*Rf),
            lambda Rf: (H, g, cost),
            (Rb, f, k1),
        )
        return (Rb, f, k1, lam, H, g, cost), accept

    H0, g0, cost0 = build_normal_eqns(Rb0, f0, k10)
    (Rb, f, k1, lam, _, _, cost), accepts = jax.lax.scan(
        lm_iter, (Rb0, f0, k10, lam, H0, g0, cost0), None, length=iters
    )
    # scatter active rows back (add-form: padded duplicate indices add 0)
    updR = jnp.where(cam_ok[:, None, None], Rb - R_full[cam_take], 0.0)
    updf = jnp.where(cam_ok, f - f_full[cam_take], 0.0)
    updk = jnp.where(cam_ok, k1 - k1_full[cam_take], 0.0)
    R_full = R_full.at[cam_take].add(updR)
    f_full = f_full.at[cam_take].add(updf)
    k1_full = k1_full.at[cam_take].add(updk)
    return R_full, f_full, k1_full, lam, cost, jnp.sum(accepts)


def _bucket(x: int, lo: int) -> int:
    """Next power of two >= max(x, lo) — bounds executable count to
    O(log N) shapes reused across phases and datasets."""
    return max(lo, 1 << int(np.ceil(np.log2(max(x, 1)))))




def _cpinv_focal(active_orig: np.ndarray, nb: int, smooth_w: float, mean_w: float):
    """Host-built focal coupling block of the Brown-Lowe prior
    (`buildBrownLowePrior`, `bundleAdjustmentRKf.m:1560-1637`):
    smoothness [1 -1; -1 1]*lf between cameras whose ORIGINAL indices are
    within 2 (capture-order adjacency), plus the global-mean coupling
    lm * (I - 11^T/k) over all active focals."""
    k = len(active_orig)
    C = np.zeros((nb, nb), np.float32)
    if smooth_w > 0 and k > 1:
        act = np.asarray(active_orig, np.int64)
        near = (np.abs(act[:, None] - act[None, :]) <= 2) & ~np.eye(k, dtype=bool)
        C[:k, :k] -= smooth_w * near
        C[np.arange(k), np.arange(k)] += smooth_w * near.sum(1)
    if mean_w > 0 and k > 1:
        C[:k, :k] += mean_w * (np.eye(k) - 1.0 / k)
    return C


def run_incremental_ba(
    R0: np.ndarray,  # (N, 3, 3) initial world->cam rotations
    f_init: np.ndarray,  # (N,) initial focals
    cx: np.ndarray,
    cy: np.ndarray,
    data: BAData,
    loc_pairs: np.ndarray,  # (P, 2) component-local camera indices
    order: list,  # incremental camera addition order (starts at seed)
    seed: int,
    cfg: BundleConfig,
    verbose: bool = False,
    with_k1: bool = False,
):
    """Incremental Brown-Lowe BA: host loop over compact jitted LM phases.

    Mirrors the reference's incremental loop (`bundleAdjustmentRKf.m:146-326`)
    with grouped camera additions, then the staged final passes with focal
    caps 0.5/1/2 percent (`:512-600`). With `with_k1`, every camera carries
    a 5th parameter (radial distortion, see Cameras.k1).
    Returns (R (N,3,3), f (N,), k1 (N,) | None, cost)."""
    n = len(f_init)
    P = len(loc_pairs)
    f0 = float(np.median(f_init))
    if cfg.focal_smoothness_weight is None:  # reference 'auto' (:485-497)
        smooth_w = (f0 / 20.0) ** 2 * 0.5 if n <= 5 else (f0 / 50.0) ** 2 * 2.0
    else:
        smooth_w = float(cfg.focal_smoothness_weight)

    group = max(1, n // 12)
    steps = list(range(2, n + 1, group))
    if not steps or steps[-1] != n:
        steps.append(n)

    # COARSE camera-count bucket (same rationale as the P_dev bucket in
    # run_bundle_adjustment): the full-length camera arrays are gather
    # sources / masked-scatter targets only, so padding them to a wide
    # rung removes per-dataset n from the LM executables' shape keys
    n_dev = _coarse(n, (64, 256, 1024))
    pad_n = n_dev - n

    def _padn(a, fill=0.0):
        a = np.asarray(a, np.float32)
        return np.concatenate([a, np.full((pad_n,) + a.shape[1:], fill, np.float32)])

    R_d = jnp.asarray(np.concatenate(
        [R0.astype(np.float32),
         np.tile(np.eye(3, dtype=np.float32), (pad_n, 1, 1))]))
    f_d = jnp.asarray(_padn(f_init, f0))  # pad with f0: keeps math finite
    k1_d = jnp.asarray(np.zeros((n_dev,), np.float32))  # host zeros: no eager broadcast executable
    cx_d = jnp.asarray(_padn(cx))
    cy_d = jnp.asarray(_padn(cy))
    pd = 5 if with_k1 else 4

    static = dict(
        pd=pd,
        sigma=float(cfg.sigma_huber),
        f_lo=float(cfg.focal_clamp[0]),
        f_hi=float(cfg.focal_clamp[1]),
        theta_prior=float(cfg.theta_prior),
        focal_prior_frac=float(cfg.focal_prior_frac),
        max_rot_deg=float(cfg.max_rotation_step_deg),
        one_direction=bool(cfg.residual_one_direction),
    )

    def phase_arrays(active: list, focal_frac: float, couple: bool,
                     k1_cap: float = _K1_STEP_CAP):
        """Host-built index/coupling arrays for one phase, plus (nb, pb)."""
        act = np.asarray(active, np.int64)
        in_act = np.zeros(n, bool)
        in_act[act] = True
        psel = np.nonzero(in_act[loc_pairs[:, 0]] & in_act[loc_pairs[:, 1]])[0]
        # nb floor 64: the compact-phase cost driver is pb (pair
        # linearization), not nb — the dense (pd*nb)^2 solve is trivial at
        # this size — so flooring nb collapses the per-phase key to
        # (64, pb) and every <=64-camera dataset shares the LM programs
        nb = _bucket(len(act), 64)
        pb = _bucket(max(len(psel), 1), 8)
        local_of = np.zeros(n, np.int32)
        local_of[act] = np.arange(len(act), dtype=np.int32)
        cam_take = np.zeros(nb, np.int32)
        cam_take[: len(act)] = act
        cam_ok = np.zeros(nb, bool)
        cam_ok[: len(act)] = True
        pair_take = np.zeros(pb, np.int32)
        pair_take[: len(psel)] = psel
        pair_ok = np.zeros(pb, bool)
        pair_ok[: len(psel)] = True
        pij = np.zeros((pb, 2), np.int32)
        pij[: len(psel)] = local_of[loc_pairs[psel]]
        cpinv = (
            _cpinv_focal(act, nb, smooth_w, float(cfg.focal_mean_weight))
            if couple
            else np.zeros((nb, nb), np.float32)
        )
        seed_local = np.int32(local_of[seed] if in_act[seed] else 0)
        return (nb, pb), (cam_take, cam_ok, pair_take, pij, pair_ok,
                          cpinv, seed_local, np.float32(focal_frac),
                          np.float32(k1_cap))

    # phase descriptors: incremental schedule (lambda resets per phase like
    # the reference — each incremental step calls runLevenbergMarquardt
    # afresh, `bundleAdjustmentRKf.m:304-306`), then the staged final
    # passes WITHOUT the focal smoothness/mean coupling (the coupling
    # stabilizes partial graphs but biases the endgame — measured 0.77%
    # mean focal error coupled vs 0.01% uncoupled on a clean 100-ring)
    final_iters = cfg.max_iter_lm // len(cfg.focal_step_fracs) + 1
    descs = [
        (phase_arrays(order[:upto], cfg.incremental_focal_frac, True,
                      k1_cap=_K1_INC_STEP_CAP),
         cfg.incremental_lm_iters, upto)
        for upto in steps
    ] + [
        (phase_arrays(order, frac, False), final_iters, None)
        for frac in cfg.focal_step_fracs
    ]

    # consecutive phases with equal (nb, pb, iters) fuse into ONE scanned
    # executable — on the relay harness the per-phase dispatch round-trip
    # dominated BA wall time (see lm_phase_group)
    state = [R_d, f_d, k1_d]
    # groups are dispatched BACK-TO-BACK with no host sync in between (the
    # per-group cost pull used to cost one ~27 ms relay round-trip each);
    # all per-phase scalars are pulled in ONE deferred sync afterwards
    group_meta = []  # (group descs, iters, costs_dev, naccs_dev)
    phase_shapes = []  # (nb, pb, iters, n_phases) per fused group
    i = 0
    while i < len(descs):
        (shape, _), iters, _ = descs[i]
        j = i
        while j < len(descs) and descs[j][0][0] == shape and descs[j][1] == iters:
            j += 1
        group = descs[i:j]
        # pad the phase axis to a power of two with floor 8 (real=False
        # phases are lax.cond-skipped at ~zero runtime; the scan compiles
        # its body ONCE regardless of length) so the scan LENGTH drops out
        # of the executable's shape key: datasets whose incremental
        # schedules differ in phase count still share the (nb, pb, iters)
        # programs (measured: a 38- and a 35-photo sheet differed ONLY in
        # G across all eight phase groups)
        G_b = _bucket(len(group), 8)

        def _stack_pad(k):
            a = np.stack([g[0][1][k] for g in group])
            return jnp.asarray(np.pad(
                a, ((0, G_b - len(group)),) + ((0, 0),) * (a.ndim - 1)))

        stacked = tuple(_stack_pad(k) for k in range(9))
        real_g = jnp.asarray(np.arange(G_b) < len(group))
        R_new, f_new, k1_new, costs_dev, naccs_dev = lm_phase_group(
            state[0], state[1], state[2], cx_d, cy_d, data, *stacked, real_g,
            np.float32(cfg.lambda0),
            nb=shape[0], pb=shape[1], iters=iters, **static,
        )
        state = [R_new, f_new, k1_new]
        group_meta.append((group, iters, costs_dev, naccs_dev))
        phase_shapes.append((shape[0], shape[1], iters, len(group)))
        i = j
    run_incremental_ba.last_stats = {  # consumed by bench MFU accounting
        "phase_shapes": phase_shapes, "pd": pd, "n": n, "n_pairs": P,
        "m_matches": int(data.u_i.shape[1]),
    }

    cost = np.float32(0.0)
    phase_costs = []  # (upto, device cost, active pair count)
    for group, iters, costs_dev, naccs_dev in group_meta:
        costs = np.asarray(costs_dev)
        naccs = np.asarray(naccs_dev)
        cost = costs[len(group) - 1]  # last REAL phase (tail = padding)
        for gi, (_, _, upto) in enumerate(group):
            if upto is not None:  # incremental phase: track for RMSE check
                in_act = np.zeros(n, bool)
                in_act[order[:upto]] = True
                npair = int(np.count_nonzero(
                    in_act[loc_pairs[:, 0]] & in_act[loc_pairs[:, 1]]))
                phase_costs.append((upto, costs[gi], npair))
            if verbose:
                tag = f"n={upto}" if upto is not None else "final"
                print(f"  phase {tag}: cost={float(costs[gi]):.1f} "
                      f"acc={int(naccs[gi])}/{iters}")

    # RMSE-history anomaly check (`bundleAdjustmentRKf.m:308-325`): a phase
    # whose per-match RMSE jumps >2.5x the running median flags a
    # problematic camera addition. Costs are pulled in ONE deferred sync
    # here instead of per phase (each host sync through the TPU relay is
    # ~27 ms; the reference checks inline because MATLAB is already
    # synchronous).
    rmse_hist = []
    for upto, c, npair in phase_costs:
        rmse = float(np.sqrt(max(float(c), 0.0) / max(npair, 1)))
        if len(rmse_hist) > 3:
            med = float(np.median(rmse_hist))
            if med > 0 and rmse > 2.5 * med:
                import warnings

                warnings.warn(
                    f"bundle adjustment: elevated phase RMSE {rmse:.3f} at "
                    f"n={upto} cameras (median {med:.3f}, "
                    f"{rmse / med:.1f}x) — possible bad camera addition",
                    RuntimeWarning,
                    stacklevel=2,
                )
        rmse_hist.append(rmse)
    # slice the n_dev padding back off on host (the costs sync above
    # already paid the round-trip; these are a few KB)
    R_out = jnp.asarray(np.asarray(state[0])[:n])
    f_out = jnp.asarray(np.asarray(state[1])[:n])
    k1_out = jnp.asarray(np.asarray(state[2])[:n]) if with_k1 else None
    return R_out, f_out, k1_out, cost


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
        if len(idxs) > M:  # per-pair subsample (`subsampleMatches` :1047-1352)
            rng = np.random.default_rng(1000003 * int(pairs[p, 0]) + int(pairs[p, 1]))
            gi0 = int(pairs[p, 0])
            pts_i = xy[gi0, pair_idx[p, idxs, 0]]
            pick = stratified_subsample(
                pts_i, sizes[gi0], M, cfg.subsample_mode, rng,
                grid_bins=cfg.subsample_grid_bins,
                polar_bins=cfg.subsample_polar_bins,
            )
            idxs = idxs[pick]
        c = len(idxs)
        gi, gj = int(pairs[p, 0]), int(pairs[p, 1])
        u_i[k, :c] = xy[gi, pair_idx[p, idxs, 0]]
        u_j[k, :c] = xy[gj, pair_idx[p, idxs, 1]]
        w[k, :c] = 1.0
    # COARSE pair-count bucket: the BAData arrays are pure gather sources
    # inside the LM executables (pair_take indexes only real rows), so
    # padding costs nothing at runtime but removes the per-dataset P from
    # every LM executable's shape key — a 125-pair and a 110-pair sheet
    # share the P=128 programs (see utils/buckets.py rationale)
    P_dev = _coarse(P, (128, 512, 2048))
    pad_p = P_dev - P
    data = BAData(
        pair_ij=jnp.asarray(
            np.pad(loc_pairs.astype(np.int32), ((0, pad_p), (0, 0)))),
        u_i=jnp.asarray(np.pad(u_i, ((0, pad_p), (0, 0), (0, 0)))),
        u_j=jnp.asarray(np.pad(u_j, ((0, pad_p), (0, 0), (0, 0)))),
        w=jnp.asarray(np.pad(w, ((0, pad_p), (0, 0)))),
        pair_valid=jnp.asarray(
            np.pad(np.ones((P,), bool), (0, pad_p))),
    )

    # ---- incremental schedule ----
    # cameras join best-connected-first; for large panoramas they join in
    # groups so the schedule stays O(n / group) LM phases (the reference
    # adds one camera per step, `bundleAdjustmentRKf.m:146-326` — at one
    # LM phase per camera a 100-camera panorama would pay 100x the solver
    # cost for negligible accuracy gain). Each phase runs on the COMPACT
    # subsystem of the active cameras (see lm_phase_group).
    order = incremental_order(loc_counts, np.arange(n), seed)

    R_ba, f_ba, k1_ba, cost = run_incremental_ba(
        R0, np.full(n, f0, np.float32), cx, cy, data, loc_pairs, order, seed,
        cfg, with_k1=bool(cfg.estimate_distortion),
    )
    result["cameras"] = Cameras(
        R=R_ba,
        f=f_ba,
        cx=jnp.asarray(cx),
        cy=jnp.asarray(cy),
        k1=k1_ba,
    )
    result["final_cost"] = float(cost)
    return result
