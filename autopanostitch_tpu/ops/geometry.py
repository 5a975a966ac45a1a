"""Core projective / rotation geometry, pure jnp and fully vmappable.

TPU-native rethink of the reference's estimator internals:
- homography DLT with Hartley normalization
  (reference: `imageMatching/estimateTransformationRANSAC.m:188-225,579-610`)
- affine / similarity / rigid / translation minimal solvers
  (reference: `estimateTransformationRANSAC.m:227-439`)
- SO(3) exp/log and projection (reference: `bundleAdjustmentRKf.m` projectToSO3)
- symmetric transfer error (reference: `estimateTransformationRANSAC.m:473-481`)

Conventions (differ from the reference deliberately):
- 0-based pixel coordinates, pixel centers at integers; principal point of a
  WxH image is ((W-1)/2, (H-1)/2).
- Homographies act on column vectors: x' ~ H @ [x, y, 1]^T  (the reference
  uses MATLAB row-vector form x' = x * T; our H equals the transpose of the
  reference's T).
- Everything is float32 and shape-static; validity is carried by weight/mask
  arguments so all solvers can run under vmap / scan with padded data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12

# TPU matmuls default to bf16; geometry must be exact f32.
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Homogeneous point helpers
# ---------------------------------------------------------------------------

def to_homogeneous(pts: Array) -> Array:
    """(..., 2) -> (..., 3) by appending ones."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def from_homogeneous(pts: Array, eps: float = 1e-8) -> Array:
    """(..., 3) -> (..., 2) with guarded divide (w ~ 0 -> large finite)."""
    w = pts[..., 2:3]
    w_safe = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    return pts[..., :2] / w_safe


def homography_apply(H: Array, pts: Array) -> Array:
    """Apply a 3x3 homography to (..., 2) points.

    Mirrors `imageProcessing/transformPointsForwardScratch.m:57-78` (with the
    transposed convention: H @ x_col).
    """
    ph = to_homogeneous(pts)
    out = jnp.einsum("ij,...j->...i", H, ph, precision=_HI)
    return from_homogeneous(out)


def inv3x3(H: Array) -> Array:
    """Closed-form adjugate 3x3 inverse — elementwise, batched-friendly
    (TPU has no fast tiny-matrix LU; jnp.linalg.inv on (B,3,3) serializes)."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det_safe = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det_safe[..., None, None]


def homography_inverse(H: Array) -> Array:
    """Guarded 3x3 inverse, normalized so H[2,2] == 1 when possible."""
    Hi = inv3x3(H)
    d = Hi[..., 2, 2]
    scale = jnp.where(jnp.abs(d) > 1e-10, d, 1.0)
    return Hi / scale[..., None, None]


# ---------------------------------------------------------------------------
# Hartley normalization (estimateTransformationRANSAC.m:579-610)
# ---------------------------------------------------------------------------

def hartley_normalize(pts: Array, w: Array):
    """Weighted Hartley normalization.

    Args:
      pts: (M, 2) points.
      w:   (M,) nonnegative weights (0 masks a row out).

    Returns:
      (normalized_pts, T) with T the 3x3 transform such that
      normalized = T @ [pts; 1].
    """
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
    mean_d = jnp.sum(d * w) / wsum
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-8)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], pts.dtype)
    T = T.at[0, 0].set(scale).at[1, 1].set(scale)
    T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
    normalized = (pts - mean) * scale
    return normalized, T


# ---------------------------------------------------------------------------
# Minimal / weighted solvers
# ---------------------------------------------------------------------------

def fit_homography_dlt(src: Array, dst: Array, w: Array) -> Array:
    """Weighted normalized-DLT homography fit (src -> dst).

    Works for the 4-point minimal case and the overdetermined weighted case
    (RANSAC refit / IRLS). The reference's minimal solver is
    `estimateTransformationRANSAC.m:188-225`.

    Solves the smallest eigenvector of A^T A (9x9 eigh — much friendlier to
    batched TPU execution than an (2M x 9) SVD).

    Args:
      src, dst: (M, 2); w: (M,) weights, zero rows are ignored.

    Returns:
      3x3 H with H[2,2] normalized to 1 (column-vector convention).
    """
    sn, Ts = hartley_normalize(src, w)
    dn, Td = hartley_normalize(dst, w)
    x, y = sn[:, 0], sn[:, 1]
    u, v = dn[:, 0], dn[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # rows for u: [-x -y -1 0 0 0 u*x u*y u]
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    # rows for v: [0 0 0 -x -y -1 v*x v*y v]
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    sw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None]
    A = jnp.concatenate([r1 * sw, r2 * sw], axis=0)  # (2M, 9)
    AtA = jnp.matmul(A.T, A, precision=_HI)  # (9, 9)
    # smallest eigenvector
    evals, evecs = jnp.linalg.eigh(AtA)
    h = evecs[:, 0]
    Hn = h.reshape(3, 3)
    H = jnp.linalg.solve(Td, jnp.matmul(Hn, Ts, precision=_HI))
    d = H[2, 2]
    scale = jnp.where(jnp.abs(d) > 1e-10, d, 1.0)
    return H / scale


def chol_solve_small(A: Array, b: Array) -> Array:
    """Solve SPD `A x = b` for SMALL static n via a fully UNROLLED
    Cholesky — scalar ops only, so under vmap everything batches as
    elementwise work with a dependency chain of O(n).

    TPU linalg primitives loop: at the RANSAC hypothesis scale (~100k
    batched 8x8 systems) `cho_factor`+`cho_solve` measured 107 ms where
    this unrolled form takes 26 ms — and the clamped pivot keeps
    near-degenerate minimal sets finite (cho_factor emitted NaNs on
    them; downstream validity checks filter the garbage models either
    way)."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        s = A[..., i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        Lii = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[i][i] = Lii
        for j in range(i + 1, n):
            t = A[..., j, i]
            for k in range(i):
                t = t - L[j][k] * L[i][k]
            L[j][i] = t / Lii
    y = [None] * n
    for i in range(n):
        t = b[..., i]
        for k in range(i):
            t = t - L[i][k] * y[k]
        y[i] = t / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[k][i] * x[k]
        x[i] = t / L[i][i]
    return jnp.stack(x, axis=-1)


def fit_homography_4pt(src: Array, dst: Array, w: Array) -> Array:
    """Fast minimal-case homography for RANSAC hypothesis generation.

    Fixes h33 = 1 and solves the 8x8 linear system with Hartley-normalized
    coordinates — batched LU is orders of magnitude cheaper on TPU than the
    9x9 eigh nullspace of :func:`fit_homography_dlt`. The h33 ~ 0 degenerate
    family simply scores badly in RANSAC and is filtered there.

    The weight argument is accepted for interface compatibility (minimal
    sets are always fully weighted).
    """
    del w
    sn, Ts = hartley_normalize(src, jnp.ones(src.shape[0], src.dtype))
    dn, Td = hartley_normalize(dst, jnp.ones(dst.shape[0], dst.dtype))
    x, y = sn[:, 0], sn[:, 1]
    u, v = dn[:, 0], dn[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (8, 8) for the 4-pt case
    b = jnp.concatenate([u, v], axis=0)
    # normal equations + regularization keep it batched-Cholesky friendly
    AtA = jnp.matmul(A.T, A, precision=_HI) + 1e-8 * jnp.eye(8, dtype=src.dtype)
    Atb = jnp.matmul(A.T, b, precision=_HI)
    h = chol_solve_small(AtA, Atb)
    Hn = jnp.concatenate([h, jnp.ones((1,), src.dtype)]).reshape(3, 3)
    H = jnp.matmul(inv3x3(Td), jnp.matmul(Hn, Ts, precision=_HI), precision=_HI)
    d = H[2, 2]
    scale = jnp.where(jnp.abs(d) > 1e-10, d, 1.0)
    return H / scale


def fit_affine(src: Array, dst: Array, w: Array) -> Array:
    """Weighted affine fit (reference `estimateTransformationRANSAC.m:227-287`).

    Returns a 3x3 matrix with last row [0 0 1].
    """
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    ms = jnp.sum(src * w[:, None], axis=0) / wsum
    md = jnp.sum(dst * w[:, None], axis=0) / wsum
    sc = (src - ms) * w[:, None]
    dc = dst - md
    # Solve A @ sc^T = dc^T in least squares: A = (dc^T W sc) (sc^T W sc)^-1
    Sxx = jnp.matmul(sc.T, src - ms, precision=_HI)  # (2,2)
    Sxy = jnp.matmul(sc.T, dc, precision=_HI)  # (2,2)
    Sxx = Sxx + 1e-8 * jnp.eye(2, dtype=src.dtype)
    A = jnp.linalg.solve(Sxx, Sxy).T  # (2,2)
    t = md - jnp.matmul(A, ms, precision=_HI)
    H = jnp.eye(3, dtype=src.dtype)
    H = H.at[:2, :2].set(A).at[:2, 2].set(t)
    return H


def fit_similarity(src: Array, dst: Array, w: Array) -> Array:
    """Weighted similarity (Procrustes) fit.

    Reference `estimateTransformationRANSAC.m:289-349`.
    """
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    ms = jnp.sum(src * w[:, None], axis=0) / wsum
    md = jnp.sum(dst * w[:, None], axis=0) / wsum
    sc = src - ms
    dc = dst - md
    # cross-covariance
    C = jnp.matmul((dc * w[:, None]).T, sc, precision=_HI)  # (2,2)
    # closed-form 2D similarity: a = (C00 + C11), b = (C10 - C01)
    a = C[0, 0] + C[1, 1]
    b = C[1, 0] - C[0, 1]
    denom = jnp.maximum(jnp.sum(w[:, None] * sc * sc), _EPS)
    sa = a / denom
    sb = b / denom
    A = jnp.array([[1.0, 0.0], [0.0, 1.0]], src.dtype)
    A = A.at[0, 0].set(sa).at[0, 1].set(-sb)
    A = A.at[1, 0].set(sb).at[1, 1].set(sa)
    t = md - jnp.matmul(A, ms, precision=_HI)
    H = jnp.eye(3, dtype=src.dtype)
    H = H.at[:2, :2].set(A).at[:2, 2].set(t)
    return H


def fit_rigid(src: Array, dst: Array, w: Array) -> Array:
    """Weighted rigid (rotation+translation) fit.

    Reference `estimateTransformationRANSAC.m:351-408`.
    """
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    ms = jnp.sum(src * w[:, None], axis=0) / wsum
    md = jnp.sum(dst * w[:, None], axis=0) / wsum
    sc = src - ms
    dc = dst - md
    C = jnp.matmul((dc * w[:, None]).T, sc, precision=_HI)
    a = C[0, 0] + C[1, 1]
    b = C[1, 0] - C[0, 1]
    n = jnp.sqrt(jnp.maximum(a * a + b * b, _EPS))
    ca, sb_ = a / n, b / n
    A = jnp.array([[1.0, 0.0], [0.0, 1.0]], src.dtype)
    A = A.at[0, 0].set(ca).at[0, 1].set(-sb_)
    A = A.at[1, 0].set(sb_).at[1, 1].set(ca)
    t = md - jnp.matmul(A, ms, precision=_HI)
    H = jnp.eye(3, dtype=src.dtype)
    H = H.at[:2, :2].set(A).at[:2, 2].set(t)
    return H


def _weighted_median(vals: Array, w: Array) -> Array:
    """Weighted median: smallest v with cumulative weight >= half the total.

    Reduces to the lower median for uniform weights; zero-weight entries
    (RANSAC outliers) are ignored. jit-safe (sort + searchsorted)."""
    order = jnp.argsort(vals)
    v = vals[order]
    c = jnp.cumsum(w[order])
    idx = jnp.searchsorted(c, 0.5 * c[-1])
    return v[jnp.clip(idx, 0, vals.shape[0] - 1)]


def fit_translation(src: Array, dst: Array, w: Array) -> Array:
    """Weighted-median translation fit (reference
    `estimateTransformationRANSAC.m:410-439` uses the per-axis median of the
    inlier displacements; the weighted median reproduces that for 0/1 inlier
    masks and stays outlier-robust under IRLS weights)."""
    d = dst - src
    tx = _weighted_median(d[:, 0], w)
    ty = _weighted_median(d[:, 1], w)
    H = jnp.eye(3, dtype=src.dtype)
    return H.at[:2, 2].set(jnp.stack([tx, ty]))


# ---------------------------------------------------------------------------
# Residuals
# ---------------------------------------------------------------------------

def transfer_error(H: Array, src: Array, dst: Array) -> Array:
    """Forward transfer error |H(src) - dst| per point, (M,)."""
    pred = homography_apply(H, src)
    return jnp.sqrt(jnp.sum((pred - dst) ** 2, axis=-1))


def symmetric_transfer_error(H: Array, src: Array, dst: Array) -> Array:
    """Symmetric transfer error (reference `estimateTransformationRANSAC.m:473-481`).

    Returns per-point error = 0.5 * (|H src - dst| + |H^-1 dst - src|).
    """
    Hi = homography_inverse(H)
    e_fwd = transfer_error(H, src, dst)
    e_bwd = transfer_error(Hi, dst, src)
    return 0.5 * (e_fwd + e_bwd)


def homography_is_valid(H: Array) -> Array:
    """Model validation: finite entries, non-degenerate (reference
    `estimateTransformationRANSAC.m:518-574` uses rcond/det + SV ratio).

    SVD-free (tiny batched SVDs serialize on TPU): the condition number is
    bounded via  cond(H) <= ||H||_F * ||H^-1||_F  and
    ||H^-1||_F = ||adj(H)||_F / |det| — all elementwise."""
    finite = jnp.all(jnp.isfinite(H), axis=(-2, -1))
    det2 = H[..., 0, 0] * H[..., 1, 1] - H[..., 0, 1] * H[..., 1, 0]
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    det3 = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    adj_fro2 = (
        (e * i - f * h) ** 2 + (b * i - c * h) ** 2 + (b * f - c * e) ** 2
        + (d * i - f * g) ** 2 + (a * i - c * g) ** 2 + (a * f - c * d) ** 2
        + (d * h - e * g) ** 2 + (a * h - b * g) ** 2 + (a * e - b * d) ** 2
    )
    fro2 = jnp.sum(H * H, axis=(-2, -1))
    cond_bound = jnp.sqrt(fro2 * adj_fro2) / jnp.maximum(jnp.abs(det3), _EPS)
    return finite & (jnp.abs(det2) > 1e-9) & (jnp.abs(det3) > 1e-12) & (cond_bound < 3e7)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def hat(w: Array) -> Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: Array) -> Array:
    """Rodrigues exponential map, (..., 3) -> (..., 3, 3). Stable near 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    # stable sin(t)/t and (1-cos t)/t^2 via guarded formulas
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = hat(w)
    W2 = jnp.matmul(W, W, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: Array) -> Array:
    """Logarithm map, (..., 3, 3) -> (..., 3).

    Stable over the whole angle range: the standard antisymmetric-part
    formula degenerates as theta -> pi (sin theta -> 0 while the axis stays
    defined), so near pi the axis is recovered from the symmetric part
    (R + R^T)/2 = cos(t) I + (1 - cos t) aa^T instead, with signs fixed
    from the largest-magnitude axis component and the antisymmetric part.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )  # = 2 sin(theta) * axis
    sin_t = jnp.sin(theta)
    # theta / (2 sin theta), -> 1/2 as theta -> 0
    scale = jnp.where(
        jnp.abs(sin_t) < 1e-6, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_t + _EPS)
    )
    w_std = v * scale[..., None]

    # --- near-pi branch: axis^2 from the symmetric part's diagonal ---
    one_m_c = jnp.maximum(1.0 - cos_t, 1e-12)[..., None]
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    a = jnp.sqrt(jnp.maximum((diag - cos_t[..., None]) / one_m_c, 0.0))
    # signs relative to the largest component k: sign(a_i) = sign(S_ik)
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    k = jnp.argmax(a, axis=-1)
    Sk = jnp.take_along_axis(S, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    sign_i = jnp.where(Sk >= 0.0, 1.0, -1.0)
    # pin a_k's own sign to + (S_kk = cos t + (1 - cos t) a_k^2 can be
    # negative near pi, which would wrongly flip the reference component);
    # for i != k the off-diagonal S_ik = (1-cos t) a_i a_k carries a_i's sign
    onehot_k = jnp.arange(3) == k[..., None]
    sign_i = jnp.where(onehot_k, 1.0, sign_i)
    a = a * sign_i
    # overall +-a ambiguity at exactly pi; otherwise match the antisymmetric
    # part (v = 2 sin(t) a with sin t >= 0 for t in [0, pi])
    flip = jnp.sum(a * v, axis=-1) < 0.0
    a = jnp.where(flip[..., None], -a, a)
    w_pi = a * theta[..., None]

    near_pi = (cos_t < -0.99)[..., None]
    return jnp.where(near_pi, w_pi, w_std)


def project_to_so3(M: Array) -> Array:
    """Nearest rotation by SVD with det correction (reference projectToSO3,
    `bundleAdjustmentRKf.m`)."""
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.linalg.det(U @ Vt)
    S = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape).copy()
    S = S.at[..., 2, 2].set(d)
    return jnp.matmul(jnp.matmul(U, S, precision=_HI), Vt, precision=_HI)


def rotation_angle_deg(R: Array) -> Array:
    """Rotation angle in degrees, (..., 3, 3) -> (...)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos_t))


# ---------------------------------------------------------------------------
# Intrinsics
# ---------------------------------------------------------------------------

def build_K(f: Array, cx: Array, cy: Array) -> Array:
    """K = [[f,0,cx],[0,f,cy],[0,0,1]] — broadcasts over leading dims.

    Reference `initializeCameraMatrices.m:313-319` (principal point at image
    center)."""
    f, cx, cy = jnp.broadcast_arrays(
        jnp.asarray(f, jnp.float32), jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32)
    )
    zero = jnp.zeros_like(f)
    one = jnp.ones_like(f)
    K = jnp.stack(
        [
            jnp.stack([f, zero, cx], axis=-1),
            jnp.stack([zero, f, cy], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return K


def invert_K(K: Array) -> Array:
    """Closed-form inverse of an fx=fy pinhole K (broadcasts)."""
    f = K[..., 0, 0]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    inv_f = 1.0 / f
    zero = jnp.zeros_like(f)
    one = jnp.ones_like(f)
    return jnp.stack(
        [
            jnp.stack([inv_f, zero, -cx * inv_f], axis=-1),
            jnp.stack([zero, inv_f, -cy * inv_f], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
