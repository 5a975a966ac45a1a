"""Batched fixed-iteration RANSAC / MSAC geometric verification.

TPU-native redesign of the reference's sequential estimators:
- `imageMatching/estimateTransformationRANSAC.m` (classic RANSAC, adaptive
  trial count `:124-131`, minimal solvers `:188-439`, symmetric transfer
  error `:473-481`, degeneracy checks `:518-574`, inlier refit `:146-181`)
- `imageMatching/estimateTransformationMLESAC.m` (Torr-Zisserman MSAC with
  truncated loss `:258-295`)

Instead of a data-dependent sequential loop, we draw B hypotheses at once
(weighted Gumbel top-k sampling of minimal sets under the validity mask),
vmap the minimal solver and scoring over the hypothesis axis, select the
best by inlier count (RANSAC) or truncated loss (MSAC), then refit with a
few IRLS weighted-DLT passes on the winning inlier set. Everything is
shape-static, so the whole verification of P image pairs vmaps/scans
cleanly across pairs and shards across chips.

The trial budget is wired to the reference's knobs: the total number of
hypotheses drawn is `min(max_iter, N(confidence))` where N(confidence) is
the classic RANSAC trial-count formula `log(1-p) / log(1-w^s)` evaluated at
the DESIGN inlier ratio w = 0.3 (`estimateTransformationRANSAC.m:124-131`
updates the same formula adaptively as inliers are found; a batched drawer
fixes w at the worst-case design point instead). Hypotheses are evaluated
in sub-batches of `batch` with a running best, so memory stays O(batch x M)
regardless of the budget.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from autopanostitch_tpu.ops import geometry as geo

Array = jax.Array

# (minimal-case fitter, weighted refit fitter, minimal point count).
# The projective minimal case uses the fast 8x8-solve form; the refit uses
# the stabler eigh DLT (only B-independent, so its cost is negligible).
_MODEL_FITTERS = {
    "projective": (geo.fit_homography_4pt, geo.fit_homography_dlt, 4),
    "affine": (geo.fit_affine, geo.fit_affine, 3),
    "similarity": (geo.fit_similarity, geo.fit_similarity, 2),
    "rigid": (geo.fit_rigid, geo.fit_rigid, 2),
    "translation": (geo.fit_translation, geo.fit_translation, 1),
}


_DESIGN_INLIER_RATIO = 0.3  # worst-case design point for the trial budget


def _bucket_1p5(x: int) -> int:
    """Round up onto the {1, 1.5} x 2^k grid (64, 96, 128, 192, 256, ...):
    bounded executable-shape variety with <= 33% padding waste."""
    import math

    x = max(int(x), 1)
    k = max(0, math.floor(math.log2(x)))
    for cand in (1 << k, 3 << (k - 1) if k >= 1 else 2, 1 << (k + 1)):
        if cand >= x:
            return cand
    return 1 << (k + 2)


def _bucket_1p5_floor(x: int) -> int:
    """Largest {1, 1.5} x 2^k grid point <= x."""
    b = _bucket_1p5(x)
    while b > max(int(x), 1):
        b = b * 2 // 3 if b % 3 == 0 else b * 3 // 4
    return max(b, 1)


def model_min_pts(model: str) -> int:
    """Minimal correspondences for the model (`imageMatching.m:37-39`)."""
    return _MODEL_FITTERS[model][2]


def num_trials(confidence: float, model: str, max_iter: int) -> int:
    """Hypothesis budget from the reference's two knobs (`inputs.m:68,72`).

    `ceil(log(1-p) / log(1-w^s))` at the design inlier ratio, HARD-capped
    at max_iter (`estimateTransformationRANSAC.m:124-131`); rounded up to
    a multiple of 64 for tiling only when that stays within the cap —
    max_iter is advertised as a cost bound and must never be exceeded.
    """
    s = model_min_pts(model)
    if confidence >= 100.0:
        n_conf = max_iter
    else:
        import math

        n_conf = math.ceil(
            math.log(max(1.0 - confidence / 100.0, 1e-12))
            / math.log(1.0 - _DESIGN_INLIER_RATIO**s)
        )
    total = max(1, min(int(max_iter), int(n_conf)))
    rounded = ((total + 63) // 64) * 64
    return rounded if rounded <= max_iter else total


def num_trials_observed(
    confidence: float, model: str, w, max_iter: int
):
    """Adaptive trial count from the OBSERVED inlier ratio, vectorized.

    The reference updates `log(1-p)/log(1-w^s)` as better models are found
    (`estimateTransformationRANSAC.m:124-131` via computeLoopNumber,
    `estimateTransformationMLESAC.m:179-211`); the batched two-phase
    verifier uses the same formula on the first-phase inlier ratio to
    decide which pairs need the remaining hypothesis budget."""
    s = model_min_pts(model)
    if confidence >= 100.0:
        return np.full(np.shape(w), max_iter, np.int64)
    w = np.clip(np.asarray(w, np.float64), 0.0, 0.9999)
    denom = np.log1p(-np.minimum(w**s, 1 - 1e-12))
    num = np.log(max(1.0 - confidence / 100.0, 1e-12))
    with np.errstate(divide="ignore"):
        needed = np.where(denom < 0, np.ceil(num / denom), np.inf)
    return np.minimum(needed, max_iter).astype(np.int64)


class RansacResult(NamedTuple):
    H: Array  # (3, 3) best model (src -> dst)
    inliers: Array  # (M,) bool
    num_inliers: Array  # () int32
    num_putative: Array  # () int32, valid matches given to the estimator
    success: Array  # () bool — found a valid model with >= min_pts inliers
    # pre-refit running best, for CONTINUING the hypothesis stream in the
    # adaptive second phase (see verify_pairs): feeding these back via
    # init_* reproduces a single longer run exactly
    raw_cost: Array  # () f32 — best hypothesis score (-inliers | msac)
    raw_H: Array  # (3, 3)
    raw_inliers: Array  # (M,) bool


def _sample_minimal_sets(key: Array, mask: Array, batch: int, min_pts: int) -> Array:
    """(batch, min_pts) index sets sampled w/o replacement from valid rows.

    Gumbel top-k trick: iid Gumbel noise + log(mask) then top_k — exact
    uniform sampling without replacement, fully parallel over hypotheses.
    """
    M = mask.shape[0]
    g = jax.random.gumbel(key, (batch, M))
    logp = jnp.where(mask, 0.0, -jnp.inf)
    _, idx = jax.lax.top_k(g + logp[None, :], min_pts)
    return idx


def _minimal_set_degenerate(pts: Array, tol: float = 1.0) -> Array:
    """(B,) bool: minimal sets whose geometry cannot constrain the model
    (reference `estimateTransformationRANSAC.m:537-574` rejects samples by
    SV-ratio/collinearity before solving; here the check is vectorized over
    the hypothesis batch).

    p==2: the two points (nearly) coincide. p>=3: some triple is (nearly)
    collinear — any point within `tol` px of the line through two others.
    Coincident points degenerate every triple they join, so they are caught
    by the same test."""
    p = pts.shape[1]
    if p <= 1:
        return jnp.zeros(pts.shape[0], bool)
    if p == 2:
        return jnp.linalg.norm(pts[:, 0] - pts[:, 1], axis=-1) < tol
    from itertools import combinations

    degen = jnp.zeros(pts.shape[0], bool)
    for a, b, c in combinations(range(p), 3):
        v1 = pts[:, b] - pts[:, a]
        v2 = pts[:, c] - pts[:, a]
        area = jnp.abs(v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0])
        base = jnp.linalg.norm(v1, axis=-1)
        # area = |v1| * dist(c, line ab); dist < tol => degenerate
        degen |= area < tol * jnp.maximum(base, 1e-6)
    return degen


def _score(err: Array, mask: Array, threshold: float, method: str):
    """Per-hypothesis score from per-match errors (B, M).

    RANSAC: maximize inlier count (minimize -count).
    MSAC:   minimize sum of truncated squared losses
            (reference `estimateTransformationMLESAC.m:258-295` truncates the
            per-point distance at the threshold).
    """
    inl = (err < threshold) & mask[None, :]
    n_inl = jnp.sum(inl, axis=-1)
    if method == "ransac":
        cost = -n_inl.astype(jnp.float32)
    else:  # msac / mlesac
        e2 = jnp.minimum(err * err, threshold * threshold)
        cost = jnp.sum(jnp.where(mask[None, :], e2, 0.0), axis=-1)
    return cost, inl, n_inl


@partial(
    jax.jit,
    static_argnames=("model", "method", "batch", "irls_iters", "total",
                     "start"),
)
def ransac_fit(
    src: Array,
    dst: Array,
    mask: Array,
    key: Array,
    threshold: float = 5.5,
    model: str = "projective",
    method: str = "ransac",
    batch: int = 512,
    irls_iters: int = 3,
    total: int | None = None,
    start: int = 0,
    init_cost: Array | None = None,
    init_H: Array | None = None,
    init_inliers: Array | None = None,
) -> RansacResult:
    """Estimate a transform src -> dst robust to outliers.

    Args:
      src, dst: (M, 2) padded correspondence arrays.
      mask: (M,) validity of each correspondence.
      key: PRNG key. threshold: inlier distance in px (`inputs.m:69`).
      model: 'projective' | 'affine' | 'similarity' | 'rigid' | 'translation'.
      method: 'ransac' | 'mlesac' (MSAC truncated-loss scoring).
      batch: hypotheses evaluated in parallel per sub-batch (memory knob).
      irls_iters: Huber-IRLS refit passes on the winning inlier set.
      total: total hypothesis budget (see :func:`num_trials`); defaults to
        `batch`. Budgets above `batch` run as a scan of sub-batches with a
        running best, bounding the error tensor at (batch, M).
      start: index of the first sub-batch in the notional key stream
        `jax.random.split(key, start + nsub)` — threefry splits are
        prefix-stable, so a phase-A run (start=0) followed by a phase-B run
        (start=nsub_A, init_*=phase A's raw best) draws EXACTLY the same
        hypotheses as one longer run.
      init_cost/init_H/init_inliers: pre-refit running best carried in from
        an earlier phase (None = fresh start).

    Returns RansacResult. All shapes static — safe under vmap over pairs.
    """
    fit_min, fit_refit, min_pts = _MODEL_FITTERS[model]
    M = src.shape[0]
    n_valid = jnp.sum(mask.astype(jnp.int32))
    if total is None:
        total = batch
    nsub = max(1, (total + batch - 1) // batch)
    sub = min(batch, total)

    def eval_chunk(key_t):
        idx = _sample_minimal_sets(key_t, mask, sub, min_pts)  # (B, p)
        src_min = src[idx]  # (B, p, 2)
        dst_min = dst[idx]
        ones = jnp.ones((sub, min_pts), src.dtype)
        Hs = jax.vmap(fit_min)(src_min, dst_min, ones)  # (B, 3, 3)
        err = jax.vmap(lambda H: geo.symmetric_transfer_error(H, src, dst))(Hs)
        err = jnp.where(jnp.isfinite(err), err, jnp.float32(1e9))
        cost, inl, n_inl = _score(err, mask, threshold, method)
        valid_model = jax.vmap(geo.homography_is_valid)(Hs)
        degen = _minimal_set_degenerate(src_min) | _minimal_set_degenerate(dst_min)
        cost = jnp.where(valid_model & ~degen, cost, jnp.float32(1e30))
        best = jnp.argmin(cost)
        return cost[best], Hs[best], inl[best], n_inl[best]

    if init_H is None:
        init = (
            jnp.float32(jnp.inf),
            jnp.eye(3, dtype=src.dtype),
            jnp.zeros((M,), bool),
            jnp.int32(0),
        )
    else:
        init = (
            init_cost.astype(jnp.float32),
            init_H.astype(src.dtype),
            init_inliers.astype(bool),
            jnp.sum((init_inliers & mask).astype(jnp.int32)),
        )

    def step(carry, key_t):
        c, H, i, n = carry
        c2, H2, i2, n2 = eval_chunk(key_t)
        better = c2 < c
        return (
            jnp.where(better, c2, c),
            jnp.where(better, H2, H),
            jnp.where(better, i2, i),
            jnp.where(better, n2, n),
        ), None

    keys = jax.random.split(key, start + nsub)[start:]
    (cost_best, H0, inl0, n_best), _ = jax.lax.scan(step, init, keys)

    # --- IRLS refit on inliers (replaces the reference's single LS refit,
    # `estimateTransformationRANSAC.m:146-181`) ---
    def irls_step(carry, _):
        H, w = carry
        H_new = fit_refit(src, dst, w)
        e = geo.symmetric_transfer_error(H_new, src, dst)
        # Huber-style weights within the inlier band, hard cut at threshold
        w_new = jnp.where((e < threshold) & mask, 1.0 / jnp.maximum(e / threshold, 0.5), 0.0)
        return (H_new, w_new), None

    w0 = inl0.astype(src.dtype)
    (H_ref, _), _ = jax.lax.scan(irls_step, (H0, w0), None, length=irls_iters)

    # keep the refit only if it did not lose inliers
    e_ref = geo.symmetric_transfer_error(H_ref, src, dst)
    inl_ref = (e_ref < threshold) & mask & jnp.isfinite(e_ref)
    n_ref = jnp.sum(inl_ref)
    use_ref = (n_ref >= n_best) & geo.homography_is_valid(H_ref)
    H_final = jnp.where(use_ref, H_ref, H0)
    inl_final = jnp.where(use_ref, inl_ref, inl0)
    n_final = jnp.sum(inl_final.astype(jnp.int32))

    success = (n_final >= min_pts) & (n_valid >= min_pts) & geo.homography_is_valid(H_final)
    H_final = jnp.where(success, H_final, jnp.eye(3, dtype=src.dtype))
    return RansacResult(
        H_final, inl_final & success, n_final * success, n_valid, success,
        cost_best, H0, inl0,
    )


@partial(
    jax.jit,
    static_argnames=("model", "method", "batch", "total", "start"),
)
def _verify_chunk(
    pair_src: Array,  # (nchunks, chunk, M, 2) — FULL pre-chunked stack
    pair_dst: Array,
    pair_mask: Array,
    keys: Array,
    c: Array,  # () int32 chunk index — traced, so ONE executable serves
    # every chunk AND the inputs upload once (a per-chunk host slice paid
    # one host->device transfer per dispatch: ~0.2 s/chunk on the relay)
    threshold,
    accept_alpha,
    accept_beta,
    small_min,
    small_ratio,
    model: str = "projective",
    method: str = "ransac",
    batch: int = 512,
    total: int | None = None,
    start: int = 0,
    init_cost: Array | None = None,  # (nchunks, chunk) when phase B
    init_H: Array | None = None,
    init_inliers: Array | None = None,
):
    """One fixed-size chunk of pair verifications (vmapped ransac_fit)."""
    take = lambda x: jax.lax.dynamic_index_in_dim(x, c, 0, keepdims=False)
    ps, pd_, pm, ks = take(pair_src), take(pair_dst), take(pair_mask), take(keys)
    one = partial(
        ransac_fit, threshold=threshold, model=model, method=method, batch=batch,
        total=total, start=start,
    )
    if init_H is None:
        res = jax.vmap(one)(ps, pd_, pm, ks)
    else:
        res = jax.vmap(
            lambda s, d, m, k, c0, h0, i0: one(
                s, d, m, k, init_cost=c0, init_H=h0, init_inliers=i0
            )
        )(ps, pd_, pm, ks, take(init_cost), take(init_H), take(init_inliers))
    # Brown-Lowe linear rule, plus the small-sample perfect-consensus
    # branch (see config.ImageMatchConfig.accept_small_min): near-unanimous
    # consensus on a tiny putative set is overwhelming evidence the linear
    # rule's +alpha intercept cannot credit. small_min = +inf disables.
    accepted = res.success & (
        (res.num_inliers > accept_alpha + accept_beta * res.num_putative)
        | (
            (res.num_inliers >= small_min)
            & (res.num_inliers >= small_ratio * res.num_putative)
        )
    )
    H_inv = jax.vmap(geo.homography_inverse)(res.H)
    return {
        "H": res.H,
        "H_inv": H_inv,
        "inliers": res.inliers,
        "num_inliers": res.num_inliers,
        "num_putative": res.num_putative,
        "accepted": accepted,
        "raw_cost": res.raw_cost,
        "raw_H": res.raw_H,
        "raw_inliers": res.raw_inliers,
    }


def verify_pairs(
    pair_src: Array,
    pair_dst: Array,
    pair_mask: Array,
    keys: Array,
    threshold: float = 5.5,
    model: str = "projective",
    method: str = "ransac",
    batch: int = 512,
    accept_alpha: float = 8.0,
    accept_beta: float = 0.3,
    accept_small_min: float | None = None,
    accept_small_ratio: float = 0.9,
    chunk: int | None = None,
    total: int | None = None,
    adaptive_first: int | None = None,
    confidence: float = 99.9,
):
    """Verify P candidate pairs with batched RANSAC + Brown-Lowe acceptance.

    The probabilistic acceptance `ni > alpha + beta * nf`
    (reference `imageMatching.m:150`, constants `:38-42`), optionally
    OR-ed with the small-sample perfect-consensus branch
    `ni >= accept_small_min AND ni >= accept_small_ratio * nf`
    (see `config.ImageMatchConfig.accept_small_min`; None disables —
    exact reference behavior).

    Adaptive two-phase budget (the batched analog of the reference's
    adaptive trial count, `estimateTransformationRANSAC.m:124-131`): with
    `adaptive_first = F`, phase A spends F hypotheses on every pair, the
    observed inlier ratio feeds `num_trials_observed`, and only pairs whose
    adaptive requirement exceeds F get the remaining `total - F` budget in
    phase B. Phase B CONTINUES phase A's hypothesis stream (prefix-stable
    key split + carried running best), so an A+B pair sees exactly the same
    hypotheses as a single `total`-budget run with sub-batch size F. Easy
    pairs (high inlier ratio — the common case) stop at F; hopeless
    non-overlapping pairs burn the full budget, as in the reference.
    Host-input path only; traced/sharded callers run single-phase.

    Implementation note: the pair set is processed in fixed-size chunks by
    ONE jitted executable dispatched from a python loop (a lax.scan over
    chunks triggers an XLA:TPU memory-assignment CHECK crash at larger pair
    counts); per-chunk outputs stay on device and concatenate once.

    Args:
      pair_src, pair_dst: (P, M, 2); pair_mask: (P, M); keys: (P, 2) uint32.
      chunk: pairs per dispatch (bounds the (chunk, B, M) error tensor).

    Returns dict of stacked device arrays per pair:
      H (P,3,3), H_inv (P,3,3), inliers (P,M), num_inliers (P,),
      num_putative (P,), accepted (P,) bool.
    """
    P, M = pair_mask.shape
    if P == 0:
        # No candidate pairs (unrelated images, single-image sets): return
        # correctly-shaped empties instead of crashing on outs[0].
        zp = np if isinstance(pair_mask, np.ndarray) else jnp
        return {
            "H": zp.zeros((0, 3, 3), zp.float32),
            "H_inv": zp.zeros((0, 3, 3), zp.float32),
            "inliers": zp.zeros((0, M), bool),
            "num_inliers": zp.zeros((0,), zp.int32),
            "num_putative": zp.zeros((0,), zp.int32),
            "accepted": zp.zeros((0,), bool),
        }

    # Host (numpy) inputs pad/slice/stitch on host: the eager jnp forms
    # compiled ~10 tiny executables per fresh pair-count, each one a relay
    # AOT round-trip. Traced/device inputs (sharded paths call this inside
    # jit) keep the jnp forms — there it is all one executable anyway.
    if accept_small_min is not None:
        # Evidence counting (ADVICE r3): the minimal sample fits min_pts
        # inliers EXACTLY, RANSAC maximizes over hundreds of hypotheses,
        # and the IRLS refit can absorb borderline points — so only
        # ni - min_pts inliers are independent evidence. Require at least
        # min_pts + 5 so the perfect-consensus branch keeps a genuinely
        # small false-accept probability (e.g. projective: >= 9).
        accept_small_min = max(
            float(accept_small_min), model_min_pts(model) + 5.0
        )

    host = isinstance(pair_mask, np.ndarray)
    if host:
        keys = np.asarray(keys)
    if total is None:
        total = batch
    if chunk is None:
        # Auto chunk: the measured per-dispatch overhead on the relay
        # harness (~0.15-0.2 s, >> the ~0.03-0.3 s of chunk compute)
        # makes ONE dispatch optimal whenever the (chunk, B, M) scratch
        # fits; cap scratch at ~1.5 GB and round the chunk up on a
        # {1, 1.5} x 2^k grid so executable shapes stay bounded across
        # datasets (compute on the padded, all-masked pairs is cheap).
        per_pair = 12.0 * min(batch, total) * M  # err+gumbel+idx f32
        cap = max(32, int(1.5e9 / per_pair))
        # three wide rungs, then the {1,1.5} grid: small sets (a 6-view
        # ring, 15 pairs) share the 32-rung without paying a 256-pad
        # 17x compute tax, and every 33..192-pair sheet shares the
        # 192-rung (a 38- and a 35-photo sheet landed on 128 vs 192 with
        # plain {1,1.5} bucketing and each paid the ~30 s verify compile)
        if P <= 32:
            chunk_p = 32
        elif P <= 192:
            chunk_p = 192
        else:
            chunk_p = _bucket_1p5(P)
        chunk = min(chunk_p, _bucket_1p5_floor(cap))

    scalar_args = (
        np.float32(threshold), np.float32(accept_alpha),
        np.float32(accept_beta),
        np.float32(
            float("inf") if accept_small_min is None else accept_small_min
        ),
        np.float32(accept_small_ratio),
    )

    def run_chunks(ps, pd, pm, ks, sub_batch, tot, start=0, init=None):
        """Chunked _verify_chunk loop over a pair set.

        Inputs are padded to (nchunks, chunk, ...) and uploaded ONCE; each
        dispatch selects its chunk by a traced index on device (a host
        slice per chunk paid one relay transfer per dispatch — measured
        ~0.2 s/chunk vs ~0.03 s of actual compute). Outputs sync once at
        the end (they are small: the (P, M) inlier masks dominate)."""
        Pq = pm.shape[0]
        # do NOT clamp the chunk down to Pq: the floor-256 rung is what
        # lets small datasets share one executable (masked pad pairs)
        ch = max(1, chunk)
        nch = (Pq + ch - 1) // ch
        Ppad = nch * ch
        xp = np if host else jnp

        def prep(x):
            x = xp.pad(x, [(0, Ppad - Pq)] + [(0, 0)] * (x.ndim - 1))
            x = x.reshape((nch, ch) + x.shape[1:])
            return jnp.asarray(x) if host else x

        ps, pd, pm, ks = prep(ps), prep(pd), prep(pm), prep(ks)
        if init is not None:
            init = tuple(prep(x) for x in init)
        outs = []
        for c in range(nch):
            kw = {}
            if init is not None:
                kw = dict(init_cost=init[0], init_H=init[1],
                          init_inliers=init[2])
            outs.append(
                _verify_chunk(
                    ps, pd, pm, ks, np.int32(c), *scalar_args,
                    model=model, method=method, batch=sub_batch,
                    total=tot, start=start, **kw,
                )
            )
        if host:  # sync once; chunk dispatches stay pipelined
            return {
                k: np.concatenate([np.asarray(o[k]) for o in outs], axis=0)[:Pq]
                for k in outs[0]
            }
        return {
            k: jnp.concatenate([o[k] for o in outs], axis=0)[:Pq]
            for k in outs[0]
        }

    adaptive = (
        host
        and adaptive_first is not None
        and 0 < adaptive_first < total
    )
    if not adaptive:
        verify_pairs.last_stats = {
            "n_pairs": int(P), "total": int(total), "first": int(total),
            "n_continued": 0, "m_matches": int(M),
            "trials_spent": float(P * total),
        }
        out = run_chunks(pair_src, pair_dst, pair_mask, keys,
                         min(batch, total), total)
        for k in ("raw_cost", "raw_H", "raw_inliers"):
            out.pop(k)
        return out

    first = int(adaptive_first)
    out_a = run_chunks(pair_src, pair_dst, pair_mask, keys, first, first)
    w = out_a["num_inliers"] / np.maximum(out_a["num_putative"], 1)
    needed = num_trials_observed(confidence, model, w, total)
    cont = np.nonzero(needed > first)[0]
    verify_pairs.last_stats = {  # consumed by bench MFU accounting
        "n_pairs": int(P), "total": int(total), "first": first,
        "n_continued": int(len(cont)), "m_matches": int(M),
        "trials_spent": float(P * first + len(cont) * (total - first)),
    }
    if len(cont):
        init = (
            out_a["raw_cost"][cont],
            out_a["raw_H"][cont],
            out_a["raw_inliers"][cont],
        )
        out_b = run_chunks(
            pair_src[cont], pair_dst[cont], pair_mask[cont], keys[cont],
            first, total - first, start=1, init=init,
        )
        for k in out_a:
            out_a[k][cont] = out_b[k]
    for k in ("raw_cost", "raw_H", "raw_inliers"):
        out_a.pop(k)
    return out_a
