"""Two-view geometry: batched minimal solvers + TPU RANSAC + config decision.

Rebuilds COLMAP's ``TwoViewGeometry::Estimate`` as used by the reference's
matching kernel (/root/reference/integration/op_cpp/sequential_matching.cc:
84-101): RANSAC over F/E/H models, inlier classification, configuration enum,
and relative-pose (qvec/tvec, tri_angle) recovery — the fields the reference
serializes per pair (io.cc:237-246).

TPU-first design: instead of the sequential hypothesize-and-verify loop with
early exit, we draw a STATIC batch of S minimal samples, solve all hypotheses
with one vmapped linear solve, score all N correspondences against all S
hypotheses with one einsum, and pick the best — then refit on inliers
(one LO step). Static shapes, no data-dependent control flow, everything on
the MXU/VPU. Unlike the reference (defect: dummy cameras,
sequential_matching.cc:89), real intrinsics are used when available.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scanner_colmap_tpu.models import geometry as geom
from scanner_colmap_tpu.ops.linalg3 import inv33 as _inv33

# COLMAP TwoViewGeometry configuration enum (interchange-compatible)
UNDEFINED = 0
DEGENERATE = 1
CALIBRATED = 2
UNCALIBRATED = 3
PLANAR = 4
PANORAMIC = 5
PLANAR_OR_PANORAMIC = 6
WATERMARK = 7
MULTIPLE = 8


class TwoViewGeometry(NamedTuple):
    """Result for one pair, fixed-shape. Mirrors colmap::TwoViewGeometry."""
    config: jax.Array        # () int32
    E: jax.Array             # (3,3)
    F: jax.Array             # (3,3)
    H: jax.Array             # (3,3)
    qvec: jax.Array          # (4,) relative pose cam1->cam2
    tvec: jax.Array          # (3,)
    tri_angle: jax.Array     # () median triangulation angle (rad)
    inlier_mask: jax.Array   # (N,) bool over input matches
    num_inliers: jax.Array   # () int32


# ---------------------------------------------------------------------------
# Normalization + DLT solvers (all batch-friendly; shapes (..., K, 2))
# ---------------------------------------------------------------------------

def _normalize_points(pts: jax.Array, mask: jax.Array):
    """Hartley normalization: centroid 0, mean dist sqrt(2). Masked."""
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / n[..., None]
    d = jnp.linalg.norm(pts - mean, axis=-1)
    mean_d = jnp.sum(d * w, axis=-1, keepdims=True) / n
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-12)
    normed = (pts - mean) * scale[..., None]
    # T maps raw -> normalized homogeneous
    zeros = jnp.zeros_like(scale[..., 0])
    ones = jnp.ones_like(zeros)
    s = scale[..., 0]
    mx, my = mean[..., 0, 0], mean[..., 0, 1]
    T = jnp.stack([
        s, zeros, -s * mx,
        zeros, s, -s * my,
        zeros, zeros, ones,
    ], axis=-1).reshape(scale.shape[:-1] + (3, 3))
    return normed, T


def _smallest_eigvec(A: jax.Array):
    """Right null vector of A (..., m, n): eigenvector of A^T A with smallest
    eigenvalue. Uses eigh — exact but expensive in large batches on TPU
    (QR-iteration sweeps); RANSAC trial batches use _null_vec_fast."""
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    return V[..., :, 0]


def _null_vec_fast(A: jax.Array, iters: int = 2):
    """Approximate right null vector of A (..., m, n), m < n, with NO linear
    solves: modified Gram-Schmidt over the m sample rows (static unrolled
    loop of batched dot/axpy — pure VPU work), then the null direction as
    the largest column of the residual projector I - Q^T Q. Batched small
    LU/eigh factorizations serialize on the TPU's scalar unit and dominated
    two-view verification (~400 ms per 128x1024-trial RANSAC; this form is
    ~15x cheaper). Degenerate samples yield garbage hypotheses that MSAC
    scores out; refits use exact eigh."""
    m, n = A.shape[-2], A.shape[-1]
    rows = []
    for i in range(m):
        r = A[..., i, :]
        for q in rows:
            r = r - jnp.sum(r * q, -1, keepdims=True) * q
        r = r * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(r * r, -1, keepdims=True), 1e-30))
        rows.append(r)
    Q = jnp.stack(rows, -2)                                   # (..., m, n)
    P = (jnp.eye(n, dtype=A.dtype)
         - jnp.einsum("...ki,...kj->...ij", Q, Q))            # projector
    best = jnp.argmax(jnp.sum(P * P, axis=-2), axis=-1)
    v = jnp.einsum("...ij,...j->...i", P,
                   jax.nn.one_hot(best, n, dtype=A.dtype))
    for _ in range(max(iters - 1, 0)):
        # re-project: squeezes out Gram-Schmidt rounding in the row span
        v = v - jnp.einsum("...kj,...k->...j", Q,
                           jnp.einsum("...ki,...i->...k", Q, v))
    v = v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True),
                                      1e-30))
    return jnp.where(jnp.isfinite(v), v, 1.0 / (n ** 0.5))


def fundamental_8pt(x1: jax.Array, x2: jax.Array, mask: jax.Array | None = None,
                    exact: bool = True):
    """8-point fundamental matrix. x1, x2: (..., K>=8, 2); mask optional.

    Returns F (..., 3, 3), rank-2 enforced, unit norm, de-normalized.
    """
    if mask is None:
        mask = jnp.ones(x1.shape[:-1], bool)
    x1n, T1 = _normalize_points(x1, mask)
    x2n, T2 = _normalize_points(x2, mask)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    ones = jnp.ones_like(u1)
    # row per correspondence: x2^T F x1 = 0
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1)
    A = A * mask[..., None]
    f = _smallest_eigvec(A) if exact else _null_vec_fast(A)
    Fm = f.reshape(f.shape[:-1] + (3, 3))
    # rank-2 enforcement is LOAD-BEARING even for trial scoring: an
    # unconstrained 3x3 "F" has no epipolar geometry and its MSAC score can
    # beat every valid hypothesis (observed: registration collapse). Trials
    # use a closed-form projection; refits use exact SVD.
    Fm = enforce_rank2(Fm) if exact else _rank2_project_fast(Fm)
    Fm = jnp.swapaxes(T2, -1, -2) @ Fm @ T1
    norm = jnp.linalg.norm(Fm, axis=(-2, -1), keepdims=True)
    return Fm / jnp.maximum(norm, 1e-12)


def enforce_rank2(Fm: jax.Array) -> jax.Array:
    """Project (..., 3, 3) onto rank-2 by zeroing the smallest singular value."""
    U, S, Vt = jnp.linalg.svd(Fm)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., None] * Vt)


def _rank2_project_fast(F: jax.Array) -> jax.Array:
    """Approximate rank-2 projection of (..., 3, 3) without SVD: the smallest
    singular pair (u3, v3) via two closed-form inverse iterations (adjugate
    inv33) on F^T F and F F^T, then subtract sigma3 * u3 v3^T. Accurate when
    sigma3 << sigma2 (any usable hypothesis); degenerate samples produce bad
    models that MSAC scores out regardless."""

    def _smallest_vec(M):
        tr = jnp.einsum("...ii->...", M)[..., None, None]
        Minv = _inv33(M + (1e-6 * tr + 1e-25) * jnp.eye(3, dtype=M.dtype))
        v = jnp.sum(Minv, axis=-1)               # Minv @ ones
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
        v = jnp.einsum("...ij,...j->...i", Minv, v)
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)

    v3 = _smallest_vec(jnp.einsum("...ki,...kj->...ij", F, F))
    u3 = _smallest_vec(jnp.einsum("...ik,...jk->...ij", F, F))
    s3 = jnp.einsum("...i,...ij,...j->...", u3, F, v3)
    F2 = F - s3[..., None, None] * u3[..., :, None] * v3[..., None, :]
    return jnp.where(jnp.isfinite(F2), F2, 0.0)


def essential_8pt(x1n: jax.Array, x2n: jax.Array, mask: jax.Array | None = None,
                  exact: bool = True):
    """Essential matrix from >=8 K-normalized correspondences (z=1 plane
    coords). Enforces the (1,1,0) singular structure (exact path only; the
    RANSAC winner is re-constrained before pose recovery)."""
    E = fundamental_8pt(x1n, x2n, mask, exact=exact)
    if not exact:
        return E
    U, S, Vt = jnp.linalg.svd(E)
    s = 0.5 * (S[..., 0] + S[..., 1])
    Snew = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return U @ (Snew[..., None] * Vt)


def homography_dlt(x1: jax.Array, x2: jax.Array, mask: jax.Array | None = None,
                   exact: bool = True):
    """DLT homography from >=4 correspondences: x2 ~ H x1. (..., K, 2)."""
    if mask is None:
        mask = jnp.ones(x1.shape[:-1], bool)
    x1n, T1 = _normalize_points(x1, mask)
    x2n, T2 = _normalize_points(x2, mask)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    o = jnp.ones_like(u1)
    z = jnp.zeros_like(u1)
    r1 = jnp.stack([-u1, -v1, -o, z, z, z, u2 * u1, u2 * v1, u2], axis=-1)
    r2 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    A = jnp.concatenate([r1 * mask[..., None], r2 * mask[..., None]], axis=-2)
    h = _smallest_eigvec(A) if exact else _null_vec_fast(A)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    Hm = jnp.linalg.solve(T2, Hn @ T1)
    return Hm / jnp.maximum(jnp.abs(Hm[..., 2:3, 2:3]), 1e-12) * jnp.sign(
        jnp.where(Hm[..., 2:3, 2:3] == 0, 1.0, Hm[..., 2:3, 2:3]))


# ---------------------------------------------------------------------------
# Residuals
# ---------------------------------------------------------------------------

def sampson_error(F: jax.Array, x1: jax.Array, x2: jax.Array):
    """Squared Sampson distance. F: (..., 3, 3); x1, x2: (..., N, 2)."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, p1)
    Ftx2 = jnp.einsum("...ji,...nj->...ni", F, p2)
    x2Fx1 = jnp.sum(p2 * Fx1, axis=-1)
    denom = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return x2Fx1**2 / jnp.maximum(denom, 1e-12)


def homography_error(H: jax.Array, x1: jax.Array, x2: jax.Array):
    """Squared transfer error |x2 - H x1|^2."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    Hx1 = jnp.einsum("...ij,...nj->...ni", H, p1)
    w = Hx1[..., 2]
    proj = Hx1[..., :2] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[..., None]
    return jnp.sum((x2 - proj) ** 2, axis=-1)


# ---------------------------------------------------------------------------
# Static-batch RANSAC
# ---------------------------------------------------------------------------

def _draw_samples(key, num_trials, sample_size, n_points, weights):
    """(S, k) indices into the correspondence set, valid-weighted."""
    logits = jnp.where(weights > 0, 0.0, NEG_LOGIT)
    return jax.random.categorical(key, logits[None, :], axis=-1,
                                  shape=(num_trials, sample_size))


NEG_LOGIT = -1e9


@functools.partial(jax.jit, static_argnames=("solver", "residual_fn", "num_trials", "sample_size"))
def ransac(key, x1, x2, valid, solver, residual_fn, num_trials: int,
           sample_size: int, max_error: float):
    """Generic static-shape RANSAC. x1,x2: (N,2); valid: (N,) bool.

    Returns (model (3,3), inlier_mask (N,), num_inliers, best_score).
    Scoring is MSAC (truncated squared error), matching LO-RANSAC behavior
    more closely than plain inlier counting.
    """
    n = x1.shape[0]
    thr = max_error * max_error
    samples = _draw_samples(key, num_trials, sample_size, n, valid)
    sx1 = x1[samples]  # (S, k, 2)
    sx2 = x2[samples]
    # trials use the fast inverse-iteration null vector; the single refit
    # below uses exact eigh (hypothesis noise is absorbed by MSAC scoring)
    models = solver(sx1, sx2, None, False)  # (S, 3, 3)

    # preemptive two-stage MSAC (Nister): score EVERY trial on a small
    # correspondence subset, then rescore only the top trials on all N —
    # full S x N scoring was the dominant FLOP cost of verification
    SUB = 192
    TOP = 128
    if num_trials > TOP and n > SUB:
        sub_idx = _draw_samples(jax.random.fold_in(key, 1), 1, SUB, n,
                                valid)[0]  # (SUB,)
        errs_sub = residual_fn(models, x1[sub_idx][None], x2[sub_idx][None])
        errs_sub = jnp.where(valid[sub_idx][None, :], errs_sub, thr)
        pre_score = jnp.sum(jnp.minimum(errs_sub, thr), axis=-1)
        _, top_idx = jax.lax.top_k(-pre_score, TOP)
        models = models[top_idx]  # (TOP, 3, 3)
    errs = residual_fn(models, x1[None], x2[None])  # (S', N)
    errs = jnp.where(valid[None, :], errs, thr)
    score = jnp.sum(jnp.minimum(errs, thr), axis=-1)  # lower is better
    best = jnp.argmin(score)
    best_model = models[best]
    best_err = errs[best]
    inliers = (best_err < thr) & valid

    # Local optimization: refit on inliers (masked), keep if better
    refit = solver(x1[None], x2[None], inliers[None])[0]
    errs2 = jnp.where(valid, residual_fn(refit[None], x1[None], x2[None])[0], thr)
    score2 = jnp.sum(jnp.minimum(errs2, thr))
    use2 = (score2 < score[best]) & (jnp.sum(inliers) >= sample_size)
    model = jnp.where(use2, refit, best_model)
    err_f = jnp.where(use2, errs2, best_err)
    inl = (err_f < thr) & valid
    return model, inl, jnp.sum(inl), jnp.minimum(score2, score[best])


def _solver_with_mask(solver):
    """Adapt solver(x1, x2, mask, exact) to the ransac calling convention."""
    def run(x1, x2, mask=None, exact=True):
        return solver(x1, x2, mask, exact=exact)
    return run


# ---------------------------------------------------------------------------
# Pose recovery from E
# ---------------------------------------------------------------------------

def _triangulate_simple(R, t, x1n, x2n):
    """Cheap triangulation for cheirality checks.

    R,t: cam1->cam2. x1n/x2n: (N,2) normalized coords. Returns (N,3) points
    in cam1 frame and depths in both cams.
    """
    # closed-form MIDPOINT triangulation (no per-point eigh): rays d1 from
    # cam1 origin, d2 from cam2 center c2 = -R^T t, both in cam1 frame;
    # solve the 2x2 normal equations of min |s d1 - (c2 + u d2)|^2
    ones = jnp.ones_like(x1n[:, :1])
    d1 = jnp.concatenate([x1n, ones], axis=-1)                 # (N, 3)
    d2 = jnp.concatenate([x2n, ones], axis=-1) @ R             # R^T [x2n;1]
    c2 = -(R.T @ t)
    a = jnp.sum(d1 * d1, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d2 * d2, axis=-1)
    e1 = d1 @ c2
    e2 = d2 @ c2
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)  # parallel rays
    s = (c * e1 - b * e2) / det
    u = (b * e1 - a * e2) / det
    X = 0.5 * (s[:, None] * d1 + c2 + u[:, None] * d2)         # (N, 3) cam1
    z1 = X[:, 2]
    z2 = (X @ R.T + t)[:, 2]
    return X, z1, z2


def pose_from_essential(E, x1n, x2n, inliers):
    """Decompose E into (R, t), resolving the 4-fold ambiguity by cheirality
    voting over inlier correspondences. Returns (qvec, tvec, tri_angle,
    num_good)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    def score(R, tv):
        X, z1, z2 = _triangulate_simple(R, tv, x1n, x2n)
        ok = (z1 > 1e-6) & (z2 > 1e-6) & inliers
        # triangulation angles at accepted points
        c2 = -R.T @ tv  # cam2 center in cam1 frame
        ang = geom.triangulation_angle(jnp.zeros(3), c2, X)
        return jnp.sum(ok), ok, ang

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts = []
    oks = []
    angs = []
    for R, tv in cands:
        c, ok, ang = score(R, tv)
        counts.append(c)
        oks.append(ok)
        angs.append(ang)
    counts = jnp.stack(counts)
    best = jnp.argmax(counts)
    Rb = jnp.stack([c[0] for c in cands])[best]
    tb = jnp.stack([c[1] for c in cands])[best]
    okb = jnp.stack(oks)[best]
    angb = jnp.stack(angs)[best]
    # median angle over good points (masked median via sort)
    ang_sorted = jnp.sort(jnp.where(okb, angb, jnp.inf))
    ngood = jnp.sum(okb)
    med_idx = jnp.clip(ngood // 2, 0, angb.shape[0] - 1)
    tri_angle = jnp.where(ngood > 0, ang_sorted[med_idx], 0.0)
    return geom.rotmat_to_quat(Rb), tb, tri_angle, counts[best]


# ---------------------------------------------------------------------------
# Full two-view estimation (COLMAP Estimate semantics)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("num_trials", "calibrated"),
)
def estimate_two_view_geometry(
    key,
    x1, x2,            # (N, 2) pixel coords of matched keypoints
    valid,             # (N,) bool
    K1, K2,            # (3, 3) calibration matrices
    calibrated: bool = True,
    max_error: float = 4.0,
    min_num_inliers: int = 15,
    min_inlier_ratio: float = 0.25,
    num_trials: int = 512,
) -> TwoViewGeometry:
    """Estimate E/F/H + config + relative pose for one verified pair.

    COLMAP decision logic (simplified, no watermark/multi-model):
      - estimate F (always), H (always), E (if calibrated)
      - config CALIBRATED if E has comparable support to F, else UNCALIBRATED
      - PLANAR_OR_PANORAMIC if H explains >= 0.8 of the best epipolar inliers
      - DEGENERATE if too few inliers
    """
    kF, kH, kE = jax.random.split(key, 3)
    n = x1.shape[0]

    F, inl_F, n_F, _ = ransac(kF, x1, x2, valid, _solver_with_mask(fundamental_8pt),
                              sampson_error, num_trials, 8, max_error)
    # the winner may be an unconstrained trial model (fast path skips the
    # per-trial SVD); project onto rank-2 once here
    F = enforce_rank2(F)
    F = F / jnp.maximum(jnp.linalg.norm(F), 1e-12)
    H, inl_H, n_H, _ = ransac(kH, x1, x2, valid, _solver_with_mask(homography_dlt),
                              homography_error, num_trials, 4, max_error)

    # Normalized coords for E + pose
    f1 = 0.5 * (K1[0, 0] + K1[1, 1])
    f2 = 0.5 * (K2[0, 0] + K2[1, 1])
    x1n = (x1 - K1[:2, 2]) / jnp.array([K1[0, 0], K1[1, 1]])
    x2n = (x2 - K2[:2, 2]) / jnp.array([K2[0, 0], K2[1, 1]])

    if calibrated:
        # threshold in normalized units
        thr_n = max_error / (0.5 * (f1 + f2))
        E, inl_E, n_E, _ = ransac(kE, x1n, x2n, valid, _solver_with_mask(essential_8pt),
                                  sampson_error, num_trials, 8, thr_n)
    else:
        E = K2.T @ F @ K1
        inl_E, n_E = inl_F, n_F

    use_E = jnp.asarray(calibrated) & (n_E.astype(jnp.float32) >= 0.95 * n_F.astype(jnp.float32))
    epi_inl = jnp.where(use_E, inl_E, inl_F)
    n_epi = jnp.where(use_E, n_E, n_F)

    planar = n_H.astype(jnp.float32) > 0.8 * n_epi.astype(jnp.float32)
    enough = (n_epi >= min_num_inliers) & (
        n_epi.astype(jnp.float32)
        >= min_inlier_ratio * jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    )

    config = jnp.where(
        ~enough, DEGENERATE,
        jnp.where(planar, PLANAR_OR_PANORAMIC, jnp.where(use_E, CALIBRATED, UNCALIBRATED)),
    ).astype(jnp.int32)

    # Pose from E over epipolar inliers (always computed; gated by config use)
    E_pose = jnp.where(use_E, E, K2.T @ F @ K1)
    # re-enforce essential structure for pose recovery
    Ue, Se, Vte = jnp.linalg.svd(E_pose)
    s = 0.5 * (Se[0] + Se[1])
    E_pose = Ue @ (jnp.array([s, s, 0.0])[:, None] * Vte)
    qvec, tvec, tri_angle, _ = pose_from_essential(E_pose, x1n, x2n, epi_inl)

    inlier_mask = epi_inl & enough
    return TwoViewGeometry(
        config=config,
        E=E_pose,
        F=F,
        H=H,
        qvec=qvec,
        tvec=tvec,
        tri_angle=tri_angle,
        inlier_mask=inlier_mask,
        num_inliers=jnp.where(enough, n_epi, 0).astype(jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_trials", "calibrated", "max_models"),
)
def estimate_two_view_geometry_multiple(
    key,
    x1, x2,            # (N, 2) pixel coords of matched keypoints
    valid,             # (N,) bool
    K1, K2,            # (3, 3) calibration matrices
    calibrated: bool = True,
    max_error: float = 4.0,
    min_num_inliers: int = 15,
    min_inlier_ratio: float = 0.25,
    num_trials: int = 512,
    max_models: int = 3,
) -> TwoViewGeometry:
    """COLMAP ``TwoViewGeometry::EstimateMultiple`` semantics (the
    reference's multiple_models flag, sequential_matching.cc:94-100 +
    colmap.proto:38): greedily estimate a geometry, remove its inliers,
    re-estimate on the remainder, up to ``max_models`` rounds.

    TPU-native form: a lax.scan of the single-model estimator with a
    shrinking validity mask — fixed trip count, masked convergence. Returns
    a TwoViewGeometry pytree with a leading ``max_models`` axis; round r is
    meaningful where ``num_inliers[r] > 0``. If >= 2 rounds found support,
    callers should treat the pair's config as MULTIPLE (COLMAP behavior).
    """
    def round_fn(carry, k):
        remaining = carry
        g = estimate_two_view_geometry(
            k, x1, x2, remaining, K1, K2, calibrated=calibrated,
            max_error=max_error, min_num_inliers=min_num_inliers,
            min_inlier_ratio=min_inlier_ratio, num_trials=num_trials)
        found = g.num_inliers >= min_num_inliers
        # zero out failed rounds so downstream sees a clean miss
        g = g._replace(
            inlier_mask=g.inlier_mask & found,
            num_inliers=jnp.where(found, g.num_inliers, 0),
            config=jnp.where(found, g.config, DEGENERATE).astype(jnp.int32))
        return remaining & ~g.inlier_mask, g

    keys = jax.random.split(key, max_models)
    _, models = jax.lax.scan(round_fn, valid, keys)
    return models
