"""Core geometry: rotations, rigid/similarity transforms, projection.

All functions are pure, jittable, and batch-friendly (leading batch dims work
via broadcasting or vmap). Conventions follow COLMAP's so that interchange is
lossless (reference behavior: two-view geometry qvec/tvec serialized in
/root/reference/integration/op_cpp/io.cc:237-246):

- quaternions are (w, x, y, z), Hamilton convention, unit norm
- a pose (qvec, tvec) maps WORLD points to CAMERA frame: x_cam = R @ x_world + t
- projection centers: C = -R^T @ t
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# Quaternions / rotations
# ----------------------------------------------------------------------------

def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) to unit norm; sign fixed so w >= 0."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion (w >= 0).

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the numerically best one (largest pivot) with jnp.where — jit-safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each numerically stable when its pivot is the largest.
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0  # 4w
    c0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0  # 4x
    c1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0  # 4y
    c2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0  # 4z
    c3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    p0 = tr
    p1 = m00 - m11 - m22
    p2 = m11 - m00 - m22
    p3 = m22 - m00 - m11
    pivots = jnp.stack([p0, p1, p2, p3], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a * b of wxyz quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4)."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def angle_axis_to_quat(aa: jax.Array) -> jax.Array:
    """(..., 3) angle-axis (axis * angle) -> wxyz quaternion.

    Differentiable at aa = 0 (needed: pose deltas are linearized at zero in
    BA/PnP refinement): uses a smoothed norm instead of jnp.where, since
    where() still propagates NaN through the untaken branch under jacfwd.
    """
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    angle = jnp.sqrt(sq + 1e-24)
    half = 0.5 * angle
    k = jnp.sin(half) / angle  # -> 0.5 smoothly as angle -> 0
    return jnp.concatenate([jnp.cos(half), aa * k], axis=-1)


# ----------------------------------------------------------------------------
# Rigid poses (qvec, tvec): x_cam = R x_world + t
# ----------------------------------------------------------------------------

def pose_transform(qvec: jax.Array, tvec: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply world->cam pose to points (..., 3)."""
    return quat_rotate(qvec, pts) + tvec


def pose_inverse(qvec: jax.Array, tvec: jax.Array):
    """Invert pose: returns (qvec_inv, tvec_inv) with x_world = R^T (x_cam - t)."""
    qi = quat_conj(qvec)
    return qi, -quat_rotate(qi, tvec)


def pose_compose(q_ab: jax.Array, t_ab: jax.Array, q_bc: jax.Array, t_bc: jax.Array):
    """Compose: (a<-b) after (b<-c) = a<-c.  x_a = R_ab (R_bc x_c + t_bc) + t_ab."""
    return quat_mul(q_ab, q_bc), quat_rotate(q_ab, t_bc) + t_ab


def projection_center(qvec: jax.Array, tvec: jax.Array) -> jax.Array:
    """Camera center in world coordinates: C = -R^T t."""
    return -quat_rotate(quat_conj(qvec), tvec)


def relative_pose(q1, t1, q2, t2):
    """Pose of cam2 relative to cam1: x_2 = R_rel x_1 + t_rel."""
    q1i, t1i = pose_inverse(q1, t1)
    return pose_compose(q2, t2, q1i, t1i)


# ----------------------------------------------------------------------------
# Cross / skew, epipolar
# ----------------------------------------------------------------------------

def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix [v]_x."""
    z = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [z, -v[..., 2], v[..., 1],
         v[..., 2], z, -v[..., 0],
         -v[..., 1], v[..., 0], z],
        axis=-1,
    )
    return rows.reshape(v.shape[:-1] + (3, 3))


def essential_from_pose(qvec: jax.Array, tvec: jax.Array) -> jax.Array:
    """E = [t]_x R for the relative pose cam1->cam2 (x2 ~ on epipolar line of x1)."""
    R = quat_to_rotmat(qvec)
    return skew(tvec) @ R


# ----------------------------------------------------------------------------
# Similarity transforms (Sim3)
# ----------------------------------------------------------------------------

def sim3_transform(scale: jax.Array, qvec: jax.Array, tvec: jax.Array, pts: jax.Array) -> jax.Array:
    """y = s R x + t for points (..., 3)."""
    return scale * quat_rotate(qvec, pts) + tvec


def sim3_transform_pose(scale, qvec_s, tvec_s, q_cw, t_cw):
    """Re-express a world->cam pose after the WORLD is remapped by Sim(3).

    New world coords: y = s R_s x + t_s.  New pose satisfies
    x_cam' ~ cam frame unchanged: R' = R_cw R_s^T, t' = s_inv-free form:
    x_cam = R_cw x + t_cw = R_cw R_s^T (y - t_s)/s + t_cw
    => R' = R_cw R_s^T, t' = t_cw - R' t_s / s, and the camera is rescaled so
    that depth scales by 1/s; COLMAP convention keeps projection x_cam' = R' y + t'
    with t' = (t_cw * s - R' t_s) ... we keep metric consistency by scaling t.
    Derivation: x_cam_scaled = s * x_cam = R' y + (s t_cw - R' t_s).
    Returns (q', t') with t' = s * t_cw - R' t_s (i.e. scene rescaled by s).
    """
    qi = quat_conj(qvec_s)
    q_new = quat_mul(q_cw, qi)
    t_new = scale * t_cw - quat_rotate(q_new, tvec_s)
    return q_new, t_new


def umeyama_alignment(src: jax.Array, dst: jax.Array, weights: jax.Array | None = None,
                      with_scale: bool = True):
    """Least-squares Sim(3): find (s, R, t) minimizing || s R src + t - dst ||^2.

    src, dst: (N, 3). weights: optional (N,) nonneg. Returns (s, qvec, tvec).
    Used for submodel merging (reference: Reconstruction::Merge similarity
    alignment, /root/reference/integration/op_cpp/merge_mapping.cc:55-61) and
    for ATE evaluation.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_s = jnp.sum(w[:, None] * src, axis=0)
    mu_d = jnp.sum(w[:, None] * dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc  # (3,3) = sum w * d c^T s c
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], cov.dtype)) + jnp.diag(jnp.array([0.0, 0.0, 1.0], cov.dtype)) * d
    R = U @ D @ Vt
    var_s = jnp.sum(w * jnp.sum(sc * sc, axis=-1))
    s = jnp.where(
        jnp.asarray(with_scale),
        jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_s, 1e-12),
        1.0,
    )
    t = mu_d - s * (R @ mu_s)
    return s, rotmat_to_quat(R), t


def np_umeyama_alignment(src, dst, weights=None, with_scale: bool = True):
    """Host-numpy Umeyama (same math as `umeyama_alignment`). The problem is
    tiny (N x 3 moments + one 3x3 SVD) and its shape varies per call, so a
    device jit would recompile for every distinct correspondence count —
    the merge stage is host control plane."""
    import numpy as np

    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    if weights is None:
        weights = np.ones(len(src))
    w = np.asarray(weights, np.float64)
    w = w / max(w.sum(), 1e-12)
    mu_s = (w[:, None] * src).sum(axis=0)
    mu_d = (w[:, None] * dst).sum(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U) * np.linalg.det(Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var_s = (w * (sc * sc).sum(axis=-1)).sum()
    s = float((S * np.diag(D)).sum() / max(var_s, 1e-12)) if with_scale else 1.0
    t = mu_d - s * (R @ mu_s)
    return s, np_rotmat_to_quat(R), t


def np_rotmat_to_quat(R):
    """Host-numpy rotation matrix -> wxyz quaternion (w >= 0)."""
    import numpy as np

    R = np.asarray(R, np.float64)
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(1.0 + tr) * 2.0
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
        q = np.array([(R[2, 1] - R[1, 2]) / s, 0.25 * s,
                      (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 - R[0, 0] + R[1, 1] - R[2, 2]) * 2.0
        q = np.array([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                      0.25 * s, (R[1, 2] + R[2, 1]) / s])
    else:
        s = np.sqrt(1.0 - R[0, 0] - R[1, 1] + R[2, 2]) * 2.0
        q = np.array([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                      (R[1, 2] + R[2, 1]) / s, 0.25 * s])
    q = q / np.linalg.norm(q)
    return q if q[0] >= 0 else -q


# ----------------------------------------------------------------------------
# Triangulation angles
# ----------------------------------------------------------------------------

def np_quat_to_rotmat(q):
    """Host-numpy wxyz quaternion -> rotation matrix (stage control planes:
    the jnp version dispatches an eager device program per call)."""
    import numpy as np

    w, x, y, z = np.asarray(q, np.float64)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def np_pose_inverse(qvec, tvec):
    """Host-numpy inverse of a world->cam pose (q, t)."""
    import numpy as np

    q = np.asarray(qvec, np.float64)
    qc = q * np.array([1.0, -1.0, -1.0, -1.0])
    return qc, -np_quat_rotate(qc, np.asarray(tvec, np.float64))


def np_angle_axis_to_quat(aa):
    """Numpy angle-axis -> quaternion (host control plane)."""
    import numpy as np

    aa = np.asarray(aa, np.float64)
    sq = np.sum(aa * aa, axis=-1, keepdims=True)
    angle = np.sqrt(sq + 1e-24)
    half = 0.5 * angle
    k = np.sin(half) / angle
    return np.concatenate([np.cos(half), aa * k], axis=-1)


def np_quat_rotate(q, v):
    """Numpy quaternion rotate for the host control plane (the engine calls
    this in per-observation loops where a jax dispatch would dominate)."""
    import numpy as np

    q = np.asarray(q)
    v = np.asarray(v)
    qv = q[..., 1:]
    uv = np.cross(qv, v)
    uuv = np.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def np_pose_transform(qvec, tvec, pts):
    return np_quat_rotate(qvec, pts) + tvec


def np_quat_mul(a, b):
    """Numpy Hamilton product a * b of wxyz quaternions (batched)."""
    import numpy as np

    a = np.asarray(a)
    b = np.asarray(b)
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def np_projection_center(qvec, tvec):
    import numpy as np

    q = np.asarray(qvec) * np.array([1.0, -1, -1, -1])
    return -np_quat_rotate(q, tvec)


def np_triangulation_angle(c1, c2, p):
    import numpy as np

    r1 = np.asarray(c1) - p
    r2 = np.asarray(c2) - p
    denom = np.linalg.norm(r1, axis=-1) * np.linalg.norm(r2, axis=-1)
    cosang = np.sum(r1 * r2, axis=-1) / np.maximum(denom, 1e-12)
    return np.arccos(np.clip(cosang, -1.0, 1.0))


def triangulation_angle(center1: jax.Array, center2: jax.Array, point3d: jax.Array) -> jax.Array:
    """Angle (radians) at point3d subtended by the two camera centers."""
    r1 = center1 - point3d
    r2 = center2 - point3d
    cosang = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )
    return jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
