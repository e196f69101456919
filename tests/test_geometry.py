import numpy as np
import jax.numpy as jnp
import pytest

from scanner_colmap_tpu.models import geometry as geom


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return q


def test_quat_rotmat_roundtrip(rng):
    q = random_quats(rng, 64)
    R = np.asarray(geom.quat_to_rotmat(q))
    # proper rotations
    assert np.allclose(R @ np.transpose(R, (0, 2, 1)), np.eye(3), atol=1e-10)
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-10)
    q2 = np.asarray(geom.rotmat_to_quat(R))
    assert np.allclose(q, q2, atol=1e-8)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 8)
    v = rng.normal(size=(8, 3))
    R = np.asarray(geom.quat_to_rotmat(q))
    out1 = np.asarray(geom.quat_rotate(q, v))
    out2 = np.einsum("nij,nj->ni", R, v)
    assert np.allclose(out1, out2, atol=1e-10)


def test_quat_mul_matches_matrix_product(rng):
    a, b = random_quats(rng, 4), random_quats(rng, 4)
    Rab = np.asarray(geom.quat_to_rotmat(geom.quat_mul(a, b)))
    Ra = np.asarray(geom.quat_to_rotmat(a))
    Rb = np.asarray(geom.quat_to_rotmat(b))
    assert np.allclose(Rab, Ra @ Rb, atol=1e-10)


def test_pose_inverse_compose(rng):
    q = random_quats(rng, 5)
    t = rng.normal(size=(5, 3))
    qi, ti = geom.pose_inverse(q, t)
    qc, tc = geom.pose_compose(q, t, qi, ti)
    assert np.allclose(np.abs(np.asarray(qc)[:, 0]), 1.0, atol=1e-10)
    assert np.allclose(np.asarray(tc), 0.0, atol=1e-10)


def test_projection_center(rng):
    q = random_quats(rng, 3)
    t = rng.normal(size=(3, 3))
    C = np.asarray(geom.projection_center(q, t))
    # transforming the center into camera frame gives the origin
    x = np.asarray(geom.pose_transform(q, t, C))
    assert np.allclose(x, 0.0, atol=1e-10)


def test_angle_axis_to_quat_small_angle():
    aa = np.array([1e-12, 0.0, 0.0])
    q = np.asarray(geom.angle_axis_to_quat(aa))
    assert np.allclose(q, [1, 0, 0, 0], atol=1e-9)
    aa = np.array([np.pi / 2, 0.0, 0.0])
    q = np.asarray(geom.angle_axis_to_quat(aa))
    R = np.asarray(geom.quat_to_rotmat(q))
    v = R @ np.array([0.0, 1.0, 0.0])
    assert np.allclose(v, [0, 0, 1], atol=1e-10)


def test_umeyama_recovers_sim3(rng):
    src = rng.normal(size=(50, 3))
    q_true = random_quats(rng, 1)[0]
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    dst = np.asarray(geom.sim3_transform(s_true, q_true, t_true, src))
    s, q, t = geom.umeyama_alignment(jnp.asarray(src), jnp.asarray(dst))
    assert np.isclose(float(s), s_true, atol=1e-8)
    assert np.allclose(np.asarray(q), q_true, atol=1e-8)
    assert np.allclose(np.asarray(t), t_true, atol=1e-8)


def test_umeyama_no_scale(rng):
    src = rng.normal(size=(30, 3))
    q_true = random_quats(rng, 1)[0]
    dst = np.asarray(geom.sim3_transform(1.0, q_true, np.zeros(3), src))
    s, q, t = geom.umeyama_alignment(jnp.asarray(src), jnp.asarray(dst), with_scale=False)
    assert np.isclose(float(s), 1.0)
    assert np.allclose(np.asarray(q), q_true, atol=1e-8)


def test_sim3_transform_pose_consistency(rng):
    """Transforming world + poses leaves image-plane geometry invariant."""
    q_cw = random_quats(rng, 1)[0]
    t_cw = rng.normal(size=3)
    pts = rng.normal(size=(10, 3)) + np.array([0, 0, 5.0])
    s = 3.0
    q_s = random_quats(rng, 1)[0]
    t_s = rng.normal(size=3)

    x_cam = np.asarray(geom.pose_transform(q_cw, t_cw, pts))
    pts_new = np.asarray(geom.sim3_transform(s, q_s, t_s, pts))
    q_new, t_new = geom.sim3_transform_pose(s, q_s, t_s, q_cw, t_cw)
    x_cam_new = np.asarray(geom.pose_transform(q_new, t_new, pts_new))
    # camera-frame points scale by s; projection rays unchanged
    assert np.allclose(x_cam_new, s * x_cam, atol=1e-8)


def test_triangulation_angle():
    c1 = np.array([0.0, 0.0, 0.0])
    c2 = np.array([1.0, 0.0, 0.0])
    p = np.array([0.5, 0.0, 0.5])
    ang = float(geom.triangulation_angle(c1, c2, p))
    assert np.isclose(ang, np.pi / 2, atol=1e-10)


def test_essential_from_pose_epipolar_constraint(rng):
    q = random_quats(rng, 1)[0]
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    E = np.asarray(geom.essential_from_pose(q, t))
    # x2^T E x1 = 0 for corresponding normalized points
    pts = rng.normal(size=(20, 3)) + np.array([0, 0, 6.0])
    x1 = pts / pts[:, 2:3]
    p2 = np.asarray(geom.pose_transform(q, t, pts))
    x2 = p2 / p2[:, 2:3]
    resid = np.einsum("ni,ij,nj->n", x2, E, x1)
    assert np.max(np.abs(resid)) < 1e-8
