import numpy as np
import jax
import jax.numpy as jnp

from scanner_colmap_tpu.models import geometry as geom
from scanner_colmap_tpu.ops import pnp, triangulate


def make_cameras(rng, m):
    qs, ts = [], []
    for i in range(m):
        aa = rng.normal(size=3) * 0.1
        q = np.asarray(geom.angle_axis_to_quat(aa))
        t = np.array([i * 0.5, 0.0, 0.0]) + rng.normal(size=3) * 0.05
        qs.append(q)
        ts.append(t)
    return np.stack(qs), np.stack(ts)


def test_triangulate_tracks_exact(rng):
    B, M = 32, 4
    qs, ts = make_cameras(rng, M)
    pts = rng.uniform(-1, 1, size=(B, 3)) + np.array([0.5, 0, 5.0])
    # observations: normalized coords in every camera
    x_cam = np.asarray(geom.pose_transform(qs[None, :, :], ts[None, :, :],
                                           pts[:, None, :]))
    xn = x_cam[..., :2] / x_cam[..., 2:3]
    qvecs = np.broadcast_to(qs[None], (B, M, 4))
    tvecs = np.broadcast_to(ts[None], (B, M, 3))
    mask = np.ones((B, M), bool)
    xyz, ok, view_ok = triangulate.triangulate_tracks(
        jnp.asarray(qvecs), jnp.asarray(tvecs), jnp.asarray(xn),
        jnp.asarray(mask), jnp.asarray(0.01))
    assert np.all(np.asarray(ok))
    assert np.allclose(np.asarray(xyz), pts, atol=1e-6)


def test_triangulate_rejects_low_parallax(rng):
    # two nearly identical cameras -> tiny triangulation angle -> reject
    q = np.array([1.0, 0, 0, 0])
    qvecs = np.stack([q, q])[None]
    tvecs = np.array([[0.0, 0, 0], [1e-5, 0, 0]])[None]
    pts = np.array([[0.1, 0.2, 5.0]])
    x_cam = np.asarray(geom.pose_transform(qvecs[0], tvecs[0], pts[0]))
    xn = (x_cam[:, :2] / x_cam[:, 2:3])[None]
    xyz, ok, _ = triangulate.triangulate_tracks(
        jnp.asarray(qvecs), jnp.asarray(tvecs), jnp.asarray(xn),
        jnp.ones((1, 2), bool), jnp.asarray(0.01), min_tri_angle=0.026)
    assert not bool(np.asarray(ok)[0])


def test_triangulate_masked_views_ignored(rng):
    B, M = 8, 5
    qs, ts = make_cameras(rng, M)
    pts = rng.uniform(-1, 1, size=(B, 3)) + np.array([0.5, 0, 5.0])
    x_cam = np.asarray(geom.pose_transform(qs[None], ts[None], pts[:, None]))
    xn = x_cam[..., :2] / x_cam[..., 2:3]
    # corrupt the masked view's observation wildly
    xn[:, 2] = 99.0
    mask = np.ones((B, M), bool)
    mask[:, 2] = False
    qvecs = np.broadcast_to(qs[None], (B, M, 4))
    tvecs = np.broadcast_to(ts[None], (B, M, 3))
    xyz, ok, _ = triangulate.triangulate_tracks(
        jnp.asarray(qvecs), jnp.asarray(tvecs), jnp.asarray(xn),
        jnp.asarray(mask), jnp.asarray(0.01))
    assert np.all(np.asarray(ok))
    assert np.allclose(np.asarray(xyz), pts, atol=1e-6)


def test_pnp_dlt_exact(rng):
    aa = rng.normal(size=3) * 0.3
    q_gt = np.asarray(geom.angle_axis_to_quat(aa))
    t_gt = rng.normal(size=3) * 0.5 + np.array([0, 0, 1.0])
    x3d = rng.uniform(-2, 2, size=(24, 3)) + np.array([0, 0, 6.0])
    x_cam = np.asarray(geom.pose_transform(q_gt, t_gt, x3d))
    xn = x_cam[:, :2] / x_cam[:, 2:3]
    q, t = pnp.pnp_dlt(jnp.asarray(x3d), jnp.asarray(xn))
    q, t = np.asarray(q), np.asarray(t)
    dq = min(np.linalg.norm(q - q_gt), np.linalg.norm(q + q_gt))
    assert dq < 1e-6
    assert np.allclose(t, t_gt, atol=1e-6)


def test_pnp_ransac_with_outliers(rng):
    aa = rng.normal(size=3) * 0.3
    q_gt = np.asarray(geom.angle_axis_to_quat(aa))
    t_gt = rng.normal(size=3) * 0.5 + np.array([0, 0, 1.0])
    n = 100
    x3d = rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 6.0])
    x_cam = np.asarray(geom.pose_transform(q_gt, t_gt, x3d))
    xn = x_cam[:, :2] / x_cam[:, 2:3]
    xn += rng.normal(size=xn.shape) * 0.0005  # ~0.3px at f=600
    xn[:30] = rng.uniform(-0.5, 0.5, size=(30, 2))  # 30% outliers
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(x3d), jnp.asarray(xn),
        jnp.ones(n, bool), jnp.asarray(12.0 / 600.0))
    assert bool(res.ok)
    assert int(res.num_inliers) > 55
    q, t = np.asarray(res.qvec), np.asarray(res.tvec)
    dq = min(np.linalg.norm(q - q_gt), np.linalg.norm(q + q_gt))
    assert dq < 2e-3
    assert np.linalg.norm(t - t_gt) < 2e-2


def test_pnp_ransac_rejects_garbage(rng):
    n = 60
    x3d = rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 6.0])
    xn = rng.uniform(-0.5, 0.5, size=(n, 2))
    res = pnp.pnp_ransac(
        jax.random.PRNGKey(1), jnp.asarray(x3d), jnp.asarray(xn),
        jnp.ones(n, bool), jnp.asarray(12.0 / 600.0))
    assert not bool(res.ok)
