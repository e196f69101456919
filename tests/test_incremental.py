"""End-to-end synthetic-scene test of the incremental mapping engine:
known cameras/points -> project to keypoints -> verified matches ->
reconstruct -> compare to ground truth (ATE after Sim(3) alignment)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scanner_colmap_tpu.engine.correspondence import CorrespondenceGraph
from scanner_colmap_tpu.engine.incremental import IncrementalMapper
from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.models import geometry as geom


def build_synthetic_scene(rng, num_images=8, num_points=300, focal=600.0,
                          noise_px=0.3, width=640, height=480):
    """Cameras on an arc looking at a point cloud; full visibility graph."""
    pts = rng.uniform(-3, 3, size=(num_points, 3)) + np.array([0, 0, 8.0])
    qs, ts = [], []
    for i in range(num_images):
        ang = (i - num_images / 2) * 0.08
        aa = np.array([0.0, ang, 0.0]) + rng.normal(size=3) * 0.01
        q = np.asarray(geom.angle_axis_to_quat(aa))
        C = np.array([i * 0.6 - num_images * 0.3, rng.normal() * 0.1, 0.0])
        t = -np.asarray(geom.quat_rotate(q, C))
        qs.append(q)
        ts.append(t)
    qs, ts = np.stack(qs), np.stack(ts)

    # project points into each image
    keypoints = {}
    kp_of_point = {}  # (image, point) -> kp index
    vis = {}
    for i in range(num_images):
        x_cam = np.asarray(geom.pose_transform(qs[i], ts[i], pts))
        uv = focal * x_cam[:, :2] / x_cam[:, 2:3] + np.array([width / 2, height / 2])
        uv += rng.normal(size=uv.shape) * noise_px
        inb = ((x_cam[:, 2] > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < width)
               & (uv[:, 1] >= 0) & (uv[:, 1] < height))
        idx = np.where(inb)[0]
        keypoints[i] = uv[idx]
        vis[i] = idx
        for kp, p in enumerate(idx):
            kp_of_point[(i, p)] = kp

    cameras = {i: (camlib.SIMPLE_RADIAL,
                   [focal, width / 2, height / 2, 0.0], width, height, True)
               for i in range(num_images)}

    # matches between consecutive-window pairs
    graph = CorrespondenceGraph()
    for i in range(num_images):
        graph.add_image(i, len(keypoints[i]))
    two_view = {}
    for i in range(num_images):
        for j in range(i + 1, min(i + 4, num_images)):
            common = np.intersect1d(vis[i], vis[j])
            if len(common) < 20:
                continue
            pairs = np.array([[kp_of_point[(i, p)], kp_of_point[(j, p)]]
                              for p in common])
            graph.add_matches(i, j, pairs)
            qrel, trel = geom.relative_pose(qs[i], ts[i], qs[j], ts[j])
            trel = np.asarray(trel)
            tn = np.linalg.norm(trel)
            two_view[(i, j)] = {
                "qvec": np.asarray(qrel), "tvec": trel / max(tn, 1e-12),
                "tri_angle": 0.1, "num_inliers": len(common),
            }
    return keypoints, cameras, graph, two_view, (qs, ts, pts)


def align_and_ate(rec, q_gt, t_gt):
    """Sim(3)-align estimated camera centers to GT, return RMS ATE."""
    est, gt = [], []
    for iid in rec.registered_image_ids:
        est.append(rec.images[iid].projection_center())
        gt.append(np.asarray(geom.projection_center(q_gt[iid], t_gt[iid])))
    est, gt = np.stack(est), np.stack(gt)
    s, q, t = geom.umeyama_alignment(jnp.asarray(est), jnp.asarray(gt))
    aligned = np.asarray(geom.sim3_transform(float(s), np.asarray(q),
                                             np.asarray(t), est))
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=-1))))


@pytest.mark.slow
def test_incremental_mapping_synthetic(rng):
    keypoints, cameras, graph, two_view, (q_gt, t_gt, pts_gt) = \
        build_synthetic_scene(rng)
    mapper = IncrementalMapper(keypoints, cameras, graph, two_view)
    rec = mapper.reconstruct()

    assert rec.num_registered == len(keypoints), \
        f"registered only {rec.num_registered}"
    assert len(rec.points3D) > 150
    assert rec.mean_reprojection_error() < 1.0
    ate = align_and_ate(rec, q_gt, t_gt)
    # scene scale ~6 units; ATE should be well under 1%
    assert ate < 0.05, ate
    assert rec.mean_track_length() > 3.0


@pytest.mark.slow
def test_incremental_mapping_with_outlier_matches(rng):
    keypoints, cameras, graph, two_view, (q_gt, t_gt, pts_gt) = \
        build_synthetic_scene(rng, num_images=6)
    # corrupt: add 15% random wrong matches between pair (0, 1)
    n0, n1 = len(keypoints[0]), len(keypoints[1])
    bad = np.stack([rng.integers(0, n0, 30), rng.integers(0, n1, 30)], axis=1)
    graph.add_matches(0, 1, bad)
    mapper = IncrementalMapper(keypoints, cameras, graph, two_view)
    rec = mapper.reconstruct()
    assert rec.num_registered >= 5
    ate = align_and_ate(rec, q_gt, t_gt)
    assert ate < 0.1, ate
