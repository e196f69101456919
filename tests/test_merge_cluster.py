"""Submodel merging + cluster scheduling tests (stage 4/5 semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from scanner_colmap_tpu.engine import cluster as cluster_mod
from scanner_colmap_tpu.engine.merge import align_reconstructions, merge_all, merge_into
from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.models import geometry as geom
from scanner_colmap_tpu.models.reconstruction import Camera, Image, Reconstruction


def make_submodel(rng, image_ids, pts, kp_of_point, q_all, t_all, focal=500.0,
                  sim3=None):
    """Build a reconstruction over image_ids observing pts (subset by vis)."""
    rec = Reconstruction()
    for iid in image_ids:
        rec.add_camera(Camera(iid, camlib.SIMPLE_PINHOLE, 640, 480,
                              np.array([focal, 320.0, 240.0])))
        q, t = q_all[iid].copy(), t_all[iid].copy()
        kps = np.zeros((len(pts), 2))
        x_cam = np.asarray(geom.np_pose_transform(q, t, pts))
        kps = focal * x_cam[:, :2] / x_cam[:, 2:3] + np.array([320.0, 240.0])
        rec.add_image(Image(image_id=iid, camera_id=iid, name=f"im{iid}",
                            qvec=q, tvec=t, xys=kps,
                            point3D_ids=np.full(len(pts), -1, np.int64),
                            registered=True))
    for p in range(len(pts)):
        track = [(iid, p) for iid in image_ids]
        rec.add_point3D(pts[p], track, error=0.1)
    if sim3 is not None:
        rec.transform(*sim3)
    return rec


@pytest.fixture
def scene(rng):
    pts = rng.uniform(-2, 2, size=(40, 3)) + np.array([0, 0, 6.0])
    q_all, t_all = {}, {}
    for iid in range(8):
        aa = rng.normal(size=3) * 0.05
        q_all[iid] = np.asarray(geom.angle_axis_to_quat(aa))
        t_all[iid] = np.array([iid * 0.4, 0, 0]) + rng.normal(size=3) * 0.02
    return pts, q_all, t_all


def test_align_reconstructions_recovers_sim3(rng, scene):
    pts, q_all, t_all = scene
    kp = None
    rec1 = make_submodel(rng, [0, 1, 2, 3, 4], pts, kp, q_all, t_all)
    s_true = 1.7
    q_s = np.asarray(geom.angle_axis_to_quat(np.array([0.1, -0.2, 0.05])))
    t_s = np.array([1.0, 2.0, -0.5])
    rec2 = make_submodel(rng, [2, 3, 4, 5, 6], pts, kp, q_all, t_all,
                         sim3=(s_true, q_s, t_s))
    # align rec2 -> rec1 frame: should invert the applied transform
    ali = align_reconstructions(rec2, rec1)
    assert ali is not None
    s, q, t = ali
    # verify: common image centers map onto each other
    for iid in [2, 3, 4]:
        c2 = rec2.images[iid].projection_center()
        c1 = rec1.images[iid].projection_center()
        mapped = np.asarray(geom.sim3_transform(s, q, t, c2))
        assert np.allclose(mapped, c1, atol=1e-6)


def test_merge_into_dedups_and_extends(rng, scene):
    pts, q_all, t_all = scene
    rec1 = make_submodel(rng, [0, 1, 2, 3, 4], pts, None, q_all, t_all)
    rec2 = make_submodel(rng, [2, 3, 4, 5, 6], pts, None, q_all, t_all,
                         sim3=(2.0, np.asarray(geom.angle_axis_to_quat(
                             np.array([0.05, 0.1, -0.02]))), np.array([0.5, -1, 2])))
    n_pts_before = len(rec1.points3D)
    ok = merge_into(rec1, rec2)
    assert ok
    # all 7 images registered now
    assert rec1.num_registered == 7
    # shared points merged (not duplicated): tracks extended to new images
    assert len(rec1.points3D) == n_pts_before
    lens = [p.track_length for p in rec1.points3D.values()]
    assert np.mean(lens) > 5.5  # extended from 5 towards 7
    # merged geometry consistent: reprojection still tight
    rec1.compute_reprojection_errors()
    assert rec1.mean_reprojection_error() < 0.5


def test_merge_into_stale_target_makes_new_point(rng, scene):
    """A dst keypoint still referencing a REMOVED point id must not crash
    the fold or resurrect the stale id: the src track falls through to the
    new-point path and the stale keypoint stays out of the new track."""
    pts, q_all, t_all = scene
    rec1 = make_submodel(rng, [0, 1, 2, 3, 4], pts, None, q_all, t_all)
    rec2 = make_submodel(rng, [2, 3, 4, 5, 6], pts, None, q_all, t_all)
    # make point 0's dst references stale: drop it WITHOUT clearing ids
    pid0 = next(iter(rec1.points3D))
    del rec1.points3D[pid0]
    n_before = len(rec1.points3D)
    assert merge_into(rec1, rec2)
    # the src copy of that point re-created it from its unassigned obs
    assert len(rec1.points3D) == n_before + 1
    new_pid = max(rec1.points3D)
    track = rec1.points3D[new_pid].track
    # observations on images whose keypoint still carries the stale id are
    # NOT claimed (they read as assigned), so the track only spans src-only
    # images — and every entry's assignment must point back at the new point
    for (iid, kp) in track:
        assert rec1.images[iid].point3D_ids[kp] == new_pid
    assert all(iid in (5, 6) for (iid, _) in track)


def test_merge_into_split_src_points_share_target(rng, scene):
    """Two src points whose tracks both touch one dst point must BOTH fold
    into that target (disjoint keypoints), not duplicate it."""
    pts, q_all, t_all = scene
    rec1 = make_submodel(rng, [0, 1, 2, 3, 4], pts, None, q_all, t_all)
    rec2 = make_submodel(rng, [2, 3, 4, 5, 6], pts, None, q_all, t_all)
    # split one src point into two halves observing the same physical point
    pid = next(iter(rec2.points3D))
    pt = rec2.points3D[pid]
    half = pt.track[: len(pt.track) // 2]
    rest = pt.track[len(pt.track) // 2:]
    pt.track = half
    rec2.add_point3D(pt.xyz.copy(), rest)
    n_before = len(rec1.points3D)
    assert merge_into(rec1, rec2)
    assert len(rec1.points3D) == n_before  # no duplicate created
    rec1.compute_reprojection_errors()
    assert rec1.mean_reprojection_error() < 0.5


def test_merge_into_skips_unregistered_dst_images(rng, scene):
    """Observations on an unregistered dst image are not folded in."""
    pts, q_all, t_all = scene
    rec1 = make_submodel(rng, [0, 1, 2, 3, 4], pts, None, q_all, t_all)
    rec2 = make_submodel(rng, [2, 3, 4, 5, 6], pts, None, q_all, t_all)
    rec2.images[6].registered = False
    assert merge_into(rec1, rec2)
    for pt in rec1.points3D.values():
        assert all(iid != 6 for (iid, _) in pt.track)
    assert not rec1.images[6].registered


def test_merge_fails_without_overlap(rng, scene):
    pts, q_all, t_all = scene
    rec1 = make_submodel(rng, [0, 1, 2], pts, None, q_all, t_all)
    rec2 = make_submodel(rng, [5, 6, 7], pts, None, q_all, t_all)
    assert not merge_into(rec1, rec2)


def test_merge_all_tree_reduction(rng, scene):
    pts, q_all, t_all = scene
    subs = []
    for start in [0, 2, 4]:
        ids = list(range(start, start + 4))
        sim3 = (1.0 + 0.3 * start,
                np.asarray(geom.angle_axis_to_quat(rng.normal(size=3) * 0.1)),
                rng.normal(size=3))
        subs.append(make_submodel(rng, ids, pts, None, q_all, t_all, sim3=sim3))
    merged = merge_all(subs)
    assert merged.num_registered == 8
    merged.compute_reprojection_errors()
    assert merged.mean_reprojection_error() < 0.5


def test_make_clusters():
    c = cluster_mod.make_clusters(list(range(10)), cluster_size=4, cluster_overlap=2)
    assert c[0] == [0, 1, 2, 3]
    assert c[1] == [2, 3, 4, 5]
    # consecutive clusters share exactly cluster_overlap images
    for a, b in zip(c, c[1:]):
        assert len(set(a) & set(b)) == 2
    # all images covered
    assert set().union(*map(set, c)) == set(range(10))
    # small set -> single cluster
    assert cluster_mod.make_clusters([1, 2, 3], 10, 5) == [[1, 2, 3]]


def test_subgraph_carries_pair_matches(rng):
    """subgraph() must attach the restricted per-pair match lists to the
    sub-graph: without them the device mapper's track builder re-derives
    every pair from per-keypoint adjacency (measured 23x slower prep)."""
    from test_incremental import build_synthetic_scene

    kp, cams, graph, tv, _ = build_synthetic_scene(rng, num_images=6,
                                                   num_points=150)
    members = [0, 1, 2, 3]
    g, _ = cluster_mod.subgraph(graph, tv, members)
    pm = getattr(g, "pair_matches", None)
    assert pm is not None and len(pm) > 0
    for (i, j), pairs in pm.items():
        assert i in members and j in members and i < j
        # lists agree with the sub-graph's own adjacency counts
        assert len(pairs) > 0
        assert g.num_pair_inliers(i, j) >= 0


def test_device_mapper_host_fallback(rng, monkeypatch, caplog):
    """A cluster the device mapper under-registers (below
    mapper.device_fallback_min_frac of its members) retries on the host
    mapper's exact schedule — per-cluster failure tolerance, the cluster
    analog of the reference's per-image PatchMatch tolerance
    (patch_match.cc:108-114)."""
    import logging

    from test_incremental import build_synthetic_scene

    from scanner_colmap_tpu.engine import device_cluster
    from scanner_colmap_tpu.utils.config import MapperConfig, MergeConfig

    kp, cams, graph, tv, (qs, ts, pts) = build_synthetic_scene(
        rng, num_images=8, num_points=250)
    cfg = MapperConfig()
    cfg.mode = "device"
    cfg.device_batch_clusters = False
    cfg.cluster_size = 6
    cfg.cluster_overlap = 2
    cfg.init_min_num_inliers = 20
    cfg.abs_pose_min_num_inliers = 12
    cfg.single_camera = True

    def broken_device_mapper(*args, **kwargs):
        rec = Reconstruction()  # registers nothing
        return (lambda: rec) if not kwargs.get("block", True) else rec

    monkeypatch.setattr(device_cluster, "map_cluster_device",
                        broken_device_mapper)
    with caplog.at_level(logging.WARNING):
        merged, subs = cluster_mod.run_clustered_mapping(
            kp, cams, graph, tv, cfg, MergeConfig(final_ba=False))
    assert any("host retry registered" in r.message for r in caplog.records)
    assert merged.num_registered >= 7
    assert all(s.num_registered >= 4 for s in subs)
