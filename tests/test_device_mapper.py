"""Device-resident cluster mapper (ops/device_mapper.py): the whole
incremental solve as ONE jitted program, validated against the synthetic
scene used by the host engine's tests (same inputs, comparable ATE)."""

import numpy as np
import pytest

from test_incremental import align_and_ate, build_synthetic_scene

from scanner_colmap_tpu.engine.cluster import run_clustered_mapping
from scanner_colmap_tpu.engine.device_cluster import (build_tracks,
                                                      map_cluster_device)
from scanner_colmap_tpu.utils.config import MapperConfig


def _cfg():
    cfg = MapperConfig()
    cfg.init_min_num_inliers = 20
    cfg.abs_pose_min_num_inliers = 12
    cfg.single_camera = True
    return cfg


def test_build_tracks_union_find(rng):
    kp, cams, graph, tv, _ = build_synthetic_scene(rng, num_images=6,
                                                   num_points=200)
    tracks = build_tracks(sorted(kp.keys()), kp, graph, max_track=8)
    assert len(tracks) > 50
    for tr in tracks:
        assert 2 <= len(tr) <= 8
        imgs = [li for li, _ in tr]
        assert len(set(imgs)) == len(imgs)  # one observation per image
        for li, k in tr:
            assert 0 <= k < len(kp[li])


@pytest.mark.slow
def test_device_mapper_synthetic(rng):
    kp, cams, graph, tv, (qs, ts, pts) = build_synthetic_scene(
        rng, num_images=8, num_points=300)
    rec = map_cluster_device(kp, cams, graph, tv, _cfg(), seed=0)
    assert rec.num_registered >= 7
    assert len(rec.points3D) > 100
    assert rec.mean_reprojection_error() < 1.0
    assert align_and_ate(rec, qs, ts) < 0.05


@pytest.mark.slow
def test_device_mode_clustered(rng):
    """mode='device' through the cluster scheduler: submodels + merge work
    exactly as in host mode."""
    kp, cams, graph, tv, (qs, ts, pts) = build_synthetic_scene(
        rng, num_images=10, num_points=300)
    cfg = _cfg()
    cfg.mode = "device"
    cfg.cluster_size = 7
    cfg.cluster_overlap = 3
    model, subs = run_clustered_mapping(kp, cams, graph, tv, cfg)
    assert len(subs) == 2
    assert model.num_registered >= 9
    assert align_and_ate(model, qs, ts) < 0.08


def test_device_mapper_no_initial_pair(rng):
    """Weak two-view geometry -> empty reconstruction, no crash."""
    kp, cams, graph, tv, _ = build_synthetic_scene(rng, num_images=4,
                                                   num_points=120)
    cfg = _cfg()
    cfg.init_min_num_inliers = 10 ** 6
    rec = map_cluster_device(kp, cams, graph, tv, cfg, seed=0)
    assert rec.num_registered == 0
    assert len(rec.points3D) == 0
