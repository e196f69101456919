"""Device-resident cluster mapper (ops/device_mapper.py): the whole
incremental solve as ONE jitted program, validated against the synthetic
scene used by the host engine's tests (same inputs, comparable ATE)."""

import numpy as np
import pytest

from test_incremental import align_and_ate, build_synthetic_scene

from scanner_colmap_tpu.engine.cluster import run_clustered_mapping
from scanner_colmap_tpu.engine.device_cluster import (build_tracks_packed,
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
    tr_img, tr_kp, tr_len = build_tracks_packed(sorted(kp.keys()), kp, graph,
                                                max_track=8)
    assert len(tr_len) > 50
    assert tr_img.shape == tr_kp.shape == (len(tr_len), tr_img.shape[1])
    assert tr_img.shape[1] <= 8
    for p in range(len(tr_len)):
        L = int(tr_len[p])
        assert 2 <= L <= 8
        imgs = tr_img[p, :L].tolist()
        assert len(set(imgs)) == L          # one observation per image
        assert np.all(tr_img[p, L:] == -1)  # -1 beyond the track length
        for t in range(L):
            assert 0 <= tr_kp[p, t] < len(kp[int(tr_img[p, t])])


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


@pytest.mark.slow
def test_device_batch_mixed_sizes(rng):
    """map_clusters_device_batch pads clusters of different sizes to common
    (M, P, T) — results must match the quality of per-cluster solves, and a
    lane that cannot seed must come back empty without poisoning the rest."""
    from scanner_colmap_tpu.engine.cluster import subgraph
    from scanner_colmap_tpu.engine.device_cluster import (
        map_clusters_device_batch)

    kp, cams, graph, tv, (qs, ts, pts) = build_synthetic_scene(
        rng, num_images=10, num_points=300)
    cfg = _cfg()
    groups = [list(range(0, 9)), list(range(6, 10))]   # 9 vs 4 images
    args = []
    for ci, members in enumerate(groups):
        g, tvs = subgraph(graph, tv, members)
        args.append(({i: kp[i] for i in members},
                     {i: cams[i] for i in members}, g, tvs, ci))
    # an unseedable lane: impossibly high init threshold via its own config
    # is per-batch, so instead pass a 2-image cluster with no matches
    g_e, _ = subgraph(graph, tv, [0, 9])
    args.append(({0: kp[0], 9: kp[9]}, {0: cams[0], 9: cams[9]}, g_e,
                 {}, 99))
    recs = map_clusters_device_batch(args, cfg)
    assert len(recs) == 3
    assert recs[0].num_registered >= 8
    assert recs[1].num_registered >= 3
    assert recs[2].num_registered == 0
    assert align_and_ate(recs[0], qs, ts) < 0.05


def test_device_mapper_no_initial_pair(rng):
    """Weak two-view geometry -> empty reconstruction, no crash."""
    kp, cams, graph, tv, _ = build_synthetic_scene(rng, num_images=4,
                                                   num_points=120)
    cfg = _cfg()
    cfg.init_min_num_inliers = 10 ** 6
    rec = map_cluster_device(kp, cams, graph, tv, cfg, seed=0)
    assert rec.num_registered == 0
    assert len(rec.points3D) == 0


def test_registration_order_visible_points():
    """The visible-points schedule must register images in order of
    triangulated-track support, not raw connectivity: an image whose
    tracks all lack two registered views scores 0 until support exists."""
    import numpy as np

    from scanner_colmap_tpu.engine.device_cluster import (
        _registration_order_tracks)

    # 5 images; tracks (rows) over local indices; -1 pads
    tr = np.array([
        [0, 1, 2, -1],   # seen by init pair -> visible once 0,1 registered
        [0, 1, 3, -1],
        [2, 3, -1, -1],  # not visible until 2 or 3 registered
        [3, 4, -1, -1],
        [2, 4, -1, -1],
    ], np.int32)
    order = _registration_order_tracks(5, tr, la=0, lb=1)
    assert sorted(order) == [2, 3, 4]
    # 2 and 3 each see one track with >=2 registered obs (rows 0/1); 4 sees
    # none -> 4 must come last
    assert order[-1] == 4
