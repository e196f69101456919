"""Post-merge iterative global refinement (COLMAP IterativeGlobalRefinement
over the MERGED model with the full correspondence graph —
engine/merge.iterative_global_refinement). The per-cluster solves never see
matches that span cluster boundaries; retriangulation over the full graph
creates those cross-cluster tracks, the constraint the pairwise Sim(3)
merge cannot generate (the drift bound in PERFORMANCE.md Known bounds)."""

import numpy as np

from test_incremental import align_and_ate, build_synthetic_scene

from scanner_colmap_tpu.engine.cluster import run_clustered_mapping
from scanner_colmap_tpu.engine.merge import iterative_global_refinement
from scanner_colmap_tpu.utils.config import MapperConfig, MergeConfig


def _cfg():
    cfg = MapperConfig()
    cfg.cluster_size = 6
    cfg.cluster_overlap = 2
    cfg.init_min_num_inliers = 20
    cfg.abs_pose_min_num_inliers = 12
    cfg.single_camera = True
    return cfg


def test_single_ba_fallback_still_refines(rng):
    """merge.iterative_refine=False keeps the single global-BA path
    (global_refine) working — the fallback when no matching table exists."""
    from scanner_colmap_tpu.engine.merge import global_refine

    kp, cams, graph, tv, (qs, ts, pts) = build_synthetic_scene(
        rng, num_images=8, num_points=250)
    cfg = _cfg()
    merged, subs = run_clustered_mapping(kp, cams, graph, tv, cfg,
                                         MergeConfig(final_ba=False))
    info = global_refine(merged)
    assert info is not None
    assert info["final_cost"] <= info["initial_cost"]
    assert merged.mean_reprojection_error() < 1.0


def test_iterative_refinement_builds_cross_cluster_tracks(rng):
    kp, cams, graph, tv, (qs, ts, pts) = build_synthetic_scene(
        rng, num_images=12, num_points=300)
    cfg = _cfg()
    merged, subs = run_clustered_mapping(kp, cams, graph, tv, cfg,
                                         MergeConfig(final_ba=False))
    assert len(subs) >= 2
    ate_merged = align_and_ate(merged, qs, ts)

    refined = iterative_global_refinement(merged, kp, cams, graph, tv, cfg)
    ate_ref = align_and_ate(refined, qs, ts)

    assert refined.num_registered >= merged.num_registered - 1
    # refinement never makes the trajectory meaningfully worse, and the
    # refined reprojection error is tight
    assert ate_ref <= ate_merged * 1.25 + 1e-3, (ate_ref, ate_merged)
    assert refined.mean_reprojection_error() < 1.0

    # the mechanism: tracks now SPAN cluster boundaries. With cluster
    # size 6 / overlap 2 on 12 images, per-cluster tracks span <= 6 images;
    # full-graph retriangulation joins observations across clusters.
    max_span = 0
    for pt in refined.points3D.values():
        iids = [iid for iid, _ in pt.track]
        if iids:
            max_span = max(max_span, max(iids) - min(iids))
    assert max_span > 6, max_span
