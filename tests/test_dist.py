"""Multi-host scaffolding: partitioning, store barrier, sharded mapping
(single-process degenerate + simulated 2-host flow through the store)."""

import numpy as np
import pytest

from scanner_colmap_tpu.parallel import dist
from scanner_colmap_tpu.utils.store import ArtifactStore


def test_partition_round_robin_explicit():
    items = list(range(10))
    p0 = dist.partition_round_robin(items, process_id=0, num_processes=3)
    p1 = dist.partition_round_robin(items, process_id=1, num_processes=3)
    p2 = dist.partition_round_robin(items, process_id=2, num_processes=3)
    assert p0 == [0, 3, 6, 9] and p1 == [1, 4, 7] and p2 == [2, 5, 8]
    assert sorted(p0 + p1 + p2) == items


def test_partition_single_process_default():
    items = list(range(5))
    assert dist.partition_round_robin(items) == items


def test_store_barrier_single(tmp_path):
    store = ArtifactStore(str(tmp_path))
    dist.barrier_via_store(store, "phase1", timeout_s=5)
    assert store.has_table("phase1_ready_0")


def test_store_barrier_times_out_waiting_for_peer(tmp_path, monkeypatch):
    store = ArtifactStore(str(tmp_path))
    monkeypatch.setattr(dist, "process_info", lambda: (0, 2))
    with pytest.raises(TimeoutError):
        dist.barrier_via_store(store, "p", timeout_s=0.5, poll_s=0.1)


def test_run_mapping_distributed_single_process(tmp_path, rng):
    """Degenerate 1-host run equals the regular mapping stage contract."""
    from scanner_colmap_tpu.pipeline import stages, synth
    from scanner_colmap_tpu.utils.config import PipelineConfig

    d = str(tmp_path / "imgs")
    synth.generate_dataset(d, num_images=6, width=256, height=192,
                           num_blobs=250, seed=2)
    cfg = PipelineConfig()
    cfg.image_path = d
    cfg.store_path = str(tmp_path / "store")
    cfg.sift.max_image_size = 256
    cfg.sift.max_num_features = 384
    cfg.sift.num_octaves = 3
    cfg.matching.overlap = 3
    cfg.matching.min_num_inliers = 12
    cfg.mapper.cluster_size = 6
    cfg.mapper.cluster_overlap = 2
    cfg.mapper.init_min_num_inliers = 20
    cfg.mapper.abs_pose_min_num_inliers = 12
    store = ArtifactStore(cfg.store_path)
    stages.prepare_images(cfg, store)
    stages.run_extraction(cfg, store)
    stages.run_matching(cfg, store)

    n = dist.run_mapping_distributed(cfg, store)
    assert n >= 1
    assert store.has_table("mapping")
    assert store.has_table("mapping_shard_0")
    model = stages.run_merge(cfg, store)
    assert model.num_registered >= 4


def test_run_matching_distributed_single_process(tmp_path, rng):
    """Single-process degenerate case: shard 0 of 1 == full matching table."""
    from scanner_colmap_tpu.parallel.dist import run_matching_distributed
    from scanner_colmap_tpu.pipeline import stages, synth
    from scanner_colmap_tpu.utils.config import PipelineConfig
    from scanner_colmap_tpu.utils.store import ArtifactStore

    image_dir = str(tmp_path / "imgs")
    synth.generate_dataset(image_dir, num_images=6, width=320, height=240,
                           num_blobs=300, seed=4)
    cfg = PipelineConfig()
    cfg.image_path = image_dir
    cfg.store_path = str(tmp_path / "store")
    cfg.sift.max_image_size = 320
    cfg.sift.max_num_features = 512
    cfg.sift.num_octaves = 3
    cfg.matching.overlap = 3
    cfg.matching.min_num_inliers = 12
    store = ArtifactStore(cfg.store_path)
    stages.prepare_images(cfg, store)
    stages.run_extraction(cfg, store)
    n = run_matching_distributed(cfg, store)
    assert n is not None and n >= 5
    # identical to the single-host stage output (row order is canonical)
    stages.run_matching(cfg, store, out_table="matching_ref")
    a = store.read_table("matching")
    b = store.read_table("matching_ref")
    import numpy as np
    pa = np.asarray(a["pair_image_ids"]).reshape(-1, 2)
    pb = np.asarray(b["pair_image_ids"]).reshape(-1, 2)
    assert sorted(map(tuple, pa)) == sorted(map(tuple, pb))
