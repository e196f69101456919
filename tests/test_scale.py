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


def test_store_large_columns_mmap_and_native_write(tmp_path, monkeypatch):
    """Large columns round-trip through the native atomic writer and come
    back as zero-copy memmaps; small columns stay eager arrays."""
    import numpy as np

    from scanner_colmap_tpu.utils import store as store_mod
    from scanner_colmap_tpu.utils.store import ArtifactStore

    st = ArtifactStore(str(tmp_path))
    big = np.arange(600_000, dtype=np.float32).reshape(-1, 3)  # ~7 MB
    st.write_table("big", {"flat": big})
    st.write_table("bigr", {"ragged": [big[:120_000], big[120_000:]]})
    st.write_table("small", {"ids": np.arange(10, dtype=np.int64)})
    t = st.read_table("big")
    assert isinstance(t["flat"], np.memmap)
    np.testing.assert_array_equal(np.asarray(t["flat"]), big)
    tr = st.read_table("bigr")
    assert isinstance(np.asarray(tr["ragged"][0]).base, np.memmap)
    np.testing.assert_array_equal(np.asarray(tr["ragged"][1]), big[120_000:])
    assert not isinstance(st.read_table("small")["ids"], np.memmap)

    # python-IO fallback produces identical bytes
    monkeypatch.setattr(store_mod, "_TIO", None)
    monkeypatch.setattr(store_mod, "_TIO_TRIED", True)
    st.write_table("big2", {"flat": big})
    np.testing.assert_array_equal(np.asarray(st.read_table("big2")["flat"]),
                                  big)


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
