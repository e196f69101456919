"""Native runtime components: corr_graph equivalence vs the Python graph,
table_io atomic write + mmap read."""

import ctypes
import os

import numpy as np
import pytest

from scanner_colmap_tpu.engine.correspondence import CorrespondenceGraph
from scanner_colmap_tpu.engine.native_graph import load_native, NativeCorrespondenceGraph


needs_native = pytest.mark.skipif(load_native() is None,
                                  reason="native toolchain unavailable")


def random_graphs(rng, n_images=6, n_kp=40, n_pairs=8, matches_per_pair=15):
    py = CorrespondenceGraph()
    nat = NativeCorrespondenceGraph()
    for i in range(n_images):
        py.add_image(i, n_kp)
        nat.add_image(i, n_kp)
    for _ in range(n_pairs):
        i, j = rng.choice(n_images, 2, replace=False)
        pairs = np.stack([rng.choice(n_kp, matches_per_pair, replace=False),
                          rng.choice(n_kp, matches_per_pair, replace=False)], axis=1)
        py.add_matches(int(i), int(j), pairs)
        nat.add_matches(int(i), int(j), pairs)
    return py, nat


@needs_native
def test_native_graph_equivalence(rng):
    py, nat = random_graphs(rng)
    assert sorted(py.image_ids) == sorted(nat.image_ids)
    assert sorted(py.pairs) == sorted(nat.pairs)
    for i in py.image_ids:
        assert py.num_keypoints(i) == nat.num_keypoints(i)
        assert py.num_correspondences(i) == nat.num_correspondences(i)
        for k in range(py.num_keypoints(i)):
            assert sorted(py.correspondences(i, k)) == \
                sorted(nat.correspondences(i, k)), (i, k)
    for (i, j) in py.pairs:
        assert py.num_pair_inliers(i, j) == nat.num_pair_inliers(i, j)


@needs_native
def test_native_graph_point_state_and_scans(rng):
    py, nat = random_graphs(rng, n_images=5, n_kp=30, n_pairs=6)
    # simulate engine state: register images 0,1; assign points to some kps
    point_of = {}
    for g in (nat,):
        g.set_registered(0, True)
        g.set_registered(1, True)
    pid = 100
    for i in (0, 1):
        for k in rng.choice(30, 10, replace=False):
            nat.set_point(i, int(k), pid)
            point_of[(i, int(k))] = pid
            pid += 1

    def py_point_of(i, k):
        return point_of.get((i, int(k)), -1)

    # visible-point counts match the python reference computation
    for i in range(2, 5):
        expected = py.num_visible_points3D(i, py_point_of)
        assert nat.num_visible_points3D_fast(i) == expected, i

    # 2D-3D correspondences: every returned (kp, pid) is truthful
    for i in range(2, 5):
        kps, pids = nat.corrs_2d3d(i)
        assert len(kps) == len(set(kps))  # one per keypoint
        for k, p in zip(kps, pids):
            found = [point_of.get((j, kj), -1)
                     for (j, kj) in py.correspondences(i, int(k)) if j in (0, 1)]
            assert p in found

    # new-track candidates: first element is the query image; partners are
    # registered + unassigned
    tracks = nat.new_track_candidates(2)
    for t in tracks:
        assert t[0][0] == 2
        assert len(t) >= 2
        for (j, kj) in t[1:]:
            assert j in (0, 1)
            assert point_of.get((j, kj), -1) < 0


@needs_native
def test_native_table_io(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native"))
    try:
        from build import build
    finally:
        sys.path.pop(0)
    lib = ctypes.CDLL(build("table_io"))
    lib.tio_write_atomic.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_int64]
    lib.tio_write_atomic.restype = ctypes.c_int64
    lib.tio_mmap_open.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_void_p),
                                  ctypes.POINTER(ctypes.c_int64)]
    lib.tio_mmap_open.restype = ctypes.c_int64
    lib.tio_mmap_close.argtypes = [ctypes.c_void_p, ctypes.c_int64]

    data = np.arange(1000, dtype=np.float32)
    p = str(tmp_path / "col.bin").encode()
    rc = lib.tio_write_atomic(p, data.ctypes.data_as(ctypes.c_void_p),
                              data.nbytes)
    assert rc == 0
    ptr = ctypes.c_void_p()
    size = ctypes.c_int64()
    rc = lib.tio_mmap_open(p, ctypes.byref(ptr), ctypes.byref(size))
    assert rc == 0 and size.value == data.nbytes
    buf = (ctypes.c_byte * size.value).from_address(ptr.value)
    back = np.frombuffer(buf, dtype=np.float32).copy()
    assert np.array_equal(back, data)
    lib.tio_mmap_close(ptr, size)
    # no stray tmp files
    assert [f for f in os.listdir(tmp_path)] == ["col.bin"]
