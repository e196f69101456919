import numpy as np
import pytest

from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.models.reconstruction import Camera, Image, Point3D, Reconstruction
from scanner_colmap_tpu.utils import colmap_io
from scanner_colmap_tpu.utils.config import PipelineConfig
from scanner_colmap_tpu.utils.store import ArtifactStore


# ---------------------------------------------------------------------------
# ArtifactStore
# ---------------------------------------------------------------------------

def test_store_uniform_roundtrip(tmp_path, rng):
    store = ArtifactStore(str(tmp_path))
    x = rng.normal(size=(10, 4)).astype(np.float32)
    ids = np.arange(10, dtype=np.int64)
    store.write_table("frames", {"image_id": ids, "feat": x}, meta={"stage": "test"})
    assert store.has_table("frames")
    out = store.read_table("frames")
    assert np.array_equal(out["image_id"], ids)
    assert np.array_equal(out["feat"], x)
    assert store.num_rows("frames") == 10
    assert store.read_manifest("frames")["meta"]["stage"] == "test"


def test_store_ragged_roundtrip(tmp_path, rng):
    store = ArtifactStore(str(tmp_path))
    rows = [rng.normal(size=(n, 2)).astype(np.float32) for n in [3, 0, 7]]
    store.write_table("kp", {"keypoints": rows})
    out = store.read_table("kp")["keypoints"]
    assert len(out) == 3
    for a, b in zip(rows, out):
        assert np.array_equal(a, b)


def test_store_bytes_roundtrip(tmp_path):
    store = ArtifactStore(str(tmp_path))
    rows = [b"hello", b"", b"worlds"]
    store.write_table("blobs", {"data": rows})
    assert store.read_table("blobs")["data"] == rows


def test_store_row_count_mismatch(tmp_path):
    store = ArtifactStore(str(tmp_path))
    with pytest.raises(ValueError):
        store.write_table("bad", {"a": np.zeros(3), "b": np.zeros(4)})


def test_store_overwrite_atomic(tmp_path):
    store = ArtifactStore(str(tmp_path))
    store.write_table("t", {"a": np.zeros(2)})
    store.write_table("t", {"a": np.ones(5)})
    assert store.num_rows("t") == 5
    assert np.array_equal(store.read_table("t")["a"], np.ones(5))
    assert store.list_tables() == ["t"]


# ---------------------------------------------------------------------------
# COLMAP binary interchange
# ---------------------------------------------------------------------------

def make_test_reconstruction(rng) -> Reconstruction:
    rec = Reconstruction()
    rec.add_camera(Camera(1, camlib.SIMPLE_RADIAL, 640, 480,
                          np.array([700.0, 320.0, 240.0, 0.01])))
    rec.add_camera(Camera(2, camlib.PINHOLE, 800, 600,
                          np.array([650.0, 660.0, 400.0, 300.0])))
    for i, cam_id in [(1, 1), (2, 1), (3, 2)]:
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        im = Image(image_id=i, camera_id=cam_id, name=f"img_{i}.jpg",
                   qvec=q, tvec=rng.normal(size=3),
                   xys=rng.uniform(0, 600, size=(5, 2)),
                   point3D_ids=np.full(5, -1, dtype=np.int64),
                   registered=True)
        rec.add_image(im)
    rec.add_point3D(rng.normal(size=3), [(1, 0), (2, 1)], rgb=[255, 0, 10], error=0.5)
    rec.add_point3D(rng.normal(size=3), [(1, 2), (3, 0)], rgb=[0, 128, 255], error=1.5)
    return rec


def test_colmap_model_roundtrip(tmp_path, rng):
    rec = make_test_reconstruction(rng)
    path = str(tmp_path / "model")
    colmap_io.write_model(rec, path)
    rec2 = colmap_io.read_model(path)

    assert set(rec2.cameras) == set(rec.cameras)
    for cid in rec.cameras:
        a, b = rec.cameras[cid], rec2.cameras[cid]
        assert a.model_id == b.model_id and a.width == b.width and a.height == b.height
        assert np.allclose(a.params, b.params)
    assert set(rec2.images) == set(rec.images)
    for iid in rec.images:
        a, b = rec.images[iid], rec2.images[iid]
        assert a.name == b.name and a.camera_id == b.camera_id
        assert np.allclose(a.qvec, b.qvec) and np.allclose(a.tvec, b.tvec)
        assert np.allclose(a.xys, b.xys)
        assert np.array_equal(a.point3D_ids, b.point3D_ids)
    assert set(rec2.points3D) == set(rec.points3D)
    for pid in rec.points3D:
        a, b = rec.points3D[pid], rec2.points3D[pid]
        assert np.allclose(a.xyz, b.xyz) and np.array_equal(a.rgb, b.rgb)
        assert a.track == b.track and np.isclose(a.error, b.error)


def test_reconstruction_observation_management(rng):
    rec = make_test_reconstruction(rng)
    pid = list(rec.points3D)[0]
    track = rec.points3D[pid].track
    img, idx = track[0]
    rec.remove_observation(pid, img, idx)
    # track fell below 2 -> point removed, back-references cleared
    assert pid not in rec.points3D
    for im in rec.images.values():
        assert not np.any(im.point3D_ids == pid)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

def test_config_roundtrip_and_overrides():
    cfg = PipelineConfig()
    cfg2 = PipelineConfig.from_json(cfg.to_json())
    assert cfg2.matching.overlap == cfg.matching.overlap == 10
    cfg2.apply_overrides({"matching.overlap": "5", "mapper.cluster_size": 12,
                          "sift.peak_threshold": "0.01"})
    assert cfg2.matching.overlap == 5
    assert cfg2.mapper.cluster_size == 12
    assert np.isclose(cfg2.sift.peak_threshold, 0.01)
