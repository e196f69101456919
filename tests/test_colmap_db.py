"""COLMAP SQLite database interchange (VERDICT r4 #7).

The database is the reference pipeline's real interchange surface — its
mapping kernel feeds COLMAP through a temp SQLite db
(incremental_mapping.cc:281-293) — so a real dataset COLMAP has processed
must replay here through mapping/merge with zero new code. Covers:
byte-level write/read round-trip, export -> import table parity, a full
replay of an imported db through mapping+merge, and pose/tri_angle
rebuild when the db carries no pose (pre-3.7 schemas)."""

import numpy as np
import pytest

from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.pipeline import stages, synth
from scanner_colmap_tpu.utils import colmap_db
from scanner_colmap_tpu.utils.config import PipelineConfig
from scanner_colmap_tpu.utils.store import ArtifactStore


def test_pair_id_round_trip():
    for a, b in [(1, 2), (2, 1), (7, 7), (1, 2147483640)]:
        pid = colmap_db.pair_id_from_images(a, b)
        lo, hi = colmap_db.images_from_pair_id(pid)
        assert (lo, hi) == (min(a, b), max(a, b))


def test_keypoint_affine_conversion():
    # 6-col affine: scale = mean column norm, orientation = atan2(a21, a11)
    s, th = 2.5, 0.7
    a11, a21 = s * np.cos(th), s * np.sin(th)
    a12, a22 = -s * np.sin(th), s * np.cos(th)
    arr = np.array([[10.0, 20.0, a11, a12, a21, a22]], np.float32)
    out = colmap_db._keypoints_to_xyso(arr)
    assert np.allclose(out[0, :2], [10, 20])
    assert np.isclose(out[0, 2], s, atol=1e-5)
    assert np.isclose(out[0, 3], th, atol=1e-5)
    # 2-col: unit scale, zero orientation
    out2 = colmap_db._keypoints_to_xyso(np.array([[1.0, 2.0]], np.float32))
    assert np.allclose(out2[0], [1, 2, 1, 0])


def test_database_write_read_round_trip(tmp_path):
    rng = np.random.default_rng(3)
    cams = {1: {"model": camlib.SIMPLE_PINHOLE, "width": 640, "height": 480,
                "params": np.array([500.0, 320.0, 240.0]),
                "prior_focal_length": True}}
    images = {1: {"name": "a.jpg", "camera_id": 1},
              2: {"name": "b.jpg", "camera_id": 1}}
    kps = {1: rng.random((30, 4)).astype(np.float32) * 100,
           2: rng.random((25, 6)).astype(np.float32) * 100}
    descs = {i: rng.integers(0, 255, (len(kps[i]), 128), dtype=np.uint8)
             for i in (1, 2)}
    mm = {(2, 1): np.array([[3, 5], [7, 1]], np.uint32)}  # flipped order
    tvg = {(1, 2): {"config": 2,
                    "inlier_matches": np.array([[5, 3]], np.uint32),
                    "E": rng.random((3, 3)), "F": rng.random((3, 3)),
                    "H": rng.random((3, 3)),
                    "qvec": np.array([1.0, 0, 0, 0]),
                    "tvec": np.array([0.1, 0.2, 0.3])}}
    path = str(tmp_path / "database.db")
    colmap_db.write_database(path, cams, images, kps, descs, mm, tvg)
    back = colmap_db.read_database(path)

    c = back["cameras"][1]
    assert (c["model"], c["width"], c["height"]) == (0, 640, 480)
    assert np.array_equal(c["params"], cams[1]["params"])
    assert c["prior_focal_length"] is True
    assert back["images"][2]["name"] == "b.jpg"
    for i in (1, 2):
        assert np.array_equal(back["keypoints"][i], kps[i])
        assert np.array_equal(back["descriptors"][i], descs[i])
    # matches stored under ordered pair id with flipped columns
    assert np.array_equal(back["matches"][(1, 2)],
                          np.array([[5, 3], [1, 7]], np.uint32))
    g = back["two_view_geometries"][(1, 2)]
    assert g["config"] == 2
    assert np.array_equal(g["inlier_matches"], tvg[(1, 2)]["inlier_matches"])
    for k in ("E", "F", "H"):
        assert np.allclose(g[k], tvg[(1, 2)][k])
    assert np.allclose(g["qvec"], tvg[(1, 2)]["qvec"])
    assert np.allclose(g["tvec"], tvg[(1, 2)]["tvec"])


@pytest.fixture(scope="module")
def matched_store(tmp_path_factory):
    d = tmp_path_factory.mktemp("dbsynth")
    gt = synth.generate_dataset(str(d), num_images=8, width=320, height=240,
                                num_blobs=350, seed=1)
    cfg = PipelineConfig()
    cfg.image_path = str(d)
    cfg.store_path = str(tmp_path_factory.mktemp("dbstore"))
    cfg.sift.max_image_size = 320
    cfg.sift.max_num_features = 512
    cfg.sift.num_octaves = 3
    cfg.matching.overlap = 4
    cfg.matching.min_num_inliers = 12
    cfg.mapper.cluster_size = 8
    cfg.mapper.cluster_overlap = 3
    cfg.mapper.init_min_num_inliers = 20
    cfg.mapper.abs_pose_min_num_inliers = 12
    store = ArtifactStore(cfg.store_path)
    stages.prepare_images(cfg, store)
    stages.run_extraction(cfg, store)
    stages.run_matching(cfg, store)
    return cfg, store, gt


@pytest.mark.slow
def test_export_import_replay(matched_store, tmp_path_factory):
    """export_colmap_db -> import_colmap_db reproduces the extraction and
    matching tables, and the imported store replays through mapping+merge
    with full registration — the zero-new-code replay contract."""
    cfg, store, gt = matched_store
    dbp = str(tmp_path_factory.mktemp("dbx") / "database.db")
    n_pairs = stages.export_colmap_db(cfg, store, database_path=dbp)
    assert n_pairs > 0

    cfg2 = PipelineConfig()
    cfg2.image_path = cfg.image_path
    cfg2.store_path = str(tmp_path_factory.mktemp("dbstore2"))
    for f in ("mapper",):
        setattr(cfg2, f, getattr(cfg, f))
    store2 = ArtifactStore(cfg2.store_path)
    stages.import_colmap_db(cfg2, store2, database_path=dbp)

    # extraction parity: identical keypoints/descriptors, same intrinsics
    e1 = store.read_table("extraction")
    e2 = store2.read_table("extraction")
    assert np.array_equal(np.asarray(e1["image_id"]),
                          np.asarray(e2["image_id"]))
    for n in range(len(e1["image_id"])):
        assert np.allclose(e1["keypoints"][n], e2["keypoints"][n],
                           atol=1e-5)
        assert np.array_equal(np.asarray(e1["descriptors"][n], np.uint8),
                              np.asarray(e2["descriptors"][n], np.uint8))
        c1, c2 = np.asarray(e1["camera"][n]), np.asarray(e2["camera"][n])
        assert c1[0] == c2[0]                     # model id
        np1 = camlib.MODEL_NUM_PARAMS[int(c1[0])]
        assert np.allclose(c1[5:5 + np1], c2[5:5 + np1])

    # matching parity: same pair set, same inlier matches per pair
    m1 = store.read_table("matching")
    m2 = store2.read_table("matching")
    p1 = {tuple(p): np.asarray(m1["matches"][n]).reshape(-1, 2)
          for n, p in enumerate(np.asarray(m1["pair_image_ids"])
                                .reshape(-1, 2).tolist())}
    p2 = {tuple(p): np.asarray(m2["matches"][n]).reshape(-1, 2)
          for n, p in enumerate(np.asarray(m2["pair_image_ids"])
                                .reshape(-1, 2).tolist())}
    assert set(p1) == set(p2)
    for k in p1:
        a = p1[k][np.lexsort(p1[k].T)]
        b = p2[k][np.lexsort(p2[k].T)]
        assert np.array_equal(a, b), k

    # replay through mapping + merge on the IMPORTED store
    stages.run_mapping(cfg2, store2)
    model = stages.run_merge(cfg2, store2)
    assert model.num_registered == 8
    ate = synth.evaluate_ate(model, gt)
    assert float(ate) < 0.05, float(ate)

    # the dense leg of the replay promise: the import must join the
    # db's bare image names onto image_path so the MVS prep can reload
    # original pixels from frames.path
    cfg2.patch_match.max_image_size = 96
    stages.run_prepare_patch_match(cfg2, store2)
    assert store2.num_rows("prepare_patch_match") == 8


@pytest.mark.slow
def test_import_rebuilds_pose_when_absent(matched_store, tmp_path_factory):
    """A db without pose columns (pre-3.7 COLMAP) must still replay: the
    import rebuilds qvec/tvec/tri_angle from E for calibrated pairs."""
    cfg, store, gt = matched_store
    dbp = str(tmp_path_factory.mktemp("dbnp") / "database.db")
    stages.export_colmap_db(cfg, store, database_path=dbp)
    # strip the pose columns the way an old-schema db would lack them
    import sqlite3

    con = sqlite3.connect(dbp)
    con.execute("UPDATE two_view_geometries SET qvec = NULL, tvec = NULL")
    con.commit()
    con.close()

    cfg2 = PipelineConfig()
    cfg2.image_path = cfg.image_path
    cfg2.store_path = str(tmp_path_factory.mktemp("dbstore3"))
    cfg2.mapper = cfg.mapper
    store2 = ArtifactStore(cfg2.store_path)
    stages.import_colmap_db(cfg2, store2, database_path=dbp)
    meta = store2.read_manifest("matching")["meta"]
    assert meta["source"]["poses_rebuilt"] > 0

    mt = store2.read_table("matching")
    rows = np.asarray(mt["two_view_geometry"])
    # every row with a usable E (calibrated OR planar/panoramic — the
    # matcher estimates all three models) gets pose + tri_angle rebuilt
    has_e = np.linalg.norm(rows[:, 10:19], axis=1) > 1e-8
    assert has_e.any()
    rebuilt = rows[has_e]
    assert np.all(np.abs(rebuilt[:, 3:7]).sum(axis=1) > 0)
    assert np.any(rebuilt[:, 2] > 0)

    stages.run_mapping(cfg2, store2)
    model = stages.run_merge(cfg2, store2)
    assert model.num_registered == 8
    assert float(synth.evaluate_ate(model, gt)) < 0.05
