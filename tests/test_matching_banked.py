"""Banked descriptor residency in the matching stage.

The matching stage streams descriptors through a device-resident window of
[bank_images + overlap] images (the packetized-stencil analog of the
reference's io/work_packet_size, feature_matching.py:70-74) instead of one
(N, K, 128) tensor. These tests pin the two contract points:

1. bank size NEVER changes results — tiny banks produce bitwise-identical
   matching tables to a single whole-collection bank (per-pair fold_in keys);
2. a 1,000-image collection matches within a bounded descriptor bank
   (BASELINE.md's 1k/10k-image configs die under whole-collection residency).
"""

import numpy as np
import pytest

from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.pipeline import stages
from scanner_colmap_tpu.utils.config import PipelineConfig
from scanner_colmap_tpu.utils.store import ArtifactStore


def write_synth_extraction(store, rng, n_img=12, n_pts=200, w=500, h=500,
                           n_desc_dim=128):
    """Write an extraction table for a synthetic translating-camera scene:
    shared 3D points, per-image projections, per-point descriptors identical
    across views (so matching + RANSAC verification both succeed)."""
    f = 500.0
    pts = np.stack([rng.uniform(-1.5, 1.5, n_pts),
                    rng.uniform(-1.5, 1.5, n_pts),
                    rng.uniform(4.0, 6.0, n_pts)], axis=1)
    desc_base = rng.integers(0, 255, (n_pts, n_desc_dim)).astype(np.uint8)
    keypoints, descriptors, cam_rows = [], [], []
    for k in range(n_img):
        cam_c = np.array([0.15 * k, 0.0, 0.0])
        x_cam = pts - cam_c  # identity rotation
        uv = f * x_cam[:, :2] / x_cam[:, 2:3] + np.array([w / 2, h / 2])
        inb = ((uv[:, 0] >= 0) & (uv[:, 0] < w)
               & (uv[:, 1] >= 0) & (uv[:, 1] < h))
        sel = np.flatnonzero(inb)
        order = rng.permutation(len(sel))
        sel = sel[order]
        kp = np.concatenate([uv[sel], np.full((len(sel), 1), 2.0),
                             np.zeros((len(sel), 1))], axis=1)
        keypoints.append(kp.astype(np.float32))
        descriptors.append(desc_base[sel])
        cam_rows.append(np.array(
            [camlib.PINHOLE, w, h, 1.0, 1.0, f, f, w / 2, h / 2]))
    store.write_table("extraction", {
        "image_id": np.arange(n_img, dtype=np.int64),
        "keypoints": keypoints,
        "descriptors": descriptors,
        "camera": np.stack(cam_rows),
    }, meta={"stage": "extraction"})
    return n_img


def _read_pairs(store, table):
    t = store.read_table(table)
    ids = np.asarray(t["pair_image_ids"]).reshape(-1, 2)
    out = {}
    for n in range(len(ids)):
        key = (int(ids[n][0]), int(ids[n][1]))
        out.setdefault(key, []).append(
            (np.asarray(t["two_view_geometry"][n]),
             np.asarray(t["matches"][n])))
    return out


def test_banked_identical_to_single_bank(rng, tmp_path):
    """bank_images=3 (many banks + chunked verify) must reproduce the
    single-bank run bitwise: same pairs, same TVG rows, same match lists."""
    store = ArtifactStore(str(tmp_path))
    write_synth_extraction(store, rng)
    cfg = PipelineConfig(store_path=str(tmp_path))
    cfg.matching.overlap = 3
    cfg.matching.execution = "banked"

    cfg.matching.bank_images = 1000  # whole collection resident
    n_single = stages.run_matching(cfg, store, out_table="matching_single")
    cfg.matching.bank_images = 3     # 4 banks over 12 images
    cfg.matching.verify_batch_pairs = 8
    n_banked = stages.run_matching(cfg, store, out_table="matching_banked")

    assert n_single == n_banked > 5
    single = _read_pairs(store, "matching_single")
    banked = _read_pairs(store, "matching_banked")
    assert set(single) == set(banked)
    for pair in single:
        assert len(single[pair]) == len(banked[pair])
        for (tvg_s, m_s), (tvg_b, m_b) in zip(single[pair], banked[pair]):
            np.testing.assert_array_equal(tvg_s, tvg_b)
            np.testing.assert_array_equal(m_s, m_b)
    meta = store.read_manifest("matching_banked")["meta"]
    assert meta["num_banks"] >= 4


def test_resident_identical_to_banked(rng, tmp_path):
    """The round-5 device-resident pool plan must reproduce the banked
    plan's matching table exactly: same pairs, TVG rows, match lists —
    the two plans share similarity operands and reduction formulation."""
    store = ArtifactStore(str(tmp_path))
    write_synth_extraction(store, rng)
    cfg = PipelineConfig(store_path=str(tmp_path))
    cfg.matching.overlap = 3

    cfg.matching.execution = "banked"
    cfg.matching.bank_images = 3
    n_b = stages.run_matching(cfg, store, out_table="matching_bk")
    cfg.matching.execution = "resident"
    cfg.matching.resident_pair_chunk = 16
    n_r = stages.run_matching(cfg, store, out_table="matching_rs")

    assert n_b == n_r > 5
    banked = _read_pairs(store, "matching_bk")
    res = _read_pairs(store, "matching_rs")
    assert set(banked) == set(res)
    for pair in banked:
        for (tvg_b, m_b), (tvg_r, m_r) in zip(banked[pair], res[pair]):
            np.testing.assert_array_equal(tvg_b, tvg_r)
            np.testing.assert_array_equal(m_b, m_r)
    assert store.read_manifest("matching_rs")["meta"]["execution"] == "resident"
    assert store.read_manifest("matching_bk")["meta"]["execution"] == "banked"


def test_banked_identical_under_schedule_slice(rng, tmp_path):
    """Host-sharded (schedule_slice) banked matching produces per-pair
    results identical to the unsharded run — fold_in keys make verification
    shard-invariant."""
    store = ArtifactStore(str(tmp_path))
    write_synth_extraction(store, rng, n_img=8)
    cfg = PipelineConfig(store_path=str(tmp_path))
    cfg.matching.overlap = 2
    cfg.matching.bank_images = 3
    cfg.matching.execution = "banked"
    stages.run_matching(cfg, store, out_table="matching_full")
    stages.run_matching(cfg, store, schedule_slice=(0, 2),
                        out_table="matching_s0")
    stages.run_matching(cfg, store, schedule_slice=(1, 2),
                        out_table="matching_s1")
    full = _read_pairs(store, "matching_full")
    sharded = _read_pairs(store, "matching_s0")
    sharded.update(_read_pairs(store, "matching_s1"))
    assert set(full) == set(sharded)
    for pair in full:
        for (tvg_f, m_f), (tvg_s, m_s) in zip(full[pair], sharded[pair]):
            np.testing.assert_array_equal(tvg_f, tvg_s)
            np.testing.assert_array_equal(m_f, m_s)


@pytest.mark.slow
def test_matching_1000_images_bounded_bank(rng, tmp_path):
    """1,000-image matching completes with a small descriptor bank: device
    residency is (bank+overlap) x K x 128 floats, NOT the 1000-image tensor.
    Random descriptors -> phase 1 exercises the full banked schedule while
    verification stays cheap."""
    store = ArtifactStore(str(tmp_path))
    n_img = 1000
    K = 64
    keypoints, descriptors, cam_rows = [], [], []
    for k in range(n_img):
        uv = rng.uniform(0, 500, (K, 2))
        keypoints.append(np.concatenate(
            [uv, np.full((K, 1), 2.0), np.zeros((K, 1))], axis=1
        ).astype(np.float32))
        descriptors.append(rng.integers(0, 255, (K, 128)).astype(np.uint8))
        cam_rows.append(np.array(
            [camlib.PINHOLE, 500, 500, 1.0, 1.0, 500.0, 500.0, 250.0, 250.0]))
    store.write_table("extraction", {
        "image_id": np.arange(n_img, dtype=np.int64),
        "keypoints": keypoints,
        "descriptors": descriptors,
        "camera": np.stack(cam_rows),
    }, meta={"stage": "extraction"})

    cfg = PipelineConfig(store_path=str(tmp_path))
    cfg.matching.overlap = 3
    cfg.matching.bank_images = 64
    stages.run_matching(cfg, store)
    meta = store.read_manifest("matching")["meta"]
    assert meta["num_banks"] >= 15  # 1000 / 64
    # resident bank bound: (64 + 3) rows x 128 slots x 128 dims x 4 B << 256 MB
    assert (64 + 3) * 128 * 128 * 4 < 256 << 20
