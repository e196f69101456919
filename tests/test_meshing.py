"""Stage 9 — TSDF fusion + marching tetrahedra meshing (ops/meshing.py).

The reference never shipped its meshing step ("Coming soon",
/root/reference/README.md:69; poisson_recon linked but unused,
CMakeLists.txt:91); these tests pin down the stage this framework ships
instead: watertight iso-surface extraction, surface accuracy against
analytic geometry, consistent orientation, PLY mesh export, and the
store-driven stage runner."""

import os

import numpy as np
import pytest

from test_mvs import _plane_fusion_input

from scanner_colmap_tpu.ops import meshing
from scanner_colmap_tpu.pipeline import stages
from scanner_colmap_tpu.utils.config import PipelineConfig
from scanner_colmap_tpu.utils.store import ArtifactStore


def _sphere_grid(n=40, radius=1.0, extent=1.5):
    origin = np.array([-extent] * 3, np.float32)
    voxel = 2 * extent / (n - 1)
    xs = origin[0] + voxel * np.arange(n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - radius
    trunc = 3 * voxel
    return meshing.TsdfGrid(
        np.clip(sdf / trunc, -1, 1).astype(np.float32),
        np.ones((n, n, n), np.float32),
        np.full((n, n, n, 3), 0.25, np.float32), origin, voxel)


def test_marching_tetrahedra_sphere_watertight():
    grid = _sphere_grid()
    verts, faces, rgb = meshing.marching_tetrahedra(grid)
    assert len(verts) > 1000 and len(faces) > 2000
    r = np.linalg.norm(verts, axis=1)
    # zero-crossing interpolation puts vertices on the radius to sub-voxel
    assert np.abs(r - 1.0).max() < 0.3 * grid.voxel
    # watertight: every undirected edge is shared by exactly two faces
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    ekey = np.sort(e, axis=1)
    _, counts = np.unique(
        ekey[:, 0].astype(np.int64) * len(verts) + ekey[:, 1],
        return_counts=True)
    assert (counts == 2).all()
    # oriented: normals point toward positive TSDF (outward for a sphere)
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    nrm = np.cross(e1, e2)
    cent = verts[faces].mean(1)
    assert ((nrm * cent).sum(-1) > 0).all()
    np.testing.assert_allclose(rgb, 0.25)


def test_marching_tetrahedra_respects_weight_mask():
    grid = _sphere_grid()
    w = grid.weight.copy()
    w[: w.shape[0] // 2] = 0.0  # half the volume unobserved
    half = grid._replace(weight=w)
    verts, faces, _ = meshing.marching_tetrahedra(half)
    full_verts, _, _ = meshing.marching_tetrahedra(grid)
    assert 0 < len(verts) < len(full_verts)
    assert verts[:, 0].min() >= grid.origin[0] + grid.voxel * (
        w.shape[0] // 2 - 1.5)


def test_marching_tetrahedra_empty_cases():
    grid = _sphere_grid(n=16)
    # all positive (no surface) and all unobserved
    pos = grid._replace(tsdf=np.abs(grid.tsdf) + 0.1)
    verts, faces, _ = meshing.marching_tetrahedra(pos)
    assert len(verts) == 0 and len(faces) == 0
    unobs = grid._replace(weight=np.zeros_like(grid.weight))
    verts, faces, _ = meshing.marching_tetrahedra(unobs)
    assert len(verts) == 0 and len(faces) == 0


def test_tsdf_fusion_recovers_plane():
    inp = _plane_fusion_input(6, H=32, W=40, depth0=4.0)
    origin, voxel, dims = meshing.grid_from_bounds(
        [-2.0, -1.6, 3.4], [2.6, 1.6, 4.6], resolution=48)
    grid = meshing.fuse_tsdf(inp, origin, voxel, dims)
    assert (grid.weight > 0).any()
    verts, faces, rgb = meshing.marching_tetrahedra(grid)
    assert len(faces) > 200
    # every mesh vertex sits on the z=4 plane to sub-voxel accuracy
    assert np.abs(verts[:, 2] - 4.0).max() < 0.5 * voxel
    # color fused from the 0.5-grey views
    assert np.abs(rgb - 0.5).max() < 0.05


def test_write_ply_mesh_roundtrip(tmp_path):
    grid = _sphere_grid(n=24)
    verts, faces, rgb = meshing.marching_tetrahedra(grid)
    p = os.path.join(tmp_path, "mesh.ply")
    meshing.write_ply_mesh(p, verts, faces, rgb)
    raw = open(p, "rb").read()
    head, _, body = raw.partition(b"end_header\n")
    assert f"element vertex {len(verts)}".encode() in head
    assert f"element face {len(faces)}".encode() in head
    vbytes = len(verts) * (12 + 3)
    assert len(body) == vbytes + len(faces) * (1 + 12)
    vt = np.frombuffer(body[:vbytes],
                       dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
    np.testing.assert_allclose(vt["xyz"], verts, rtol=1e-6)
    ft = np.frombuffer(body[vbytes:],
                       dtype=[("n", np.uint8), ("idx", np.int32, 3)])
    assert (ft["n"] == 3).all()
    np.testing.assert_array_equal(ft["idx"], faces)


def test_run_meshing_stage(tmp_path):
    """Stage runner over a store: plane depth maps -> mesh table + PLY."""
    inp = _plane_fusion_input(5, H=24, W=32, depth0=4.0)
    store = ArtifactStore(str(tmp_path / "store"))
    n = inp.depths.shape[0]
    store.write_table("patch_match", {
        "image_id": np.arange(n, dtype=np.int64),
        "depth_map": [np.asarray(inp.depths[i], np.float32)
                      for i in range(n)],
        "normal_map": [np.asarray(inp.normals[i], np.float32)
                       for i in range(n)],
        "cost_map": [np.zeros(inp.depths[i].shape, np.float32)
                     for i in range(n)],
    })
    Rs, Ts, Ks_ = [], [], []
    from scanner_colmap_tpu.models import geometry as geom
    for i in range(n):
        Rm = np.asarray(geom.quat_to_rotmat(np.asarray(inp.qvecs[i])))
        Rs.append(Rm.reshape(-1).astype(np.float64))
        Ts.append(np.asarray(inp.tvecs[i], np.float64))
        Ks_.append(np.asarray(inp.Ks[i]).reshape(-1).astype(np.float64))
    store.write_table("prepare_patch_match", {
        "image_id": np.arange(n, dtype=np.int64),
        "R": np.stack(Rs), "T": np.stack(Ts), "K": np.stack(Ks_),
        "bitmap": [np.full(inp.depths[i].shape, 128, np.uint8)
                   for i in range(n)],
    })
    # fused cloud provides the grid bounds: points on the plane
    rng = np.random.default_rng(0)
    xyz = np.stack([rng.uniform(-1.5, 2.0, 400),
                    rng.uniform(-1.2, 1.2, 400),
                    np.full(400, 4.0)], axis=1).astype(np.float32)
    store.write_table("fused", {"xyz": xyz})

    cfg = PipelineConfig(store_path=str(tmp_path / "store"))
    cfg.meshing.resolution = 48
    mesh_path = str(tmp_path / "mesh.ply")
    nfaces = stages.run_meshing(cfg, store, mesh_path=mesh_path)
    assert nfaces > 100
    tab = store.read_table("mesh")
    verts = np.asarray(tab["verts"][0])
    assert np.abs(verts[:, 2] - 4.0).max() < 0.1
    assert len(np.asarray(tab["faces"][0])) == nfaces
    assert os.path.exists(mesh_path)
    meta = store.read_manifest("mesh")["meta"]
    assert meta["stage"] == "meshing" and meta["tsdf_s"] >= 0


def test_run_meshing_empty_store(tmp_path):
    store = ArtifactStore(str(tmp_path / "store"))
    store.write_table("patch_match", {
        "image_id": np.zeros(0, np.int64), "depth_map": [],
        "normal_map": [], "cost_map": []})
    store.write_table("prepare_patch_match", {
        "image_id": np.zeros(0, np.int64)})
    cfg = PipelineConfig(store_path=str(tmp_path / "store"))
    assert stages.run_meshing(cfg, store) == 0
    assert len(store.read_table("mesh")["verts"][0]) == 0
