"""COLMAP binary model interchange: cameras.bin / images.bin / points3D.bin.

The reference round-trips whole reconstructions through these files between
stages (/root/reference/integration/op_cpp/io.cc:390-454,
incremental_mapping.cc:366-372). We keep the format only as an interchange /
evaluation boundary (import COLMAP ground truth, export our models for COLMAP
tooling); internal stage hand-off uses the typed artifact store instead.

Format (little-endian), as written by COLMAP:
  cameras.bin : u64 n; per cam: i32 id, i32 model_id, u64 w, u64 h, f64 params[k]
  images.bin  : u64 n; per img: i32 id, f64 qvec[4], f64 tvec[3], i32 camera_id,
                name chars until \\0, u64 n2d, per p2d: f64 x, f64 y, i64 p3d_id
  points3D.bin: u64 n; per pt: i64 id, f64 xyz[3], u8 rgb[3], f64 error,
                u64 track_len, per elem: i32 image_id, i32 point2D_idx
"""

from __future__ import annotations

import os
import struct
from typing import BinaryIO

import numpy as np

from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.models.reconstruction import Camera, Image, Point3D, Reconstruction


def _read(f: BinaryIO, fmt: str):
    size = struct.calcsize("<" + fmt)
    return struct.unpack("<" + fmt, f.read(size))


def _write(f: BinaryIO, fmt: str, *vals):
    f.write(struct.pack("<" + fmt, *vals))


# ---------------------------------------------------------------------------
# cameras.bin
# ---------------------------------------------------------------------------

def _read_cameras_stream(f: BinaryIO):
    cams = {}
    (n,) = _read(f, "Q")
    for _ in range(n):
        cam_id, model_id, w, h = _read(f, "iiQQ")
        k = camlib.MODEL_NUM_PARAMS[model_id]
        params = np.array(_read(f, "d" * k))
        cams[cam_id] = Camera(cam_id, model_id, int(w), int(h), params)
    return cams


def _write_cameras_stream(cams, f: BinaryIO):
    _write(f, "Q", len(cams))
    for cam in cams.values():
        k = camlib.MODEL_NUM_PARAMS[cam.model_id]
        _write(f, "iiQQ", cam.camera_id, cam.model_id, cam.width, cam.height)
        _write(f, "d" * k, *[float(x) for x in cam.params[:k]])


def read_cameras_bin(path: str):
    with open(path, "rb") as f:
        return _read_cameras_stream(f)


def write_cameras_bin(cams, path: str):
    with open(path, "wb") as f:
        _write_cameras_stream(cams, f)


# ---------------------------------------------------------------------------
# images.bin
# ---------------------------------------------------------------------------

def read_images_bin(path: str):
    with open(path, "rb") as f:
        return _read_images_stream(f)


def _read_images_stream(f: BinaryIO):
    images = {}
    (n,) = _read(f, "Q")
    for _ in range(n):
        vals = _read(f, "idddddddi")
        image_id = vals[0]
        qvec = np.array(vals[1:5])
        tvec = np.array(vals[5:8])
        camera_id = vals[8]
        name = b""
        while True:
            c = f.read(1)
            if c == b"\x00":
                break
            name += c
        (n2d,) = _read(f, "Q")
        data = np.frombuffer(f.read(24 * n2d), dtype=np.float64).reshape(n2d, 3)
        xys = data[:, :2].copy()
        # explicit copy: for n2d <= 1 the strided column is already flagged
        # contiguous, so ascontiguousarray returns the read-only frombuffer
        # VIEW and later in-place point3D_id writes raise
        p3d = data[:, 2].copy().view(np.int64)
        images[image_id] = Image(
            image_id=image_id,
            camera_id=camera_id,
            name=name.decode("utf-8"),
            qvec=qvec,
            tvec=tvec,
            xys=xys,
            point3D_ids=p3d,
            registered=True,
        )
    return images


def write_images_bin(images, path: str):
    with open(path, "wb") as f:
        _write_images_stream(images, f)


def _write_images_stream(images, f: BinaryIO):
    reg = [im for im in images.values() if im.registered]
    _write(f, "Q", len(reg))
    for im in reg:
        _write(f, "idddddddi", im.image_id, *[float(x) for x in im.qvec],
               *[float(x) for x in im.tvec], im.camera_id)
        f.write(im.name.encode("utf-8") + b"\x00")
        n2d = len(im.xys)
        _write(f, "Q", n2d)
        if n2d:
            data = np.empty((n2d, 3), dtype=np.float64)
            data[:, :2] = im.xys
            data[:, 2] = np.asarray(im.point3D_ids, np.int64).view(np.float64)
            f.write(data.tobytes())


# ---------------------------------------------------------------------------
# points3D.bin
# ---------------------------------------------------------------------------

def read_points3D_bin(path: str):
    with open(path, "rb") as f:
        return _read_points3D_stream(f)


def _read_points3D_stream(f: BinaryIO):
    pts = {}
    (n,) = _read(f, "Q")
    for _ in range(n):
        vals = _read(f, "qdddBBBd")
        pid = vals[0]
        xyz = np.array(vals[1:4])
        rgb = np.array(vals[4:7], dtype=np.uint8)
        error = vals[7]
        (tlen,) = _read(f, "Q")
        elems = np.frombuffer(f.read(8 * tlen), dtype=np.int32).reshape(tlen, 2)
        track = [(int(a), int(b)) for a, b in elems]
        pts[pid] = Point3D(xyz, rgb, float(error), track)
    return pts


def write_points3D_bin(pts, path: str):
    with open(path, "wb") as f:
        _write_points3D_stream(pts, f)


def _write_points3D_stream(pts, f: BinaryIO):
    _write(f, "Q", len(pts))
    for pid, pt in pts.items():
        _write(f, "qdddBBBd", pid, *[float(x) for x in pt.xyz],
               *[int(x) for x in pt.rgb], float(pt.error))
        _write(f, "Q", len(pt.track))
        for image_id, p2d_idx in pt.track:
            _write(f, "ii", int(image_id), int(p2d_idx))


# ---------------------------------------------------------------------------
# Whole models
# ---------------------------------------------------------------------------

def read_model(path: str) -> Reconstruction:
    rec = Reconstruction()
    rec.cameras = read_cameras_bin(os.path.join(path, "cameras.bin"))
    rec.images = read_images_bin(os.path.join(path, "images.bin"))
    rec.points3D = read_points3D_bin(os.path.join(path, "points3D.bin"))
    if rec.points3D:
        rec._next_point3D_id = max(rec.points3D) + 1
    return rec


def write_model(rec: Reconstruction, path: str):
    os.makedirs(path, exist_ok=True)
    write_cameras_bin(rec.cameras, os.path.join(path, "cameras.bin"))
    write_images_bin(rec.images, os.path.join(path, "images.bin"))
    write_points3D_bin(rec.points3D, os.path.join(path, "points3D.bin"))


def model_to_bytes(rec: Reconstruction):
    """(cameras_bytes, images_bytes, points3D_bytes) — the reference's stage
    contract stores exactly these three byte columns per submodel
    (io.cc:412-417, incremental_mapping.py:88-94)."""
    import io as _io

    bufs = []
    for writer, data in ((_write_cameras_stream, rec.cameras),
                         (_write_images_stream, rec.images),
                         (_write_points3D_stream, rec.points3D)):
        b = _io.BytesIO()
        writer(data, b)
        bufs.append(b.getvalue())
    return tuple(bufs)


def model_from_bytes(cameras_b: bytes, images_b: bytes,
                     points3D_b: bytes) -> Reconstruction:
    import io as _io

    rec = Reconstruction()
    rec.cameras = _read_cameras_stream(_io.BytesIO(cameras_b))
    rec.images = _read_images_stream(_io.BytesIO(images_b))
    rec.points3D = _read_points3D_stream(_io.BytesIO(points3D_b))
    if rec.points3D:
        rec._next_point3D_id = max(rec.points3D) + 1
    return rec
