"""Reconstruction container — the sparse-model data structure.

Host-level container (numpy arrays + python metadata) analogous to COLMAP's
``Reconstruction`` (cameras, images, points3D with tracks), which the reference
serializes wholesale between stages as cameras.bin/images.bin/points3D.bin
byte columns (/root/reference/integration/op_cpp/io.cc:390-417,
incremental_mapping.cc:366-372).

Device-side compute (BA, triangulation) uses dedicated padded pytrees built
from this container — see scanner_colmap_tpu.ops.ba. The container itself is
host-side: variable-length tracks live here as ragged numpy, and are padded
only at the jit boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.models import geometry as geom


@dataclasses.dataclass
class Camera:
    camera_id: int
    model_id: int
    width: int
    height: int
    params: np.ndarray  # raw COLMAP params (model-specific length)
    prior_focal: bool = False

    @property
    def params_padded(self) -> np.ndarray:
        p = np.zeros(camlib.MAX_CAM_PARAMS, dtype=np.float64)
        p[: len(self.params)] = self.params
        return p


@dataclasses.dataclass
class Image:
    image_id: int
    camera_id: int
    name: str
    qvec: np.ndarray = dataclasses.field(default_factory=lambda: np.array([1.0, 0, 0, 0]))
    tvec: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    # per-keypoint 2D observations and their 3D point ids (-1 = none)
    xys: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0, 2)))
    point3D_ids: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0, dtype=np.int64))
    registered: bool = False

    @property
    def num_points3D(self) -> int:
        return int(np.sum(self.point3D_ids >= 0))

    def projection_center(self) -> np.ndarray:
        return np.asarray(geom.np_projection_center(self.qvec, self.tvec))


@dataclasses.dataclass
class Point3D:
    xyz: np.ndarray
    rgb: np.ndarray  # (3,) uint8
    error: float
    # track: list of (image_id, point2D_idx)
    track: List

    @property
    def track_length(self) -> int:
        return len(self.track)


class Reconstruction:
    """Sparse model: cameras + images + 3D points with tracks.

    ``observer`` (optional callable (image_id, p2d_idx, pid)) is notified on
    every keypoint->point3D assignment change, letting an external index
    (e.g. the native correspondence graph) mirror the state without the
    engine auditing every mutation site.
    """

    def __init__(self):
        self.cameras: Dict[int, Camera] = {}
        self.images: Dict[int, Image] = {}
        self.points3D: Dict[int, Point3D] = {}
        self._next_point3D_id = 1
        self.observer = None

    def set_point3D_id(self, image_id: int, p2d_idx: int, pid: int):
        self.images[image_id].point3D_ids[p2d_idx] = pid
        if self.observer is not None:
            self.observer(image_id, p2d_idx, pid)

    # ---- mutation -------------------------------------------------------
    def add_camera(self, cam: Camera):
        self.cameras[cam.camera_id] = cam

    def add_image(self, im: Image):
        self.images[im.image_id] = im

    def add_point3D(self, xyz, track, rgb=None, error=-1.0) -> int:
        pid = self._next_point3D_id
        self._next_point3D_id += 1
        rgb = np.zeros(3, np.uint8) if rgb is None else np.asarray(rgb, np.uint8)
        self.points3D[pid] = Point3D(np.asarray(xyz, np.float64), rgb, float(error), list(track))
        for image_id, p2d_idx in track:
            self.set_point3D_id(image_id, p2d_idx, pid)
        return pid

    def remove_point3D(self, pid: int):
        pt = self.points3D.pop(pid)
        for image_id, p2d_idx in pt.track:
            im = self.images.get(image_id)
            if im is not None and p2d_idx < len(im.point3D_ids) and im.point3D_ids[p2d_idx] == pid:
                self.set_point3D_id(image_id, p2d_idx, -1)

    def deregister_image(self, image_id: int):
        im = self.images[image_id]
        im.registered = False
        for p2d_idx, pid in enumerate(im.point3D_ids):
            if pid >= 0:
                self.remove_observation(int(pid), image_id, p2d_idx)

    def remove_observation(self, pid: int, image_id: int, p2d_idx: int):
        pt = self.points3D.get(pid)
        if pt is None:
            return
        pt.track = [(i, j) for (i, j) in pt.track if not (i == image_id and j == p2d_idx)]
        self.set_point3D_id(image_id, p2d_idx, -1)
        if len(pt.track) < 2:
            self.remove_point3D(pid)

    # ---- queries --------------------------------------------------------
    @property
    def registered_image_ids(self) -> List[int]:
        return [i for i, im in self.images.items() if im.registered]

    @property
    def num_registered(self) -> int:
        return len(self.registered_image_ids)

    def mean_track_length(self) -> float:
        if not self.points3D:
            return 0.0
        return float(np.mean([p.track_length for p in self.points3D.values()]))

    def mean_reprojection_error(self) -> float:
        errs = [p.error for p in self.points3D.values() if p.error >= 0]
        return float(np.mean(errs)) if errs else -1.0

    def compute_reprojection_errors(self) -> None:
        """Recompute per-point mean reprojection error from current geometry.
        Host-side numpy (called in engine inner loops — no jax dispatches)."""
        for pid, pt in self.points3D.items():
            errs = []
            for image_id, p2d_idx in pt.track:
                im = self.images[image_id]
                cam = self.cameras[im.camera_id]
                x_cam = geom.np_pose_transform(im.qvec, im.tvec, pt.xyz)
                if x_cam[2] <= 0:
                    errs.append(np.inf)
                    continue
                uv = camlib.np_cam_to_image(cam.model_id, cam.params, x_cam)
                errs.append(float(np.linalg.norm(uv - im.xys[p2d_idx])))
            pt.error = float(np.mean(errs)) if errs else -1.0

    def transform(self, scale: float, qvec: np.ndarray, tvec: np.ndarray):
        """Apply Sim(3) to the whole model in-place (new = s R old + t)."""
        for pt in self.points3D.values():
            pt.xyz = np.asarray(geom.sim3_transform(scale, qvec, tvec, pt.xyz))
        for im in self.images.values():
            q, t = geom.sim3_transform_pose(scale, qvec, tvec, im.qvec, im.tvec)
            im.qvec, im.tvec = np.asarray(q), np.asarray(t)

    def copy(self) -> "Reconstruction":
        import copy as _copy

        return _copy.deepcopy(self)
