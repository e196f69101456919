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


def np_reproj_errors(rec: "Reconstruction", iids, kps, xyz):
    """Batched reprojection errors on the host: err[n] = pixel distance of
    xyz[n] projected through the camera of image iids[n] vs keypoint kps[n].

    Returns (err (N,), z (N,) camera-frame depths). The ONE shared
    rotate/distort/project routine behind track-fit checks, merge
    verification, and per-point error refresh — repeated images are
    compacted so poses/intrinsics stack once per distinct image.
    """
    iids = np.asarray(iids, np.int64)
    if len(iids) == 0:
        return np.zeros(0), np.zeros(0)
    kps = np.asarray(kps, np.int64)
    xyz = np.asarray(xyz, np.float64)
    # vectorized slot assignment (a python genexpr here ran once per
    # observation and dominated the host-side error refresh)
    uniq, s_arr = np.unique(iids, return_inverse=True)
    img_list = uniq.tolist()
    q = np.stack([rec.images[i].qvec for i in img_list])
    t = np.stack([rec.images[i].tvec for i in img_list])
    mid = np.asarray([rec.cameras[rec.images[i].camera_id].model_id
                      for i in img_list])
    prm = np.stack([rec.cameras[rec.images[i].camera_id].params_padded
                    for i in img_list])
    fx, fy, cx, cy, k1, k2, p1, p2 = camlib.np_canonical_intrinsics(mid, prm)
    x_cam = geom.np_quat_rotate(q[s_arr], xyz) + t[s_arr]
    z = x_cam[:, 2]
    zs = np.where(np.abs(z) < 1e-12, 1e-12, z)
    xy = x_cam[:, :2] / zs[:, None]
    d = camlib.np_distort(k1[s_arr], k2[s_arr], p1[s_arr], p2[s_arr], xy)
    u = fx[s_arr] * d[..., 0] + cx[s_arr]
    v = fy[s_arr] * d[..., 1] + cy[s_arr]
    uv_obs = np.empty((len(iids), 2))
    # group observations by image via ONE sort — the boolean-mask loop
    # (`s_arr == s` per unique image) rescanned all N observations per
    # image: O(U*N) = 93 s per call at 10k images / 2M observations,
    # which was 280 of the 296 s of merged-model track ops (profiled)
    order = np.argsort(s_arr, kind="stable")
    bounds = np.searchsorted(s_arr[order], np.arange(len(img_list) + 1))
    for s, iid in enumerate(img_list):
        sl = order[bounds[s]: bounds[s + 1]]
        uv_obs[sl] = rec.images[iid].xys[kps[sl]]
    err = np.hypot(u - uv_obs[:, 0], v - uv_obs[:, 1])
    return err, z


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

    def flat_observations(self, point_ids=None):
        """Flatten tracks into parallel index arrays for batched math.

        Returns (pids (Np,), xyz (Np,3), obs_pt (No,), obs_img (No,),
        obs_kp (No,), img_list) where obs_img indexes into the compact
        img_list and obs_pt into pids. With point_ids, only those points
        (COLMAP's modified-points passes scale with the local window, not
        the whole model).
        """
        pts = self.points3D
        if point_ids is None:
            pids = np.fromiter(pts.keys(), np.int64, len(pts))
        else:
            pids = np.asarray([p for p in point_ids if p in pts], np.int64)
        xyz = np.empty((len(pids), 3))
        if len(pids) == 0:
            z = np.zeros(0, np.int64)
            return pids, xyz, z, z, z, []
        for i, pid in enumerate(pids):
            xyz[i] = pts[pid].xyz
        # observations from the per-image assignment arrays (they mirror the
        # track lists exactly): vectorized per image instead of a Python loop
        # over every track entry — this ran 100+ times per cluster solve
        sort = np.argsort(pids, kind="stable")
        pids_sorted = pids[sort]
        obs_pt_l, obs_img_l, obs_kp_l = [], [], []
        img_list: List[int] = []
        for iid, im in self.images.items():
            kps = np.flatnonzero(im.point3D_ids >= 0)
            if len(kps) == 0:
                continue
            p = im.point3D_ids[kps]
            pos = np.searchsorted(pids_sorted, p)
            ok = (pos < len(pids_sorted))
            ok &= pids_sorted[np.minimum(pos, len(pids_sorted) - 1)] == p
            if not ok.any():
                continue
            s = len(img_list)
            img_list.append(iid)
            obs_pt_l.append(sort[pos[ok]])
            obs_img_l.append(np.full(int(ok.sum()), s, np.int64))
            obs_kp_l.append(kps[ok])
        if obs_pt_l:
            obs_pt = np.concatenate(obs_pt_l)
            obs_img = np.concatenate(obs_img_l)
            obs_kp = np.concatenate(obs_kp_l)
        else:
            obs_pt = obs_img = obs_kp = np.zeros(0, np.int64)
        return (pids, xyz, obs_pt, obs_img, obs_kp, img_list)

    def compute_reprojection_errors(self, point_ids=None) -> None:
        """Recompute per-point mean reprojection error from current geometry.

        Fully vectorized host numpy over the flattened observation arrays —
        one batched rotate/project for ALL observations (the per-track loop
        version dominated mapping wall-clock). With point_ids, only those
        points are updated."""
        if not self.points3D:
            return
        pids, xyz, obs_pt, obs_img, obs_kp, img_list = self.flat_observations(
            point_ids)
        if len(pids) == 0:
            return
        if len(obs_pt) == 0:
            for pid in pids:
                self.points3D[pid].error = -1.0
            return
        iids = np.asarray(img_list, np.int64)[obs_img]
        err, z = np_reproj_errors(self, iids, obs_kp, xyz[obs_pt])
        err = np.where(z > 0, err, np.inf)

        counts = np.bincount(obs_pt, minlength=len(pids))
        sums = np.bincount(obs_pt, weights=err, minlength=len(pids))
        mean = np.where(counts > 0, sums / np.maximum(counts, 1), -1.0)
        for i, pid in enumerate(pids):
            self.points3D[pid].error = float(mean[i])

    def transform(self, scale: float, qvec: np.ndarray, tvec: np.ndarray):
        """Apply Sim(3) to the whole model in-place (new = s R old + t).

        Host numpy, batched over all points/images in two vector ops — a
        per-point device dispatch here costs more than the whole merge."""
        qvec = np.asarray(qvec, np.float64)
        tvec = np.asarray(tvec, np.float64)
        pts = list(self.points3D.values())
        if pts:
            xyz = np.stack([p.xyz for p in pts])
            new = scale * geom.np_quat_rotate(qvec, xyz) + tvec
            for p, x in zip(pts, new):
                p.xyz = x
        ims = list(self.images.values())
        if ims:
            # pose update (see geom.sim3_transform_pose):
            # q' = q_cw * conj(q_s);  t' = s t_cw - R' t_s
            q_cw = np.stack([im.qvec for im in ims])
            t_cw = np.stack([im.tvec for im in ims])
            qi = qvec * np.array([1.0, -1.0, -1.0, -1.0])
            q_new = geom.np_quat_mul(q_cw, qi[None, :])
            t_new = scale * t_cw - geom.np_quat_rotate(q_new, tvec[None, :])
            for im, q, t in zip(ims, q_new, t_new):
                im.qvec, im.tvec = q, t

    def copy(self) -> "Reconstruction":
        import copy as _copy

        # the observer callback is a live engine hook (a bound method of the
        # native correspondence graph holding ctypes handles — deepcopying it
        # raises, and a sharing copy would double-free the native handle);
        # copies are standalone models and get no observer
        obs = self.observer
        self.observer = None
        try:
            dup = _copy.deepcopy(self)
        finally:
            self.observer = obs
        return dup
