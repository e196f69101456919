"""Incremental Structure-from-Motion engine.

Rebuilds the behavior of COLMAP's ``IncrementalMapper`` control loop as
replicated by the reference's mapping kernel
(/root/reference/integration/op_cpp/incremental_mapping.cc:268-373):
initial-pair selection and registration, next-image ranking, PnP
registration, triangulation, iterative local refinement, growth-triggered
global refinement (retriangulate + global BA + complete/merge tracks +
filtering), and a final global pass.

Architecture split (SURVEY §7.4.2): the success-dependent outer loop is
host Python over numpy control state; every numerical kernel — PnP RANSAC,
batched multi-view triangulation, the Schur-complement LM bundle — is a
jitted static-shape device call with bucketed padding.
"""

from __future__ import annotations

import logging
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from scanner_colmap_tpu.engine.bundle_io import next_pow2, pack_bundle, unpack_bundle
from scanner_colmap_tpu.engine.correspondence import CorrespondenceGraph
from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.models import geometry as geom
from scanner_colmap_tpu.models.reconstruction import Camera, Image, Reconstruction
from scanner_colmap_tpu.ops import ba, pnp, triangulate
from scanner_colmap_tpu.utils.config import MapperConfig

log = logging.getLogger(__name__)


class IncrementalMapper:
    """One cluster's incremental reconstruction.

    Inputs (all host numpy):
      keypoints: {image_id: (K_i, 2) pixel coords}
      cameras:   {image_id: (model_id, params, width, height, prior_focal)}
      graph:     CorrespondenceGraph of verified matches
      two_view:  {(id1, id2): dict(qvec, tvec, tri_angle, num_inliers)}
                 with id1 < id2, pose maps cam(id1) -> cam(id2)
    """

    def __init__(self, keypoints, cameras, graph: CorrespondenceGraph,
                 two_view, config: Optional[MapperConfig] = None, seed: int = 0):
        # keypoints may carry (x, y) or full (x, y, scale, ori) rows — the
        # engine only consumes positions
        self.kp = {i: np.asarray(k, np.float64)[:, :2]
                   for i, k in keypoints.items()}
        self.cam_info = cameras
        self.graph = graph
        self.two_view = two_view
        self.cfg = config or MapperConfig()
        self.rec = Reconstruction()
        self.key = jax.random.PRNGKey(seed)
        self.num_reg_trials: Dict[int, int] = {}
        self._kp_norm_cache: Dict[int, np.ndarray] = {}
        if getattr(graph, "has_fast_scans", False):
            # mirror point assignments into the native graph's index
            self.rec.observer = graph.set_point
        self._num_total_reg_images = 0
        # growth trackers for global-BA triggers (ref :339-350)
        self._ba_prev_num_reg = 0
        self._ba_prev_num_points = 0

        self._init_log_f: Dict[int, float] = {}
        # shared camera: when enabled and all images agree on model/dims,
        # every image references ONE camera (id -1) and BA ties intrinsics
        infos = list(self.cam_info.values())
        share = (self.cfg.single_camera and len(infos) > 0 and all(
            (i[0], i[2], i[3]) == (infos[0][0], infos[0][2], infos[0][3])
            for i in infos))
        if share:
            model_id, params, w, h, prior = infos[0]
            self.rec.add_camera(Camera(-1, model_id, w, h,
                                       np.array(params, np.float64), prior))
        for iid, kps in self.kp.items():
            model_id, params, w, h, prior = self.cam_info[iid]
            cam_id = -1 if share else iid
            if not share:
                self.rec.add_camera(Camera(iid, model_id, w, h,
                                           np.array(params, np.float64), prior))
            self._init_log_f[iid] = float(np.log(max(params[0], 1e-6)))
            self.rec.add_image(Image(
                image_id=iid, camera_id=cam_id, name=f"image_{iid}",
                xys=kps.copy(),
                point3D_ids=np.full(len(kps), -1, np.int64)))

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _cam_arrays(self, image_id):
        cam = self.rec.cameras[self.rec.images[image_id].camera_id]
        return np.int32(cam.model_id), cam.params_padded

    _image_to_cam_jit = staticmethod(jax.jit(camlib.image_to_cam))

    def _normalize(self, image_id, uv: np.ndarray) -> np.ndarray:
        mid, p = self._cam_arrays(image_id)
        return np.asarray(self._image_to_cam_jit(
            jnp.asarray(mid), jnp.asarray(p), jnp.asarray(uv)))

    def _kp_norm(self, image_id) -> np.ndarray:
        """Normalized coords of ALL keypoints, cached (one device call per
        image — the engine reads single rows from this in its inner loops)."""
        cached = self._kp_norm_cache.get(image_id)
        if cached is None:
            cached = self._normalize(image_id, self.kp[image_id])
            self._kp_norm_cache[image_id] = cached
        return cached

    def _focal(self, image_id) -> float:
        cam = self.rec.cameras[self.rec.images[image_id].camera_id]
        return float(cam.params[0])

    def point3D_of(self, image_id, kp_idx) -> int:
        return int(self.rec.images[image_id].point3D_ids[kp_idx])

    def _set_registered(self, image_id: int, registered: bool):
        self.rec.images[image_id].registered = registered
        self.graph.set_registered(image_id, registered)

    # ------------------------------------------------------------------
    # initial pair (ref :305-313)
    # ------------------------------------------------------------------
    def find_initial_pair(self) -> Optional[Tuple[int, int]]:
        min_ang = math.radians(self.cfg.init_min_tri_angle_deg)
        cands = []
        for (i, j) in self.graph.pairs:
            tv = self.two_view.get((i, j))
            if tv is None:
                continue
            if tv["num_inliers"] < self.cfg.init_min_num_inliers:
                continue
            if tv["tri_angle"] < min_ang:
                continue
            cands.append((tv["num_inliers"], i, j))
        if not cands:
            return None
        cands.sort(reverse=True)
        return cands[0][1], cands[0][2]

    def register_initial_pair(self, image_id1: int, image_id2: int) -> bool:
        tv = self.two_view[(min(image_id1, image_id2), max(image_id1, image_id2))]
        if image_id1 > image_id2:
            qrel, trel = geom.pose_inverse(np.asarray(tv["qvec"]), np.asarray(tv["tvec"]))
            qrel, trel = np.asarray(qrel), np.asarray(trel)
        else:
            qrel, trel = np.asarray(tv["qvec"]), np.asarray(tv["tvec"])

        im1, im2 = self.rec.images[image_id1], self.rec.images[image_id2]
        im1.qvec = np.array([1.0, 0, 0, 0])
        im1.tvec = np.zeros(3)
        im2.qvec = qrel.copy()
        im2.tvec = trel.copy()
        self._set_registered(image_id1, True)
        self._set_registered(image_id2, True)
        self._num_total_reg_images = 2
        n = self.triangulate_image(image_id1)
        log.info("initial pair (%d, %d): %d points", image_id1, image_id2, n)
        return n >= self.cfg.init_min_num_inliers // 2

    # ------------------------------------------------------------------
    # next images (ref :322-328)
    # ------------------------------------------------------------------
    def find_next_images(self) -> List[int]:
        scores = []
        for iid, im in self.rec.images.items():
            if im.registered:
                continue
            if self.num_reg_trials.get(iid, 0) >= self.cfg.max_reg_trials:
                continue
            n = self.graph.num_visible_points3D(iid, self.point3D_of)
            if n >= 3:
                scores.append((n, iid))
        scores.sort(reverse=True)
        return [iid for _, iid in scores]

    # ------------------------------------------------------------------
    # registration (ref :329, COLMAP RegisterNextImage)
    # ------------------------------------------------------------------
    def register_next_image(self, image_id: int) -> bool:
        self.num_reg_trials[image_id] = self.num_reg_trials.get(image_id, 0) + 1
        if self.graph.has_fast_scans:
            kps_f, pids_f = self.graph.corrs_2d3d(image_id)
            corr2d3d = [(int(k), int(p)) for k, p in zip(kps_f, pids_f)
                        if int(p) in self.rec.points3D]
        else:
            corr2d3d = []  # (kp_idx, pid)
            seen_kp = set()
            for kp_idx in range(len(self.kp[image_id])):
                for (j, kj) in self.graph.correspondences(image_id, kp_idx):
                    if not self.rec.images[j].registered:
                        continue
                    pid = self.point3D_of(j, kj)
                    if pid >= 0 and kp_idx not in seen_kp:
                        corr2d3d.append((kp_idx, pid))
                        seen_kp.add(kp_idx)
                        break
        if len(corr2d3d) < max(6, self.cfg.abs_pose_min_num_inliers // 2):
            return False

        kp_idx = np.array([c[0] for c in corr2d3d])
        pids = [c[1] for c in corr2d3d]
        xn = self._kp_norm(image_id)[kp_idx]
        x3d = np.stack([self.rec.points3D[p].xyz for p in pids])

        N = next_pow2(len(corr2d3d), 64)
        xn_p = np.zeros((N, 2))
        x3d_p = np.zeros((N, 3))
        valid = np.zeros(N, bool)
        xn_p[: len(xn)] = xn
        x3d_p[: len(x3d)] = x3d
        valid[: len(xn)] = True

        thr = self.cfg.abs_pose_max_error / self._focal(image_id)
        res = pnp.pnp_ransac(
            self._next_key(), jnp.asarray(x3d_p), jnp.asarray(xn_p),
            jnp.asarray(valid), jnp.asarray(thr),
            min_num_inliers=min(self.cfg.abs_pose_min_num_inliers,
                                max(6, len(corr2d3d) // 2)),
            min_inlier_ratio=self.cfg.abs_pose_min_inlier_ratio)
        if not bool(res.ok):
            return False

        im = self.rec.images[image_id]
        im.qvec = np.asarray(res.qvec)
        im.tvec = np.asarray(res.tvec)
        self._set_registered(image_id, True)
        self._num_total_reg_images += 1

        # attach inlier observations to their tracks
        inl = np.asarray(res.inlier_mask)[: len(corr2d3d)]
        for (k, pid), ok in zip(corr2d3d, inl):
            if ok and pid in self.rec.points3D and im.point3D_ids[k] < 0:
                self.rec.points3D[pid].track.append((image_id, int(k)))
                self.rec.set_point3D_id(image_id, int(k), pid)
        return True

    # ------------------------------------------------------------------
    # triangulation (ref :49-57, COLMAP TriangulateImage)
    # ------------------------------------------------------------------
    def triangulate_image(self, image_id: int) -> int:
        """Continue existing tracks + triangulate new points seen from
        image_id. Returns number of new points."""
        im = self.rec.images[image_id]
        if not im.registered:
            return 0

        # 1. continuation: link keypoints to existing points via corrs
        if self.graph.has_fast_scans:
            kps_f, pids_f = self.graph.continuations(image_id)
            for kp_idx, pid in zip(kps_f, pids_f):
                kp_idx, pid = int(kp_idx), int(pid)
                if pid not in self.rec.points3D or im.point3D_ids[kp_idx] >= 0:
                    continue
                if self._observation_fits(image_id, kp_idx, pid):
                    self.rec.points3D[pid].track.append((image_id, kp_idx))
                    self.rec.set_point3D_id(image_id, kp_idx, pid)
        else:
            for kp_idx in range(len(self.kp[image_id])):
                if im.point3D_ids[kp_idx] >= 0:
                    continue
                for (j, kj) in self.graph.correspondences(image_id, kp_idx):
                    if not self.rec.images[j].registered:
                        continue
                    pid = self.point3D_of(j, kj)
                    if pid < 0:
                        continue
                    if self._observation_fits(image_id, kp_idx, pid):
                        self.rec.points3D[pid].track.append((image_id, kp_idx))
                        self.rec.set_point3D_id(image_id, kp_idx, pid)
                    break

        # 2. new tracks: unassigned kps with >= 1 registered unassigned corr
        if self.graph.has_fast_scans:
            tracks = self.graph.new_track_candidates(image_id)
        else:
            tracks = []  # list of [(img, kp), ...]
            for kp_idx in range(len(self.kp[image_id])):
                if im.point3D_ids[kp_idx] >= 0:
                    continue
                track = [(image_id, kp_idx)]
                for (j, kj) in self.graph.correspondences(image_id, kp_idx):
                    if (self.rec.images[j].registered
                            and self.point3D_of(j, kj) < 0):
                        track.append((j, kj))
                if len(track) >= 2:
                    tracks.append(track)
        return self._triangulate_tracks(tracks)

    def _observation_fits(self, image_id, kp_idx, pid,
                          thr_factor: float = 1.0) -> bool:
        im = self.rec.images[image_id]
        pt = self.rec.points3D[pid]
        x_cam = geom.np_pose_transform(im.qvec, im.tvec, pt.xyz)
        if x_cam[2] <= 0:
            return False
        cam = self.rec.cameras[im.camera_id]
        uv = camlib.np_cam_to_image(cam.model_id, cam.params, x_cam)
        err = np.linalg.norm(uv - self.kp[image_id][kp_idx])
        return err < self.cfg.filter_max_reproj_error * thr_factor

    def _triangulate_tracks(self, tracks) -> int:
        """Batch-triangulate candidate tracks; add accepted points."""
        if not tracks:
            return 0
        T = 8
        B = next_pow2(len(tracks), 64)
        qv = np.zeros((B, T, 4))
        qv[..., 0] = 1.0
        tv = np.zeros((B, T, 3))
        xn = np.zeros((B, T, 2))
        mask = np.zeros((B, T), bool)
        focals = []
        for b, track in enumerate(tracks):
            f_sum = 0.0
            for t, (iid, kp) in enumerate(track[:T]):
                im = self.rec.images[iid]
                qv[b, t] = im.qvec
                tv[b, t] = im.tvec
                xn[b, t] = self._kp_norm(iid)[kp]
                mask[b, t] = True
                f_sum += self._focal(iid)
            focals.append(f_sum / min(len(track), T))
        thr_n = self.cfg.filter_max_reproj_error / np.asarray(focals)
        thr_pad = np.full(B, 1e-3)
        thr_pad[: len(tracks)] = thr_n

        xyz, ok, view_ok = triangulate.triangulate_tracks(
            jnp.asarray(qv), jnp.asarray(tv), jnp.asarray(xn),
            jnp.asarray(mask), jnp.asarray(thr_pad),
            min_tri_angle=math.radians(self.cfg.min_tri_angle_deg))
        xyz = np.asarray(xyz)
        ok = np.asarray(ok)
        view_ok = np.asarray(view_ok)

        n_new = 0
        for b, track in enumerate(tracks):
            if not ok[b]:
                continue
            kept = [te for t, te in enumerate(track[:T]) if view_ok[b, t]]
            # guard against double-assignment created earlier in this batch
            kept = [(i, k) for (i, k) in kept
                    if self.rec.images[i].point3D_ids[k] < 0]
            if len(kept) < 2:
                continue
            self.rec.add_point3D(xyz[b], kept)
            n_new += 1
        return n_new

    # ------------------------------------------------------------------
    # track completion + merging (COLMAP CompleteAndMergeTracks, ref :141-178)
    # ------------------------------------------------------------------
    def complete_tracks(self) -> int:
        n = 0
        for pid in list(self.rec.points3D.keys()):
            pt = self.rec.points3D.get(pid)
            if pt is None:
                continue
            for (iid, kp) in list(pt.track):
                for (j, kj) in self.graph.correspondences(iid, kp):
                    im_j = self.rec.images[j]
                    if not im_j.registered or im_j.point3D_ids[kj] >= 0:
                        continue
                    if self._observation_fits(j, kj, pid):
                        pt.track.append((j, int(kj)))
                        self.rec.set_point3D_id(j, int(kj), pid)
                        n += 1
        return n

    def merge_tracks(self) -> int:
        """Merge pairs of 3D points linked by a correspondence whose merged
        position fits both tracks."""
        n = 0
        for pid in list(self.rec.points3D.keys()):
            pt = self.rec.points3D.get(pid)
            if pt is None:
                continue
            partner = None
            for (iid, kp) in pt.track:
                for (j, kj) in self.graph.correspondences(iid, kp):
                    if not self.rec.images[j].registered:
                        continue
                    pid2 = self.point3D_of(j, kj)
                    if pid2 >= 0 and pid2 != pid:
                        partner = pid2
                        break
                if partner:
                    break
            if partner is None or partner not in self.rec.points3D:
                continue
            pt2 = self.rec.points3D[partner]
            w1, w2 = len(pt.track), len(pt2.track)
            merged_xyz = (pt.xyz * w1 + pt2.xyz * w2) / (w1 + w2)
            # verify merged point fits all observations
            old_xyz1, old_xyz2 = pt.xyz.copy(), pt2.xyz.copy()
            pt.xyz = merged_xyz
            fits = all(
                self._observation_fits(i, k, pid)
                for (i, k) in pt.track + pt2.track
                if self.rec.images[i].registered)
            pt.xyz = old_xyz1
            if not fits:
                continue
            # move pt2's observations into pt
            for (i, k) in pt2.track:
                self.rec.set_point3D_id(i, int(k), pid)
            pt.track = pt.track + pt2.track
            pt.xyz = merged_xyz
            del self.rec.points3D[partner]
            n += 1
        return n

    # ------------------------------------------------------------------
    # filtering (COLMAP FilterPoints/FilterImages, ref :141-178)
    # ------------------------------------------------------------------
    def filter_points(self) -> int:
        self.rec.compute_reprojection_errors()
        min_ang = math.radians(self.cfg.min_tri_angle_deg)
        removed = 0
        for pid in list(self.rec.points3D.keys()):
            pt = self.rec.points3D[pid]
            if pt.error > self.cfg.filter_max_reproj_error or pt.error < 0:
                self.rec.remove_point3D(pid)
                removed += 1
                continue
            # max pairwise triangulation angle test
            centers = [self.rec.images[i].projection_center()
                       for (i, _) in pt.track if self.rec.images[i].registered]
            if len(centers) < 2:
                self.rec.remove_point3D(pid)
                removed += 1
                continue
            c = np.stack(centers)
            angs = geom.np_triangulation_angle(c[:, None, :], c[None, :, :],
                                               pt.xyz)
            max_ang = float(np.max(angs))
            if max_ang < min_ang:
                self.rec.remove_point3D(pid)
                removed += 1
        return removed

    def filter_images(self) -> int:
        removed = 0
        for iid in self.rec.registered_image_ids:
            im = self.rec.images[iid]
            n = im.num_points3D
            if self._num_total_reg_images > 2 and n < 3:
                self.rec.deregister_image(iid)
                self.graph.set_registered(iid, False)
                removed += 1
        return removed

    # ------------------------------------------------------------------
    # bundle adjustment (ref :59-139)
    # ------------------------------------------------------------------
    def _run_ba(self, image_ids, max_iterations, refine_intrinsics=True,
                fix_all_poses_outside=None):
        params, obs, cfg, meta = pack_bundle(self.rec, image_ids)
        if not meta["point_ids"] or len(meta["image_ids"]) < 2:
            return None
        Mv = len(meta["image_ids"])
        fixed_full = [0]
        fixed_t0 = [1] if Mv > 2 else []
        if Mv == 2:
            fixed_t0 = [1]
        pose_free = np.asarray(ba.make_pose_free(
            params.qvec.shape[0], fixed_full=fixed_full, fixed_tvec0=fixed_t0))
        if fix_all_poses_outside is not None:
            inside = set(fix_all_poses_outside)
            for s, iid in enumerate(meta["image_ids"]):
                if iid not in inside:
                    pose_free[s] = 0.0
        # COLMAP refines focal when no prior focal; distortion always
        any_prior = all(self.rec.cameras[self.rec.images[i].camera_id].prior_focal
                        for i in meta["image_ids"])
        prior_log_f = np.asarray(cfg.prior_log_f).copy()
        # per-slot prior weight = weight of the PHYSICAL camera divided by
        # its group size (shared-camera slots sum to one camera's prior)
        group_size = {}
        for iid in meta["image_ids"]:
            cid = self.rec.images[iid].camera_id
            group_size[cid] = group_size.get(cid, 0) + 1
        wf = np.zeros(prior_log_f.shape[0])
        wk = np.zeros(prior_log_f.shape[0])
        for s, iid in enumerate(meta["image_ids"]):
            prior_log_f[s] = self._init_log_f[iid]
            g = group_size[self.rec.images[iid].camera_id]
            wf[s] = self.cfg.intr_prior_weight_f / g
            wk[s] = self.cfg.intr_prior_weight_k / g
        cfg = cfg._replace(
            pose_free=jnp.asarray(pose_free),
            refine_focal=jnp.asarray(bool(refine_intrinsics and not any_prior)),
            refine_distortion=jnp.asarray(bool(refine_intrinsics)),
            loss_scale=jnp.asarray(float(self.cfg.filter_max_reproj_error)),
            prior_log_f=jnp.asarray(prior_log_f),
            prior_weight_f=jnp.asarray(wf),
            prior_weight_k=jnp.asarray(wk),
        )
        p_out, info = ba.bundle_adjust(
            params, obs, cfg, max_iterations=max_iterations,
            chunk=min(1024, params.xyz.shape[0]))
        unpack_bundle(self.rec, p_out, meta, update_intrinsics=refine_intrinsics)
        if refine_intrinsics:
            # normalized-keypoint cache depends on intrinsics
            for iid in meta["image_ids"]:
                self._kp_norm_cache.pop(iid, None)
        return info

    def local_bundle_adjustment(self, image_id: int):
        """Iterative local refinement (ref :86-114): BA over the images most
        connected to image_id, repeated until the changed-observation ratio
        drops below ba_local_max_refinement_change."""
        # local window: images sharing the most points with image_id
        share = {}
        im = self.rec.images[image_id]
        for pid in im.point3D_ids:
            if pid < 0:
                continue
            for (j, _) in self.rec.points3D[int(pid)].track:
                if j != image_id and self.rec.images[j].registered:
                    share[j] = share.get(j, 0) + 1
        neighbors = sorted(share, key=share.get, reverse=True)[:7]
        window = [image_id] + neighbors
        if len(window) < 2:
            return
        prev_points = None
        for it in range(self.cfg.ba_local_max_refinements):
            info = self._run_ba(window, self.cfg.ba_local_max_num_iterations,
                                refine_intrinsics=True)
            if info is None:
                return
            self.complete_tracks()
            self.merge_tracks()
            self.filter_points()
            num_points = len(self.rec.points3D)
            if prev_points is not None:
                change = abs(num_points - prev_points) / max(prev_points, 1)
                if change < self.cfg.ba_local_max_refinement_change:
                    break
            prev_points = num_points

    def global_bundle_adjustment(self):
        """Iterative global refinement (ref :116-139): retriangulate, BA over
        all registered images, complete/merge tracks, filter."""
        reg = self.rec.registered_image_ids
        if len(reg) < 2:
            return
        for it in range(self.cfg.ba_global_max_refinements):
            self.retriangulate()
            prev_obs = sum(p.track_length for p in self.rec.points3D.values())
            # stricter solve for tiny models, like ref :66-73
            iters = self.cfg.ba_global_max_num_iterations
            if len(reg) < 10:
                iters *= 2
            info = self._run_ba(reg, iters, refine_intrinsics=True)
            if info is None:
                return
            self.complete_tracks()
            self.merge_tracks()
            self.filter_points()
            self.filter_images()
            reg = self.rec.registered_image_ids
            num_obs = sum(p.track_length for p in self.rec.points3D.values())
            change = abs(num_obs - prev_obs) / max(prev_obs, 1)
            if change < self.cfg.ba_global_max_refinement_change:
                break

    def retriangulate(self):
        """Re-create tracks for under-reconstructed pairs (cheap version of
        COLMAP's Retriangulate): try new tracks from every registered image."""
        for iid in self.rec.registered_image_ids:
            self.triangulate_image(iid)

    def _check_global_ba_trigger(self) -> bool:
        """Growth-ratio/frequency triggers (ref :339-350)."""
        n_reg = self._num_total_reg_images
        n_pts = len(self.rec.points3D)
        if self._ba_prev_num_reg == 0:
            return True
        if n_reg >= self.cfg.ba_global_images_ratio * self._ba_prev_num_reg:
            return True
        if n_reg >= self._ba_prev_num_reg + self.cfg.ba_global_images_freq:
            return True
        if self._ba_prev_num_points and (
                n_pts >= self.cfg.ba_global_points_ratio * self._ba_prev_num_points
                or n_pts >= self._ba_prev_num_points + self.cfg.ba_global_points_freq):
            return True
        return False

    # ------------------------------------------------------------------
    # main loop (ref :305-361)
    # ------------------------------------------------------------------
    def reconstruct(self, init_pair: Optional[Tuple[int, int]] = None) -> Reconstruction:
        if init_pair is None:
            init_pair = self.find_initial_pair()
        if init_pair is None:
            log.warning("no valid initial pair")
            return self.rec
        if not self.register_initial_pair(*init_pair):
            log.warning("initial pair registration weak")
        self.global_bundle_adjustment()
        self._ba_prev_num_reg = self._num_total_reg_images
        self._ba_prev_num_points = len(self.rec.points3D)

        reg_next_success = True
        while reg_next_success:
            reg_next_success = False
            for image_id in self.find_next_images():
                if self.register_next_image(image_id):
                    reg_next_success = True
                    self.triangulate_image(image_id)
                    self.local_bundle_adjustment(image_id)
                    if self._check_global_ba_trigger():
                        self.global_bundle_adjustment()
                        self._ba_prev_num_reg = self._num_total_reg_images
                        self._ba_prev_num_points = len(self.rec.points3D)
                    break  # re-rank after each success, like COLMAP

        self.global_bundle_adjustment()
        self.rec.compute_reprojection_errors()
        log.info("reconstruction: %d images, %d points, mean err %.3f px",
                 self.rec.num_registered, len(self.rec.points3D),
                 self.rec.mean_reprojection_error())
        return self.rec
