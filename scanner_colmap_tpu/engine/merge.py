"""Submodel merging: Sim(3) alignment + track-aware model fusion.

Rebuilds the capability of COLMAP's ``Reconstruction::Merge`` as used by the
reference's merge kernel (/root/reference/integration/op_cpp/
merge_mapping.cc:43-76): submodels built per cluster share ``cluster_overlap``
images; the merge computes a similarity transform from the common registered
images, folds one model into the other, and reprojection-filters merged
points (kMaxReprojError = 64 px, merge_mapping.cc:17).

Improvements over the reference (SURVEY §7.4.6, §8):
- TREE reduction over submodels instead of a linear fold (log depth, and the
  pairing keeps adjacent clusters — which actually share images — together)
- failures are reported (returned), not silently printed
- the Sim(3) is estimated from ALL common camera centers via weighted Umeyama
  (batched on device) rather than pairwise accumulation
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import numpy as np

from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.models import geometry as geom
from scanner_colmap_tpu.models.reconstruction import Reconstruction
from scanner_colmap_tpu.utils.config import MergeConfig

log = logging.getLogger(__name__)


def align_reconstructions(src: Reconstruction, dst: Reconstruction,
                          min_common_images: int = 2,
                          max_point_pairs: int = 2000
                          ) -> Optional[Tuple[float, np.ndarray, np.ndarray]]:
    """Sim(3) mapping src world coords into dst world coords.

    Correspondences: common registered image centers PLUS 3D point pairs
    identified by shared (image, keypoint) observations. The points break
    the rotational degeneracy of collinear camera tracks (the common case:
    sequential capture), so two overlap images suffice — the reference
    needs enough common images because it aligns from poses alone.
    """
    common = [i for i in src.registered_image_ids
              if i in dst.images and dst.images[i].registered]
    if len(common) < min_common_images:
        return None
    src_pts = [src.images[i].projection_center() for i in common]
    dst_pts = [dst.images[i].projection_center() for i in common]
    weights = [10.0] * len(common)  # trust camera centers more than points

    # shared-observation point pairs
    common_set = set(common)
    n_pairs = 0
    for pid, pt in src.points3D.items():
        if n_pairs >= max_point_pairs:
            break
        for (iid, kp) in pt.track:
            if iid not in common_set:
                continue
            dst_im = dst.images[iid]
            if kp >= len(dst_im.point3D_ids):
                continue
            dpid = int(dst_im.point3D_ids[kp])
            if dpid >= 0 and dpid in dst.points3D:
                src_pts.append(pt.xyz)
                dst_pts.append(dst.points3D[dpid].xyz)
                weights.append(1.0)
                n_pairs += 1
                break
    if len(src_pts) < 3:
        return None
    # host numpy: the correspondence count varies per call, so a device jit
    # would recompile every merge; the math is a 3x3 SVD
    s, q, t = geom.np_umeyama_alignment(np.stack(src_pts), np.stack(dst_pts),
                                        weights=np.asarray(weights))
    return float(s), np.asarray(q), np.asarray(t)


def _batch_reproj_ok(rec: Reconstruction, iids, kps, xyz,
                     max_err: float) -> np.ndarray:
    """Vectorized: does xyz[i] reproject within max_err at keypoint kps[i] of
    registered dst image iids[i]? One batched rotate/project for all
    candidate observations of a merge (the per-observation host loop
    dominated merge wall-clock)."""
    iids = np.asarray(iids, np.int64)
    if len(iids) == 0:
        return np.zeros(0, bool)
    kps = np.asarray(kps, np.int64)
    xyz = np.asarray(xyz, np.float64)
    img_list = list(dict.fromkeys(int(i) for i in iids))
    slot = {iid: s for s, iid in enumerate(img_list)}
    s_arr = np.fromiter((slot[int(i)] for i in iids), np.int64, len(iids))
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
    for s, iid in enumerate(img_list):
        sel = s_arr == s
        uv_obs[sel] = rec.images[iid].xys[kps[sel]]
    err = np.hypot(u - uv_obs[:, 0], v - uv_obs[:, 1])
    return (z > 0) & (err <= max_err)


def merge_into(dst: Reconstruction, src: Reconstruction,
               config: Optional[MergeConfig] = None) -> bool:
    """Fold src into dst (in place). Returns False if alignment failed."""
    cfg = config or MergeConfig()
    ali = align_reconstructions(src, dst, cfg.min_common_images)
    if ali is None:
        log.warning("merge: <%d common registered images", cfg.min_common_images)
        return False
    s, q, t = ali
    src = src.copy()
    src.transform(s, q, t)

    # add src-only cameras/images (dst wins on conflicts)
    for cid, cam in src.cameras.items():
        if cid not in dst.cameras:
            dst.add_camera(cam)
    for iid, im in src.images.items():
        if iid not in dst.images:
            dst.add_image(im)
            # forget stale point references; tracks re-added below
            im.point3D_ids = np.full(len(im.point3D_ids), -1, np.int64)
        elif not dst.images[iid].registered and im.registered:
            old = dst.images[iid]
            old.qvec, old.tvec = im.qvec, im.tvec
            old.registered = True

    # fold points with track-aware dedup
    for pid, pt in src.points3D.items():
        # does any observation already belong to a dst point?
        target = -1
        for (iid, kp) in pt.track:
            dst_im = dst.images.get(iid)
            if dst_im is not None and kp < len(dst_im.point3D_ids):
                ref = int(dst_im.point3D_ids[kp])
                if ref >= 0:
                    target = ref
                    break
        new_track = []
        for (iid, kp) in pt.track:
            dst_im = dst.images.get(iid)
            if dst_im is None or not dst_im.registered:
                continue
            if int(dst_im.point3D_ids[kp]) >= 0:
                continue  # already observed by a dst point
            new_track.append((iid, kp))
        if target >= 0 and target in dst.points3D:
            tgt = dst.points3D[target]
            if _track_reproj_ok(dst, tgt.xyz, new_track, cfg.max_reproj_error):
                for (iid, kp) in new_track:
                    tgt.track.append((iid, kp))
                    dst.images[iid].point3D_ids[kp] = target
        elif len(new_track) >= 2:
            if _track_reproj_ok(dst, pt.xyz, new_track, cfg.max_reproj_error):
                dst.add_point3D(pt.xyz, new_track, rgb=pt.rgb, error=pt.error)
    return True


def _track_reproj_ok(rec, xyz, track, max_err: float) -> bool:
    if not track:
        return True
    iids = [i for (i, _) in track]
    kps = [k for (_, k) in track]
    ok = _batch_reproj_ok(rec, iids, kps,
                          np.broadcast_to(xyz, (len(track), 3)), max_err)
    return bool(ok.all())


def merge_all(models: List[Reconstruction],
              config: Optional[MergeConfig] = None) -> Reconstruction:
    """Tree-reduce a list of submodels (adjacent pairs share overlap images).

    Unmergeable models are carried forward and retried at the next level;
    anything still unmerged at the end is dropped with a warning (the
    reference silently prints and keeps going, merge_mapping.cc:64-66).
    """
    models = [m for m in models if m.num_registered > 0]
    if not models:
        return Reconstruction()
    level = models
    while len(level) > 1:
        nxt = []
        skipped = []
        for i in range(0, len(level) - 1, 2):
            a, b = level[i], level[i + 1]
            if merge_into(a, b, config):
                nxt.append(a)
            else:
                nxt.append(a)
                skipped.append(b)
        if len(level) % 2 == 1:
            nxt.append(level[-1])
        # retry skipped against the merged survivors
        still = []
        for m in skipped:
            if not any(merge_into(a, m, config) for a in nxt):
                still.append(m)
        if still:
            if len(nxt) + len(still) == len(level):
                for m in still:
                    log.warning("merge_all: dropping unmergeable submodel "
                                "with %d images", m.num_registered)
            else:
                nxt.extend(still)
        level = nxt
    return level[0]
