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
from scanner_colmap_tpu.models.reconstruction import Point3D, Reconstruction
from scanner_colmap_tpu.utils.config import MergeConfig

log = logging.getLogger(__name__)


def align_reconstructions(src: Reconstruction, dst: Reconstruction,
                          min_common_images: int = 2,
                          max_point_pairs: int = 2000
                          ) -> Optional[Tuple[float, np.ndarray, np.ndarray]]:
    """Sim(3) mapping src world coords into dst world coords.

    Primary estimator: the common images' full POSES — rotation from the
    averaged relative orientation, scale from pairwise center-distance
    ratios, translation from centers. Camera orientations are the most
    accurate quantities either submodel has; aligning from them instead of
    noisy triangulated point pairs cut merged-trajectory ATE ~5x on the
    48-image benchmark (points-only Umeyama inherits point noise into the
    rotation, and a merged-in rotation error grows linearly with trajectory
    lever arm — unrecoverable later, global BA cannot observe the bend with
    windowed matching).

    Fallback (tiny/degenerate overlap baseline): weighted Umeyama over
    common camera centers PLUS 3D point pairs identified by shared
    (image, keypoint) observations — the points break the rotational
    degeneracy of collinear camera tracks.
    """
    common = [i for i in src.registered_image_ids
              if i in dst.images and dst.images[i].registered]
    if len(common) < min_common_images:
        return None

    pose_ali = _align_from_poses(src, dst, common)
    if pose_ali is not None:
        return pose_ali
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


def _align_from_poses(src: Reconstruction, dst: Reconstruction,
                      common) -> Optional[Tuple[float, np.ndarray, np.ndarray]]:
    """Sim(3) from the common images' poses (see align_reconstructions).

    Returns None when the overlap baseline is too small to fix scale or the
    per-image orientations disagree (caller falls back to point pairs).
    """
    # rotation: each common image constrains q_R via q_i^dst = q_i^src (x)
    # conj(q_R); average the per-image estimates (conj sign resolved below
    # by center residual — cheap and robust to convention slips)
    qs = []
    for i in common:
        q = geom.np_quat_mul(dst.images[i].qvec * np.array([1.0, -1, -1, -1]),
                             src.images[i].qvec)
        qs.append(q if q[0] >= 0 else -q)
    qs = np.stack(qs)
    q_mean = qs.mean(axis=0)
    q_mean /= np.linalg.norm(q_mean)
    # orientation consensus: all estimates near the mean
    if len(qs) > 1 and np.min(np.abs(qs @ q_mean)) < 0.999:
        return None

    Cs = np.stack([src.images[i].projection_center() for i in common])
    Cd = np.stack([dst.images[i].projection_center() for i in common])
    ratios, dst_dists = [], []
    for a in range(len(common)):
        for b in range(a + 1, len(common)):
            ds_ = np.linalg.norm(Cs[a] - Cs[b])
            dd = np.linalg.norm(Cd[a] - Cd[b])
            if ds_ > 1e-8 and dd > 1e-8:
                ratios.append(dd / ds_)
                dst_dists.append(dd)
    if not ratios:
        return None
    s = float(np.median(ratios))

    best = None
    for qc in (q_mean, q_mean * np.array([1.0, -1, -1, -1])):
        t = np.mean(Cd - s * geom.np_quat_rotate(qc, Cs), axis=0)
        res = float(np.linalg.norm(
            s * geom.np_quat_rotate(qc, Cs) + t - Cd, axis=-1).mean())
        if best is None or res < best[0]:
            best = (res, qc, t)
    res, qc, t = best
    # centers must agree to a fraction of the overlap baseline
    if res > 0.1 * max(np.median(dst_dists), 1e-8):
        return None
    return s, np.asarray(qc), np.asarray(t)


def _batch_reproj_ok(rec: Reconstruction, iids, kps, xyz,
                     max_err: float) -> np.ndarray:
    """Vectorized: does xyz[i] reproject within max_err at keypoint kps[i] of
    registered dst image iids[i]? One batched rotate/project for all
    candidate observations of a merge (the per-observation host loop
    dominated merge wall-clock)."""
    from scanner_colmap_tpu.models.reconstruction import np_reproj_errors

    if len(np.asarray(iids)) == 0:
        return np.zeros(0, bool)
    err, z = np_reproj_errors(rec, iids, kps, xyz)
    return (z > 0) & (err <= max_err)


def merge_into(dst: Reconstruction, src: Reconstruction,
               config: Optional[MergeConfig] = None,
               consume: bool = False) -> bool:
    """Fold src into dst (in place). Returns False if alignment failed.

    consume=True transforms src IN PLACE instead of deep-copying it first —
    valid when the caller discards src afterwards (the tree fold does; src
    is only mutated after alignment succeeded, so a False return leaves it
    untouched either way). Measured at 2k images / 250 submodels: deepcopy
    was 66% of the whole fold (65 s of 99 s host profile)."""
    cfg = config or MergeConfig()
    ali = align_reconstructions(src, dst, cfg.min_common_images)
    if ali is None:
        log.warning("merge: <%d common registered images", cfg.min_common_images)
        return False
    s, q, t = ali
    if not consume:
        src = src.copy()
    src.transform(s, q, t)

    # fold points with track-aware dedup. Candidates are collected with
    # VECTOR ops over the flattened src tracks and reprojection-checked in
    # ONE batched call — src tracks partition src keypoints, so no
    # candidate's check depends on another's application (the per-
    # observation Python loops here were 7.3 s of a 15 s fold profile at
    # 2k images; see tools/prof_host_ops.py)
    src_pts = list(src.points3D.values())
    src_pids = np.fromiter(src.points3D.keys(), np.int64, len(src_pts))
    nP = len(src_pts)
    # src observations from the per-image ASSIGNMENT arrays (they mirror
    # the track lists exactly) — vector ops per image instead of a Python
    # pass over every track entry. Observations group by point via one
    # argsort; within a point they order by (image, keypoint), which only
    # affects the tie-break when several dst points own a track's
    # observations. Captured BEFORE the image-add block below, which
    # resets src-only images' assignment arrays.
    ob_pid_l, ob_iid_l, ob_kp_l = [], [], []
    for iid, im in src.images.items():
        kps = np.flatnonzero(im.point3D_ids >= 0)
        if len(kps):
            ob_pid_l.append(im.point3D_ids[kps])
            ob_iid_l.append(np.full(len(kps), iid, np.int64))
            ob_kp_l.append(kps)

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

    if nP == 0 or not ob_pid_l:
        return True
    ob_pid = np.concatenate(ob_pid_l)
    ob_iid = np.concatenate(ob_iid_l)
    ob_kp = np.concatenate(ob_kp_l)
    # map src point id -> dense point index; drop assignments whose id is
    # not a live src point (stale image references)
    pid_sorted = np.argsort(src_pids, kind="stable")
    pos = np.searchsorted(src_pids[pid_sorted], ob_pid)
    pos = np.minimum(pos, nP - 1)
    live = src_pids[pid_sorted][pos] == ob_pid
    ob_pi = pid_sorted[pos[live]]
    order_p = np.argsort(ob_pi, kind="stable")
    o_pi = ob_pi[order_p]                      # sorted by point index
    o_iid = ob_iid[live][order_p]
    o_kp = ob_kp[live][order_p]
    nO = len(o_pi)
    if nO == 0:
        return True

    # per-observation dst state, gathered per distinct image
    uniq, inv = np.unique(o_iid, return_inverse=True)
    reg_u = np.zeros(len(uniq), bool)
    len_u = np.zeros(len(uniq), np.int64)
    order_o = np.argsort(inv, kind="stable")
    bounds = np.searchsorted(inv[order_o], np.arange(len(uniq) + 1))
    ref = np.full(nO, -1, np.int64)           # dst point id at (iid, kp)
    inrange = np.zeros(nO, bool)
    for s, iid in enumerate(uniq.tolist()):
        dst_im = dst.images.get(iid)
        if dst_im is None:
            continue
        reg_u[s] = dst_im.registered
        len_u[s] = len(dst_im.point3D_ids)
        sl = order_o[bounds[s]: bounds[s + 1]]
        k = o_kp[sl]
        okr = k < len_u[s]
        inrange[sl] = okr
        ref[sl[okr]] = dst_im.point3D_ids[k[okr]]

    # target = first track observation already assigned in dst, selected
    # in flattened (image-dict, keypoint) order — a deliberate tie-break
    # vs the old per-track loop's track order when a src track's
    # observations are owned by several dst points (ADVICE r4)
    first_pos = np.full(nP, nO, np.int64)
    has_ref = ref >= 0
    np.minimum.at(first_pos, o_pi[has_ref], np.flatnonzero(has_ref))
    target = np.where(first_pos < nO, ref[np.minimum(first_pos, nO - 1)], -1)

    # new-track observations: registered dst image, keypoint unassigned
    nt = reg_u[inv] & inrange & (ref < 0)
    counts_new = np.bincount(o_pi[nt], minlength=nP)
    nt_pi, nt_iid, nt_kp = o_pi[nt], o_iid[nt], o_kp[nt]
    nt_start = np.searchsorted(nt_pi, np.arange(nP))
    nt_end = np.searchsorted(nt_pi, np.arange(nP) + 1)

    # candidate xyz: the dst target's position, else the src point's
    tgt_valid = np.zeros(nP, bool)
    cand_xyz = np.empty((nP, 3))
    for pi in np.flatnonzero(target >= 0):
        tp = dst.points3D.get(int(target[pi]))
        if tp is not None:
            tgt_valid[pi] = True
            cand_xyz[pi] = tp.xyz
    new_pt = (~tgt_valid) & (counts_new >= 2)   # stale targets fall through
    cand = tgt_valid | new_pt
    if new_pt.any():
        cand_xyz[new_pt] = np.stack([src_pts[pi].xyz
                                     for pi in np.flatnonzero(new_pt)])

    # one batched reprojection check over every candidate's new observations
    ok = np.ones(nP, bool)
    f_sel = nt & cand[o_pi]
    if f_sel.any():
        fits = _batch_reproj_ok(dst, o_iid[f_sel], o_kp[f_sel],
                                cand_xyz[o_pi[f_sel]], cfg.max_reproj_error)
        np.logical_and.at(ok, o_pi[f_sel], fits)

    # apply accepted candidates. Point ids are allocated in bulk, the track
    # lists are built from slice-zips of ONE tolist conversion, and the
    # keypoint-id writes go out grouped per image (set_point3D_id per
    # observation was 2.4 s of the same profile)
    acc = cand & ok
    new_acc = acc & new_pt
    n_new = int(new_acc.sum())
    pid_arr = np.where(tgt_valid, target, -1)
    if n_new:
        pid_arr[new_acc] = dst._next_point3D_id + np.arange(n_new)
        dst._next_point3D_id += n_new
    iid_list, kp_list = nt_iid.tolist(), nt_kp.tolist()
    for pi in np.flatnonzero(acc):
        s0, e0 = nt_start[pi], nt_end[pi]
        entries = list(zip(iid_list[s0:e0], kp_list[s0:e0]))
        if tgt_valid[pi]:
            dst.points3D[int(pid_arr[pi])].track.extend(entries)
        else:
            pt = src_pts[pi]
            dst.points3D[int(pid_arr[pi])] = Point3D(
                np.asarray(pt.xyz, np.float64), pt.rgb, float(pt.error),
                entries)
    a_sel = acc[nt_pi]
    if a_sel.any():
        a_iid = nt_iid[a_sel]
        a_kp = nt_kp[a_sel]
        a_pid = pid_arr[nt_pi[a_sel]]
        if dst.observer is None:
            au, ainv = np.unique(a_iid, return_inverse=True)
            ao = np.argsort(ainv, kind="stable")
            ab = np.searchsorted(ainv[ao], np.arange(len(au) + 1))
            for s, iid in enumerate(au.tolist()):
                sl = ao[ab[s]: ab[s + 1]]
                dst.images[iid].point3D_ids[a_kp[sl]] = a_pid[sl]
        else:
            for iid, kp, pid in zip(a_iid.tolist(), a_kp.tolist(),
                                    a_pid.tolist()):
                dst.set_point3D_id(iid, kp, pid)
    return True


def global_refine(rec: Reconstruction, max_iterations: int = 50,
                  filter_max_reproj_error: float = 4.0,
                  intr_prior_weight_f: float = 300.0,
                  intr_prior_weight_k: float = 3000.0,
                  max_track: int = 16,
                  dense_max_images: int = 256,
                  cg_iters: int = 32) -> Optional[dict]:
    """One global BA over the (merged) model + reprojection filtering.

    Per-cluster BA leaves inter-submodel drift that the Sim(3) merge cannot
    remove (the reference stops at Reconstruction::Merge and ships the
    unrefined concatenation, merge_mapping.cc:61-76); a final global solve
    is what COLMAP's mapper would have done on the full problem.
    """
    from scanner_colmap_tpu.engine.bundle_io import pack_bundle_flat
    from scanner_colmap_tpu.ops import ba

    reg = rec.registered_image_ids
    if len(reg) < 2:
        return None
    cam_in, pt_in, obs_in, meta = pack_bundle_flat(rec, reg,
                                                   max_track=max_track)
    if not meta["point_ids"]:
        return None
    # gauge: fix slot 0 fully, one translation component of slot 1
    cam_in[0, 12:18] = 0.0
    cam_in[1, 15] = 0.0
    group_size: dict = {}
    for iid in meta["image_ids"]:
        cid = rec.images[iid].camera_id
        group_size[cid] = group_size.get(cid, 0) + 1
    for s, iid in enumerate(meta["image_ids"]):
        g = group_size[rec.images[iid].camera_id]
        cam_in[s, 20] = intr_prior_weight_f / g
        cam_in[s, 21] = intr_prior_weight_k / g
    scal_in = np.asarray([1.0, 1.0, filter_max_reproj_error], np.float32)

    P = pt_in.shape[0]
    # beyond the dense Schur bound (O(MC^2) memory, O(P*MC^2) accumulation)
    # the solve switches to the matrix-free CG path (ba._lm_trial_cg) —
    # same LM loop, same ties, scales to 1k-10k cameras
    solver = "dense" if cam_in.shape[0] <= dense_max_images else "cg"
    out = ba.bundle_adjust_flat_segmented(
        cam_in, pt_in, obs_in, scal_in,
        max_iterations=max_iterations, chunk=min(1024, P), solver=solver,
        cg_iters=cg_iters)
    M = cam_in.shape[0]
    cam = out[: M * 9].reshape(M, 9).astype(np.float64)
    xyz = out[M * 9: M * 9 + P * 3].reshape(P, 3).astype(np.float64)
    stats = out[M * 9 + P * 3:]
    from scanner_colmap_tpu.engine.bundle_io import unpack_bundle

    p_out = ba.BundleParams(qvec=cam[:, 0:4], tvec=cam[:, 4:7],
                            log_f=cam[:, 7], k1=cam[:, 8], xyz=xyz)
    unpack_bundle(rec, p_out, meta, update_intrinsics=True)

    # reprojection filter on the refined model
    rec.compute_reprojection_errors()
    for pid in [p for p, pt in rec.points3D.items()
                if pt.error > filter_max_reproj_error or pt.error < 0]:
        rec.remove_point3D(pid)
    rec.compute_reprojection_errors()
    return {"initial_cost": float(stats[0]), "final_cost": float(stats[1]),
            "iterations": int(stats[2])}


def transplant_model(model: Reconstruction, mapper) -> int:
    """Transplant a merged model's intrinsics/poses/points into a fresh
    full-graph IncrementalMapper (the seed state for iterative global
    refinement). Returns the number of registered images transplanted."""
    # intrinsics from the merged model (shared camera -1 or per-image ids)
    for cid, cam in model.cameras.items():
        if cid in mapper.rec.cameras:
            mapper.rec.cameras[cid].params = np.array(cam.params, np.float64)
    n = 0
    for iid, im in model.images.items():
        if not im.registered or iid not in mapper.rec.images:
            continue
        mi = mapper.rec.images[iid]
        mi.qvec = np.asarray(im.qvec, np.float64).copy()
        mi.tvec = np.asarray(im.tvec, np.float64).copy()
        mapper._set_registered(iid, True)
        n += 1
    mapper._num_total_reg_images = n
    if n < 2:
        return n
    # warm-start points (retriangulation then extends coverage)
    for pid, pt in model.points3D.items():
        track = []
        for iid, k in pt.track:
            k = int(k)
            im = mapper.rec.images.get(iid)
            if (im is not None and im.registered
                    and k < len(im.point3D_ids) and im.point3D_ids[k] < 0):
                track.append((iid, k))
        if len(track) >= 2:
            mapper.rec.add_point3D(np.asarray(pt.xyz, np.float64), track,
                                   rgb=pt.rgb)
    return n


def iterative_global_refinement(model: Reconstruction, keypoints, cameras,
                                graph, two_view, mapper_cfg,
                                window: int = 10,
                                loop_gate_factor: float = 3.0,
                                loop_separation: int = 0
                                ) -> Reconstruction:
    """COLMAP IterativeGlobalRefinement over the MERGED model with the FULL
    correspondence graph (incremental_mapping.cc:116-139 semantics — the
    reference runs this only per-cluster and ships the merged model
    unrefined, merge_mapping.cc:61-76).

    Transplants the merged poses/intrinsics/points into an
    IncrementalMapper spanning every image, then runs its retriangulate /
    global BA / complete+merge tracks / filter loop. Retriangulation over
    the full graph creates CROSS-CLUSTER tracks the per-cluster solves
    never saw — the constraints that pairwise Sim(3) merging cannot
    generate, and the main lever against inter-cluster drift."""
    from scanner_colmap_tpu.engine.incremental import IncrementalMapper

    mapper = IncrementalMapper(keypoints, cameras, graph, two_view,
                               mapper_cfg)
    n = transplant_model(model, mapper)
    if n < 2:
        return model
    # loop-closure pre-round: when the graph carries edges far outside the
    # matching window (loop pairs — stages.run_matching loop_closure), the
    # merged model's inter-leg drift can push cross-loop reprojections past
    # the normal acceptance gate, so the constraint would be filtered before
    # it could act. One refinement round with gates/loss loosened by
    # loop_gate_factor lets retriangulation CREATE the cross-loop tracks and
    # the robust BA pull the loop together; the normal rounds then re-filter
    # at full strictness.
    # loop edge iff the offset exceeds the separation the MATCHING stage
    # used for loop candidates (loop_min_separation or 2*overlap) AND the
    # widest actual window offset (quadratic_overlap schedules pairs at
    # offsets up to 2^(overlap-1), which must not falsely trigger this) —
    # ADVICE r3: recomputing 2*window here disagreed with both.
    sep = max(loop_separation if loop_separation > 0 else 2 * window, window)
    has_loops = any(abs(int(i) - int(j)) > sep for (i, j) in two_view)
    if has_loops and loop_gate_factor > 1.0:
        import dataclasses as _dc

        mapper.cfg = _dc.replace(
            mapper_cfg,
            filter_max_reproj_error=(mapper_cfg.filter_max_reproj_error
                                     * loop_gate_factor),
            ba_global_max_refinements=1)
        mapper.global_bundle_adjustment()
        mapper.cfg = mapper_cfg
    mapper.global_bundle_adjustment()
    mapper.rec.compute_reprojection_errors()
    return mapper.rec


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
            if merge_into(a, b, config, consume=True):
                nxt.append(a)
            else:
                nxt.append(a)
                skipped.append(b)
        if len(level) % 2 == 1:
            nxt.append(level[-1])
        # retry skipped against the merged survivors
        still = []
        for m in skipped:
            if not any(merge_into(a, m, config, consume=True)
                       for a in nxt):
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
