"""ctypes binding for the native correspondence graph (native/corr_graph.cc).

Drop-in accelerated implementation of the CorrespondenceGraph contract plus
the engine's hot scans (next-image ranking, 2D-3D collection, candidate
tracks). Falls back cleanly: ``load_native()`` returns None when the
toolchain is unavailable, and the engine keeps using the Python graph.
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_LIB = None
_LIB_TRIED = False


def load_native():
    """Build (if needed) + load libcorr_graph. Returns ctypes lib or None."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if os.environ.get("SCT_DISABLE_NATIVE"):
        return None
    try:
        import sys

        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        sys.path.insert(0, os.path.join(root, "native"))
        try:
            from build import build  # type: ignore
        finally:
            sys.path.pop(0)
        path = build("corr_graph")
        lib = ctypes.CDLL(path)
    except Exception as e:  # toolchain missing, build failure, ...
        log.info("native corr_graph unavailable (%s); using python graph", e)
        return None

    c = ctypes
    lib.cg_new.restype = c.c_void_p
    lib.cg_free.argtypes = [c.c_void_p]
    lib.cg_add_image.argtypes = [c.c_void_p, c.c_int64, c.c_int64]
    lib.cg_num_images.argtypes = [c.c_void_p]
    lib.cg_num_images.restype = c.c_int64
    lib.cg_num_keypoints.argtypes = [c.c_void_p, c.c_int64]
    lib.cg_num_keypoints.restype = c.c_int64
    lib.cg_add_matches.argtypes = [c.c_void_p, c.c_int64, c.c_int64,
                                   c.POINTER(c.c_int32), c.c_int64]
    lib.cg_add_matches.restype = c.c_int64
    lib.cg_num_correspondences.argtypes = [c.c_void_p, c.c_int64]
    lib.cg_num_correspondences.restype = c.c_int64
    lib.cg_num_pair_inliers.argtypes = [c.c_void_p, c.c_int64, c.c_int64]
    lib.cg_num_pair_inliers.restype = c.c_int64
    lib.cg_get_corrs.argtypes = [c.c_void_p, c.c_int64, c.c_int64,
                                 c.POINTER(c.c_int64), c.POINTER(c.c_int32),
                                 c.c_int64]
    lib.cg_get_corrs.restype = c.c_int64
    lib.cg_set_registered.argtypes = [c.c_void_p, c.c_int64, c.c_int32]
    lib.cg_is_registered.argtypes = [c.c_void_p, c.c_int64]
    lib.cg_is_registered.restype = c.c_int32
    lib.cg_set_point.argtypes = [c.c_void_p, c.c_int64, c.c_int64, c.c_int64]
    lib.cg_get_point.argtypes = [c.c_void_p, c.c_int64, c.c_int64]
    lib.cg_get_point.restype = c.c_int64
    lib.cg_num_visible_points.argtypes = [c.c_void_p, c.c_int64]
    lib.cg_num_visible_points.restype = c.c_int64
    lib.cg_corrs_2d3d.argtypes = [c.c_void_p, c.c_int64,
                                  c.POINTER(c.c_int32), c.POINTER(c.c_int64),
                                  c.c_int64]
    lib.cg_corrs_2d3d.restype = c.c_int64
    lib.cg_continuations.argtypes = lib.cg_corrs_2d3d.argtypes
    lib.cg_continuations.restype = c.c_int64
    lib.cg_new_track_candidates.argtypes = [
        c.c_void_p, c.c_int64, c.POINTER(c.c_int64), c.POINTER(c.c_int64),
        c.POINTER(c.c_int32), c.c_int64, c.c_int64]
    lib.cg_new_track_candidates.restype = c.c_int64
    lib.cg_complete_candidates.argtypes = [
        c.c_void_p, c.POINTER(c.c_int64), c.POINTER(c.c_int32),
        c.POINTER(c.c_int64), c.c_int64]
    lib.cg_complete_candidates.restype = c.c_int64
    lib.cg_merge_candidates.argtypes = [
        c.c_void_p, c.POINTER(c.c_int64), c.POINTER(c.c_int64), c.c_int64]
    lib.cg_merge_candidates.restype = c.c_int64
    _LIB = lib
    return lib


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class NativeCorrespondenceGraph:
    """Same query surface as engine.correspondence.CorrespondenceGraph,
    plus registration/point state for the accelerated scans."""

    has_fast_scans = True

    def __init__(self):
        self._lib = load_native()
        if self._lib is None:
            raise RuntimeError("native corr_graph unavailable")
        self._g = self._lib.cg_new()
        self._pairs = set()
        self._image_ids = []

    def __del__(self):
        try:
            if getattr(self, "_g", None):
                self._lib.cg_free(self._g)
                self._g = None
        except Exception:
            pass

    # ---- build -----------------------------------------------------------
    def add_image(self, image_id: int, num_keypoints: int):
        if image_id not in set(self._image_ids):
            self._lib.cg_add_image(self._g, image_id, num_keypoints)
            self._image_ids.append(image_id)

    def has_image(self, image_id: int) -> bool:
        return self._lib.cg_num_keypoints(self._g, image_id) >= 0

    def add_matches(self, image_id1: int, image_id2: int, pairs):
        p = np.ascontiguousarray(np.asarray(pairs, np.int32))
        if p.size == 0:
            return
        self._lib.cg_add_matches(self._g, image_id1, image_id2,
                                 _i32p(p), p.shape[0])
        self._pairs.add((min(image_id1, image_id2), max(image_id1, image_id2)))

    # ---- queries (CorrespondenceGraph contract) -------------------------
    def correspondences(self, image_id: int, kp_idx: int):
        cap = 64
        while True:
            out_img = np.empty(cap, np.int64)
            out_kp = np.empty(cap, np.int32)
            n = self._lib.cg_get_corrs(self._g, image_id, kp_idx,
                                       _i64p(out_img), _i32p(out_kp), cap)
            if n < cap:  # the native scan clamps silently; n == cap may
                break    # mean truncation — regrow until a strict fit
            cap *= 2
        return [(int(out_img[i]), int(out_kp[i])) for i in range(n)]

    def num_keypoints(self, image_id: int) -> int:
        return int(self._lib.cg_num_keypoints(self._g, image_id))

    def num_correspondences(self, image_id: int) -> int:
        return int(self._lib.cg_num_correspondences(self._g, image_id))

    def num_pair_inliers(self, i, j) -> int:
        return int(self._lib.cg_num_pair_inliers(self._g, i, j))

    @property
    def image_ids(self):
        return list(self._image_ids)

    @property
    def pairs(self):
        return sorted(self._pairs)

    # ---- accelerated state + scans --------------------------------------
    def set_registered(self, image_id: int, registered: bool):
        self._lib.cg_set_registered(self._g, image_id, 1 if registered else 0)

    def set_point(self, image_id: int, kp_idx: int, pid: int):
        self._lib.cg_set_point(self._g, image_id, kp_idx, pid)

    def get_point(self, image_id: int, kp_idx: int) -> int:
        return int(self._lib.cg_get_point(self._g, image_id, kp_idx))

    def num_visible_points3D_fast(self, image_id: int) -> int:
        return int(self._lib.cg_num_visible_points(self._g, image_id))

    def num_visible_points3D(self, image_id: int, point3D_of) -> int:
        # contract-compatible path; the fast variant uses internal state
        return self.num_visible_points3D_fast(image_id)

    def corrs_2d3d(self, image_id: int, cap: int = 1 << 15):
        out_kp = np.empty(cap, np.int32)
        out_pid = np.empty(cap, np.int64)
        n = self._lib.cg_corrs_2d3d(self._g, image_id, _i32p(out_kp),
                                    _i64p(out_pid), cap)
        return out_kp[:n].copy(), out_pid[:n].copy()

    def continuations(self, image_id: int, cap: int = 1 << 15):
        out_kp = np.empty(cap, np.int32)
        out_pid = np.empty(cap, np.int64)
        n = self._lib.cg_continuations(self._g, image_id, _i32p(out_kp),
                                       _i64p(out_pid), cap)
        return out_kp[:n].copy(), out_pid[:n].copy()

    def complete_candidates(self, cap: int = 1 << 18):
        """All (image_id, kp_idx, pid) track-completion candidates across the
        graph: unassigned keypoints on registered images reachable from an
        assigned point. One native scan replaces per-observation queries."""
        out_img = np.empty(cap, np.int64)
        out_kp = np.empty(cap, np.int32)
        out_pid = np.empty(cap, np.int64)
        n = self._lib.cg_complete_candidates(self._g, _i64p(out_img),
                                             _i32p(out_kp), _i64p(out_pid),
                                             cap)
        return out_img[:n].copy(), out_kp[:n].copy(), out_pid[:n].copy()

    def merge_candidates(self, cap: int = 1 << 17):
        """Unique (pid_a < pid_b) candidate merge pairs linked by a
        correspondence between registered images."""
        out_a = np.empty(cap, np.int64)
        out_b = np.empty(cap, np.int64)
        n = self._lib.cg_merge_candidates(self._g, _i64p(out_a), _i64p(out_b),
                                          cap)
        return out_a[:n].copy(), out_b[:n].copy()

    def new_track_candidates(self, image_id: int, max_tracks: int = 1 << 14,
                             max_elems: int = 1 << 17):
        offsets = np.empty(max_tracks + 1, np.int64)
        out_img = np.empty(max_elems, np.int64)
        out_kp = np.empty(max_elems, np.int32)
        t = self._lib.cg_new_track_candidates(
            self._g, image_id, _i64p(offsets), _i64p(out_img), _i32p(out_kp),
            max_tracks, max_elems)
        tracks = []
        for k in range(t):
            a, b = int(offsets[k]), int(offsets[k + 1])
            tracks.append([(int(out_img[e]), int(out_kp[e]))
                           for e in range(a, b)])
        return tracks
