"""Correspondence graph over verified matches.

Rebuilds the role of COLMAP's ``CorrespondenceGraph``/``DatabaseCache`` that
the reference feeds from its temp SQLite database
(/root/reference/integration/op_cpp/incremental_mapping.cc:194-293) — here an
in-memory, index-based structure (no SQLite, no disk round trip, SURVEY §8.7).

Pure control-plane data (host, numpy): the per-image keypoint counts are a
few thousand and pair counts O(N * overlap); the heavy math stays on device.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def make_graph(prefer_native: bool = True):
    """Correspondence graph factory: the native C++ graph when the toolchain
    is available (engine/native_graph.py), else this module's Python one.
    Both satisfy the same query contract; the native one additionally offers
    fast scans (has_fast_scans)."""
    if prefer_native:
        try:
            from scanner_colmap_tpu.engine.native_graph import (
                NativeCorrespondenceGraph,
            )

            return NativeCorrespondenceGraph()
        except Exception:
            pass
    return CorrespondenceGraph()


class CorrespondenceGraph:
    """Bidirectional (image, keypoint) correspondence adjacency."""

    has_fast_scans = False

    def set_point(self, image_id, kp_idx, pid):
        """No-op: the python graph queries reconstruction state directly."""

    def set_registered(self, image_id, registered):
        """No-op (see set_point)."""

    def __init__(self):
        # corr[image_id] : list per keypoint of [(other_image, other_kp), ...]
        self._corr: Dict[int, List[List[Tuple[int, int]]]] = {}
        self._num_kps: Dict[int, int] = {}
        self._pair_inliers: Dict[Tuple[int, int], int] = {}

    def add_image(self, image_id: int, num_keypoints: int):
        if image_id not in self._corr:
            self._corr[image_id] = [[] for _ in range(num_keypoints)]
            self._num_kps[image_id] = num_keypoints

    def has_image(self, image_id: int) -> bool:
        return image_id in self._corr

    def add_matches(self, image_id1: int, image_id2: int,
                    pairs: np.ndarray):
        """pairs: (K, 2) int array of (kp1, kp2) verified inlier matches."""
        if image_id1 == image_id2:
            return
        c1 = self._corr[image_id1]
        c2 = self._corr[image_id2]
        n = 0
        for k1, k2 in np.asarray(pairs):
            k1, k2 = int(k1), int(k2)
            if k1 < 0 or k2 < 0:
                continue
            c1[k1].append((image_id2, k2))
            c2[k2].append((image_id1, k1))
            n += 1
        key = (min(image_id1, image_id2), max(image_id1, image_id2))
        self._pair_inliers[key] = self._pair_inliers.get(key, 0) + n

    # ------------------------------------------------------------------
    def correspondences(self, image_id: int, kp_idx: int):
        return self._corr[image_id][kp_idx]

    def num_keypoints(self, image_id: int) -> int:
        return self._num_kps[image_id]

    def num_correspondences(self, image_id: int) -> int:
        return sum(len(c) for c in self._corr[image_id])

    def num_pair_inliers(self, image_id1: int, image_id2: int) -> int:
        key = (min(image_id1, image_id2), max(image_id1, image_id2))
        return self._pair_inliers.get(key, 0)

    @property
    def image_ids(self):
        return list(self._corr.keys())

    @property
    def pairs(self):
        return list(self._pair_inliers.keys())

    def num_visible_points3D(self, image_id: int, point3D_of) -> int:
        """Count keypoints whose correspondences reach a triangulated point.

        point3D_of: callable (image_id, kp_idx) -> point3D id or -1.
        """
        n = 0
        for kp_idx, corrs in enumerate(self._corr[image_id]):
            for j, kj in corrs:
                if point3D_of(j, kj) >= 0:
                    n += 1
                    break
        return n

    def transitive_correspondences(self, image_id: int, kp_idx: int,
                                   depth: int = 2):
        """BFS up to `depth` hops (COLMAP uses transitivity for track
        completion). Returns list of (image, kp) excluding the seed."""
        seen = {(image_id, kp_idx)}
        frontier = [(image_id, kp_idx)]
        out = []
        for _ in range(depth):
            nxt = []
            for (i, k) in frontier:
                for (j, kj) in self._corr[i][k]:
                    if (j, kj) not in seen:
                        seen.add((j, kj))
                        out.append((j, kj))
                        nxt.append((j, kj))
            frontier = nxt
            if not frontier:
                break
        return out
