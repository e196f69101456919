"""Structured metrics + profiling.

Replaces the reference's printf-only observability (SURVEY §5: BA ratios to
stdout, match counts to stdout, db.summarize()) with:

- a Metrics registry: named counters/gauges/timers, serialized into stage
  manifests and dumpable as one JSON blob
- stage timer context managers (wall time + derived throughput)
- a jax.profiler trace context for on-device inspection (TensorBoard)
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


class Metrics:
    """Process-wide structured metrics, grouped by stage."""

    def __init__(self):
        self._data: Dict[str, Dict[str, float]] = defaultdict(dict)

    def set(self, stage: str, name: str, value):
        self._data[stage][name] = float(value)

    def inc(self, stage: str, name: str, delta: float = 1.0):
        self._data[stage][name] = self._data[stage].get(name, 0.0) + delta

    @contextlib.contextmanager
    def timer(self, stage: str, name: str = "wall_s", items_name: Optional[str] = None,
              items: Optional[int] = None):
        t0 = time.time()
        yield
        dt = time.time() - t0
        self.set(stage, name, dt)
        if items_name and items is not None:
            self.set(stage, items_name, items / max(dt, 1e-9))

    def stage(self, stage: str) -> Dict[str, float]:
        return dict(self._data.get(stage, {}))

    def to_dict(self) -> Dict[str, Dict[str, float]]:
        return {k: dict(v) for k, v in self._data.items()}

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    def dump(self, path: str):
        with open(path, "w") as f:
            f.write(self.to_json())


GLOBAL_METRICS = Metrics()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def reconstruction_metrics(rec) -> Dict[str, float]:
    """Standard sparse-model quality metrics (the numbers COLMAP reports)."""
    n_pts = len(rec.points3D)
    return {
        "num_registered_images": rec.num_registered,
        "num_points3D": n_pts,
        "mean_track_length": rec.mean_track_length(),
        "mean_reprojection_error_px": rec.mean_reprojection_error(),
        "num_observations": float(sum(p.track_length
                                      for p in rec.points3D.values())),
    }
