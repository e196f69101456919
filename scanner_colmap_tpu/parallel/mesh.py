"""Device mesh construction + sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, axis_names: Sequence[str] = (DATA_AXIS,),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """1D (default) or nD mesh over the available devices.

    The SfM workload's parallel axes (SURVEY §2.2): `data` shards the
    ordered-image/point axis (row parallelism + windowed stencils via halo
    exchange); an optional second axis can shard MVS pixels.
    """
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def shard_rows(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 of an array across the mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_shards(x: np.ndarray, num_shards: int, axis: int = 0):
    """Pad axis to a multiple of num_shards. Returns (padded, orig_len)."""
    n = x.shape[axis]
    target = ((n + num_shards - 1) // num_shards) * num_shards
    if target == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return np.pad(x, pad), n
