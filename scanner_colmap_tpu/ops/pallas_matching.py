"""Pallas TPU kernel: fused descriptor matching (similarity + top-2 + ratio).

The XLA path (ops/matching.py) materializes the (N, M) similarity matrix in
HBM and reads it three times (argmax, one-hot mask, second max). This kernel
tiles the row axis, keeps each (TILE_N, M) similarity block in VMEM, and
produces best/second/argbest in one pass: one HBM write of O(N) instead of
O(N*M) traffic — the matmul feeds the MXU directly from VMEM-resident
descriptor tiles.

Numerics match matching.match_descriptors exactly (same masking/ratio/cross
rules are applied by the caller on the reduced outputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9

TILE_N = 256


def _top2_kernel(d1_ref, d2_ref, v2_ref, best_ref, second_ref, idx_ref):
    """One row tile: sim = d1 @ d2^T; per-row best/second/argbest."""
    d1 = d1_ref[:]                      # (TILE_N, 128)
    d2 = d2_ref[:]                      # (M, 128)
    v2 = v2_ref[:]                      # (M, 1) float 0/1 validity
    sim = jax.lax.dot_general(
        d1, d2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TILE_N, M)
    sim = jnp.where(v2[:, 0][None, :] > 0, sim, NEG)

    M = sim.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, dimension=1)
    best = jnp.max(sim, axis=1)
    amax = jnp.argmax(sim, axis=1).astype(jnp.int32)
    masked = jnp.where(col == amax[:, None], NEG, sim)
    second = jnp.max(masked, axis=1)

    best_ref[:] = best[:, None]
    second_ref[:] = second[:, None]
    idx_ref[:] = amax[:, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def top2_similarity(d1: jax.Array, d2: jax.Array, valid2: jax.Array,
                    interpret: bool = False):
    """Per-row (best, second, argbest) of d1 @ d2^T with column masking.

    d1: (N, 128) float32 L2-normalized; d2: (M, 128); valid2: (M,).
    N must be a multiple of TILE_N (pad rows); M a multiple of 128.
    """
    N, D = d1.shape
    M = d2.shape[0]
    assert N % TILE_N == 0, f"N={N} must be a multiple of {TILE_N}"
    assert M % 128 == 0, f"M={M} must be a multiple of 128"
    v2 = valid2.astype(jnp.float32)[:, None]

    grid = (N // TILE_N,)
    best, second, idx = pl.pallas_call(
        _top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ),
        interpret=interpret,
    )(d1.astype(jnp.float32), d2.astype(jnp.float32), v2)
    return best[:, 0], second[:, 0], idx[:, 0]


def match_descriptors_pallas(
    desc1, desc2, valid1, valid2,
    max_ratio: float = 0.8,
    max_distance: float = 0.7,
    cross_check: bool = True,
    interpret: bool = False,
):
    """Drop-in equivalent of matching.match_descriptors on the fused kernel.

    Cross-check runs the kernel a second time in the reverse direction
    (still O(N+M) HBM traffic total).
    """
    from scanner_colmap_tpu.ops.matching import normalize_descriptors

    d1 = normalize_descriptors(desc1)
    d2 = normalize_descriptors(desc2)
    best, second, idx = top2_similarity(d1, d2, valid2, interpret=interpret)
    dist = jnp.arccos(jnp.clip(best, -1.0, 1.0))
    dist2 = jnp.arccos(jnp.clip(second, -1.0, 1.0))
    ok = valid1 & (best > -1.0) & (dist < max_distance)
    ok &= dist < max_ratio * dist2
    if cross_check:
        rb, _, ridx = top2_similarity(d2, d1, valid1, interpret=interpret)
        ok &= ridx[idx] == jnp.arange(desc1.shape[0])
    return jnp.where(ok, idx, -1).astype(jnp.int32), ok
