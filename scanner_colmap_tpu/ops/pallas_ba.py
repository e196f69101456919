"""Pallas TPU kernel: the BA dense-Schur point-block accumulation
S = sum_p B_p @ Vinv_p @ B_p^T  (ops/ba._build_normal_eqs chunk_body's
dominant matmul — the chip-filling op of the dense solver, measured 11.6%
of bf16 peak through XLA at M=256/P=49k).

The kernel fuses the per-point Vinv application (BV = B @ Vinv) into the
tiled accumulation matmul, so BV never round-trips HBM (XLA's einsum pair
materializes a (chunk, MC, 3) BV per chunk). Layout: B ships as
(3, P, MC) and Vinv as (3, 3, P) so the minor-most dims are lane-sized
(a (CP, 128, 3) block would put 3 on lanes and pad 42x in VMEM).

STATUS — measured on TPU v5e (tools/exp_pallas_ba.py) and kept as the
documented experiment; the XLA einsum-scan stays the default:

    M=256 (MC=2048), P=8192:  XLA 6.1 ms (33.9 TFLOP/s)
                              Pallas 14.3 ms (14.4 TFLOP/s)  0.43x
    M=128 (MC=1024), P=16384: XLA 4.3 ms (23.8 TFLOP/s)
                              Pallas 8.2 ms (12.6 TFLOP/s)   0.53x

Why fusion loses here: the fused BV term depends on (row-band, chunk) but
not on the output column — the kernel recomputes it once per column tile
(MC/128 = 8-16x redundant VPU broadcast work), which costs more than the
one HBM round trip of BV it saves (XLA's scan streams BV at full
bandwidth and runs the accumulation as one deep-K MXU matmul). Building B
from the camera scatter inside the kernel — the only fusion that would
change the traffic equation — is blocked on data-dependent block indices
(Pallas TPU dynamic indexing is block-granular, the same bound documented
for PatchMatch gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
CP = 1024        # points folded per grid step


def _schur_kernel(b3i_ref, b3j_ref, vinv_ref, s_ref):
    """Fold CP points into one (TILE, TILE) output tile of S."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        s_ref[:] = jnp.zeros(s_ref.shape, jnp.float32)

    acc = jnp.zeros(s_ref.shape, jnp.float32)
    for kk in range(3):
        # BV[:, :, kk] = sum_k' Vinv[kk, k'] * B[k'] — the fused per-point
        # 3x3 application; (CP, 1) * (CP, TILE) VPU broadcasts
        bv = (vinv_ref[kk, 0, :][:, None] * b3i_ref[0]
              + vinv_ref[kk, 1, :][:, None] * b3i_ref[1]
              + vinv_ref[kk, 2, :][:, None] * b3i_ref[2])
        acc += jax.lax.dot_general(
            bv, b3j_ref[kk], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    s_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_accumulate(B: jax.Array, Vinv: jax.Array, interpret: bool = False):
    """S (MC, MC) = sum_p B[p] @ Vinv[p] @ B[p]^T.

    B: (P, MC, 3) f32; Vinv: (P, 3, 3) f32 (symmetric). P must divide by
    CP and MC by TILE.
    """
    P, MC, _ = B.shape
    cp = min(CP, P)
    assert P % cp == 0, f"P={P} must divide by {cp}"
    assert MC % TILE == 0, f"MC={MC} must divide by {TILE}"
    b3 = jnp.transpose(B, (2, 0, 1))            # (3, P, MC)
    v3 = jnp.transpose(Vinv, (1, 2, 0))         # (3, 3, P)

    grid = (MC // TILE, MC // TILE, P // cp)
    return pl.pallas_call(
        _schur_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, cp, TILE), lambda i, j, k: (0, k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cp, TILE), lambda i, j, k: (0, k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cp), lambda i, j, k: (0, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((MC, MC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(b3, b3, v3)


def schur_accumulate_xla(B: jax.Array, Vinv: jax.Array, chunk: int = 1024):
    """Reference: the ops/ba chunk-scan einsum pair (materializes BV)."""
    P, MC, _ = B.shape

    def body(acc, xs):
        B_c, V_c = xs
        BV = jnp.einsum("pai,pij->paj", B_c, V_c)
        return acc + jnp.einsum("pai,pbi->ab", BV, B_c), None

    n = P // chunk
    acc, _ = jax.lax.scan(
        body, jnp.zeros((MC, MC), jnp.float32),
        (B.reshape(n, chunk, MC, 3), Vinv.reshape(n, chunk, 3, 3)))
    return acc
