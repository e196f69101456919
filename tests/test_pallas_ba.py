"""Correctness of the Pallas Schur-accumulation kernel (interpret mode on
the CPU mesh; the TPU measurement lives in tools/exp_pallas_ba.py)."""

import numpy as np
import jax.numpy as jnp

from scanner_colmap_tpu.ops import pallas_ba


def test_schur_accumulate_matches_xla(rng):
    P, MC = 512, 256
    B = jnp.asarray(rng.normal(size=(P, MC, 3)), jnp.float32)
    V = rng.normal(size=(P, 3, 3)).astype(np.float32)
    Vinv = jnp.asarray(V + np.transpose(V, (0, 2, 1)))  # symmetric
    s_ref = np.asarray(pallas_ba.schur_accumulate_xla(B, Vinv, chunk=256))
    s_pal = np.asarray(pallas_ba.schur_accumulate(B, Vinv, interpret=True))
    assert np.allclose(s_pal, s_ref, rtol=2e-4, atol=2e-3 * np.abs(s_ref).max())
