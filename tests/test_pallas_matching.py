"""Pallas fused matching kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from scanner_colmap_tpu.ops import matching
from scanner_colmap_tpu.ops.pallas_matching import match_descriptors_pallas, top2_similarity


def make_desc(rng, n):
    d = rng.normal(size=(n, 128)).astype(np.float32)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def test_top2_matches_reference(rng):
    N, M = 256, 128
    d1 = make_desc(rng, N)
    d2 = make_desc(rng, M)
    valid2 = rng.uniform(size=M) > 0.2
    best, second, idx = top2_similarity(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(valid2), interpret=True)
    sim = d1 @ d2.T
    sim[:, ~valid2] = -1e9
    ref_idx = sim.argmax(1)
    ref_best = sim.max(1)
    sim2 = sim.copy()
    sim2[np.arange(N), ref_idx] = -1e9
    ref_second = sim2.max(1)
    assert np.array_equal(np.asarray(idx), ref_idx)
    assert np.allclose(np.asarray(best), ref_best, atol=1e-5)
    assert np.allclose(np.asarray(second), ref_second, atol=1e-5)


def test_pallas_match_equals_xla_match(rng):
    N, M = 256, 256
    d1 = make_desc(rng, N)
    # half of d2 = permuted copies of d1 rows (real matches), half random
    perm = rng.permutation(N)[:M // 2]
    d2 = np.concatenate([
        d1[perm] + 0.01 * rng.normal(size=(M // 2, 128)).astype(np.float32),
        make_desc(rng, M - M // 2)])
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    v1 = rng.uniform(size=N) > 0.1
    v2 = rng.uniform(size=M) > 0.1

    idx_ref, ok_ref = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v1), jnp.asarray(v2),
        precision="f32")  # the pallas kernel computes f32 similarities
    idx_pl, ok_pl = match_descriptors_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v1), jnp.asarray(v2),
        interpret=True)
    assert np.array_equal(np.asarray(ok_ref), np.asarray(ok_pl))
    assert np.array_equal(np.asarray(idx_ref), np.asarray(idx_pl))


def test_pair_kernel_equals_xla_path(rng):
    """match_pairs_resident (the fused per-pair kernel, kept as the
    measured alternative to the XLA resident path — 6x slower on v5e,
    PERFORMANCE.md lever 48) must stay decision-identical to
    match_descriptors; interpret mode pins the semantics on CPU."""
    from scanner_colmap_tpu.ops.pallas_matching import match_pairs_resident

    N_IMG, K, NP = 6, 128, 4
    D = rng.integers(0, 255, (N_IMG, K, 128)).astype(np.uint8)
    V = np.ones((N_IMG, K), bool)
    for i in range(N_IMG):      # ragged validity
        n = int(rng.integers(K // 2, K + 1))
        V[i, n:] = False
        D[i, n:] = 0
    pool = matching.normalize_pool(jnp.asarray(D))
    ai = jnp.asarray(rng.integers(0, N_IMG, NP), dtype=jnp.int32)
    bi = jnp.asarray(rng.integers(0, N_IMG, NP), dtype=jnp.int32)
    out = np.asarray(match_pairs_resident(pool, jnp.asarray(V), ai, bi,
                                          interpret=True))
    for n in range(NP):
        a, b = int(ai[n]), int(bi[n])
        idx, ok = matching.match_descriptors(
            jnp.asarray(D[a]), jnp.asarray(D[b]),
            jnp.asarray(V[a]), jnp.asarray(V[b]), precision="f32")
        ref = np.where(np.asarray(ok), np.asarray(idx), -1)
        # the kernel computes an f32-accumulated bf16 similarity (the
        # default precision class); compare against the f32 path modulo
        # near-tie flips, which must be rare
        agree = (out[n] == ref).mean()
        assert agree > 0.97, (n, agree)
