import numpy as np
import jax
import jax.numpy as jnp

from scanner_colmap_tpu.ops import matching


def make_descriptors(rng, n, dim=128):
    d = rng.normal(size=(n, dim)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d


def test_match_identical_descriptors(rng):
    d = make_descriptors(rng, 32)
    valid = np.ones(32, bool)
    idx, ok = matching.match_descriptors(d, d, valid, valid)
    assert np.array_equal(np.asarray(idx), np.arange(32))
    assert np.all(np.asarray(ok))


def test_match_permuted(rng):
    d1 = make_descriptors(rng, 40)
    perm = rng.permutation(40)
    d2 = d1[perm]
    valid = np.ones(40, bool)
    idx, ok = matching.match_descriptors(d1, d2, valid, valid)
    # match_idx[i] should be position of i in perm
    inv = np.argsort(perm)
    assert np.array_equal(np.asarray(idx), inv)


def test_ratio_test_rejects_ambiguous(rng):
    # query equidistant from two similar targets -> ambiguous -> ratio reject
    base = make_descriptors(rng, 1)[0]
    d1 = base + 0.05 * rng.normal(size=128)
    d1 = (d1 / np.linalg.norm(d1))[None].astype(np.float32)
    d2 = np.stack([base + 0.05 * rng.normal(size=128),
                   base + 0.05 * rng.normal(size=128)])
    d2 = (d2 / np.linalg.norm(d2, axis=-1, keepdims=True)).astype(np.float32)
    idx, ok = matching.match_descriptors(
        d1, d2, np.ones(1, bool), np.ones(2, bool))
    assert not bool(np.asarray(ok)[0])


def test_masking(rng):
    d1 = make_descriptors(rng, 10)
    d2 = np.concatenate([d1, make_descriptors(rng, 5)], axis=0)
    valid2 = np.ones(15, bool)
    valid2[:10] = False  # true matches masked out
    idx, ok = matching.match_descriptors(d1, d2, np.ones(10, bool), valid2)
    # matches into masked region never returned
    assert np.all(np.asarray(idx)[np.asarray(ok)] >= 10)
    # invalid rows produce no match
    valid1 = np.zeros(10, bool)
    idx, ok = matching.match_descriptors(d1, d2, valid1, np.ones(15, bool))
    assert not np.any(np.asarray(ok))


def test_cross_check_rejects_asymmetric(rng):
    # d1[0] best-matches d2[0], but d2[0]'s best row is d1[1] (closer copy)
    base = make_descriptors(rng, 1)[0]
    d1 = np.stack([base + 0.05 * rng.normal(size=128), base + 0.01 * rng.normal(size=128)])
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    far = make_descriptors(rng, 1)[0]
    d2 = np.stack([base, far])
    idx, ok = matching.match_descriptors(
        d1.astype(np.float32), d2.astype(np.float32),
        np.ones(2, bool), np.ones(2, bool), cross_check=True)
    ok = np.asarray(ok)
    assert not ok[0]  # loses cross-check to row 1
    assert ok[1]


def test_match_window_batched(rng):
    K = 16
    d0 = make_descriptors(rng, K)
    perms = [rng.permutation(K) for _ in range(3)]
    desc = np.stack([d0] + [d0[p] for p in perms])
    valid = np.ones((4, K), bool)
    idx, ok = matching.match_window(desc, valid)
    assert idx.shape == (3, K)
    for w, p in enumerate(perms):
        inv = np.argsort(p)
        assert np.array_equal(np.asarray(idx)[w], inv)
        assert np.all(np.asarray(ok)[w])


def test_matches_to_pairs(rng):
    match_idx = jnp.array([5, -1, 3, -1, 0, 7], dtype=jnp.int32)
    match_valid = jnp.array([True, False, True, False, True, True])
    pairs, mask = matching.matches_to_pairs(match_idx, match_valid, max_num_matches=3)
    pairs, mask = np.asarray(pairs), np.asarray(mask)
    assert mask.sum() == 3
    got = {tuple(p) for p in pairs[mask]}
    assert got <= {(0, 5), (2, 3), (4, 0), (5, 7)}
    # capacity respected and invalid slots are -1
    assert np.all(pairs[~mask] == -1)
