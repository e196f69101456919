import numpy as np
import jax.numpy as jnp

from scanner_colmap_tpu.models import geometry as geom
from scanner_colmap_tpu.ops import matching


def test_guided_matching_recovers_ambiguous_matches(rng):
    """Repeated descriptors that fail the plain ratio test match fine once
    the epipolar gate removes the distractors."""
    n = 30
    # scene points + stereo pair
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(4, 8, n)], axis=1)
    q = np.array([1.0, 0, 0, 0])
    t = np.array([0.8, 0.0, 0.0])
    f = 400.0
    cc = np.array([200.0, 150.0])
    uv1 = f * pts[:, :2] / pts[:, 2:3] + cc
    p2 = np.asarray(geom.np_pose_transform(q, t, pts))
    uv2 = f * p2[:, :2] / p2[:, 2:3] + cc
    K = np.array([[f, 0, cc[0]], [0, f, cc[1]], [0, 0, 1.0]])
    E = np.asarray(geom.essential_from_pose(q, t / np.linalg.norm(t)))
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)

    # descriptors: PAIRS of identical descriptors (i and i+n/2 share one)
    half = n // 2
    base = rng.normal(size=(half, 128)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    noise = lambda: 0.02 * rng.normal(size=(half, 128)).astype(np.float32)
    d1 = np.concatenate([base + noise(), base + noise()])
    d2 = np.concatenate([base + noise(), base + noise()])
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    valid = np.ones(n, bool)

    # plain ratio test: duplicates are ambiguous -> mostly rejected
    idx_p, ok_p = matching.match_descriptors(d1, d2, valid, valid)
    plain = int(np.asarray(ok_p).sum())

    idx_g, ok_g = matching.match_descriptors_guided(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(valid), jnp.asarray(valid),
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(F),
        max_epipolar_error=2.0)
    ok_g = np.asarray(ok_g)
    idx_g = np.asarray(idx_g)
    guided = int(ok_g.sum())
    assert guided > plain + 5, (plain, guided)
    # guided matches are correct (identity correspondence by construction)
    correct = np.mean(idx_g[ok_g] == np.nonzero(ok_g)[0])
    assert correct > 0.9
