import numpy as np
import jax
import jax.numpy as jnp

from scanner_colmap_tpu.models import geometry as geom
from scanner_colmap_tpu.ops import two_view


def synthetic_pair(rng, n=100, noise=0.0, outlier_frac=0.0, focal=600.0,
                   planar=False):
    """Generate a synthetic calibrated two-view problem with known pose."""
    # camera 1 at origin; camera 2 rotated + translated
    aa = rng.normal(size=3) * 0.1
    q = np.asarray(geom.angle_axis_to_quat(aa))
    t = np.array([1.0, 0.2, 0.1])
    t /= np.linalg.norm(t)
    if planar:
        pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                        np.full(n, 4.0)], axis=1)
    else:
        pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                        rng.uniform(3, 8, n)], axis=1)
    K = np.array([[focal, 0, 320.0], [0, focal, 240.0], [0, 0, 1.0]])
    x1c = pts
    x2c = np.asarray(geom.pose_transform(q, t, pts))
    uv1 = (x1c[:, :2] / x1c[:, 2:3]) * focal + np.array([320.0, 240.0])
    uv2 = (x2c[:, :2] / x2c[:, 2:3]) * focal + np.array([320.0, 240.0])
    uv1 += rng.normal(size=uv1.shape) * noise
    uv2 += rng.normal(size=uv2.shape) * noise
    n_out = int(outlier_frac * n)
    if n_out:
        uv2[:n_out] = rng.uniform(0, 640, size=(n_out, 2))
    return uv1, uv2, K, q, t, pts


def test_fundamental_8pt_exact(rng):
    uv1, uv2, K, q, t, _ = synthetic_pair(rng, n=50)
    F = np.asarray(two_view.fundamental_8pt(jnp.asarray(uv1), jnp.asarray(uv2)))
    err = np.asarray(two_view.sampson_error(jnp.asarray(F), jnp.asarray(uv1), jnp.asarray(uv2)))
    assert np.max(err) < 1e-6
    # F consistent with ground-truth E = K^-T F K^-1 up to scale
    E_gt = np.asarray(geom.essential_from_pose(q, t))
    E_est = K.T @ F @ K
    E_est = E_est / np.linalg.norm(E_est)
    E_gt = E_gt / np.linalg.norm(E_gt)
    s = np.sign(np.sum(E_est * E_gt))
    assert np.allclose(s * E_est, E_gt, atol=1e-5)


def test_homography_dlt_exact(rng):
    # pure-rotation pair -> exact homography
    aa = rng.normal(size=3) * 0.05
    q = np.asarray(geom.angle_axis_to_quat(aa))
    R = np.asarray(geom.quat_to_rotmat(q))
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    H_gt = K @ R @ np.linalg.inv(K)
    uv1 = np.stack([rng.uniform(100, 540, 30), rng.uniform(100, 380, 30)], axis=1)
    p1 = np.concatenate([uv1, np.ones((30, 1))], axis=1)
    p2 = p1 @ H_gt.T
    uv2 = p2[:, :2] / p2[:, 2:3]
    H = np.asarray(two_view.homography_dlt(jnp.asarray(uv1), jnp.asarray(uv2)))
    err = np.asarray(two_view.homography_error(jnp.asarray(H), jnp.asarray(uv1), jnp.asarray(uv2)))
    assert np.max(err) < 1e-8


def test_ransac_fundamental_with_outliers(rng):
    uv1, uv2, K, q, t, _ = synthetic_pair(rng, n=200, noise=0.3, outlier_frac=0.3)
    valid = np.ones(200, bool)
    key = jax.random.PRNGKey(0)
    F, inl, n_inl, _ = two_view.ransac(
        key, jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
        two_view._solver_with_mask(two_view.fundamental_8pt),
        two_view.sampson_error, num_trials=256, sample_size=8, max_error=4.0)
    inl = np.asarray(inl)
    assert int(n_inl) > 120
    # outliers (first 60) mostly rejected
    assert inl[:60].mean() < 0.15
    assert inl[60:].mean() > 0.9


def test_estimate_two_view_geometry_calibrated(rng):
    uv1, uv2, K, q_gt, t_gt, _ = synthetic_pair(rng, n=150, noise=0.3, outlier_frac=0.2)
    key = jax.random.PRNGKey(1)
    tvg = two_view.estimate_two_view_geometry(
        key, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(150, bool),
        jnp.asarray(K), jnp.asarray(K), calibrated=True)
    assert int(tvg.config) in (two_view.CALIBRATED, two_view.UNCALIBRATED)
    assert int(tvg.num_inliers) > 90
    # relative pose close to ground truth
    q_est = np.asarray(tvg.qvec)
    t_est = np.asarray(tvg.tvec)
    dq = min(np.linalg.norm(q_est - np.asarray(q_gt)), np.linalg.norm(q_est + np.asarray(q_gt)))
    assert dq < 0.02
    cos_t = abs(np.dot(t_est, t_gt))
    assert cos_t > 0.995
    assert float(tvg.tri_angle) > 0.01


def test_estimate_two_view_geometry_planar(rng):
    uv1, uv2, K, q_gt, t_gt, _ = synthetic_pair(rng, n=120, noise=0.2, planar=True)
    key = jax.random.PRNGKey(2)
    tvg = two_view.estimate_two_view_geometry(
        key, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(120, bool),
        jnp.asarray(K), jnp.asarray(K), calibrated=True)
    assert int(tvg.config) == two_view.PLANAR_OR_PANORAMIC


def test_estimate_two_view_geometry_degenerate(rng):
    # random garbage matches -> degenerate
    uv1 = rng.uniform(0, 640, size=(60, 2))
    uv2 = rng.uniform(0, 640, size=(60, 2))
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    key = jax.random.PRNGKey(3)
    tvg = two_view.estimate_two_view_geometry(
        key, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(60, bool),
        jnp.asarray(K), jnp.asarray(K), calibrated=True)
    assert int(tvg.config) == two_view.DEGENERATE
    assert int(tvg.num_inliers) == 0


def test_estimate_multiple_two_motions(rng):
    """Two independent rigid motions in one match set (EstimateMultiple
    semantics, reference multiple_models flag colmap.proto:38): the greedy
    multi-model estimator should find both, with disjoint inlier sets."""
    uv1_a, uv2_a, K, _, _, _ = synthetic_pair(rng, n=120, noise=0.1)
    # second motion: a different pose acting on different points
    aa = rng.normal(size=3) * 0.1 + 0.3
    q_b = np.asarray(geom.angle_axis_to_quat(aa))
    t_b = np.array([-0.5, 0.8, 0.2])
    t_b /= np.linalg.norm(t_b)
    pts = np.stack([rng.uniform(-1, 1, 80), rng.uniform(-1, 1, 80),
                    rng.uniform(3, 8, 80)], axis=1)
    focal = K[0, 0]
    x2c = np.asarray(geom.pose_transform(q_b, t_b, pts))
    uv1_b = (pts[:, :2] / pts[:, 2:3]) * focal + K[:2, 2]
    uv2_b = (x2c[:, :2] / x2c[:, 2:3]) * focal + K[:2, 2]
    uv1 = np.concatenate([uv1_a, uv1_b])
    uv2 = np.concatenate([uv2_a, uv2_b])
    valid = np.ones(len(uv1), bool)

    models = two_view.estimate_two_view_geometry_multiple(
        jax.random.PRNGKey(3), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.asarray(valid), jnp.asarray(K), jnp.asarray(K),
        max_error=2.0, min_num_inliers=15, min_inlier_ratio=0.1,
        num_trials=512, max_models=3)
    n_inl = np.asarray(models.num_inliers)
    masks = np.asarray(models.inlier_mask)
    found = n_inl > 0
    assert found.sum() >= 2, f"expected >=2 models, got {n_inl}"
    # inlier sets of distinct rounds are disjoint by construction
    assert not np.any(masks[0] & masks[1])
    # first model should dominate the larger motion group (120 pts)
    assert n_inl[0] >= 60


def test_planar_pose_from_homography(rng):
    """PLANAR_OR_PANORAMIC pairs recover their relative pose from the H
    decomposition (COLMAP PoseFromHomographyMatrix; VERDICT missing #4 —
    pose previously always came from E)."""
    uv1, uv2, K, q_gt, t_gt, _ = synthetic_pair(rng, n=120, noise=0.1,
                                                planar=True)
    key = jax.random.PRNGKey(2)
    tvg = two_view.estimate_two_view_geometry(
        key, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(120, bool),
        jnp.asarray(K), jnp.asarray(K), calibrated=True)
    assert int(tvg.config) == two_view.PLANAR_OR_PANORAMIC
    q_est = np.asarray(tvg.qvec)
    t_est = np.asarray(tvg.tvec)
    dq = min(np.linalg.norm(q_est - np.asarray(q_gt)),
             np.linalg.norm(q_est + np.asarray(q_gt)))
    assert dq < 0.03, (q_est, q_gt)
    assert abs(np.dot(t_est, t_gt)) > 0.99, (t_est, t_gt)
    assert float(tvg.tri_angle) > 0.01


def test_panoramic_pose_zero_translation(rng):
    """A pure-rotation pair decomposes to tvec = 0 and tri_angle = 0."""
    aa = rng.normal(size=3) * 0.08
    q = np.asarray(geom.angle_axis_to_quat(aa))
    R = np.asarray(geom.quat_to_rotmat(q))
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    H_gt = K @ R @ np.linalg.inv(K)
    uv1 = np.stack([rng.uniform(50, 590, 100), rng.uniform(50, 430, 100)],
                   axis=1)
    p1 = np.concatenate([uv1, np.ones((100, 1))], axis=1)
    p2 = p1 @ H_gt.T
    uv2 = p2[:, :2] / p2[:, 2:3] + rng.normal(size=(100, 2)) * 0.1
    tvg = two_view.estimate_two_view_geometry(
        jax.random.PRNGKey(4), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(100, bool), jnp.asarray(K), jnp.asarray(K), calibrated=True)
    assert int(tvg.config) == two_view.PLANAR_OR_PANORAMIC
    assert np.linalg.norm(np.asarray(tvg.tvec)) < 1e-6
    assert float(tvg.tri_angle) == 0.0
    q_est = np.asarray(tvg.qvec)
    dq = min(np.linalg.norm(q_est - q), np.linalg.norm(q_est + q))
    assert dq < 0.02


def test_watermark_detection(rng):
    """Border-concentrated identical-position matches (a static overlay)
    produce config WATERMARK (enum 7, COLMAP DetectWatermark)."""
    W, H = 640, 480
    K = np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]])
    # watermark matches: same pixel in both images, in the bottom border
    n_wm = 80
    uv_wm = np.stack([rng.uniform(0, W, n_wm),
                      rng.uniform(H - 0.05 * H, H, n_wm)], axis=1)
    # a few scattered random matches (noise)
    n_noise = 20
    uv1 = np.concatenate([uv_wm, rng.uniform(100, 400, (n_noise, 2))])
    uv2 = np.concatenate([uv_wm, rng.uniform(100, 400, (n_noise, 2))])
    tvg = two_view.estimate_two_view_geometry(
        jax.random.PRNGKey(5), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(len(uv1), bool), jnp.asarray(K), jnp.asarray(K),
        calibrated=True, size1=jnp.array([W, H]), size2=jnp.array([W, H]),
        min_inlier_ratio=0.1)
    assert int(tvg.config) == two_view.WATERMARK
    # same pair with detection off never reports WATERMARK
    tvg2 = two_view.estimate_two_view_geometry(
        jax.random.PRNGKey(5), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(len(uv1), bool), jnp.asarray(K), jnp.asarray(K),
        calibrated=True, watermark_detection=False, min_inlier_ratio=0.1)
    assert int(tvg2.config) != two_view.WATERMARK


def test_scene_matches_not_watermark(rng):
    """A genuine scene pair (translating camera, full-frame inliers) must
    NOT be flagged as watermark: support is not border-concentrated."""
    uv1, uv2, K, _, _, _ = synthetic_pair(rng, n=150, noise=0.2)
    tvg = two_view.estimate_two_view_geometry(
        jax.random.PRNGKey(6), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(150, bool), jnp.asarray(K), jnp.asarray(K), calibrated=True)
    assert int(tvg.config) != two_view.WATERMARK


def test_adaptive_ransac_trial_counts(rng):
    """Confidence-adaptive trials (colmap.proto:23-29, previously dead
    config fields): clean data stops after min_num_trials; heavily
    contaminated data runs to max_num_trials."""
    uv1, uv2, K, _, _, _ = synthetic_pair(rng, n=200, noise=0.1)
    key = jax.random.PRNGKey(0)
    solver = two_view._solver_with_mask(two_view.fundamental_8pt)
    _, _, n_inl, _, trials_clean = two_view.ransac_adaptive(
        key, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(200, bool),
        solver, two_view.sampson_error, 2048, 8, 4.0,
        confidence=0.999, min_num_trials=30, chunk=128)
    assert int(n_inl) > 150
    assert int(trials_clean) >= 30           # min honored
    assert int(trials_clean) <= 256          # early exit well below max

    uv1o, uv2o, K, _, _, _ = synthetic_pair(rng, n=200, noise=0.1,
                                            outlier_frac=0.6)
    _, _, _, _, trials_dirty = two_view.ransac_adaptive(
        key, jnp.asarray(uv1o), jnp.asarray(uv2o), jnp.ones(200, bool),
        solver, two_view.sampson_error, 512, 8, 4.0,
        confidence=0.999, min_num_trials=30, chunk=128)
    # 40% inliers at k=8: dyn bound ~10^4 >> 512 -> runs to the cap
    assert int(trials_dirty) == 512


def test_null_vec_fast_matches_eigh(rng):
    """MGS null vector (solve-free trial path) agrees with exact eigh on
    batched 8x9 minimal systems."""
    import jax.numpy as jnp

    # random rank-8 systems with a known null vector
    v_gt = rng.normal(size=(64, 9))
    v_gt /= np.linalg.norm(v_gt, axis=-1, keepdims=True)
    B = rng.normal(size=(64, 8, 9))
    # project rows orthogonal to v_gt -> v_gt is the exact null vector
    A = B - np.einsum("bkj,bj,bi->bki", B, v_gt, v_gt)
    v = np.asarray(two_view._null_vec_fast(jnp.asarray(A)))
    align = np.abs(np.einsum("bi,bi->b", v, v_gt))
    assert np.all(align > 0.999), align.min()
    resid = np.linalg.norm(np.einsum("bki,bi->bk", A, v), axis=-1)
    assert np.max(resid) < 1e-4
