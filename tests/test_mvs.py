"""PatchMatch stereo + fusion tests on synthetic textured planes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scanner_colmap_tpu.models import geometry as geom
from scanner_colmap_tpu.ops import fusion, patch_match


def make_plane_scene(rng, H=48, W=64, depth0=5.0, S=3, focal=80.0,
                     slope=0.0):
    """A fronto-parallel (or sloped) textured plane seen from S+1 cameras.

    Returns (problem, gt_depth). Texture = smooth random field (so NCC has
    gradient signal)."""
    # random smooth texture on the plane, sampled in world coords
    tex = rng.uniform(0, 1, size=(160, 160)).astype(np.float32)
    # smooth it a bit
    k = np.ones((5, 5)) / 25.0
    from scipy.signal import convolve2d

    tex = convolve2d(tex, k, mode="same", boundary="symm").astype(np.float32)

    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]])

    def render(q, t):
        """Ray-cast the plane z = depth0 + slope * x (world)."""
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        xn = (xx - K[0, 2]) / K[0, 0]
        yn = (yy - K[1, 2]) / K[1, 1]
        qi, ti = geom.pose_inverse(q, t)
        qi, ti = np.asarray(qi), np.asarray(ti)
        # camera center + ray direction in world
        C = ti
        d = np.stack([xn, yn, np.ones_like(xn)], -1) @ np.asarray(
            geom.quat_to_rotmat(qi)).T
        # plane: z - slope * x = depth0  ->  t = (depth0 + slope*Cx - Cz)/(dz - slope*dx)
        denom = d[..., 2] - slope * d[..., 0]
        tt = (depth0 + slope * C[0] - C[2]) / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        Xw = C + tt[..., None] * d
        # texture lookup by world (x, y)
        u = (Xw[..., 0] * 20.0) % 160
        v = (Xw[..., 1] * 20.0) % 160
        img = tex[np.clip(v.astype(int), 0, 159), np.clip(u.astype(int), 0, 159)]
        depth = tt * 1.0  # camera-frame z: for identity-rotation ref this is z
        x_cam = np.asarray(geom.np_pose_transform(q, t, Xw))
        return img.astype(np.float32), x_cam[..., 2].astype(np.float32)

    q_ref = np.array([1.0, 0, 0, 0])
    t_ref = np.zeros(3)
    ref_img, gt_depth = render(q_ref, t_ref)

    srcs, Rs, ts, Kss = [], [], [], []
    for s in range(S):
        q = np.asarray(geom.angle_axis_to_quat(rng.normal(size=3) * 0.01))
        t = np.array([(s + 1) * 0.25 * (-1) ** s, 0.02 * s, 0.0])
        img, _ = render(q, t)
        srcs.append(img)
        Rs.append(np.asarray(geom.quat_to_rotmat(q)))
        ts.append(t)
        Kss.append(K)

    problem = patch_match.PatchMatchProblem(
        ref_image=jnp.asarray(ref_img),
        src_images=jnp.asarray(np.stack(srcs)),
        K_ref=jnp.asarray(K),
        K_src=jnp.asarray(np.stack(Kss)),
        R=jnp.asarray(np.stack(Rs)),
        t=jnp.asarray(np.stack(ts)),
        depth_min=jnp.asarray(depth0 * 0.5),
        depth_max=jnp.asarray(depth0 * 1.5),
        src_valid=jnp.ones(S, bool),
    )
    return problem, gt_depth


def test_plane_costs_prefers_true_depth(rng):
    problem, gt_depth = make_plane_scene(rng)
    H, W = gt_depth.shape
    n = jnp.zeros((H, W, 3)).at[..., 2].set(-1.0)
    c_true = np.asarray(patch_match.plane_costs(
        problem, jnp.asarray(gt_depth), n))
    c_wrong = np.asarray(patch_match.plane_costs(
        problem, jnp.asarray(gt_depth * 1.3), n))
    # interior pixels: true depth must beat wrong depth clearly
    sl = (slice(8, H - 8), slice(8, W - 8))
    assert c_true[sl].mean() < 0.25
    assert c_true[sl].mean() < c_wrong[sl].mean() - 0.2


@pytest.mark.slow
def test_patch_match_recovers_plane_depth(rng):
    problem, gt_depth = make_plane_scene(rng)
    depth, normal, cost = patch_match.patch_match(
        jax.random.PRNGKey(0), problem, num_iterations=6,
        window_radius=5)  # the pipeline default radius
    depth = np.asarray(depth)
    H, W = gt_depth.shape
    sl = (slice(8, H - 8), slice(8, W - 8))
    rel = np.abs(depth[sl] - gt_depth[sl]) / gt_depth[sl]
    # majority of interior pixels within 2.5% depth error (the default
    # gradient-corrected field sampling floors at ~2% on this 48x64 scene;
    # sampling="exact" reaches ~1% at ~19x the device cost — see
    # ops/patch_match.py plane_costs docstring)
    assert np.median(rel) < 0.025, np.median(rel)
    # normals roughly fronto-parallel on average (NCC constrains normals
    # weakly at small baselines; exact orientation isn't expected)
    nz = np.asarray(normal)[sl][..., 2]
    assert np.mean(nz) < -0.75, np.mean(nz)


def test_fusion_consistent_views_emit_points(rng):
    """Three views of a plane with perfect depths -> fused cloud on plane."""
    H, W, S = 32, 40, 2
    focal = 60.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]])
    depth0 = 4.0
    qs = [np.array([1.0, 0, 0, 0])]
    ts = [np.zeros(3)]
    for s in range(S):
        qs.append(np.array([1.0, 0, 0, 0]))
        ts.append(np.array([0.3 * (s + 1), 0, 0]))
    N = S + 1
    depths = np.zeros((N, H, W), np.float64)
    normals = np.zeros((N, H, W, 3))
    normals[..., 2] = -1.0
    colors = np.full((N, H, W, 3), 0.5)
    # analytic depth of the plane z=depth0 for each camera (identity rotations)
    for i in range(N):
        depths[i] = depth0  # fronto-parallel plane, z const in world = cam z
    inp = fusion.FusionInput(
        depths=jnp.asarray(depths), normals=jnp.asarray(normals),
        colors=jnp.asarray(colors), qvecs=jnp.asarray(np.stack(qs)),
        tvecs=jnp.asarray(np.stack(ts)), Ks=jnp.asarray(np.stack([K] * N)),
        valid=jnp.ones((N, H, W), bool))
    out = fusion.fuse_depth_maps(inp, min_num_consistent=2)
    pts = fusion.compact_fused_points(out)
    assert len(pts["xyz"]) > H * W * 0.5  # plenty of fused points
    # fused points lie on the plane z = depth0 (world)
    assert np.allclose(pts["xyz"][:, 2], depth0, atol=0.05)
    # leadership dedup: total emitted < total valid pixels (no N-fold dup)
    assert len(pts["xyz"]) < 1.5 * H * W


def _plane_fusion_input(n_views, H=16, W=20, depth0=4.0, baseline=0.12):
    """N fronto-parallel views of the plane z=depth0 with perfect depths."""
    focal = 40.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1.0]])
    qs = np.tile([1.0, 0, 0, 0], (n_views, 1))
    ts = np.stack([np.array([baseline * i, 0, 0]) for i in range(n_views)])
    depths = np.full((n_views, H, W), depth0)
    normals = np.zeros((n_views, H, W, 3))
    normals[..., 2] = -1.0
    colors = np.full((n_views, H, W, 3), 0.5)
    return fusion.FusionInput(
        depths=jnp.asarray(depths), normals=jnp.asarray(normals),
        colors=jnp.asarray(colors), qvecs=jnp.asarray(qs),
        tvecs=jnp.asarray(ts), Ks=jnp.asarray(np.stack([K] * n_views)),
        valid=jnp.ones((n_views, H, W), bool))


def test_fusion_windowed_equals_allpairs(rng):
    """window >= N-1 reproduces the all-pairs result exactly (the VERDICT
    'outputs unchanged at N <= window' contract)."""
    inp = _plane_fusion_input(6)
    out_full = fusion.fuse_depth_maps(inp, min_num_consistent=2, window=None)
    out_win = fusion.fuse_depth_maps(inp, min_num_consistent=2, window=8)
    pts_full = fusion.compact_fused_points(out_full)
    pts_win = fusion.compact_fused_points(out_win)
    assert len(pts_full["xyz"]) == len(pts_win["xyz"]) > 0
    np.testing.assert_array_equal(np.asarray(pts_full["xyz"]),
                                  np.asarray(pts_win["xyz"]))
    np.testing.assert_array_equal(pts_full["num_consistent"],
                                  pts_win["num_consistent"])
    np.testing.assert_array_equal(pts_full["visibility"],
                                  pts_win["visibility"])
    # device-side compaction agrees with host-side on the windowed layout
    pts_dev = fusion.compact_fused_points_device(out_win)
    order_a = np.lexsort(np.asarray(pts_win["xyz"]).T)
    order_b = np.lexsort(np.asarray(pts_dev["xyz"]).T)
    np.testing.assert_allclose(
        np.asarray(pts_win["xyz"])[order_a],
        np.asarray(pts_dev["xyz"])[order_b], rtol=1e-5)
    np.testing.assert_array_equal(pts_win["visibility"][order_a],
                                  pts_dev["visibility"][order_b])


def test_fusion_window_bounds_memory_100_views(rng):
    """100 views fuse with a bounded visibility tensor: (N,H,W,2*win+1)
    slots instead of the O(N^2) (N,H,W,N) tensor that died at Gerrard-Hall
    scale (VERDICT missing #3)."""
    n = 100
    inp = _plane_fusion_input(n, H=12, W=16)
    out = fusion.fuse_depth_maps(inp, min_num_consistent=2, window=4)
    assert out["visibility"].shape == (n, 12, 16, 9)  # 2*4+1, not 100
    pts = fusion.compact_fused_points(out)
    assert len(pts["xyz"]) > 0
    assert pts["visibility"].shape[1] == n  # host view stays global-width
    # support is capped by the window, not the collection
    assert pts["num_consistent"].max() <= 9


def test_fusion_inconsistent_views_no_points(rng):
    H, W = 24, 24
    K = np.array([[50.0, 0, 12], [0, 50.0, 12], [0, 0, 1.0]])
    depths = np.stack([np.full((H, W), 3.0), np.full((H, W), 9.0)])
    normals = np.zeros((2, H, W, 3))
    normals[..., 2] = -1.0
    inp = fusion.FusionInput(
        depths=jnp.asarray(depths), normals=jnp.asarray(normals),
        colors=jnp.zeros((2, H, W, 3)),
        qvecs=jnp.asarray(np.tile([1.0, 0, 0, 0], (2, 1))),
        tvecs=jnp.asarray(np.stack([np.zeros(3), np.array([0.3, 0, 0])])),
        Ks=jnp.asarray(np.stack([K, K])),
        valid=jnp.ones((2, H, W), bool))
    out = fusion.fuse_depth_maps(inp, min_num_consistent=2)
    pts = fusion.compact_fused_points(out)
    assert len(pts["xyz"]) == 0


def test_write_ply_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(10, 3)).astype(np.float32)
    rgb = (rng.uniform(0, 1, (10, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "cloud.ply")
    fusion.write_ply(p, xyz, rgb)
    data = open(p, "rb").read()
    assert b"element vertex 10" in data
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    body = np.frombuffer(data[header_end:], dtype=np.dtype(
        [("xyz", "<f4", 3), ("rgb", "u1", 3)]))
    assert np.allclose(body["xyz"], xyz)
    assert np.array_equal(body["rgb"], rgb)


def test_patch_match_geom_consistency_pass(rng):
    """Second pass with forward-backward depth consistency (COLMAP
    geom_consistency): warm-started from pass 1, must keep or improve
    depth accuracy, and its cost penalizes wrong depths more."""
    problem, gt_depth = make_plane_scene(rng)
    d1, n1, c1 = patch_match.patch_match(
        jax.random.PRNGKey(0), problem, num_iterations=6)
    # sources see (approximately) the same plane: reuse ref depth as each
    # source's depth map — geometrically consistent to first order for the
    # small test baselines
    S = problem.src_images.shape[0]
    src_depths = jnp.broadcast_to(d1, (S,) + d1.shape)
    d2, n2, c2 = patch_match.patch_match(
        jax.random.PRNGKey(1), problem, num_iterations=3,
        src_depths=src_depths, init_depth=d1, init_normal=n1)
    H, W = gt_depth.shape
    sl = (slice(8, H - 8), slice(8, W - 8))
    rel1 = np.median(np.abs(np.asarray(d1)[sl] - gt_depth[sl]) / gt_depth[sl])
    rel2 = np.median(np.abs(np.asarray(d2)[sl] - gt_depth[sl]) / gt_depth[sl])
    assert rel2 < max(rel1 * 1.5, 0.02), (rel1, rel2)

    # a uniformly wrong depth field must cost more than the solution
    bad = jnp.full_like(d2, float(problem.depth_max))
    c_bad = patch_match.plane_costs(problem, bad, n2,
                                    src_depths=src_depths)
    c_good = patch_match.plane_costs(problem, d2, n2,
                                     src_depths=src_depths)
    assert float(jnp.median(c_bad[sl])) > float(jnp.median(c_good[sl]))


def test_patch_match_warm_start_converges_with_few_sweeps(rng):
    """The coarse-to-fine contract at the op level: a solve warm-started
    from a (noisy) near-solution field needs only a few sweeps to match
    the from-scratch accuracy — this is what the stage's half-res pass
    provides (stages.run_patch_match coarse_to_fine)."""
    problem, gt_depth = make_plane_scene(rng)
    H, W = gt_depth.shape
    init_d = jnp.asarray(gt_depth * (1.0 + 0.03 * rng.standard_normal((H, W))),
                         jnp.float32)
    init_n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32),
                              (H, W, 3))
    depth, _, _ = patch_match.patch_match(
        jax.random.PRNGKey(0), problem, num_iterations=3, window_radius=5,
        init_depth=init_d, init_normal=init_n)
    depth = np.asarray(depth)
    sl = (slice(8, H - 8), slice(8, W - 8))
    rel = np.abs(depth[sl] - gt_depth[sl]) / gt_depth[sl]
    assert np.median(rel) < 0.025, np.median(rel)


def test_patch_match_tiled_matches_untiled(rng):
    """Row-band tiling with halo (the reference-resolution memory plan)
    recovers the same plane depth as the untiled solve; band seams must
    not leave depth discontinuities."""
    problem, gt_depth = make_plane_scene(rng, H=96, W=64, S=3)
    key = jax.random.PRNGKey(0)
    kw = dict(num_iterations=6, window_radius=3, sigma_spatial=2.0)
    d_u, n_u, c_u = patch_match.patch_match(key, problem, **kw)
    d_t, n_t, c_t = patch_match.patch_match_tiled(
        key, problem, tile_rows=32, halo_rows=16, **kw)
    assert d_t.shape == d_u.shape
    med_u = float(jnp.median(jnp.abs(d_u - gt_depth) / gt_depth))
    med_t = float(jnp.median(jnp.abs(d_t - gt_depth) / gt_depth))
    # the field sampler floors at ~2-2.5% on these tiny scenes (see
    # test_patch_match_recovers_plane_depth); tiling must stay at that
    # floor, not degrade beyond it
    assert med_t < 0.035, med_t                   # tiled solves the scene
    assert med_t < med_u * 2.0 + 5e-3, (med_t, med_u)
    # interior of each band center agrees with ground truth (no seam bias):
    # check rows around the band boundaries specifically
    for seam in (32, 64):
        band = slice(seam - 2, seam + 2)
        seam_err = float(jnp.median(
            jnp.abs(d_t[band] - gt_depth[band]) / gt_depth[band]))
        assert seam_err < 0.05, (seam, seam_err)


def test_patch_match_tiled_passthrough_small():
    """tile_rows <= 0 or small images fall through to the untiled solve
    bit-for-bit."""
    rng = np.random.default_rng(0)
    problem, _ = make_plane_scene(rng, H=48, W=64, S=2)
    key = jax.random.PRNGKey(1)
    kw = dict(num_iterations=2, window_radius=2)
    d_u, _, _ = patch_match.patch_match(key, problem, **kw)
    d_t, _, _ = patch_match.patch_match_tiled(key, problem, tile_rows=0,
                                              **kw)
    np.testing.assert_array_equal(np.asarray(d_u), np.asarray(d_t))
