import numpy as np
import jax.numpy as jnp

from scanner_colmap_tpu.models import cameras as camlib


def test_project_unproject_roundtrip_all_models(rng):
    models = [
        (camlib.SIMPLE_PINHOLE, [500.0, 320.0, 240.0]),
        (camlib.PINHOLE, [500.0, 510.0, 320.0, 240.0]),
        (camlib.SIMPLE_RADIAL, [500.0, 320.0, 240.0, 0.05]),
        (camlib.RADIAL, [500.0, 320.0, 240.0, 0.05, -0.01]),
        (camlib.OPENCV, [500.0, 510.0, 320.0, 240.0, 0.05, -0.01, 0.001, -0.002]),
    ]
    pts = rng.normal(size=(100, 3)) * 0.3
    pts[:, 2] = np.abs(pts[:, 2]) + 2.0
    for model_id, params in models:
        p = camlib.pad_params(params, model_id)
        uv = np.asarray(camlib.cam_to_image(jnp.int32(model_id), jnp.asarray(p), jnp.asarray(pts)))
        xy = np.asarray(camlib.image_to_cam(jnp.int32(model_id), jnp.asarray(p), jnp.asarray(uv)))
        expected = pts[:, :2] / pts[:, 2:3]
        assert np.allclose(xy, expected, atol=1e-6), camlib.MODEL_NAMES[model_id]


def test_batched_mixed_models(rng):
    import jax

    ids = jnp.array([camlib.SIMPLE_PINHOLE, camlib.SIMPLE_RADIAL], dtype=jnp.int32)
    params = jnp.stack([
        jnp.asarray(camlib.pad_params([400.0, 100.0, 100.0], 0)),
        jnp.asarray(camlib.pad_params([400.0, 100.0, 100.0, 0.1], 2)),
    ])
    pts = jnp.asarray(rng.normal(size=(2, 3)) * 0.2 + np.array([0, 0, 3.0]))
    uv = jax.vmap(camlib.cam_to_image)(ids, params, pts)
    assert uv.shape == (2, 2)
    # SIMPLE_PINHOLE projection is exact
    x = pts[0]
    expected = 400.0 * np.asarray(x[:2] / x[2]) + 100.0
    assert np.allclose(np.asarray(uv[0]), expected, atol=1e-8)


def test_calibration_matrix():
    p = camlib.pad_params([400.0, 410.0, 100.0, 120.0], camlib.PINHOLE)
    K = np.asarray(camlib.calibration_matrix(jnp.int32(camlib.PINHOLE), jnp.asarray(p)))
    assert np.allclose(K, [[400, 0, 100], [0, 410, 120], [0, 0, 1]])


def test_camera_from_exif_default_rule():
    model_id, p, prior = camlib.camera_from_exif(640, 480, None)
    assert model_id == camlib.SIMPLE_RADIAL
    assert not prior
    assert np.isclose(p[0], 1.2 * 640)
    assert np.isclose(p[1], 320) and np.isclose(p[2], 240)
    model_id, p, prior = camlib.camera_from_exif(640, 480, 777.0)
    assert prior and np.isclose(p[0], 777.0)
