import numpy as np
import jax.numpy as jnp

from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.ops import undistort


def test_undistort_identity_for_pinhole(rng):
    img = rng.uniform(0, 1, (32, 40)).astype(np.float32)
    p = camlib.pad_params([50.0, 20.0, 16.0], camlib.SIMPLE_PINHOLE)
    new_p = np.array([50.0, 50.0, 20.0, 16.0])
    out, inb = undistort.undistort_image(
        jnp.asarray(img), jnp.int32(camlib.SIMPLE_PINHOLE), jnp.asarray(p),
        jnp.asarray(new_p))
    assert np.allclose(np.asarray(out), img, atol=1e-5)
    assert np.all(np.asarray(inb))


def test_undistort_inverts_distortion(rng):
    """Render a distorted view of a grid pattern; undistort; straight lines
    (constant-intensity columns) should be restored in the interior."""
    H, W = 64, 64
    f, cx, cy, k = 40.0, 32.0, 32.0, 0.15
    # build distorted image by forward sampling: for each distorted pixel,
    # find its ideal (undistorted) pinhole coords via iterative undistort
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    xn = (xx - cx) / f
    yn = (yy - cy) / f
    und = np.asarray(camlib.undistort(k, 0.0, 0.0, 0.0,
                                      jnp.asarray(np.stack([xn, yn], -1))))
    ux = und[..., 0] * f + cx
    pattern = (np.sin(0.7 * ux) > 0).astype(np.float32)  # vertical stripes
    distorted = pattern  # pixel (x,y) of distorted image shows stripe at ux

    p = camlib.pad_params([f, cx, cy, k], camlib.SIMPLE_RADIAL)
    out, inb = undistort.undistort_image(
        jnp.asarray(distorted), jnp.int32(camlib.SIMPLE_RADIAL),
        jnp.asarray(p), jnp.asarray([f, f, cx, cy]))
    out = np.asarray(out)
    # in the undistorted image, stripes must be vertical: rows nearly equal
    interior = out[20:44, 8:56]
    row_var = np.var(interior, axis=0).mean()
    assert row_var < 0.02, row_var
