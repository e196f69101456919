"""Image undistortion: vmapped bilinear remap through the camera model.

The reference intended this as a per-image COLMAP ``UndistortImage`` wrapper
but never finished it (/root/reference/integration/op_cpp/undistort_image.cc
— incomplete, wrong op registration, unbuilt; SURVEY §8.3). Capability
rebuilt here: produce a pinhole (distortion-free) image + camera for MVS
consumers, by inverse-mapping every output pixel through the undistorted
pinhole model into the distorted source image and sampling bilinearly —
a dense gather, one fused kernel on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from scanner_colmap_tpu.models import cameras as camlib


@functools.partial(jax.jit, static_argnames=())
def undistort_image(
    image: jax.Array,        # (H, W) or (H, W, C)
    model_id: jax.Array,     # () int32 source camera model
    params: jax.Array,       # (MAX_CAM_PARAMS,) source camera params
    new_params: jax.Array,   # (4,) target PINHOLE (fx, fy, cx, cy)
):
    """Remap image into the undistorted pinhole camera geometry."""
    H, W = image.shape[:2]
    dtype = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32
    img = image.astype(dtype)

    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(dtype)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(dtype)
    # output pixel -> normalized ray in the (pinhole) target camera
    xn = (xx - new_params[2]) / new_params[0]
    yn = (yy - new_params[3]) / new_params[1]
    # distort forward through the SOURCE model -> source pixel
    fx, fy, cx, cy, k1, k2, p1, p2 = camlib.canonical_intrinsics(model_id, params)
    d = camlib.distort(k1, k2, p1, p2, jnp.stack([xn, yn], axis=-1))
    sx = fx * d[..., 0] + cx
    sy = fy * d[..., 1] + cy

    # allow the exact border (clamped bilinear handles x == W-1)
    inb = (sx >= -0.5) & (sx <= W - 0.5) & (sy >= -0.5) & (sy <= H - 0.5)
    sxc = jnp.clip(sx, 0.0, W - 1.0)
    syc = jnp.clip(sy, 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(sxc).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(syc).astype(jnp.int32), 0, H - 2)
    fxr = (sxc - x0)[..., None] if image.ndim == 3 else sxc - x0
    fyr = (syc - y0)[..., None] if image.ndim == 3 else syc - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    out = ((1 - fyr) * ((1 - fxr) * v00 + fxr * v01)
           + fyr * ((1 - fxr) * v10 + fxr * v11))
    mask = inb if image.ndim == 2 else inb[..., None]
    return jnp.where(mask, out, 0.0), inb


def undistorted_pinhole_params(model_id: int, params, blank_pixels: float = 0.0):
    """Choose target PINHOLE (fx, fy, cx, cy) for a distorted source camera.

    Keeps focal/principal point; COLMAP additionally rescales to control
    blank borders — with small k this is a faithful default.
    """
    import numpy as np

    fx, fy, cx, cy, *_ = [np.asarray(v) for v in camlib.canonical_intrinsics(
        np.int32(model_id), np.asarray(params))]
    return np.array([float(fx), float(fy), float(cx), float(cy)])
