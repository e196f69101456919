"""Scale benchmark: 1,000-image sparse reconstruction on ONE chip.

BASELINE.md's eval configs name a 1k-frame input; round 1 could not run it
(whole-collection descriptor residency). With banked matching + the
device-resident cluster mapper this runs within one chip's memory. Prints
ONE JSON line like bench.py. Not part of the driver's default bench —
run manually: `python bench_scale.py` (env: SCALE_IMAGES to change N).
"""

import json
import logging
import os
import sys
import tempfile
import time

logging.basicConfig(level=logging.INFO, stream=sys.stderr)


def log(msg):
    print(f"[scale] {msg}", file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    import jax

    from scanner_colmap_tpu.pipeline import stages, synth
    from scanner_colmap_tpu.utils.config import PipelineConfig
    from scanner_colmap_tpu.utils.store import ArtifactStore

    n_img = int(os.environ.get("SCALE_IMAGES", "1000"))
    workdir = tempfile.mkdtemp(prefix="sct_scale_")
    image_dir = os.path.join(workdir, "images")
    log(f"devices: {jax.devices()}")
    t0 = time.time()
    gt = synth.generate_dataset(image_dir, num_images=n_img, width=480,
                                height=360, num_blobs=500, seed=7)
    log(f"rendered {n_img} frames in {time.time() - t0:.0f}s")

    cfg = PipelineConfig(image_path=image_dir,
                         store_path=os.path.join(workdir, "store"))
    cfg.sift.max_image_size = 480
    cfg.sift.max_num_features = 1024
    cfg.sift.num_octaves = 3
    cfg.matching.overlap = 6
    cfg.matching.min_num_inliers = 12
    cfg.mapper.cluster_size = 12
    cfg.mapper.cluster_overlap = 4
    cfg.mapper.init_min_num_inliers = 20
    cfg.mapper.abs_pose_min_num_inliers = 12
    cfg.mapper.single_camera = True

    store = ArtifactStore(cfg.store_path)
    stages.prepare_images(cfg, store)
    times = {}
    for name, fn in [("extraction", stages.run_extraction),
                     ("matching", stages.run_matching),
                     ("mapping", stages.run_mapping),
                     ("merge", stages.run_merge)]:
        log(name)
        t0 = time.time()
        out = fn(cfg, store)
        times[name] = time.time() - t0
        log(f"{name}: {times[name]:.1f}s")
    model = out
    total = sum(times.values())
    ate = synth.evaluate_ate(model, gt)
    # trajectory extent: ATE on a 600-unit track reads very differently
    # from the same number on an 8-unit arc
    import numpy as np

    from scanner_colmap_tpu.models import geometry as geom
    centers = np.stack([
        np.asarray(geom.np_projection_center(gt["qvecs"][i], gt["tvecs"][i]))
        for i in range(len(gt["tvecs"]))])
    span = float(np.linalg.norm(centers.max(0) - centers.min(0)))
    mm = store.read_manifest("matching")["meta"]
    result = {
        "metric": "scale_1k_images_registered_per_sec",
        "value": round(model.num_registered / max(total, 1e-9), 3),
        "unit": "images/s",
        "vs_baseline": round(model.num_registered / max(total, 1e-9) / 0.5, 2),
        "detail": {
            "num_images": n_img,
            "registered": int(model.num_registered),
            "ate": round(float(ate), 4),
            "ate_rel_span": round(float(ate) / max(span, 1e-9), 5),
            "trajectory_span": round(span, 1),
            "mean_reproj_px": round(model.mean_reprojection_error(), 3),
            "stage_s": {k: round(v, 1) for k, v in times.items()},
            "matching_banks": mm["num_banks"],
            "bank_images": mm["bank_images"],
            "scheduled_pairs": mm["scheduled_pairs"],
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
