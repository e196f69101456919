"""The eight pipeline stages.

Mirrors the reference's per-stage scripts (README.md:35-69) with the same
stage contracts (table names/columns follow SURVEY §2.4), on the artifact
store instead of Scanner tables:

  1 prepare_images   (prepare_images.py)      -> frames
  2 extraction       (extraction.py)          -> extraction
  3 feature_matching (feature_matching.py)    -> matching
  4 incremental_mapping (incremental_mapping.py) -> mapping (1 row/cluster)
  5a remove_empty    (remove_empty_reconstruction.py) -> folded into 5
  5 merge_mapping    (merge_mapping.py)       -> models (+ COLMAP export dir)
  6 prepare_patch_match (prepare_patch_match.py) -> prepare_patch_match
  7 patch_match      (patch_match.py)         -> patch_match
  8 stereo_fusion    (absent/broken in ref)   -> fused (+ PLY export)

Every stage is idempotent: it reads the previous stage's table and
atomically replaces its own (the reference's force=True semantics, but
crash-safe). Each stage records its config + metrics in the table manifest.
"""

from __future__ import annotations

import logging
import math
import os
import threading
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from scanner_colmap_tpu.engine.cluster import run_clustered_mapping
from scanner_colmap_tpu.engine.correspondence import make_graph
from scanner_colmap_tpu.engine.merge import merge_all
from scanner_colmap_tpu.models import cameras as camlib
from scanner_colmap_tpu.models import geometry as geom
from scanner_colmap_tpu.models.reconstruction import Reconstruction
from scanner_colmap_tpu.ops import fusion as fusion_ops
from scanner_colmap_tpu.ops import image as image_ops
from scanner_colmap_tpu.ops import meshing as meshing_ops
from scanner_colmap_tpu.ops import matching as matching_ops
from scanner_colmap_tpu.ops import patch_match as pm_ops
from scanner_colmap_tpu.ops import sift as sift_ops
from scanner_colmap_tpu.ops import two_view as tv_ops
from scanner_colmap_tpu.utils import colmap_io
from scanner_colmap_tpu.utils.config import PipelineConfig
from scanner_colmap_tpu.utils.jit_cache import persistent_jit
from scanner_colmap_tpu.utils.store import ArtifactStore

log = logging.getLogger(__name__)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# jitted stage kernels, cached across stage invocations (an inline
# jax.jit(lambda ...) would recompile on every call)
# ---------------------------------------------------------------------------

import functools
import inspect


@functools.lru_cache(maxsize=8)
def _extract_batch_fn(max_num_features, num_octaves, scales_per_octave,
                      init_sigma, peak_threshold, edge_threshold, upright):
    def run(imgs, vhws):
        # canvases arrive as uint8 (4x less over the 52 MB/s link,
        # round-5; the reference's own 8-bit grayscale working format) —
        # restore the [0, 1] float scale on device
        imgs = imgs.astype(jnp.float32) * (1.0 / 255.0)
        feats = jax.lax.map(
            lambda args: sift_ops.extract(
                args[0], args[1],
                max_features=max_num_features, num_octaves=num_octaves,
                num_scales=scales_per_octave, init_sigma=init_sigma,
                peak_threshold=peak_threshold, edge_threshold=edge_threshold,
                upright=upright),
            (imgs, vhws))
        # pack to TWO output buffers: each separate device->host array costs
        # a full transfer round trip on high-latency links. top_k orders
        # slots valid-first, so a per-image count lets the host download a
        # truncated [:, :kmax] slice instead of every padded slot.
        meta = jnp.concatenate([
            feats.xy, feats.scale[..., None], feats.ori[..., None],
            feats.valid[..., None].astype(feats.xy.dtype)], axis=-1)
        counts = jnp.sum(feats.valid, axis=-1).astype(jnp.int32)
        return counts, meta, sift_ops.descriptors_to_uint8(feats.desc)
    return persistent_jit(
        run, salt=(max_num_features, num_octaves, scales_per_octave,
                   init_sigma, peak_threshold, edge_threshold, upright),
        # the closure computes only through ops.sift: scope the source
        # fingerprint there so unrelated stage edits don't invalidate the
        # most expensive remote compile (SIFT: minutes)
        fingerprint_modules=("scanner_colmap_tpu.ops.sift",))


def _copy_to_host_async(x) -> None:
    """Start a device->host transfer without blocking (no-op where the
    runtime lacks the hook); a later np.asarray(x) then finds the bytes
    already in flight instead of starting the transfer at the sync point."""
    try:
        x.copy_to_host_async()
    except Exception:
        pass


def _chunked_map(f, xs, chunk: int):
    """vmap `f` over the leading axis in fixed-size chunks: a lax.map of a
    vmapped body. Parallel (MXU-batched) within a chunk, sequential across
    chunks — full parallelism without materializing every pair's
    intermediates (e.g. 1024x1024 distance matrices) at once."""
    NP = jax.tree.leaves(xs)[0].shape[0]
    C = min(chunk, NP)
    xs_c = jax.tree.map(lambda x: x.reshape((NP // C, C) + x.shape[1:]), xs)
    ys_c = jax.lax.map(lambda c: jax.vmap(f)(c), xs_c)
    return jax.tree.map(lambda y: y.reshape((NP,) + y.shape[2:]), ys_c)


@functools.lru_cache(maxsize=8)
def _match_all_fn(max_ratio, max_distance, cross_check, precision="bf16"):
    def run(d, v, ai, bi):
        def per_pair(args):
            a, b = args
            idx, ok = matching_ops.match_descriptors(
                d[a], d[b], v[a], v[b], max_ratio=max_ratio,
                max_distance=max_distance, cross_check=cross_check,
                precision=precision)
            # single packed output (-1 = no match): one download round trip
            return jnp.where(ok, idx, -1).astype(jnp.int32)
        return _chunked_map(per_pair, (ai, bi), 16)
    return persistent_jit(
        run, salt=(max_ratio, max_distance, cross_check, precision,
                   inspect.getsource(_chunked_map)),
        fingerprint_modules=("scanner_colmap_tpu.ops.matching",))


def _pack_tvg(g, dtype=jnp.float32):
    """ONE packed f32 row per geometry (a download per field costs a full
    round trip each): [:37] is exactly the stage's tvg_row layout
    [config, n_inl, tri_angle, qvec(4), tvec(3), E(9), F(9), H(9)],
    [37:] is the inlier mask."""
    return jnp.concatenate([
        jnp.stack([g.config.astype(dtype), g.num_inliers.astype(dtype),
                   g.tri_angle.astype(dtype)]),
        g.qvec.astype(dtype), g.tvec.astype(dtype),
        g.E.ravel().astype(dtype), g.F.ravel().astype(dtype),
        g.H.ravel().astype(dtype), g.inlier_mask.astype(dtype)], axis=-1)


@functools.lru_cache(maxsize=8)
def _verify_all_fn(max_error, min_num_inliers, min_inlier_ratio, num_trials,
                   max_models=1, min_num_trials=30, confidence=0.999,
                   watermark_detection=True):
    def run(keys, uv1, uv2, vm, K1, K2, sz1, sz2):
        def per_pair(args):
            k, u1, u2, v, k1m, k2m, s1, s2 = args
            if max_models > 1:
                # COLMAP EstimateMultiple (reference multiple_models flag):
                # rows = models found by greedy inlier removal
                g = tv_ops.estimate_two_view_geometry_multiple(
                    k, u1, u2, v, k1m, k2m, calibrated=True,
                    max_error=max_error, min_num_inliers=min_num_inliers,
                    min_inlier_ratio=min_inlier_ratio, num_trials=num_trials,
                    max_models=max_models, min_num_trials=min_num_trials,
                    confidence=confidence,
                    watermark_detection=watermark_detection,
                    size1=s1, size2=s2)
                return jax.vmap(_pack_tvg)(g)
            g = tv_ops.estimate_two_view_geometry(
                k, u1, u2, v, k1m, k2m, calibrated=True,
                max_error=max_error, min_num_inliers=min_num_inliers,
                min_inlier_ratio=min_inlier_ratio, num_trials=num_trials,
                min_num_trials=min_num_trials, confidence=confidence,
                watermark_detection=watermark_detection,
                size1=s1, size2=s2)
            return _pack_tvg(g)[None]  # (1, 37+P)
        return _chunked_map(per_pair, (keys, uv1, uv2, vm, K1, K2, sz1, sz2),
                            8)
    return persistent_jit(
        run, salt=(max_error, min_num_inliers, min_inlier_ratio, num_trials,
                   max_models, min_num_trials, confidence,
                   watermark_detection, inspect.getsource(_chunked_map),
                   inspect.getsource(_pack_tvg)),
        fingerprint_modules=("scanner_colmap_tpu.ops.two_view",))


@functools.lru_cache(maxsize=2)
def _pair_keys_fn():
    """Per-pair PRNG keys by double fold_in of (row_a, row_b): bitwise
    identical regardless of bank size, verify chunking, or host sharding."""
    def run(key, ab):
        return jax.vmap(lambda r: jax.random.fold_in(
            jax.random.fold_in(key, r[0]), r[1]))(ab)
    return jax.jit(run)


@functools.lru_cache(maxsize=8)
def _guided_all_fn(max_epipolar_error, max_distance, cross_check,
                   precision="bf16"):
    def run(d, v, ar, br, uva, uvb, fs):
        def per_pair(args):
            a, b, ua, ub, f = args
            idx, ok = matching_ops.match_descriptors_guided(
                d[a], d[b], v[a], v[b], ua, ub, f,
                max_epipolar_error=max_epipolar_error,
                max_distance=max_distance, cross_check=cross_check,
                precision=precision)
            return jnp.where(ok, idx, -1).astype(jnp.int32)
        return _chunked_map(per_pair, (ar, br, uva, uvb, fs), 16)
    return persistent_jit(
        run, salt=(max_epipolar_error, max_distance, cross_check, precision,
                   inspect.getsource(_chunked_map)),
        fingerprint_modules=("scanner_colmap_tpu.ops.matching",))


# ---------------------------------------------------------------------------
# stage 1: prepare_images
# ---------------------------------------------------------------------------

def prepare_images(cfg: PipelineConfig, store: Optional[ArtifactStore] = None,
                   stride: int = 1, frame_range: Optional[tuple] = None):
    """Ingest the collection; ids = sorted order (fixes the reference's
    stateful id counter, SURVEY §8.5).

    Input sampling mirrors Scanner's lazy Stride/Range operators
    (SURVEY §2.2: db.streams.Stride/Range; video frame sampling README.md:3):
    - a DIRECTORY of images: sorted listing, then [range] then [::stride]
    - a VIDEO file: frames are decoded at `stride` intervals into
      <store>/video_frames/ (requires an imageio backend for the container;
      a clear error otherwise) and treated as the image directory
    """
    store = store or ArtifactStore(cfg.store_path)
    src = cfg.image_path
    if os.path.isfile(src):
        src = _extract_video_frames(src, os.path.join(store.root, "video_frames"),
                                    stride=stride, frame_range=frame_range)
        paths = image_ops.list_images(src)
    else:
        paths = image_ops.list_images(src)
        if frame_range is not None:
            paths = paths[frame_range[0]:frame_range[1]]
        if stride > 1:
            paths = paths[::stride]
    if not paths:
        raise FileNotFoundError(f"no images under {cfg.image_path}")
    names, widths, heights = [], [], []
    for p in paths:
        from PIL import Image as PILImage

        with PILImage.open(p) as im:
            w, h = im.size
        names.append(p.encode())
        widths.append(w)
        heights.append(h)
    store.write_table("frames", {
        "image_id": np.arange(len(paths), dtype=np.int64),
        "path": names,
        "width": np.asarray(widths, np.int32),
        "height": np.asarray(heights, np.int32),
    }, meta={"stage": "prepare_images", "image_path": cfg.image_path,
             "stride": stride})
    log.info("prepare_images: %d frames", len(paths))
    return len(paths)


def _extract_video_frames(video_path: str, out_dir: str, stride: int = 1,
                          frame_range: Optional[tuple] = None) -> str:
    """Decode a video's frames (every `stride`-th) to PNGs. Uses imageio;
    raises a clear error when no backend can open the container."""
    import os as _os

    try:
        import imageio.v3 as iio
    except ImportError as e:
        raise RuntimeError("video input requires imageio") from e
    _os.makedirs(out_dir, exist_ok=True)
    from PIL import Image as PILImage

    n_out = 0
    try:
        for i, frame in enumerate(iio.imiter(video_path)):
            if frame_range is not None and (i < frame_range[0]
                                            or i >= frame_range[1]):
                continue
            if i % stride:
                continue
            PILImage.fromarray(np.asarray(frame)).convert("RGB").save(
                _os.path.join(out_dir, f"frame_{i:06d}.png"))
            n_out += 1
    except Exception as e:
        raise RuntimeError(
            f"cannot decode video {video_path!r}: {e}. The baked image lacks "
            "an ffmpeg backend; pre-extract frames to a directory instead.") from e
    log.info("video: extracted %d frames (stride %d)", n_out, stride)
    return out_dir


# ---------------------------------------------------------------------------
# stage 2: extraction
# ---------------------------------------------------------------------------

def run_extraction(cfg: PipelineConfig, store: Optional[ArtifactStore] = None,
                   batch_size: int = 4,
                   frame_slice: Optional[tuple] = None,
                   out_table: str = "extraction"):
    """SIFT + EXIF camera init per image (reference extraction_op.cc).

    frame_slice=(k, nproc): extract only every nproc-th frame starting at k
    (multi-host sharding — parallel/dist.py merges the shard tables).

    Device work is batched: images decode on host, then a BATCH extracts in
    ONE device dispatch (lax.map over the batch inside jit) — essential when
    the accelerator sits behind a high-latency link, and the packetization
    analog of the reference's work_packet_size (extraction.py:42-43).

    Downloads are the bound on a thin link, so they are (a) truncated — slots
    are valid-first (top_k by response), so only [:kmax] rows come down,
    kmax bucketed to 128 for a stable slice-program cache — and (b) started
    with copy_to_host_async in dispatch order, overlapping the next batch's
    device compute.
    """
    store = store or ArtifactStore(cfg.store_path)
    frames = store.read_table("frames")
    paths = [p.decode() for p in frames["path"]]
    frame_ids = np.asarray(frames["image_id"], np.int64)
    if frame_slice is not None:
        k_sh, nproc = frame_slice
        sel = list(range(len(paths)))[k_sh::nproc]
        paths = [paths[i] for i in sel]
        frame_ids = frame_ids[sel]
    s = cfg.sift
    canvas = (_round_up(cfg.sift.max_image_size, 128),) * 2

    extract_batch = _extract_batch_fn(
        s.max_num_features, s.num_octaves, s.scales_per_octave, s.init_sigma,
        s.peak_threshold, s.edge_threshold, s.upright)

    t0 = time.time()
    keypoints, descriptors, cam_rows, num_feats = [], [], [], []
    # PIPELINED with a BOUNDED in-flight window (parallel.inflight_batches):
    # host JPEG decode of batch k+W, device compute of batches k..k+W-1, and
    # the download of batch k overlap. Unbounded dispatch-ahead (the old
    # "dispatch everything, then drain" shape) queued hundreds of executions
    # into the high-latency device transport at 1k-image scale and wedged;
    # the window keeps the same overlap with O(W) queued work and O(W)
    # device-resident result buffers.
    K = s.max_num_features
    window = max(2, int(cfg.parallel.inflight_batches))
    pending = []  # dispatched, counts download in flight
    ready = []    # counts known, truncated meta/desc downloads in flight

    def slice_oldest():
        items, cnt_dev, meta_dev, desc_dev = pending.pop(0)
        counts = np.asarray(cnt_dev)
        kmax = min(K, _round_up(max(int(counts.max()), 1), 128))
        if kmax < K:  # valid-first slots: only [:kmax] rows come down
            meta_dev = meta_dev[:, :kmax]
            desc_dev = desc_dev[:, :kmax]
        _copy_to_host_async(meta_dev)
        _copy_to_host_async(desc_dev)
        ready.append((items, counts, meta_dev, desc_dev))

    def convert_oldest():
        items, counts, meta_dev, desc_dev = ready.pop(0)
        f_meta = np.asarray(meta_dev)   # (B, kmax, 5): x, y, scale, ori, valid
        f_desc = np.asarray(desc_dev)
        for b, item in enumerate(items):
            nv = int(counts[b])
            kp = f_meta[b, :nv, :4]
            desc = f_desc[b, :nv]
            # camera at EXTRACTION resolution (like the reference, which
            # builds it from the resized bitmap — extraction_op.cc:43-64)
            h, w = int(item["valid_hw"][0]), int(item["valid_hw"][1])
            exif_f = item["exif_focal_px"]
            exif_scaled = exif_f * item["scale"] if exif_f else None
            model_id, params, prior = camlib.camera_from_exif(w, h, exif_scaled)
            keypoints.append(kp.astype(np.float32))
            descriptors.append(desc)
            cam_rows.append(np.concatenate([
                [model_id, w, h, 1.0 if prior else 0.0, item["scale"]], params]))
            num_feats.append(len(kp))

    for start in range(0, len(paths), batch_size):
        chunk_paths = paths[start:start + batch_size]
        items = [image_ops.load_for_extraction(p, s.max_image_size, canvas)
                 for p in chunk_paths]
        n = len(items)
        imgs = np.stack([it["image"] for it in items])
        vhws = np.stack([it["valid_hw"] for it in items])
        if n < batch_size:  # pad the batch for a stable jit signature
            imgs = np.concatenate([imgs, np.zeros(
                (batch_size - n,) + imgs.shape[1:], imgs.dtype)])
            vhws = np.concatenate([vhws, np.ones(
                (batch_size - n, 2), vhws.dtype)])
        cnt_dev, meta_dev, desc_dev = extract_batch(
            jnp.asarray(imgs), jnp.asarray(vhws))
        _copy_to_host_async(cnt_dev)
        pending.append((items, cnt_dev, meta_dev, desc_dev))
        if len(pending) >= window:
            slice_oldest()
        if len(ready) >= window:
            convert_oldest()
    while pending:
        slice_oldest()
    while ready:
        convert_oldest()
    store.write_table(out_table, {
        "image_id": frame_ids,
        "keypoints": keypoints,
        "descriptors": descriptors,
        # empty shard (more hosts than frames): a zero-row stack would raise
        # BEFORE the cross-host barrier and strand every peer on its timeout
        "camera": (np.stack(cam_rows) if cam_rows
                   else np.zeros((0, 9), np.float64)),
    }, meta={"stage": "extraction", "config": vars(s),
             "throughput_images_per_s": len(paths) / max(time.time() - t0, 1e-9)})
    log.info("extraction: %d images, mean %.0f feats, %.2f img/s",
             len(paths), np.mean(num_feats), len(paths) / max(time.time() - t0, 1e-9))
    return num_feats


def _load_extraction(store: ArtifactStore):
    ext = store.read_table("extraction")
    image_ids = [int(i) for i in ext["image_id"]]
    kp = {}
    desc = {}
    cameras = {}
    for n, iid in enumerate(image_ids):
        kp[iid] = np.asarray(ext["keypoints"][n], np.float64)
        desc[iid] = np.asarray(ext["descriptors"][n])
        row = ext["camera"][n]
        model_id = int(row[0])
        w, h = int(row[1]), int(row[2])
        prior = row[3] > 0
        params = row[5:5 + camlib.MODEL_NUM_PARAMS[model_id]]
        cameras[iid] = (model_id, list(params), w, h, prior)
    return image_ids, kp, desc, cameras


# ---------------------------------------------------------------------------
# stage 3: feature matching + two-view geometry
# ---------------------------------------------------------------------------

def _kmeans_pp(samp: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Vectorized k-means++ init + Lloyd iterations in plain numpy.

    Replaces scipy.cluster.vq.kmeans2, whose Python-loop ++ seeding cost
    ~14 s on a 20k x 128 sample — 2x the entire 200-image window-matching
    stage (VERDICT r4 weak #2). This version runs the same algorithm in
    ~0.9 s: the ++ seeding keeps a running min-distance vector, each Lloyd
    step is one (n, d) @ (d, k) matmul + a scatter-add."""
    n, d = samp.shape
    cent = np.empty((k, d), np.float32)
    cent[0] = samp[rng.integers(n)]
    d2 = ((samp - cent[0]) ** 2).sum(1)
    for j in range(1, k):
        tot = float(d2.sum())
        if tot <= 1e-12:          # fewer distinct points than centers
            cent[j:] = samp[rng.integers(n, size=k - j)]
            break
        cent[j] = samp[rng.choice(n, p=d2 / tot)]
        d2 = np.minimum(d2, ((samp - cent[j]) ** 2).sum(1))
    sq = (samp ** 2).sum(1)
    for _ in range(iters):
        dist = (sq[:, None] - 2.0 * (samp @ cent.T)
                + (cent ** 2).sum(1)[None, :])
        lab = np.argmin(dist, axis=1)
        sums = np.zeros((k, d), np.float32)
        np.add.at(sums, lab, samp)
        cnt = np.bincount(lab, minlength=k).astype(np.float32)
        cent = np.where((cnt == 0)[:, None], cent,
                        sums / np.maximum(cnt, 1.0)[:, None])
    return cent


def _bow_embedding(image_ids, desc, vocab_size: int = 128,
                   sample_cap: int = 20000, per_image_cap: int = 512,
                   seed: int = 1):
    """(N, k) L2-normalized TF-IDF bag-of-words embeddings over a k-means
    mini-vocabulary of the collection's own SIFT descriptors — the
    loop-closure candidate ranking (a vocabulary-tree-lite; the reference's
    loop_detection flag is declared unsupported, colmap.proto:56-57).
    Similarity between images a,b is ``Hw[a] @ Hw[b]``; candidate retrieval
    is done blockwise (``_loop_candidates``) so no dense (N, N) matrix is
    ever materialized — O(block*N) host memory at 10k-image scale.

    Mean-pooled descriptors were measured non-discriminative (all-pairs
    sim ~0.99 on repetitive texture); word histograms separate true
    revisits by a clear margin (see PERFORMANCE.md round-3)."""
    n_img = len(image_ids)
    # the vocabulary only has to discriminate THIS collection's images:
    # cap the k-means sample proportionally to N so small collections pay
    # a proportionally small prepass (round-5: the fixed 20k sample +
    # scipy kmeans2 cost ~14 s of host time regardless of N and caused
    # the unflagged 200-image matching regression, VERDICT r4 weak #2)
    sample_cap = int(min(sample_cap, max(4096, 96 * n_img)))
    rng = np.random.default_rng(seed)
    per_img = []
    for r in range(n_img):
        d = desc[image_ids[r]].astype(np.float32)[:per_image_cap]
        n = np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-8)
        per_img.append(d / n)
    all_d = (np.concatenate(per_img) if per_img
             else np.zeros((0, 128), np.float32))
    if len(all_d) < 16:
        return None
    samp = all_d[rng.permutation(len(all_d))[:sample_cap]]
    k = int(min(vocab_size, max(8, len(samp) // 4)))
    cent = _kmeans_pp(samp, k, iters=12, rng=rng)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-8)
    H = np.zeros((n_img, k), np.float32)
    for r in range(n_img):
        if len(per_img[r]):
            w = np.argmax(per_img[r] @ cent.T, axis=1)
            H[r] = np.bincount(w, minlength=k)
    df = (H > 0).sum(axis=0)
    Hw = H * np.log(n_img / np.maximum(df, 1))
    Hw /= np.maximum(np.linalg.norm(Hw, axis=1, keepdims=True), 1e-8)
    return Hw


def _bow_similarity(image_ids, desc, **kw):
    """Dense (N, N) similarity — kept for small-N callers/tests; large
    collections should use _loop_candidates (blockwise top-k)."""
    Hw = _bow_embedding(image_ids, desc, **kw)
    if Hw is None:  # too few descriptors to build a vocabulary
        return np.zeros((len(image_ids), len(image_ids)), np.float32)
    return Hw @ Hw.T


def _loop_candidates(Hw, sep: int, top_k: int, min_sim: float,
                     block: int = 256):
    """Top-k non-window retrieval per image from BoW embeddings, computed
    in row blocks: O(block*N) memory instead of the dense (N, N) matrix
    (ADVICE r3: dense + per-row argsort was ~400 MB + O(N^2 log N) at 10k).
    Returns a set of (a, b) pairs with a < b and |a - b| > sep."""
    n_img = Hw.shape[0]
    pairs: set = set()
    floor = max(min_sim, -1.5)
    cols = np.arange(n_img)
    for s in range(0, n_img, block):
        e = min(s + block, n_img)
        sim = Hw[s:e] @ Hw.T                      # (block, N)
        off = np.abs(np.arange(s, e)[:, None] - cols[None, :])
        sim[off <= sep] = -2.0                    # window + self excluded
        k = min(top_k, n_img)
        idx = np.argpartition(-sim, k - 1, axis=1)[:, :k]
        for r in range(e - s):
            a = s + r
            for b in idx[r]:
                if sim[r, b] > floor:
                    pairs.add((min(a, int(b)), max(a, int(b))))
    return pairs


def _revisit_probe(image_ids, desc, sep: int, n_img: int, ratio: float,
                   probe_images: int = 64):
    """Sampled revisit probe: the auto-closure signal on an evenly spaced
    <= ``probe_images`` subset (VERDICT r4 #2: budget the prepass — a
    straight-pass collection should not pay the full k-means to learn
    closure is off). Returns (frac, coherence, Hw, full): the signal is
    measured in subset space — for a true revisit the top-far-partner map
    still moves ~1 subset step per subset row (an out-and-back with
    stride s maps a=i*s to b~N-i*s, i.e. subset partner N/s - i), while
    appearance aliasing scatters partners thousands of rows apart
    (PERFORMANCE.md round-4 measurements), so the |delta| <= 4 coherence
    tolerance transfers; the separation gate is scaled to subset units.
    When the collection fits inside the probe (full=True) the probe IS
    the exact full-collection signal and Hw is the full embedding."""
    n_sub = min(probe_images, n_img)
    idx = np.linspace(0, n_img - 1, n_sub).astype(np.int64)
    stride = max(1, (n_img - 1) // max(n_sub - 1, 1))
    sub_ids = [image_ids[int(i)] for i in idx]
    Hw = _bow_embedding(sub_ids, desc)
    if Hw is None:
        return None, None, None, n_sub == n_img
    sep_sub = max(1, int(np.ceil(sep / stride)))
    frac, coh = _revisit_signal(Hw, sep_sub, ratio)
    return frac, coh, Hw, n_sub == n_img


def _revisit_signal(Hw, sep: int, ratio: float, block: int = 256):
    """Loop-closure auto-on signal: (revisit_fraction, partner_coherence).

    - revisit_fraction: images whose best NON-window BoW similarity
      reaches `ratio` x their best window similarity. A straight pass at
      small N scores far pairs well below near pairs; a revisiting
      trajectory scores second-leg pairs comparably to window pairs.
    - partner_coherence: among ratio-passing rows, the fraction of
      CONSECUTIVE rows whose top far partners move together
      (|b(a+1) - b(a)| <= 4). A true revisit's partner map is locally
      smooth (an out-and-back gives b(a) ~ N - a); appearance aliasing
      scatters it. This is the load-bearing gate at collection scale:
      with 10k far candidates per row, extreme-value statistics push
      the ratio test to fraction 1.0 on a STRAIGHT repetitive-texture
      pass (measured), and both a far-field contrast test and a
      descriptor-match probe alias the same way (blob texture repeats;
      measured 16/16 false probe pairs with >=12 ratio-test matches) —
      but the false partners land 2,762 rows apart on consecutive
      queries (coherence 0.02) while genuine revisits track at step 1
      (0.96).
    Blockwise: O(block*N) memory."""
    n_img = Hw.shape[0]
    if n_img < 3:
        return 0.0, 0.0
    cols = np.arange(n_img)
    passed = np.zeros(n_img, bool)
    partner = np.zeros(n_img, np.int64)
    for s in range(0, n_img, block):
        e = min(s + block, n_img)
        sim = Hw[s:e] @ Hw.T
        off = np.abs(np.arange(s, e)[:, None] - cols[None, :])
        near = np.where((off > 0) & (off <= sep), sim, -2.0).max(axis=1)
        far = np.where(off > sep, sim, -2.0)
        far_top = far.max(axis=1)
        partner[s:e] = np.argmax(far, axis=1)
        passed[s:e] = (far_top > -1.5) & (far_top >= ratio * near)
    frac = float(np.mean(passed))
    both = passed[:-1] & passed[1:]
    if not both.any():
        return frac, 0.0
    coh = float(np.mean(
        np.abs(partner[1:][both] - partner[:-1][both]) <= 4))
    return frac, coh


def run_matching(cfg: PipelineConfig, store: Optional[ArtifactStore] = None,
                 schedule_slice: Optional[tuple] = None,
                 out_table: str = "matching"):
    """Sequential overlap-window matching + geometric verification
    (reference feature_matching.py + sequential_matching.cc). Uses REAL
    intrinsics for verification (fixes SURVEY §8.6).

    Memory plan: descriptors are streamed in BANKS — a device-resident
    window of [bank + overlap] images along the ordered axis (the
    packetized-stencil analog of the reference's io/work_packet_size,
    feature_matching.py:70-74) — so device memory is O(bank), not
    O(collection): 1k-10k image collections match on one chip. Verification
    batches pairs in fixed chunks. Every pair's RANSAC key is derived by
    fold_in from its (row_a, row_b), so results are bitwise-invariant to
    bank size, chunking, and host sharding.

    schedule_slice=(k, n): process only every n-th scheduled pair starting
    at k (multi-host partitioned matching — parallel/dist.py)."""
    store = store or ArtifactStore(cfg.store_path)
    image_ids, kp, desc, cameras = _load_extraction(store)
    m = cfg.matching
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    n_img = len(image_ids)
    # max(..., 1): a collection whose every image extracted zero features
    # must still produce an (empty) matching table, not divide by zero
    K_max = _round_up(max(max((len(d) for d in desc.values()), default=1),
                          1), 128)

    # pair schedule along the ordered axis (the reference's stencil,
    # feature_matching.py:43): linear offsets 1..overlap, or quadratic
    # offsets 1,2,4,... (colmap.proto:61-65 — flag the reference never used)
    if m.quadratic_overlap:
        offsets = sorted({1 << i for i in range(max(m.overlap, 1))})
    else:
        offsets = list(range(1, m.overlap + 1))
    sched = [(a, a + off) for off in offsets for a in range(n_img)
             if a + off < n_img]
    if schedule_slice is not None:
        k, nproc = schedule_slice
        sched = sched[k::nproc]

    # ---- bank geometry ----------------------------------------------------
    W = max(offsets) if offsets else 1
    B = m.bank_images
    if B <= 0:
        # auto: bank <= ~256 MB of f32 descriptors
        B = max((256 << 20) // (K_max * 128 * 4) - W, 8)
    n_bank = min(B + W, n_img)  # resident rows per bank (fixed jit signature)

    # execution plan (round-5): device-RESIDENT pool when the u8 pool plus
    # its normalized bf16 copy fit the budget — descriptors upload once
    # over the ~52 MB/s link instead of once per bank (at 10k images the
    # f32 bank re-upload alone was ~11 GB = most of the 194 s stage);
    # "banked" streams as before. Same matching table either way.
    # The resident pool is normalized to bf16, which is exactly the
    # default precision's matmul operand; an explicit precision="f32"
    # run must keep its exact f32 normalization, so it takes the banked
    # plan. Budget factor 4: u8 pool + the concatenate's transient u8
    # copy + the bf16 normalized copy, on the BUCKETED image axis.
    n_pool_rows = _round_up(max(n_img, 1), 256)
    pool_bytes = n_pool_rows * K_max * 128 * 4
    resident = (m.execution == "resident"
                or (m.execution == "auto"
                    and pool_bytes <= m.resident_pool_mb << 20)) \
        and m.precision == "bf16"

    # banks carry the descriptors' NATIVE dtype (uint8 COLMAP wire format):
    # the device normalizes either way, and u8 moves 4x fewer bytes
    bank_dtype = desc[image_ids[0]].dtype if n_img else np.uint8

    def build_bank(s0):
        Db = np.zeros((n_bank, K_max, 128), bank_dtype)
        Vb = np.zeros((n_bank, K_max), bool)
        for r in range(min(n_bank, n_img - s0)):
            d = desc[image_ids[s0 + r]]
            Db[r, :len(d)] = d
            Vb[r, :len(d)] = True
        return Db, Vb

    def upload_pool(chunk_imgs: int = 512):
        """One-time chunked u8 upload + on-device normalize to bf16.

        The pool's image axis is BUCKETED (rounded up to 256) so the
        matcher's jit signature — and its disk-cached AOT executable —
        is shared across nearby collection sizes instead of recompiling
        per exact N (round-5 bench: ~3-7 s per fresh signature on the
        remote compiler). Pad rows are zero and unreachable (ai/bi index
        only real rows)."""
        n_pool = _round_up(max(n_img, 1), 256)
        Vb = np.zeros((n_pool, K_max), bool)
        blocks = []
        for s in range(0, n_img, chunk_imgs):
            e = min(s + chunk_imgs, n_img)
            blk = np.zeros((e - s, K_max, 128), bank_dtype)
            for r in range(s, e):
                d = desc[image_ids[r]]
                blk[r - s, :len(d)] = d
                Vb[r, :len(d)] = True
            blocks.append(jnp.asarray(blk))
        if n_pool > n_img:   # bucket padding allocates ON DEVICE — no upload
            blocks.append(jnp.zeros((n_pool - n_img, K_max, 128),
                                    bank_dtype))
        raw = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, 0)
        del blocks
        pool = matching_ops.normalize_pool(raw)
        del raw
        return pool, jnp.asarray(Vb)

    # group scheduled pairs by the bank that owns their first row; within a
    # bank every partner row b <= a + W is resident
    by_bank: Dict[int, list] = {}
    for a, b in sched:
        by_bank.setdefault(a // B, []).append((a, b))

    # ---- auto loop-closure probe: a sampled revisit signal on a host
    # thread OVERLAPPED with the device-bound phase-1 matching, so a
    # straight-pass collection learns closure is off at ~zero wall cost
    # (VERDICT r4 #2: the always-on full prepass cost 200-image matching
    # 6.6 -> 18.4 s for zero accuracy gain) --------------------------------
    lc = m.loop_closure
    lc = lc.lower() if isinstance(lc, str) else lc
    lc_auto = lc == "auto"
    lc_on = lc in (True, 1, "on", "true")
    sep = m.loop_min_separation or 2 * m.overlap
    loop_meta: Dict = {"mode": "auto" if lc_auto else
                       ("on" if lc_on else "off")}
    probe_thread = None
    probe_out: Dict = {}
    if lc_auto and n_img <= sep + 1:
        # provable skip: the max offset is n_img - 1 <= sep, so no pair
        # can pass the |a - b| > sep separation gate (explicit
        # loop_closure=True still runs the full prepass)
        lc_auto = lc_on = False
        loop_meta["skipped"] = f"n_img {n_img} <= sep+1 ({sep + 1})"
    elif lc_auto and n_img > 2:

        def _probe_worker():
            try:
                f, c, hw, full = _revisit_probe(image_ids, desc, sep, n_img,
                                                m.loop_auto_ratio,
                                                m.loop_probe_images)
                probe_out.update(frac=f, coh=c, Hw=hw, full=full)
            except Exception as e:  # fall back to the full prepass
                probe_out["error"] = repr(e)

        probe_thread = threading.Thread(target=_probe_worker, daemon=True)
        probe_thread.start()

    # ---- phase 1: matching (pipelined: the next dispatch goes out before
    # the previous one's matches download) ---------------------------------
    cand = []  # (row_a, row_b, sel, idx_row)

    def drain_bank(pairs_blk, idx_dev):
        idx_all = np.asarray(idx_dev)
        for n, (a, b) in enumerate(pairs_blk):
            sel = np.nonzero(idx_all[n] >= 0)[0]
            if len(sel) >= m.min_num_inliers:
                cand.append((a, b, sel, idx_all[n]))

    pool = valid_pool = None

    def match_via_pool(pairs_list):
        """Chunked pooled matching with async download pipelining.

        Chunk sizes bucket to powers of two up to resident_pair_chunk,
        so padding waste is bounded at 2x (a fixed-size chunk wasted up
        to NPC-1 full KxK matmuls on small collections) while the AOT
        signatures stay few; shared by the window schedule and the
        loop-closure candidates."""
        NPC = max(int(m.resident_pair_chunk), 8)
        pend = None
        for c0 in range(0, len(pairs_list), NPC):
            chunk = pairs_list[c0:c0 + NPC]
            npad = 8
            while npad < len(chunk):
                npad *= 2
            ai = np.zeros(npad, np.int32)
            bi = np.zeros(npad, np.int32)
            for n, (a, b) in enumerate(chunk):
                ai[n], bi[n] = a, b
            idx_dev = matching_ops.match_pairs_pool(
                pool, valid_pool, jnp.asarray(ai), jnp.asarray(bi),
                max_ratio=m.max_ratio, max_distance=m.max_distance,
                cross_check=m.cross_check, precision=m.precision)
            _copy_to_host_async(idx_dev)
            if pend is not None:
                drain_bank(*pend)
            pend = (chunk, idx_dev)
        if pend is not None:
            drain_bank(*pend)

    pending = None
    if resident:
        pool, valid_pool = upload_pool()
        match_via_pool(sched)
    else:
        match_all = _match_all_fn(m.max_ratio, m.max_distance, m.cross_check,
                                  m.precision)
        for blk in sorted(by_bank):
            pairs_blk = by_bank[blk]
            s0 = blk * B
            Db, Vb = build_bank(s0)
            NP1 = 8
            while NP1 < len(pairs_blk):
                NP1 *= 2
            ai = np.zeros(NP1, np.int32)
            bi = np.zeros(NP1, np.int32)
            for n, (a, b) in enumerate(pairs_blk):
                ai[n], bi[n] = a - s0, b - s0
            idx_dev = match_all(jnp.asarray(Db), jnp.asarray(Vb),
                                jnp.asarray(ai), jnp.asarray(bi))
            _copy_to_host_async(idx_dev)
            if pending is not None:
                drain_bank(*pending)
            pending = (pairs_blk, idx_dev)
    if pending is not None:
        drain_bank(*pending)

    # ---- phase 2: loop-closure candidates (EXCEEDS reference: loop
    # detection unsupported there, colmap.proto:56-57). BoW global
    # descriptors rank non-window pairs; candidates run through the same
    # matcher as the window schedule (resident pool, or mini-banks on the
    # banked plan) and fall into the same verification gate below — a
    # false candidate costs one RANSAC slot.
    n_loop_pairs = 0
    Hw = None
    if (lc_on or lc_auto) and n_img > 2:
        t_pre0 = time.time()
        if probe_thread is not None:
            probe_thread.join()
        need_full_signal = lc_auto
        if lc_auto and probe_out.get("frac") is not None:
            frac_p, coh_p = probe_out["frac"], probe_out["coh"]
            loop_meta["probe_frac"] = round(float(frac_p), 4)
            loop_meta["probe_coherence"] = round(float(coh_p), 4)
            if probe_out["full"]:
                # collection fits inside the probe: this IS the exact
                # full signal; decide with the real gate and reuse the
                # probe's embedding for candidate retrieval
                lc_on = (frac_p >= m.loop_auto_min_frac
                         and coh_p >= m.loop_auto_min_coherence)
                loop_meta["revisit_frac"] = loop_meta.pop("probe_frac")
                loop_meta["partner_coherence"] = loop_meta.pop(
                    "probe_coherence")
                Hw = probe_out["Hw"]
                need_full_signal = False
            # subset probe: skip the full prepass only on a CLEAR off
            # signal (half the real gate's thresholds — a true revisit
            # measures coherence ~0.96 vs ~0.04 aliasing, so the margin
            # is wide); borderline probes fall through to the full signal
            elif (frac_p < 0.5 * m.loop_auto_min_frac
                    or coh_p < 0.5 * m.loop_auto_min_coherence):
                lc_on = False
                need_full_signal = False
                loop_meta["skipped"] = "probe: no revisit structure"
        elif lc_auto and probe_out.get("full") and "error" not in probe_out:
            lc_on = False          # tiny set: too few descriptors to embed
            need_full_signal = False
        if lc_on and Hw is None:   # explicit on, or probe-confirmed subset
            Hw = _bow_embedding(image_ids, desc)
            if Hw is None:
                lc_on = False
        if need_full_signal:
            if Hw is None:
                Hw = _bow_embedding(image_ids, desc)
            if Hw is None:
                lc_on = False
            else:
                frac, coh = _revisit_signal(Hw, sep, m.loop_auto_ratio)
                lc_on = (frac >= m.loop_auto_min_frac
                         and coh >= m.loop_auto_min_coherence)
                loop_meta["revisit_frac"] = round(float(frac), 4)
                loop_meta["partner_coherence"] = round(float(coh), 4)
                log.info("matching: loop-closure auto prepass — revisit "
                         "fraction %.3f (>= %.3f), partner coherence %.3f "
                         "(>= %.2f) -> %s", frac, m.loop_auto_min_frac, coh,
                         m.loop_auto_min_coherence, "ON" if lc_on else "off")
        loop_meta["prepass_s"] = round(time.time() - t_pre0, 3)
    loop_meta["enabled"] = bool(lc_on and n_img > 2)
    if lc_on and n_img > 2:
        loop_pairs = _loop_candidates(
            Hw, sep, m.loop_top_k, m.loop_min_similarity)
        loop_pairs -= set(sched)
        n_loop_pairs = len(loop_pairs)

        if resident:
            # the pool holds every image: loop candidates are just more
            # (a, b) chunks through the same pipelined pooled matcher
            match_via_pool(sorted(loop_pairs))
        else:
            match_all = _match_all_fn(m.max_ratio, m.max_distance,
                                      m.cross_check, m.precision)
            batch: list = []

            def flush_loop_batch():
                nonlocal batch
                if not batch:
                    return
                rows = sorted({r for p in batch for r in p})
                Db = np.zeros((n_bank, K_max, 128), bank_dtype)
                Vb = np.zeros((n_bank, K_max), bool)
                for n, r in enumerate(rows):
                    d = desc[image_ids[r]]
                    Db[n, :len(d)] = d
                    Vb[n, :len(d)] = True
                row_of = {r: n for n, r in enumerate(rows)}
                NPL = 8
                while NPL < len(batch):
                    NPL *= 2
                ai = np.zeros(NPL, np.int32)
                bi = np.zeros(NPL, np.int32)
                for n, (a, b) in enumerate(batch):
                    ai[n], bi[n] = row_of[a], row_of[b]
                idx_all = np.asarray(match_all(
                    jnp.asarray(Db), jnp.asarray(Vb),
                    jnp.asarray(ai), jnp.asarray(bi)))
                for n, (a, b) in enumerate(batch):
                    sel = np.nonzero(idx_all[n] >= 0)[0]
                    if len(sel) >= m.min_num_inliers:
                        cand.append((a, b, sel, idx_all[n]))
                batch = []

            for p in sorted(loop_pairs):
                if len({p[0], p[1]} | {r for q in batch for r in q}) > n_bank:
                    flush_loop_batch()
                batch.append(p)
            flush_loop_batch()
        log.info("matching: %d loop-closure candidates past the "
                 "separation/rank gate", n_loop_pairs)

    # ---- phase 3: two-view geometries in fixed-size pair chunks ----------
    pair_ids, tvg_rows, match_lists = [], [], []
    if cand:
        P = _round_up(max(max(len(c[2]) for c in cand), 8), 256)
        n_models = 3 if m.multiple_models else 1
        verify_all = _verify_all_fn(m.max_error, m.min_num_inliers,
                                    m.min_inlier_ratio,
                                    min(m.max_num_trials, 4096),
                                    max_models=n_models,
                                    min_num_trials=m.min_num_trials,
                                    confidence=m.confidence,
                                    watermark_detection=m.detect_watermark)
        VC = 8
        while VC < min(len(cand), max(m.verify_batch_pairs, 8)):
            VC *= 2

        def drain_verify(chunk, packed_dev):
            packed = np.asarray(packed_dev)
            for n, (a, b, sel, idx_row) in enumerate(chunk):
                ia, ib = image_ids[a], image_ids[b]
                # one table row per model found (the reference serializes a
                # vector<TVG> per pair, io.cc:224-304); single-model runs
                # have exactly one row. Extra models' configs -> MULTIPLE.
                found = [r for r in range(n_models)
                         if int(packed[n, r, 0]) not in (tv_ops.DEGENERATE,
                                                         tv_ops.UNDEFINED)
                         and int(packed[n, r, 1]) >= m.min_num_inliers]
                for r in found:
                    row = packed[n, r, :37].astype(np.float64)
                    if len(found) > 1:
                        row[0] = tv_ops.MULTIPLE
                    k_n = min(len(sel), P)
                    inl = packed[n, r, 37:37 + k_n] > 0.5
                    pairs = np.stack([sel[:k_n][inl],
                                      idx_row[sel[:k_n][inl]]], axis=1)
                    pair_ids.append((ia, ib))
                    tvg_rows.append(row)
                    match_lists.append(pairs.astype(np.int32))

        pending_v = []
        for c0 in range(0, len(cand), VC):
            chunk = cand[c0:c0 + VC]
            uv1p = np.zeros((VC, P, 2))
            uv2p = np.zeros((VC, P, 2))
            vmp = np.zeros((VC, P), bool)
            K1p = np.tile(np.eye(3) * 100.0, (VC, 1, 1))  # padded: benign K
            K2p = np.tile(np.eye(3) * 100.0, (VC, 1, 1))
            S1p = np.full((VC, 2), 100.0)
            S2p = np.full((VC, 2), 100.0)
            salts = np.zeros((VC, 2), np.int32)
            for n, (a, b, sel, idx_row) in enumerate(chunk):
                ia, ib = image_ids[a], image_ids[b]
                k_n = min(len(sel), P)
                uv1p[n, :k_n] = kp[ia][sel[:k_n], :2]
                uv2p[n, :k_n] = kp[ib][idx_row[sel[:k_n]], :2]
                vmp[n, :k_n] = True
                K1p[n] = _cam_K(cameras[ia])
                K2p[n] = _cam_K(cameras[ib])
                S1p[n] = (cameras[ia][2], cameras[ia][3])  # (width, height)
                S2p[n] = (cameras[ib][2], cameras[ib][3])
                salts[n] = (a, b)
            keys = _pair_keys_fn()(key, jnp.asarray(salts))
            packed_dev = verify_all(
                keys, jnp.asarray(uv1p), jnp.asarray(uv2p),
                jnp.asarray(vmp), jnp.asarray(K1p), jnp.asarray(K2p),
                jnp.asarray(S1p), jnp.asarray(S2p))
            _copy_to_host_async(packed_dev)
            pending_v.append((chunk, packed_dev))
            if len(pending_v) > 2:
                drain_verify(*pending_v.pop(0))
        for item in pending_v:
            drain_verify(*item)

        if m.guided_matching and pair_ids:
            match_lists = _guided_rematch(
                m, image_ids, kp, desc, pair_ids, tvg_rows, match_lists,
                B, n_bank, K_max)

    store.write_table(out_table, {
        "pair_image_ids": np.asarray(pair_ids, np.int64).reshape(-1, 2),
        "two_view_geometry": np.stack(tvg_rows) if tvg_rows else np.zeros((0, 37)),
        "matches": match_lists,
    }, meta={"stage": "matching", "config": vars(m),
             "execution": "resident" if resident else "banked",
             "bank_images": B, "num_banks": len(by_bank),
             "scheduled_pairs": len(sched), "k_max": K_max,
             "loop_closure": dict(loop_meta,
                                  n_candidates=int(n_loop_pairs)),
             "pairs_per_s": len(pair_ids) / max(time.time() - t0, 1e-9)})
    log.info("matching: %d verified pairs, %.2f pairs/s",
             len(pair_ids), len(pair_ids) / max(time.time() - t0, 1e-9))
    return len(pair_ids)


def _guided_rematch(m, image_ids, kp, desc, pair_ids, tvg_rows, match_lists,
                    B, n_bank, K_max):
    """Second matching pass constrained by each pair's estimated F
    (guided_matching capability, colmap.proto:41). Banked like phase 1:
    descriptors stream through a [bank + overlap] device window."""
    id_to_row = {iid: n for n, iid in enumerate(image_ids)}
    n_img = len(image_ids)
    by_bank: Dict[int, list] = {}
    for n, (ia, ib) in enumerate(pair_ids):
        blk = id_to_row[ia] // B
        if id_to_row[ib] - blk * B >= n_bank:
            # loop-closure pair whose partner lies outside the window bank:
            # keep the original matches (the guided pass is upgrade-only)
            continue
        by_bank.setdefault(blk, []).append(n)

    def build_bank(s0):
        Db = np.zeros((n_bank, K_max, 128), np.float32)
        Vb = np.zeros((n_bank, K_max), bool)
        for r in range(min(n_bank, n_img - s0)):
            d = desc[image_ids[s0 + r]].astype(np.float32)
            Db[r, :len(d)] = d
            Vb[r, :len(d)] = True
        return Db, Vb

    guided_all = _guided_all_fn(m.max_error, m.max_distance, m.cross_check,
                                m.precision)
    out = list(match_lists)
    for blk in sorted(by_bank):
        rows = by_bank[blk]
        s0 = blk * B
        Db, Vb = build_bank(s0)
        NP = 8
        while NP < len(rows):
            NP *= 2
        a_rows = np.zeros(NP, np.int32)
        b_rows = np.zeros(NP, np.int32)
        Fs = np.tile(np.eye(3, dtype=np.float64), (NP, 1, 1))
        uv_a = np.zeros((NP, K_max, 2))
        uv_b = np.zeros((NP, K_max, 2))
        for k, n in enumerate(rows):
            ia, ib = pair_ids[n]
            a_rows[k] = id_to_row[ia] - s0
            b_rows[k] = id_to_row[ib] - s0
            Fs[k] = tvg_rows[n][17:26].reshape(3, 3)
            uv_a[k, :len(kp[ia])] = kp[ia][:, :2]
            uv_b[k, :len(kp[ib])] = kp[ib][:, :2]
        idx_g = np.asarray(guided_all(jnp.asarray(Db), jnp.asarray(Vb),
                                      jnp.asarray(a_rows),
                                      jnp.asarray(b_rows),
                                      jnp.asarray(uv_a), jnp.asarray(uv_b),
                                      jnp.asarray(Fs)))
        for k, n in enumerate(rows):
            ia, ib = pair_ids[n]
            sel = np.nonzero(idx_g[k][:len(kp[ia])] >= 0)[0]
            pairs = np.stack([sel, idx_g[k][sel]], axis=1).astype(np.int32)
            # keep the larger of (original inliers, guided matches)
            if len(pairs) >= len(match_lists[n]):
                out[n] = pairs
    return out


def _cam_K(caminfo):
    model_id, params, w, h, prior = caminfo
    f = params[0]
    if model_id == camlib.PINHOLE:
        return np.array([[params[0], 0, params[2]], [0, params[1], params[3]],
                         [0, 0, 1.0]])
    return np.array([[f, 0, params[1]], [0, f, params[2]], [0, 0, 1.0]])


def _build_graph(store: ArtifactStore, kp: Dict[int, np.ndarray]):
    mt = store.read_table("matching")
    # make_graph(): the native C++ graph when the toolchain is available —
    # the post-merge full-graph iterative refinement loops complete/merge/
    # filter over the WHOLE model and needs the fast scans as much as
    # per-cluster mapping does (round-2 bottleneck: this built the pure
    # Python graph and merge+refine dominated the 1k-image wall clock)
    graph = make_graph()
    for iid, k in kp.items():
        graph.add_image(iid, len(k))
    two_view = {}
    pair_ids = np.asarray(mt["pair_image_ids"]).reshape(-1, 2)
    # group rows by pair: multiple_models emits one row per model
    # (vector<TVG> per pair in the reference, io.cc:224-304)
    by_pair: Dict[tuple, list] = {}
    for n in range(len(pair_ids)):
        by_pair.setdefault((int(pair_ids[n][0]), int(pair_ids[n][1])),
                           []).append(n)
    pair_matches: Dict[tuple, np.ndarray] = {}
    for (i, j), rows in by_pair.items():
        all_pairs = np.concatenate(
            [np.asarray(mt["matches"][n]).reshape(-1, 2) for n in rows])
        if len(rows) > 1:
            all_pairs = np.unique(all_pairs, axis=0)
        graph.add_matches(i, j, all_pairs)
        # normalized per-pair match lists: cluster subgraphs rebuild from
        # these directly instead of O(pairs x keypoints) adjacency scans
        lo, hi = min(i, j), max(i, j)
        pair_matches[(lo, hi)] = (all_pairs if i < j
                                  else all_pairs[:, ::-1].copy())
        # pose/config from the strongest model
        best = max(rows, key=lambda n: mt["two_view_geometry"][n][1])
        row = np.asarray(mt["two_view_geometry"][best])
        if i > j:
            q, t = geom.np_pose_inverse(row[3:7], row[7:10])
        else:
            q, t = row[3:7].copy(), row[7:10].copy()
        two_view[(lo, hi)] = {
            "config": int(row[0]), "num_inliers": int(row[1]),
            "tri_angle": float(row[2]), "qvec": q, "tvec": t,
        }
    graph.pair_matches = pair_matches
    return graph, two_view


# ---------------------------------------------------------------------------
# stage 4: incremental mapping (clustered)
# ---------------------------------------------------------------------------

def run_mapping(cfg: PipelineConfig, store: Optional[ArtifactStore] = None):
    """Clustered incremental SfM; one row per non-empty submodel
    (reference incremental_mapping.py + remove_empty_reconstruction.py)."""
    store = store or ArtifactStore(cfg.store_path)
    image_ids, kp, desc, cameras = _load_extraction(store)
    graph, two_view = _build_graph(store, kp)
    t0 = time.time()
    _, submodels = run_clustered_mapping(
        kp, cameras, graph, two_view, cfg.mapper, cfg.merge, merge=False)
    cams_b, imgs_b, pts_b, cluster_id = [], [], [], []
    for ci, rec in enumerate(submodels):
        cb, ib, pb = colmap_io.model_to_bytes(rec)
        cams_b.append(cb)
        imgs_b.append(ib)
        pts_b.append(pb)
        cluster_id.append(ci)
    n_reg = sum(r.num_registered for r in submodels)
    from scanner_colmap_tpu.engine import cluster as cluster_mod

    store.write_table("mapping", {
        "cluster_id": np.asarray(cluster_id, np.int64),
        "cameras": cams_b,
        "images": imgs_b,
        "points3d": pts_b,
    }, meta={"stage": "mapping", "config": vars(cfg.mapper),
             "images_registered_per_s": n_reg / max(time.time() - t0, 1e-9),
             "num_submodels": len(submodels),
             "device_stats": dict(cluster_mod.LAST_MAPPING_STATS)})
    log.info("mapping: %d submodels, %d registrations, %.2f img/s",
             len(submodels), n_reg, n_reg / max(time.time() - t0, 1e-9))
    return len(submodels)


# ---------------------------------------------------------------------------
# stage 5: merge
# ---------------------------------------------------------------------------

def run_merge(cfg: PipelineConfig, store: Optional[ArtifactStore] = None,
              export_path: Optional[str] = None):
    """Tree-merge submodels into one model (reference merge_mapping.py)."""
    store = store or ArtifactStore(cfg.store_path)
    t_split = {}          # sub-timings recorded into the manifest meta
    t0 = time.time()
    tab = store.read_table("mapping")
    submodels = [colmap_io.model_from_bytes(c, i, p)
                 for c, i, p in zip(tab["cameras"], tab["images"], tab["points3d"])]
    t_split["load"] = round(time.time() - t0, 2)
    t0 = time.time()
    model = merge_all(submodels, cfg.merge)
    t_split["fold"] = round(time.time() - t0, 2)
    if cfg.merge.final_ba and len(submodels) > 1:
        # beyond merge.final_ba_max_images the solves inside switch from
        # the dense Schur factorization to matrix-free CG (ops/ba) — large
        # merged models are refined, not skipped
        if cfg.merge.iterative_refine and store.has_table("matching"):
            # full-graph iterative refinement: retriangulation builds
            # cross-cluster tracks before the global solve
            from scanner_colmap_tpu.engine.merge import (
                iterative_global_refinement)

            t0 = time.time()
            image_ids_r, kp_r, _, cameras_r = _load_extraction(store)
            graph_r, two_view_r = _build_graph(store, kp_r)
            t_split["graph"] = round(time.time() - t0, 2)
            t0 = time.time()
            m_cfg = cfg.matching
            win_max = (1 << max(m_cfg.overlap - 1, 0)
                       if m_cfg.quadratic_overlap else m_cfg.overlap)
            model = iterative_global_refinement(
                model, kp_r, cameras_r, graph_r, two_view_r, cfg.mapper,
                window=win_max,
                loop_gate_factor=cfg.merge.loop_refine_gate_factor,
                loop_separation=(m_cfg.loop_min_separation
                                 or 2 * m_cfg.overlap))
            t_split["refine"] = round(time.time() - t0, 2)
            log.info("merge: iterative refinement -> %d images, %d points",
                     model.num_registered, len(model.points3D))
        else:
            from scanner_colmap_tpu.engine.merge import global_refine

            info = global_refine(
                model, max_iterations=cfg.merge.final_ba_iterations,
                filter_max_reproj_error=cfg.mapper.filter_max_reproj_error,
                intr_prior_weight_f=cfg.mapper.intr_prior_weight_f,
                intr_prior_weight_k=cfg.mapper.intr_prior_weight_k,
                dense_max_images=cfg.merge.final_ba_max_images)
            if info:
                log.info("merge: final BA cost %.1f -> %.1f",
                         info["initial_cost"], info["final_cost"])
    model.compute_reprojection_errors()
    cb, ib, pb = colmap_io.model_to_bytes(model)
    store.write_table("models", {
        "model_id": np.zeros(1, np.int64),
        "cameras": [cb], "images": [ib], "points3d": [pb],
    }, meta={"stage": "merge", "num_registered": model.num_registered,
             "num_points": len(model.points3D),
             "mean_reproj_error": model.mean_reprojection_error(),
             "time_split_s": t_split})
    if export_path:
        colmap_io.write_model(model, export_path)
    log.info("merge: %d images, %d points, err %.3f px", model.num_registered,
             len(model.points3D), model.mean_reprojection_error())
    return model


def load_model(store: ArtifactStore) -> Reconstruction:
    tab = store.read_table("models")
    return colmap_io.model_from_bytes(
        tab["cameras"][0], tab["images"][0], tab["points3d"][0])


# ---------------------------------------------------------------------------
# stage 5b: undistortion (optional; COLMAP image_undistorter equivalent)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=2)
def _undistort_batch_fn():
    from scanner_colmap_tpu.ops import undistort as ud_ops

    def run(imgs, model_ids, params, new_params):
        out, _ = jax.vmap(ud_ops.undistort_image)(imgs, model_ids, params,
                                                  new_params)
        # ONE uint8 download instead of a float map per image
        return jnp.clip(out * 255.0, 0.0, 255.0).astype(jnp.uint8)
    return persistent_jit(
        run, fingerprint_modules=("scanner_colmap_tpu.ops.undistort",))


def run_undistort(cfg: PipelineConfig, store: Optional[ArtifactStore] = None,
                  output_path: Optional[str] = None):
    """Undistort every registered image to an ideal pinhole camera and export
    a dense-ready workspace (undistorted images + pinhole model).

    The reference intended this as a per-image COLMAP ``UndistortImage``
    kernel but never finished it (/root/reference/integration/op_cpp/
    undistort_image.cc — incomplete, wrong op registration, unbuilt; SURVEY
    §8.3). Capability rebuilt: batched inverse-map remap on device
    (ops/undistort.py), COLMAP-binary export of the pinhole model.
    """
    from PIL import Image as PILImage

    from scanner_colmap_tpu.ops import undistort as ud_ops

    store = store or ArtifactStore(cfg.store_path)
    model = load_model(store)
    frames = store.read_table("frames")
    paths = {int(i): p.decode() for i, p in zip(frames["image_id"],
                                                frames["path"])}
    # NB: not "<root>/undistorted" — that path is the stage's TABLE dir,
    # which write_table atomically replaces
    out_root = output_path or os.path.join(store.root, "undistort_ws")
    img_dir = os.path.join(out_root, "images")
    os.makedirs(img_dir, exist_ok=True)

    reg = sorted(model.registered_image_ids)
    if not reg:
        store.write_table("undistorted", {
            "image_id": np.zeros(0, np.int64), "path": [],
            "new_params": np.zeros((0, 4), np.float64)},
            meta={"stage": "undistort"})
        return 0
    canvas = (_round_up(cfg.sift.max_image_size, 32),) * 2
    new_model = model.copy()
    scale_of = cam_scales(store)

    batch, meta_rows = [], []
    out_paths, out_ids, out_params = [], [], []

    def flush():
        if not batch:
            return
        n = len(batch)
        imgs = np.stack([b[0] for b in batch])
        mids = np.asarray([b[1] for b in batch], np.int32)
        prms = np.stack([b[2] for b in batch])
        nprm = np.stack([b[3] for b in batch])
        out = np.asarray(_undistort_batch_fn()(
            jnp.asarray(imgs), jnp.asarray(mids), jnp.asarray(prms),
            jnp.asarray(nprm)))
        for k in range(n):
            iid, h, w = meta_rows[k]
            p = os.path.join(img_dir, f"image_{iid:06d}.png")
            PILImage.fromarray(out[k][:h, :w]).save(p)
            out_paths.append(p.encode())
            out_ids.append(iid)
            out_params.append(nprm[k])
        batch.clear()
        meta_rows.clear()

    for iid in reg:
        im = model.images[iid]
        cam = model.cameras[im.camera_id]
        item = image_ops.load_for_extraction(paths[iid],
                                             cfg.sift.max_image_size, canvas)
        # params live at extraction resolution; rescale to THIS load's scale
        s = item["scale"] / scale_of[iid]
        scaled = np.asarray(cam.params_padded, np.float64).copy()
        n_f = 1 if cam.model_id in (camlib.SIMPLE_PINHOLE, camlib.SIMPLE_RADIAL,
                                    camlib.RADIAL) else 2
        scaled[:n_f + 2] *= s  # focal(s) + principal point scale together
        new_p = ud_ops.undistorted_pinhole_params(cam.model_id, scaled)
        h, w = int(item["valid_hw"][0]), int(item["valid_hw"][1])
        batch.append((item["image"].astype(np.float32) / 255.0,
                      cam.model_id, scaled, new_p))
        meta_rows.append((iid, h, w))
        # pinhole camera in the exported model (per image: undistortion
        # resolution may differ per image)
        new_model.cameras[im.camera_id] = type(cam)(
            cam.camera_id, camlib.PINHOLE, w, h,
            np.asarray(new_p, np.float64), cam.prior_focal)
        if len(batch) >= 8:
            flush()
    flush()

    colmap_io.write_model(new_model, os.path.join(out_root, "sparse"))
    store.write_table("undistorted", {
        "image_id": np.asarray(out_ids, np.int64),
        "path": out_paths,
        "new_params": np.stack(out_params),
    }, meta={"stage": "undistort", "output_path": out_root})
    log.info("undistort: %d images -> %s", len(out_ids), out_root)
    return len(out_ids)


# ---------------------------------------------------------------------------
# stage 6: prepare_patch_match
# ---------------------------------------------------------------------------

def run_prepare_patch_match(cfg: PipelineConfig,
                            store: Optional[ArtifactStore] = None):
    """Per-registered-image MVS geometry: R, T, K, bitmap, depth range
    (reference prepare_patch_match.cc: depth ranges from sparse points)."""
    store = store or ArtifactStore(cfg.store_path)
    model = load_model(store)
    frames = store.read_table("frames")
    paths = {int(i): p.decode() for i, p in zip(frames["image_id"], frames["path"])}

    pm = cfg.patch_match
    canvas = (_round_up(pm.max_image_size, 32),) * 2
    rows = {"image_id": [], "R": [], "T": [], "K": [], "width": [],
            "height": [], "bitmap": [], "depth_min": [], "depth_max": []}
    scale_of = cam_scales(store)
    for iid in sorted(model.registered_image_ids):
        im = model.images[iid]
        cam = model.cameras[im.camera_id]
        # depths of this image's sparse points (COLMAP ComputeDepthRanges)
        depths = []
        for pid in im.point3D_ids:
            if pid >= 0 and int(pid) in model.points3D:
                x_cam = geom.np_pose_transform(im.qvec, im.tvec,
                                               model.points3D[int(pid)].xyz)
                if x_cam[2] > 0:
                    depths.append(x_cam[2])
        if len(depths) < 5:
            continue
        d = np.asarray(depths)
        dmin = float(np.percentile(d, 2) * pm.depth_min_factor)
        dmax = float(np.percentile(d, 98) * pm.depth_max_factor)

        item = image_ops.load_for_extraction(paths[iid], pm.max_image_size, canvas)
        h, w = int(item["valid_hw"][0]), int(item["valid_hw"][1])
        # rescale intrinsics: camera was built at extraction resolution
        s_mvs = item["scale"] / scale_of[iid]
        K = _cam_K((cam.model_id, list(cam.params), cam.width, cam.height, cam.prior_focal))
        K = K * np.array([[s_mvs], [s_mvs], [1.0]])
        rows["image_id"].append(iid)
        rows["R"].append(geom.np_quat_to_rotmat(im.qvec).astype(np.float32).ravel())
        rows["T"].append(np.asarray(im.tvec, np.float32))
        rows["K"].append(K.astype(np.float32).ravel())
        rows["width"].append(w)
        rows["height"].append(h)
        rows["bitmap"].append(item["image"].astype(np.float32) / 255.0)
        rows["depth_min"].append(dmin)
        rows["depth_max"].append(dmax)
    store.write_table("prepare_patch_match", {
        "image_id": np.asarray(rows["image_id"], np.int64),
        "R": np.stack(rows["R"]) if rows["R"] else np.zeros((0, 9), np.float32),
        "T": np.stack(rows["T"]) if rows["T"] else np.zeros((0, 3), np.float32),
        "K": np.stack(rows["K"]) if rows["K"] else np.zeros((0, 9), np.float32),
        "width": np.asarray(rows["width"], np.int32),
        "height": np.asarray(rows["height"], np.int32),
        "bitmap": rows["bitmap"],
        "depth_min": np.asarray(rows["depth_min"], np.float64),
        "depth_max": np.asarray(rows["depth_max"], np.float64),
    }, meta={"stage": "prepare_patch_match", "canvas": list(canvas)})
    log.info("prepare_patch_match: %d images", len(rows["image_id"]))
    return len(rows["image_id"])


def import_colmap_db(cfg: PipelineConfig,
                     store: Optional[ArtifactStore] = None,
                     database_path: str = "",
                     recompute_pose: bool = True) -> int:
    """Import a COLMAP SQLite ``database.db`` into the artifact store.

    Writes the ``frames``, ``extraction``, and ``matching`` tables exactly
    as stages 1-3 would, so any real dataset COLMAP has processed (the
    reference's demonstrated context is Gerrard Hall, README.md:5-6)
    replays through mapping -> merge -> dense with zero new code — the
    database is the reference pipeline's actual interchange surface
    (incremental_mapping.cc:281-293 builds one per cluster). Images are
    ordered by name (the ordered-axis assumption, prepare_images.py:13);
    original COLMAP image ids are preserved.

    COLMAP's db stores no triangulation angle, and older schemas no
    relative pose; with ``recompute_pose`` both are rebuilt from E for
    CALIBRATED pairs (pose_from_essential cheirality voting), because the
    mapper's init-pair selection ranks by tri_angle. Returns the number
    of imported image pairs."""
    from scanner_colmap_tpu.ops import two_view as tv_import
    from scanner_colmap_tpu.utils import colmap_db

    store = store or ArtifactStore(cfg.store_path)
    db = colmap_db.read_database(database_path)
    order = sorted(db["images"], key=lambda i: db["images"][i]["name"])
    n_img = len(order)
    max_np = max([camlib.MODEL_NUM_PARAMS[camlib.PINHOLE]]
                 + [camlib.MODEL_NUM_PARAMS.get(
                     colmap_db._DOWNGRADE.get(c["model"], c["model"]), 4)
                    for c in db["cameras"].values()])

    downgraded = []
    kp_by_id: Dict[int, np.ndarray] = {}
    keypoints, descriptors, cam_rows = [], [], []
    widths, heights, names = [], [], []
    for iid in order:
        im = db["images"][iid]
        cam = db["cameras"][im["camera_id"]]
        model, params = cam["model"], np.asarray(cam["params"], np.float64)
        if model in colmap_db._DOWNGRADE:
            downgraded.append(im["name"])
            model = colmap_db._DOWNGRADE[model]
            params = params[:camlib.MODEL_NUM_PARAMS[model]]
        if model not in camlib.MODEL_NUM_PARAMS:
            raise ValueError(
                f"unsupported COLMAP camera model {model} for {im['name']}")
        kp_raw = db["keypoints"].get(iid, np.zeros((0, 2), np.float32))
        kp4 = colmap_db._keypoints_to_xyso(np.asarray(kp_raw))
        kp_by_id[iid] = kp4
        keypoints.append(kp4)
        descriptors.append(np.asarray(
            db["descriptors"].get(iid, np.zeros((0, 128), np.uint8)),
            np.uint8))
        row = np.zeros(5 + max_np)
        row[0], row[1], row[2] = model, cam["width"], cam["height"]
        row[3] = 1.0 if cam["prior_focal_length"] else 0.0
        row[4] = 1.0                       # features at native resolution
        row[5:5 + len(params)] = params
        cam_rows.append(row)
        widths.append(cam["width"])
        heights.append(cam["height"])
        # frames.path is opened directly by the dense stages
        # (run_undistort/run_prepare_patch_match reload original pixels):
        # join the db's bare image name onto image_path like
        # prepare_images does. Store list columns are bytes.
        names.append(os.path.join(cfg.image_path or "",
                                  im["name"]).encode())

    store.write_table("frames", {
        "image_id": np.asarray(order, np.int64),
        "path": names,
        "width": np.asarray(widths, np.int32),
        "height": np.asarray(heights, np.int32),
    }, meta={"stage": "prepare_images", "image_path": cfg.image_path,
             "source": {"colmap_db": database_path}, "stride": 1})
    store.write_table("extraction", {
        "image_id": np.asarray(order, np.int64),
        "keypoints": keypoints,
        "descriptors": descriptors,
        "camera": (np.stack(cam_rows) if cam_rows
                   else np.zeros((0, 5 + max_np))),
    }, meta={"stage": "extraction",
             "source": {"colmap_db": database_path,
                        "distortion_dropped": downgraded}})

    # ---- matching table from the db's verified two-view geometries ------
    cam_of = {iid: db["cameras"][db["images"][iid]["camera_id"]]
              for iid in order}

    def K_of(iid):
        c = cam_of[iid]
        p = np.asarray(c["params"])
        if c["model"] in (camlib.PINHOLE, colmap_db._OPENCV,
                          colmap_db._FULL_OPENCV):
            return np.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1.0]])
        return np.array([[p[0], 0, p[1]], [0, p[0], p[2]], [0, 0, 1.0]])

    pose_fn = None
    if recompute_pose:
        pose_fn = jax.jit(tv_import.pose_from_essential)
    pair_ids, tvg_rows, match_lists = [], [], []
    n_pose_rebuilt = 0
    for (i1, i2), g in sorted(db["two_view_geometries"].items()):
        inl = np.asarray(g["inlier_matches"], np.int64).reshape(-1, 2)
        if len(inl) == 0 or g["config"] in (tv_import.UNDEFINED,
                                            tv_import.DEGENERATE):
            continue
        row = np.zeros(37)
        row[0], row[1] = g["config"], len(inl)
        q, t = g.get("qvec"), g.get("tvec")
        has_pose = (q is not None and np.any(np.asarray(q) != 0))
        if has_pose:
            row[3:7], row[7:10] = np.asarray(q), np.asarray(t)
        for sl, M in ((slice(10, 19), g["E"]), (slice(19, 28), g["F"]),
                      (slice(28, 37), g["H"])):
            if M is not None:
                row[sl] = np.asarray(M).ravel()
        # rebuild pose/tri_angle from E: the db has no tri_angle column and
        # (pre-3.7) possibly no pose; init-pair ranking needs both. Any
        # config with a usable E qualifies — planar/panoramic scenes
        # classify as PLANAR_OR_PANORAMIC yet still carry E (the matcher
        # estimates all three models), and their pairs register fine once
        # tri_angle is present
        if (pose_fn is not None and g["E"] is not None
                and np.linalg.norm(np.asarray(g["E"])) > 1e-8
                and g["config"] not in (tv_import.UNDEFINED,
                                        tv_import.DEGENERATE,
                                        tv_import.UNCALIBRATED,
                                        tv_import.WATERMARK)
                and len(inl) >= 5):
            x1 = kp_by_id[i1][inl[:, 0], :2]
            x2 = kp_by_id[i2][inl[:, 1], :2]
            K1inv, K2inv = np.linalg.inv(K_of(i1)), np.linalg.inv(K_of(i2))
            h1 = np.concatenate([x1, np.ones((len(x1), 1))], 1) @ K1inv.T
            h2 = np.concatenate([x2, np.ones((len(x2), 1))], 1) @ K2inv.T
            P = _round_up(len(inl), 256)
            x1n = np.zeros((P, 2)); x1n[:len(inl)] = h1[:, :2] / h1[:, 2:]
            x2n = np.zeros((P, 2)); x2n[:len(inl)] = h2[:, :2] / h2[:, 2:]
            mask = np.zeros(P, bool); mask[:len(inl)] = True
            qe, te, tri, ngood = pose_fn(
                jnp.asarray(np.asarray(g["E"])), jnp.asarray(x1n),
                jnp.asarray(x2n), jnp.asarray(mask))
            row[2] = float(tri)
            if not has_pose:
                row[3:7], row[7:10] = np.asarray(qe), np.asarray(te)
                n_pose_rebuilt += 1
        pair_ids.append((i1, i2))
        tvg_rows.append(row)
        match_lists.append(inl.astype(np.int32))

    store.write_table("matching", {
        "pair_image_ids": np.asarray(pair_ids, np.int64).reshape(-1, 2),
        "two_view_geometry": (np.stack(tvg_rows) if tvg_rows
                              else np.zeros((0, 37))),
        "matches": match_lists,
    }, meta={"stage": "matching",
             "source": {"colmap_db": database_path,
                        "raw_match_pairs": len(db["matches"]),
                        "poses_rebuilt": n_pose_rebuilt}})
    log.info("import_colmap_db: %d images, %d verified pairs "
             "(%d poses rebuilt from E)%s", n_img, len(pair_ids),
             n_pose_rebuilt,
             f", distortion dropped for {len(downgraded)} OPENCV images"
             if downgraded else "")
    return len(pair_ids)


def export_colmap_db(cfg: PipelineConfig,
                     store: Optional[ArtifactStore] = None,
                     database_path: str = "") -> int:
    """Export the store's extraction+matching tables as a COLMAP
    ``database.db`` — the inverse of :func:`import_colmap_db`, so this
    framework's features/matches can be handed to stock COLMAP for
    cross-validation (and the pair round-trips in tests)."""
    from scanner_colmap_tpu.utils import colmap_db

    store = store or ArtifactStore(cfg.store_path)
    image_ids, kp, desc, cams = _load_extraction(store)
    frames = store.read_table("frames", columns=["image_id", "path"])

    def _db_name(p):
        # COLMAP dbs store image names relative to the image dir; our
        # frames.path is absolute (prepare_images joins image_path)
        p = p.decode() if isinstance(p, bytes) else str(p)
        base = cfg.image_path or ""
        if base and os.path.abspath(p).startswith(
                os.path.abspath(base) + os.sep):
            return os.path.relpath(p, base)
        return os.path.basename(p)

    name_of = {int(i): _db_name(p)
               for i, p in zip(frames["image_id"], frames["path"])}
    cameras, images, keypoints, descriptors = {}, {}, {}, {}
    for iid in image_ids:
        model_id, params, w, h, prior = cams[iid]
        cameras[iid] = {"model": model_id, "width": w, "height": h,
                        "params": np.asarray(params, np.float64),
                        "prior_focal_length": prior}
        images[iid] = {"name": name_of.get(iid, f"image_{iid}"),
                       "camera_id": iid}
        keypoints[iid] = np.asarray(kp[iid], np.float32)
        descriptors[iid] = np.asarray(desc[iid], np.uint8)

    mt = store.read_table("matching")
    pids = np.asarray(mt["pair_image_ids"], np.int64).reshape(-1, 2)
    matches, tvgs = {}, {}
    for n in range(len(pids)):
        i1, i2 = int(pids[n, 0]), int(pids[n, 1])
        row = np.asarray(mt["two_view_geometry"][n], np.float64)
        inl = np.asarray(mt["matches"][n], np.uint32).reshape(-1, 2)
        key = (i1, i2)
        if key in tvgs:      # multiple_models: keep the strongest row,
            if row[1] <= tvgs[key]["_n"]:      # union the inlier matches
                inl = np.unique(np.concatenate(
                    [tvgs[key]["inlier_matches"], inl]), axis=0)
                tvgs[key]["inlier_matches"] = inl
                matches[key] = inl
                continue
            inl = np.unique(np.concatenate(
                [tvgs[key]["inlier_matches"], inl]), axis=0)
        matches[key] = inl
        tvgs[key] = {"config": int(row[0]), "inlier_matches": inl,
                     "qvec": row[3:7], "tvec": row[7:10],
                     "E": row[10:19].reshape(3, 3),
                     "F": row[19:28].reshape(3, 3),
                     "H": row[28:37].reshape(3, 3), "_n": row[1]}
    for g in tvgs.values():
        g.pop("_n")
    colmap_db.write_database(database_path, cameras, images, keypoints,
                             descriptors, matches, tvgs)
    log.info("export_colmap_db: %d images, %d pairs -> %s",
             len(image_ids), len(tvgs), database_path)
    return len(tvgs)


def cam_scales(store: ArtifactStore) -> Dict[int, float]:
    """Extraction downscale factor per image id (camera resolution basis).
    ONE table read for the whole collection — callers loop over images, so a
    per-image read would be O(N^2) in collection size."""
    ext = store.read_table("extraction", columns=["image_id", "camera"])
    return {int(i): float(row[4])
            for i, row in zip(ext["image_id"], ext["camera"])}


def cam_scale_of(store: ArtifactStore, iid: int) -> float:
    """Extraction downscale factor for image iid (camera resolution basis)."""
    return cam_scales(store)[iid]


# ---------------------------------------------------------------------------
# stage 7: patch_match
# ---------------------------------------------------------------------------

def run_patch_match(cfg: PipelineConfig, store: Optional[ArtifactStore] = None,
                    ref_slice: Optional[tuple] = None,
                    out_table: str = "patch_match"):
    """PatchMatch depth/normals per reference image with a window of source
    views (reference patch_match.py stencil + patch_match.cc).

    ref_slice=(k, nproc): compute only the k-th CONTIGUOUS block of
    reference images (multi-host sharding — parallel/dist.py). The block is
    extended by the source-view window so the geometric-consistency pass
    has its neighbors' pass-1 depth maps locally (halo recompute instead of
    a cross-host exchange); only the core block is written out."""
    store = store or ArtifactStore(cfg.store_path)
    tab = store.read_table("prepare_patch_match")
    pm = cfg.patch_match
    n = len(tab["image_id"])
    if n == 0:
        store.write_table(out_table, {
            "image_id": np.zeros(0, np.int64), "depth_map": [],
            "normal_map": [], "cost_map": []},
            meta={"stage": "patch_match"})
        return 0
    canvas_h = max(int(h) for h in tab["height"])
    canvas_w = max(int(w) for w in tab["width"])
    canvas_h, canvas_w = _round_up(canvas_h, 32), _round_up(canvas_w, 32)

    Rm = np.asarray(tab["R"]).reshape(n, 3, 3)
    Tm = np.asarray(tab["T"]).reshape(n, 3)
    Km = np.asarray(tab["K"]).reshape(n, 3, 3)

    S = pm.overlap
    key = jax.random.PRNGKey(1)
    t0 = time.time()

    # host shard: core block of refs to OUTPUT, halo-extended set to COMPUTE
    if ref_slice is not None:
        k_blk, nproc = ref_slice
        bounds = np.linspace(0, n, nproc + 1).astype(int)
        core = set(range(bounds[k_blk], bounds[k_blk + 1]))
        halo = max(0, S // 2 + S % 2)
        compute = set(range(max(0, bounds[k_blk] - halo),
                            min(n, bounds[k_blk + 1] + halo)))
    else:
        core = compute = set(range(n))

    def window(ref):
        # source views: the stencil window around ref (reference uses the
        # next `overlap` rows; symmetric is strictly better)
        return [s for s in range(max(0, ref - S // 2),
                                 min(n, ref + S // 2 + S % 2 + 1))
                if s != ref][:S]

    # coarse canvas for the coarse-to-fine first pass (half res, 32-aligned)
    ch2 = _round_up((canvas_h + 1) // 2, 32)
    cw2 = _round_up((canvas_w + 1) // 2, 32)

    def _half(bm):
        h2, w2 = bm.shape[0] // 2, bm.shape[1] // 2
        return 0.25 * (bm[: 2 * h2 : 2, : 2 * w2 : 2]
                       + bm[1 : 2 * h2 : 2, : 2 * w2 : 2]
                       + bm[: 2 * h2 : 2, 1 : 2 * w2 : 2]
                       + bm[1 : 2 * h2 : 2, 1 : 2 * w2 : 2])

    def build_problem(ref, ds=1):
        CH, CW = (canvas_h, canvas_w) if ds == 1 else (ch2, cw2)
        srcs = window(ref)
        src_imgs = np.zeros((S, CH, CW), np.float32)
        Ks = np.tile(np.eye(3, dtype=np.float32), (S, 1, 1))
        Rs = np.tile(np.eye(3, dtype=np.float32), (S, 1, 1))
        ts = np.zeros((S, 3), np.float32)
        src_valid = np.zeros(S, bool)
        for si, s in enumerate(srcs):
            # bitmaps are stored canvas-padded (uniform trailing dims for the
            # ragged column); crop to the valid region before re-padding
            h_s, w_s = int(tab["height"][s]), int(tab["width"][s])
            bm = np.asarray(tab["bitmap"][s])[:h_s, :w_s]
            if ds == 2:
                bm = _half(bm)
            src_imgs[si, :bm.shape[0], :bm.shape[1]] = bm
            Ks[si] = Km[s]
            if ds == 2:
                Ks[si] = Ks[si].copy()
                Ks[si][:2, :] *= 0.5
            # relative pose ref cam -> src cam: R_rel = R_s R_r^T etc.
            Rs[si] = Rm[s] @ Rm[ref].T
            ts[si] = Tm[s] - Rs[si] @ Tm[ref]
            src_valid[si] = True
        h_r, w_r = int(tab["height"][ref]), int(tab["width"][ref])
        ref_bm = np.asarray(tab["bitmap"][ref])[:h_r, :w_r]
        if ds == 2:
            ref_bm = _half(ref_bm)
        ref_img = np.zeros((CH, CW), np.float32)
        ref_img[:ref_bm.shape[0], :ref_bm.shape[1]] = ref_bm
        K_ref = Km[ref]
        if ds == 2:
            K_ref = K_ref.copy()
            K_ref[:2, :] *= 0.5
        return pm_ops.PatchMatchProblem(
            ref_image=jnp.asarray(ref_img),
            src_images=jnp.asarray(src_imgs),
            K_ref=jnp.asarray(K_ref),
            K_src=jnp.asarray(Ks),
            R=jnp.asarray(Rs), t=jnp.asarray(ts),
            depth_min=jnp.asarray(np.float32(tab["depth_min"][ref])),
            depth_max=jnp.asarray(np.float32(tab["depth_max"][ref])),
            src_valid=jnp.asarray(src_valid))

    def run_pass(depth_bank=None, normal_bank=None, cost_bank=None,
                 refs=None, pass_idx=0, ds=1, iters=None, init_banks=None):
        """One sweep over all ref images. With banks (canvas-res pass-1
        results), runs the geom-consistency pass: source depth maps feed
        the forward-backward term, pass-1 depth/normal warm-start.

        PIPELINED: jax dispatch is async, so problems are dispatched ahead
        (bounded in-flight window) and results downloaded in order — host
        problem assembly, device compute, and downloads overlap."""
        d_out = [None] * n
        n_out = [None] * n
        c_out = [None] * n
        # dispatch-ahead window scaled to canvas area: 8 in-flight 480px
        # problems is ~200 MB of device inputs; reference-resolution
        # problems shrink the window so HBM stays bounded
        CH, CW = (canvas_h, canvas_w) if ds == 1 else (ch2, cw2)
        MAX_IN_FLIGHT = max(2, min(8, (8 * 480 * 384) // max(CH * CW, 1)))
        if pm.tile_rows < 0:
            tile = 0
        elif pm.tile_rows > 0:
            tile = pm.tile_rows
        else:
            tile = pm.tile_auto_rows if CH * CW > pm.tile_auto_px else 0
        pending = []  # (ref, packed device array)

        def drain(ref, packed_dev):
            try:
                packed = np.asarray(packed_dev).astype(np.float32)
            except Exception as e:  # per-image tolerance, patch_match.cc:108-114
                log.warning("patch_match failed for image %d: %s", ref, e)
                return
            d_out[ref] = packed[..., 0]
            # normals are unit with n_z < 0 by construction: reconstruct z
            nx, ny = packed[..., 1], packed[..., 2]
            nz = -np.sqrt(np.maximum(1.0 - nx**2 - ny**2, 0.0))
            n_out[ref] = np.stack([nx, ny, nz], axis=-1)
            c_out[ref] = packed[..., 3]

        for ref in (sorted(refs) if refs is not None else range(n)):
            kwargs = {}
            if depth_bank is not None:
                if depth_bank[ref] is None:
                    continue
                src_d = np.zeros((S, canvas_h, canvas_w), np.float32)
                for si, s in enumerate(window(ref)):
                    if depth_bank[s] is not None:
                        src_d[si] = depth_bank[s]
                kwargs = dict(src_depths=jnp.asarray(src_d),
                              geom_weight=pm.geom_weight,
                              max_geom_error=pm.max_geom_error,
                              init_depth=jnp.asarray(depth_bank[ref]),
                              init_normal=jnp.asarray(normal_bank[ref]))
            elif init_banks is not None and init_banks[0][ref] is not None:
                # coarse-to-fine warm start (upsampled half-res field)
                kwargs = dict(init_depth=jnp.asarray(init_banks[0][ref]),
                              init_normal=jnp.asarray(init_banks[1][ref]))
            problem = build_problem(ref, ds)
            # per-ref key by fold_in, NOT sequential splits: depth maps stay
            # bitwise identical regardless of host sharding / ref subsets
            k = jax.random.fold_in(jax.random.fold_in(key, pass_idx), ref)
            try:
                depth, normal, cost = pm_ops.patch_match_tiled(
                    k, problem, tile_rows=tile, halo_rows=pm.tile_halo,
                    num_iterations=iters or pm.num_iterations,
                    window_radius=pm.window_radius,
                    sigma_spatial=pm.sigma_spatial,
                    sigma_color=pm.sigma_color,
                    sampling=pm.sampling, **kwargs)
                # ONE packed f16 download per image instead of three f32
                # maps (downloads dominate this stage on slow links; f16
                # depth keeps ~5e-4 relative precision vs fusion's 1e-2
                # consistency gate, and unit normals with n_z < 0 need
                # only two components)
                packed_dev = jnp.concatenate(
                    [depth[..., None], normal[..., :2], cost[..., None]],
                    axis=-1).astype(jnp.float16)
            except Exception as e:
                log.warning("patch_match failed for image %d: %s", ref, e)
                continue
            pending.append((ref, packed_dev))
            if len(pending) >= MAX_IN_FLIGHT:
                drain(*pending.pop(0))
        for item in pending:
            drain(*item)
        return d_out, n_out, c_out

    if pm.coarse_to_fine:
        # half-res pass with the full sweep budget (each Jacobi sweep
        # reaches 2x the full-res pixels), then a short full-res refinement
        # from the upsampled field
        dc, nc, _ = run_pass(refs=compute, ds=2, pass_idx=2)
        d_init = [None] * n
        n_init = [None] * n
        for r in range(n):
            if dc[r] is None:
                continue
            d_init[r] = np.repeat(np.repeat(dc[r], 2, 0), 2, 1)[
                :canvas_h, :canvas_w]
            n_init[r] = np.repeat(np.repeat(nc[r], 2, 0), 2, 1)[
                :canvas_h, :canvas_w]
        d_bank, n_bank, c_bank = run_pass(refs=compute,
                                          iters=pm.fine_iterations,
                                          init_banks=(d_init, n_init))
    else:
        d_bank, n_bank, c_bank = run_pass(refs=compute)
    if pm.geom_consistency:
        # COLMAP's second PatchMatch pass: photometric + geometric cost
        d_bank, n_bank, c_bank = run_pass(d_bank, n_bank, c_bank, refs=core,
                                          pass_idx=1)

    depth_maps, normal_maps, cost_maps, out_ids = [], [], [], []
    for ref in sorted(core):
        if d_bank[ref] is None:
            continue
        h, w = int(tab["height"][ref]), int(tab["width"][ref])
        depth_maps.append(d_bank[ref][:h, :w])
        normal_maps.append(n_bank[ref][:h, :w])
        cost_maps.append(c_bank[ref][:h, :w])
        out_ids.append(int(tab["image_id"][ref]))
    store.write_table(out_table, {
        "image_id": np.asarray(out_ids, np.int64),
        "depth_map": depth_maps,
        "normal_map": normal_maps,
        "cost_map": cost_maps,
    }, meta={"stage": "patch_match", "config": vars(pm),
             "depth_maps_per_s": len(out_ids) / max(time.time() - t0, 1e-9)})
    log.info("patch_match: %d depth maps, %.2f maps/s", len(out_ids),
             len(out_ids) / max(time.time() - t0, 1e-9))
    return len(out_ids)


# ---------------------------------------------------------------------------
# stage 8: stereo fusion
# ---------------------------------------------------------------------------

def _load_fusion_input(cfg: PipelineConfig, store: ArtifactStore):
    """Assemble the padded per-view depth/normal/color/pose tensors shared
    by fusion and meshing from the patch_match + prepare tables.

    Returns (FusionInput, ids); ids is empty when no depth maps exist."""
    pm_tab = store.read_table("patch_match")
    prep = store.read_table("prepare_patch_match")
    ids = [int(i) for i in pm_tab["image_id"]]
    if not ids:
        return None, []
    prep_ids = [int(i) for i in prep["image_id"]]
    H = max(d.shape[0] for d in pm_tab["depth_map"])
    W = max(d.shape[1] for d in pm_tab["depth_map"])
    N = len(ids)
    depths = np.zeros((N, H, W), np.float32)
    normals = np.zeros((N, H, W, 3), np.float32)
    colors = np.zeros((N, H, W, 3), np.float32)
    valid = np.zeros((N, H, W), bool)
    qvecs = np.zeros((N, 4))
    tvecs = np.zeros((N, 3))
    Ks = np.zeros((N, 3, 3))
    for n, iid in enumerate(ids):
        pidx = prep_ids.index(iid)
        d = np.asarray(pm_tab["depth_map"][n])
        nm = np.asarray(pm_tab["normal_map"][n])
        c = np.asarray(pm_tab["cost_map"][n])
        bm = np.asarray(prep["bitmap"][pidx])
        h, w = d.shape
        depths[n, :h, :w] = d
        normals[n, :h, :w] = nm
        colors[n, :h, :w] = bm[:h, :w, None]
        # geom-consistency runs carry the fb-error term in the cost; allow
        # a 1 px mean forward-backward error on top of the NCC threshold
        thr = 2.0 - cfg.patch_match.filter_min_ncc
        if cfg.patch_match.geom_consistency:
            thr += cfg.patch_match.geom_weight
        valid[n, :h, :w] = c < thr
        Rm = np.asarray(prep["R"][pidx]).reshape(3, 3)
        # host numpy: the jnp version dispatches an EAGER device program per
        # image (~60 ms of link latency each — it dominated fusion)
        qvecs[n] = geom.np_rotmat_to_quat(Rm)
        tvecs[n] = prep["T"][pidx]
        Ks[n] = np.asarray(prep["K"][pidx]).reshape(3, 3)

    inp = fusion_ops.FusionInput(
        depths=jnp.asarray(depths), normals=jnp.asarray(normals),
        colors=jnp.asarray(colors), qvecs=jnp.asarray(qvecs),
        tvecs=jnp.asarray(tvecs), Ks=jnp.asarray(Ks),
        valid=jnp.asarray(valid))
    return inp, ids


def run_fusion(cfg: PipelineConfig, store: Optional[ArtifactStore] = None,
               ply_path: Optional[str] = None):
    """Fuse all depth maps into a colored point cloud (COLMAP StereoFusion
    semantics via batched consistency voting — ops/fusion.py)."""
    store = store or ArtifactStore(cfg.store_path)
    fu = cfg.fusion
    inp, ids = _load_fusion_input(cfg, store)
    if not ids:
        store.write_table("fused", {
            "xyz": np.zeros((0, 3), np.float32),
            "rgb": np.zeros((0, 3), np.uint8),
            "normal": np.zeros((0, 3), np.float32),
            "num_consistent": np.zeros(0, np.int32),
        }, meta={"stage": "fusion"})
        return 0
    t0 = time.time()
    # bounded voting window (auto: 2x the PatchMatch source window — votes
    # beyond it are rare since depth maps were built from window sources)
    if fu.window == 0:
        win = 2 * cfg.patch_match.overlap
    elif fu.window < 0:
        win = None  # all-pairs
    else:
        win = fu.window
    out = fusion_ops.fuse_depth_maps(
        inp, max_depth_error=fu.max_depth_error,
        max_normal_error_rad=math.radians(fu.max_normal_error_deg),
        min_num_consistent=fu.min_num_consistent, window=win)
    pts = fusion_ops.compact_fused_points_device(out)
    rate = len(pts["xyz"]) / max(time.time() - t0, 1e-9)
    store.write_table("fused", {
        "xyz": pts["xyz"].astype(np.float32),
        "rgb": np.clip(pts["rgb"] * 255, 0, 255).astype(np.uint8),
        "normal": pts["normal"].astype(np.float32),
        "num_consistent": pts["num_consistent"].astype(np.int32),
        "visibility": pts["visibility"],
    }, meta={"stage": "fusion", "fused_points_per_s": rate})
    if ply_path:
        fusion_ops.write_ply(ply_path, pts["xyz"], pts["rgb"], pts["normal"])
    log.info("fusion: %d points, %.0f pts/s", len(pts["xyz"]), rate)
    return len(pts["xyz"])


# ---------------------------------------------------------------------------
# end-to-end driver (the unified pipeline scanner-colmap.py failed to be)
# ---------------------------------------------------------------------------

def run_meshing(cfg: PipelineConfig, store: Optional[ArtifactStore] = None,
                mesh_path: Optional[str] = None):
    """Stage 9: surface mesh from the depth maps — TSDF volumetric fusion
    (device lax.scan over views) + vectorized marching tetrahedra
    (ops/meshing.py). Ships the reference's never-shipped meshing step
    (/root/reference/README.md:69 "Coming soon"; poisson_recon linked but
    unused, CMakeLists.txt:91). Grid bounds come from the fused point
    cloud's robust percentile box, so fusion must run first."""
    store = store or ArtifactStore(cfg.store_path)
    me = cfg.meshing

    def write_empty():
        # single-row table (like the merged-model table): ragged cells
        store.write_table("mesh", {
            "verts": [np.zeros((0, 3), np.float32)],
            "faces": [np.zeros((0, 3), np.int32)],
            "rgb": [np.zeros((0, 3), np.uint8)],
        }, meta={"stage": "meshing"})
        return 0

    inp, ids = _load_fusion_input(cfg, store)
    if not ids:
        return write_empty()
    fused = store.read_table("fused")
    xyz = np.asarray(fused["xyz"])
    if len(xyz) < 16:
        return write_empty()
    p = me.bounds_percentile
    lo = np.percentile(xyz, p, axis=0)
    hi = np.percentile(xyz, 100 - p, axis=0)
    origin, voxel, dims = meshing_ops.grid_from_bounds(
        lo, hi, resolution=me.resolution, margin_voxels=me.margin_voxels)
    t0 = time.time()
    grid = meshing_ops.fuse_tsdf(inp, origin, voxel, dims,
                                 trunc_voxels=me.trunc_voxels)
    t_tsdf = time.time() - t0
    t0 = time.time()
    verts, faces, rgb = meshing_ops.marching_tetrahedra(
        grid, min_weight=me.min_weight)
    t_mc = time.time() - t0
    store.write_table("mesh", {
        "verts": [verts.astype(np.float32)],
        "faces": [faces.astype(np.int32)],
        "rgb": [np.clip(rgb * 255, 0, 255).astype(np.uint8)],
    }, meta={"stage": "meshing", "dims": list(dims),
             "voxel": float(voxel), "tsdf_s": round(t_tsdf, 3),
             "extract_s": round(t_mc, 3)})
    if mesh_path and len(faces):
        meshing_ops.write_ply_mesh(mesh_path, verts, faces, rgb)
    log.info("meshing: %d verts / %d faces on %s grid (tsdf %.2fs, "
             "extract %.2fs)", len(verts), len(faces), dims, t_tsdf, t_mc)
    return len(faces)


def run_all(cfg: PipelineConfig, export_path: Optional[str] = None,
            ply_path: Optional[str] = None, dense: bool = True,
            resume: bool = False, mesh_path: Optional[str] = None,
            mesh: bool = True):
    """End-to-end pipeline. With resume=True, stages whose output table
    already exists are skipped — crash recovery is rerun-from-last-table,
    like the reference's materialized-table model but without force=True
    clobbering everything (SURVEY §5 checkpoint/resume)."""
    store = ArtifactStore(cfg.store_path)

    def need(table):
        return not (resume and store.has_table(table))

    if need("frames"):
        prepare_images(cfg, store)
    if need("extraction"):
        run_extraction(cfg, store)
    if need("matching"):
        run_matching(cfg, store)
    if need("mapping"):
        run_mapping(cfg, store)
    if need("models"):
        model = run_merge(cfg, store, export_path=export_path)
    else:
        model = load_model(store)
    if dense:
        if need("prepare_patch_match"):
            run_prepare_patch_match(cfg, store)
        if need("patch_match"):
            run_patch_match(cfg, store)
        if need("fused"):
            run_fusion(cfg, store, ply_path=ply_path)
        if mesh and need("mesh"):
            run_meshing(cfg, store, mesh_path=mesh_path)
    return model
