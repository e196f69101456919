// Native correspondence graph + track bookkeeping for the SfM engine.
//
// This is the framework's C++ runtime component: the role COLMAP's
// CorrespondenceGraph/DatabaseCache plays for the reference's mapping kernel
// (/root/reference/integration/op_cpp/incremental_mapping.cc:194-293, via a
// temp SQLite database) — rebuilt as an in-memory, index-based structure
// with a C ABI consumed from Python over ctypes. It owns:
//
//   - per-(image, keypoint) correspondence adjacency
//   - image registration state and per-keypoint 3D-point assignments
//   - the hot scans of the incremental loop: next-image ranking
//     (num_visible_points), 2D-3D correspondence collection for PnP,
//     and candidate-track gathering for triangulation
//
// The Python engine keeps a pure-Python fallback (engine/correspondence.py);
// this library accelerates the same contract. No exceptions across the ABI;
// all queries are bounds-checked and return counts.
//
// Build: see native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Corr {
  int32_t image;  // dense image index
  int32_t kp;
};

struct ImageData {
  int64_t image_id = -1;
  std::vector<std::vector<Corr>> corrs;  // per keypoint
  std::vector<int64_t> point3d;          // per keypoint, -1 = none
  bool registered = false;
  int64_t num_correspondences = 0;
};

struct CorrGraph {
  std::vector<ImageData> images;
  std::unordered_map<int64_t, int32_t> id_to_idx;
  std::unordered_map<uint64_t, int64_t> pair_inliers;  // key = lo<<32|hi idx

  int32_t idx(int64_t image_id) const {
    auto it = id_to_idx.find(image_id);
    return it == id_to_idx.end() ? -1 : it->second;
  }
};

uint64_t pair_key(int32_t a, int32_t b) {
  if (a > b) std::swap(a, b);
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

}  // namespace

extern "C" {

CorrGraph* cg_new() { return new CorrGraph(); }

void cg_free(CorrGraph* g) { delete g; }

void cg_add_image(CorrGraph* g, int64_t image_id, int64_t num_keypoints) {
  if (g->idx(image_id) >= 0) return;
  int32_t i = static_cast<int32_t>(g->images.size());
  g->images.emplace_back();
  ImageData& im = g->images.back();
  im.image_id = image_id;
  im.corrs.resize(num_keypoints);
  im.point3d.assign(num_keypoints, -1);
  g->id_to_idx[image_id] = i;
}

int64_t cg_num_images(CorrGraph* g) {
  return static_cast<int64_t>(g->images.size());
}

int64_t cg_num_keypoints(CorrGraph* g, int64_t image_id) {
  int32_t i = g->idx(image_id);
  return i < 0 ? -1 : static_cast<int64_t>(g->images[i].corrs.size());
}

// pairs: (n, 2) int32 keypoint index pairs; negative entries skipped.
int64_t cg_add_matches(CorrGraph* g, int64_t id1, int64_t id2,
                       const int32_t* pairs, int64_t n) {
  int32_t i1 = g->idx(id1), i2 = g->idx(id2);
  if (i1 < 0 || i2 < 0 || i1 == i2) return 0;
  ImageData& a = g->images[i1];
  ImageData& b = g->images[i2];
  int64_t added = 0;
  for (int64_t r = 0; r < n; ++r) {
    int32_t k1 = pairs[2 * r], k2 = pairs[2 * r + 1];
    if (k1 < 0 || k2 < 0) continue;
    if (k1 >= static_cast<int64_t>(a.corrs.size())) continue;
    if (k2 >= static_cast<int64_t>(b.corrs.size())) continue;
    a.corrs[k1].push_back({i2, k2});
    b.corrs[k2].push_back({i1, k1});
    ++added;
  }
  a.num_correspondences += added;
  b.num_correspondences += added;
  g->pair_inliers[pair_key(i1, i2)] += added;
  return added;
}

int64_t cg_num_correspondences(CorrGraph* g, int64_t image_id) {
  int32_t i = g->idx(image_id);
  return i < 0 ? -1 : g->images[i].num_correspondences;
}

int64_t cg_num_pair_inliers(CorrGraph* g, int64_t id1, int64_t id2) {
  int32_t i1 = g->idx(id1), i2 = g->idx(id2);
  if (i1 < 0 || i2 < 0) return 0;
  auto it = g->pair_inliers.find(pair_key(i1, i2));
  return it == g->pair_inliers.end() ? 0 : it->second;
}

// Fills out_img (image ids) and out_kp; returns count (clamped to cap).
int64_t cg_get_corrs(CorrGraph* g, int64_t image_id, int64_t kp,
                     int64_t* out_img, int32_t* out_kp, int64_t cap) {
  int32_t i = g->idx(image_id);
  if (i < 0 || kp < 0 ||
      kp >= static_cast<int64_t>(g->images[i].corrs.size()))
    return 0;
  const auto& cs = g->images[i].corrs[kp];
  int64_t n = 0;
  for (const Corr& c : cs) {
    if (n >= cap) break;
    out_img[n] = g->images[c.image].image_id;
    out_kp[n] = c.kp;
    ++n;
  }
  return n;
}

// ---- registration / point-assignment state -------------------------------

void cg_set_registered(CorrGraph* g, int64_t image_id, int32_t reg) {
  int32_t i = g->idx(image_id);
  if (i >= 0) g->images[i].registered = reg != 0;
}

int32_t cg_is_registered(CorrGraph* g, int64_t image_id) {
  int32_t i = g->idx(image_id);
  return (i >= 0 && g->images[i].registered) ? 1 : 0;
}

void cg_set_point(CorrGraph* g, int64_t image_id, int64_t kp, int64_t pid) {
  int32_t i = g->idx(image_id);
  if (i >= 0 && kp >= 0 &&
      kp < static_cast<int64_t>(g->images[i].point3d.size()))
    g->images[i].point3d[kp] = pid;
}

int64_t cg_get_point(CorrGraph* g, int64_t image_id, int64_t kp) {
  int32_t i = g->idx(image_id);
  if (i < 0 || kp < 0 ||
      kp >= static_cast<int64_t>(g->images[i].point3d.size()))
    return -1;
  return g->images[i].point3d[kp];
}

// ---- hot scans of the incremental loop -----------------------------------

// Keypoints of image_id whose correspondences reach a triangulated point.
int64_t cg_num_visible_points(CorrGraph* g, int64_t image_id) {
  int32_t i = g->idx(image_id);
  if (i < 0) return 0;
  const ImageData& im = g->images[i];
  int64_t n = 0;
  for (const auto& cs : im.corrs) {
    for (const Corr& c : cs) {
      if (g->images[c.image].point3d[c.kp] >= 0) {
        ++n;
        break;
      }
    }
  }
  return n;
}

// 2D-3D correspondences for PnP registration: for each keypoint, the first
// 3D point reached through a REGISTERED image. Fills kp_idx + pid arrays.
int64_t cg_corrs_2d3d(CorrGraph* g, int64_t image_id, int32_t* out_kp,
                      int64_t* out_pid, int64_t cap) {
  int32_t i = g->idx(image_id);
  if (i < 0) return 0;
  const ImageData& im = g->images[i];
  int64_t n = 0;
  for (size_t kp = 0; kp < im.corrs.size() && n < cap; ++kp) {
    for (const Corr& c : im.corrs[kp]) {
      const ImageData& other = g->images[c.image];
      if (!other.registered) continue;
      int64_t pid = other.point3d[c.kp];
      if (pid >= 0) {
        out_kp[n] = static_cast<int32_t>(kp);
        out_pid[n] = pid;
        ++n;
        break;
      }
    }
  }
  return n;
}

// Track continuation candidates: unassigned keypoints of image_id whose
// correspondence chain reaches an existing point via a registered image.
int64_t cg_continuations(CorrGraph* g, int64_t image_id, int32_t* out_kp,
                         int64_t* out_pid, int64_t cap) {
  int32_t i = g->idx(image_id);
  if (i < 0) return 0;
  const ImageData& im = g->images[i];
  int64_t n = 0;
  for (size_t kp = 0; kp < im.corrs.size() && n < cap; ++kp) {
    if (im.point3d[kp] >= 0) continue;
    for (const Corr& c : im.corrs[kp]) {
      const ImageData& other = g->images[c.image];
      if (!other.registered) continue;
      int64_t pid = other.point3d[c.kp];
      if (pid >= 0) {
        out_kp[n] = static_cast<int32_t>(kp);
        out_pid[n] = pid;
        ++n;
        break;
      }
    }
  }
  return n;
}

// Candidate NEW tracks from image_id: for each unassigned keypoint with at
// least one registered unassigned partner, emit a flattened track:
//   out_offsets[t], out_offsets[t+1] delimit track t in (out_img, out_kp)
// The first element of each track is (image_id, kp). Returns track count.
int64_t cg_new_track_candidates(CorrGraph* g, int64_t image_id,
                                int64_t* out_offsets, int64_t* out_img,
                                int32_t* out_kp, int64_t max_tracks,
                                int64_t max_elems) {
  int32_t i = g->idx(image_id);
  if (i < 0) return 0;
  const ImageData& im = g->images[i];
  int64_t t = 0, e = 0;
  for (size_t kp = 0; kp < im.corrs.size(); ++kp) {
    if (t >= max_tracks) break;
    if (im.point3d[kp] >= 0) continue;
    int64_t start = e;
    if (e < max_elems) {
      out_img[e] = image_id;
      out_kp[e] = static_cast<int32_t>(kp);
      ++e;
    } else {
      break;
    }
    for (const Corr& c : im.corrs[kp]) {
      if (e >= max_elems) break;
      const ImageData& other = g->images[c.image];
      if (!other.registered || other.point3d[c.kp] >= 0) continue;
      out_img[e] = other.image_id;
      out_kp[e] = c.kp;
      ++e;
    }
    if (e - start >= 2) {
      out_offsets[t] = start;
      out_offsets[t + 1] = e;
      ++t;
    } else {
      e = start;  // roll back singleton
    }
  }
  return t;
}

// Track-completion candidates over the WHOLE graph (one call replaces a
// per-observation python scan): every unassigned keypoint (j, kj) on a
// REGISTERED image whose correspondences reach an assigned point pid emits
// (image_id_j, kj, pid). Emits each distinct (kp, pid) pair once; a keypoint
// can appear with several candidate pids (the caller keeps the first that
// fits geometrically). Returns count (clamped to cap).
int64_t cg_complete_candidates(CorrGraph* g, int64_t* out_img,
                               int32_t* out_kp, int64_t* out_pid,
                               int64_t cap) {
  int64_t n = 0;
  for (const ImageData& im : g->images) {
    if (!im.registered) continue;
    for (size_t kp = 0; kp < im.corrs.size(); ++kp) {
      if (im.point3d[kp] >= 0) continue;
      int64_t last_pid = -1;  // corrs from one pair are grouped; cheap dedup
      for (const Corr& c : im.corrs[kp]) {
        int64_t pid = g->images[c.image].point3d[c.kp];
        if (pid < 0 || pid == last_pid) continue;
        if (n >= cap) return n;
        out_img[n] = im.image_id;
        out_kp[n] = static_cast<int32_t>(kp);
        out_pid[n] = pid;
        ++n;
        last_pid = pid;
      }
    }
  }
  return n;
}

// Track-merge candidates: correspondence edges whose endpoints carry two
// DIFFERENT assigned points on registered images. Emits unique unordered
// (pid_a < pid_b) pairs. Returns count (clamped to cap).
int64_t cg_merge_candidates(CorrGraph* g, int64_t* out_pid_a,
                            int64_t* out_pid_b, int64_t cap) {
  std::unordered_set<uint64_t> seen;
  int64_t n = 0;
  for (size_t ii = 0; ii < g->images.size(); ++ii) {
    const ImageData& im = g->images[ii];
    if (!im.registered) continue;
    for (size_t kp = 0; kp < im.corrs.size(); ++kp) {
      int64_t pa = im.point3d[kp];
      if (pa < 0) continue;
      for (const Corr& c : im.corrs[kp]) {
        if (static_cast<size_t>(c.image) < ii) continue;  // each edge once
        const ImageData& other = g->images[c.image];
        if (!other.registered) continue;
        int64_t pb = other.point3d[c.kp];
        if (pb < 0 || pb == pa) continue;
        int64_t lo = pa < pb ? pa : pb, hi = pa < pb ? pb : pa;
        uint64_t key = (static_cast<uint64_t>(lo) << 32) ^
                       static_cast<uint64_t>(hi);
        if (!seen.insert(key).second) continue;
        if (n >= cap) return n;
        out_pid_a[n] = lo;
        out_pid_b[n] = hi;
        ++n;
      }
    }
  }
  return n;
}

}  // extern "C"
