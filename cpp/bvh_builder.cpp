// Native binned-SAH BVH builder.
//
// C++ counterpart of the reference's SAH tree compiler
// (/root/reference/include/mitsuba/render/gkdtree.h min-max binning +
// greedy SAH, sahkdtree3.h) for the host-side scene-compile step: the
// Python builder in accel/bvh.py is the (identical-algorithm) fallback;
// this one is ~100x faster on large meshes.  Compiled by
// mitsuba_path_guiding_tpu/accel/native.py with g++ -O3 and loaded via
// ctypes (no pybind11 dependency).
//
// Layout matches scene/types.py::BVH:
//   internal node i: child0[i], child1[i] >= 0
//   leaf node     i: child0[i] = -(prim_start+1), child1[i] = -prim_count
#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int N_BINS = 16;
constexpr int MAX_LEAF = 4;

struct V3 {
  float x, y, z;
};

static inline V3 vmin(const V3 &a, const V3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3 &a, const V3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Builder {
  const V3 *tri_min, *tri_max, *centroid;
  float *node_min, *node_max;
  int32_t *child0, *child1, *prim_idx;
  int n_nodes = 0, n_prims_out = 0, max_depth = 0, max_nodes;

  int build(std::vector<int32_t> &idx, int lo, int hi, int depth) {
    if (n_nodes >= max_nodes) return -1;
    const int node = n_nodes++;
    V3 bmin = {FLT_MAX, FLT_MAX, FLT_MAX}, bmax = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int i = lo; i < hi; ++i) {
      bmin = vmin(bmin, tri_min[idx[i]]);
      bmax = vmax(bmax, tri_max[idx[i]]);
    }
    node_min[node * 3 + 0] = bmin.x;
    node_min[node * 3 + 1] = bmin.y;
    node_min[node * 3 + 2] = bmin.z;
    node_max[node * 3 + 0] = bmax.x;
    node_max[node * 3 + 1] = bmax.y;
    node_max[node * 3 + 2] = bmax.z;
    max_depth = std::max(max_depth, depth);

    const int n = hi - lo;
    if (n <= MAX_LEAF) {
      child0[node] = -(n_prims_out + 1);
      child1[node] = -n;
      for (int i = lo; i < hi; ++i) prim_idx[n_prims_out++] = idx[i];
      return node;
    }

    // centroid bounds + widest axis
    V3 cmin = {FLT_MAX, FLT_MAX, FLT_MAX}, cmax = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int i = lo; i < hi; ++i) {
      cmin = vmin(cmin, centroid[idx[i]]);
      cmax = vmax(cmax, centroid[idx[i]]);
    }
    const float ext[3] = {cmax.x - cmin.x, cmax.y - cmin.y, cmax.z - cmin.z};
    int axis = 0;
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;

    int mid;
    if (ext[axis] < 1e-12f) {
      mid = lo + n / 2;  // degenerate spread: median split
      std::nth_element(idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
                       [&](int a, int b) {
                         const float *ca = &centroid[a].x;
                         const float *cb = &centroid[b].x;
                         return ca[axis] < cb[axis];
                       });
    } else {
      const float c0 = (&cmin.x)[axis];
      const float scale = N_BINS * (1.0f - 1e-6f) / ext[axis];
      int counts[N_BINS] = {0};
      V3 bmin_b[N_BINS], bmax_b[N_BINS];
      for (int b = 0; b < N_BINS; ++b) {
        bmin_b[b] = {FLT_MAX, FLT_MAX, FLT_MAX};
        bmax_b[b] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
      }
      for (int i = lo; i < hi; ++i) {
        int b = (int)(((&centroid[idx[i]].x)[axis] - c0) * scale);
        b = std::max(0, std::min(N_BINS - 1, b));
        counts[b]++;
        bmin_b[b] = vmin(bmin_b[b], tri_min[idx[i]]);
        bmax_b[b] = vmax(bmax_b[b], tri_max[idx[i]]);
      }
      auto area = [](const V3 &lo_, const V3 &hi_) {
        const float dx = std::max(hi_.x - lo_.x, 0.0f);
        const float dy = std::max(hi_.y - lo_.y, 0.0f);
        const float dz = std::max(hi_.z - lo_.z, 0.0f);
        return 2.0f * (dx * dy + dy * dz + dx * dz);
      };
      // prefix/suffix sweeps
      float lcost[N_BINS], rcost[N_BINS];
      {
        V3 amin = {FLT_MAX, FLT_MAX, FLT_MAX}, amax = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        int cnt = 0;
        for (int b = 0; b < N_BINS; ++b) {
          if (counts[b]) {
            amin = vmin(amin, bmin_b[b]);
            amax = vmax(amax, bmax_b[b]);
          }
          cnt += counts[b];
          lcost[b] = cnt ? area(amin, amax) * cnt : FLT_MAX;
        }
        amin = {FLT_MAX, FLT_MAX, FLT_MAX};
        amax = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        cnt = 0;
        for (int b = N_BINS - 1; b >= 0; --b) {
          if (counts[b]) {
            amin = vmin(amin, bmin_b[b]);
            amax = vmax(amax, bmax_b[b]);
          }
          cnt += counts[b];
          rcost[b] = cnt ? area(amin, amax) * cnt : FLT_MAX;
        }
      }
      int best = -1;
      float best_cost = FLT_MAX;
      for (int s = 0; s < N_BINS - 1; ++s) {
        if (lcost[s] == FLT_MAX || rcost[s + 1] == FLT_MAX) continue;
        const float c = lcost[s] + rcost[s + 1];
        if (c < best_cost) {
          best_cost = c;
          best = s;
        }
      }
      if (best < 0) {
        mid = lo + n / 2;
        std::nth_element(idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
                         [&](int a, int b) {
                           return (&centroid[a].x)[axis] < (&centroid[b].x)[axis];
                         });
      } else {
        auto it = std::partition(idx.begin() + lo, idx.begin() + hi, [&](int t) {
          int b = (int)(((&centroid[t].x)[axis] - c0) * scale);
          b = std::max(0, std::min(N_BINS - 1, b));
          return b <= best;
        });
        mid = (int)(it - idx.begin());
        if (mid == lo || mid == hi) mid = lo + n / 2;  // safety
      }
    }

    const int c0i = build(idx, lo, mid, depth + 1);
    const int c1i = build(idx, mid, hi, depth + 1);
    child0[node] = c0i;
    child1[node] = c1i;
    return node;
  }
};

}  // namespace

extern "C" int build_bvh_native(
    const float *p0, const float *e1, const float *e2, int n_tris,
    float box_pad,
    float *node_min, float *node_max, int32_t *child0, int32_t *child1,
    int32_t *prim_idx, int max_nodes, int32_t *out_n_nodes,
    int32_t *out_max_depth) {
  std::vector<V3> tmin(n_tris), tmax(n_tris), cent(n_tris);
  for (int i = 0; i < n_tris; ++i) {
    const V3 a = {p0[i * 3], p0[i * 3 + 1], p0[i * 3 + 2]};
    const V3 b = {a.x + e1[i * 3], a.y + e1[i * 3 + 1], a.z + e1[i * 3 + 2]};
    const V3 c = {a.x + e2[i * 3], a.y + e2[i * 3 + 1], a.z + e2[i * 3 + 2]};
    V3 lo = vmin(vmin(a, b), c), hi = vmax(vmax(a, b), c);
    cent[i] = {(lo.x + hi.x) * 0.5f, (lo.y + hi.y) * 0.5f, (lo.z + hi.z) * 0.5f};
    lo = {lo.x - box_pad, lo.y - box_pad, lo.z - box_pad};
    hi = {hi.x + box_pad, hi.y + box_pad, hi.z + box_pad};
    tmin[i] = lo;
    tmax[i] = hi;
  }
  std::vector<int32_t> idx(n_tris);
  for (int i = 0; i < n_tris; ++i) idx[i] = i;

  Builder b;
  b.tri_min = tmin.data();
  b.tri_max = tmax.data();
  b.centroid = cent.data();
  b.node_min = node_min;
  b.node_max = node_max;
  b.child0 = child0;
  b.child1 = child1;
  b.prim_idx = prim_idx;
  b.max_nodes = max_nodes;
  const int root = b.build(idx, 0, n_tris, 0);
  if (root != 0) return 1;  // overflow or unexpected root
  *out_n_nodes = b.n_nodes;
  *out_max_depth = b.max_depth;
  return 0;
}
