// Native binned-SAH BVH builder.
//
// TPU-native replacement for the accel-structure build the reference
// delegates to optixAccelBuild (/root/reference/fredholm/include/fredholm/
// renderer.h:434-552). The Python builder (fredholm_tpu/accel/bvh.py) is
// fine for small scenes; this C++ implementation handles multi-million-
// triangle scenes at native speed and is loaded via ctypes
// (fredholm_tpu/accel/native.py), with identical output layout:
// preorder node arrays + reordered primitive list.
//
// Build: see native/Makefile (produces libbvh.so).

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int N_BINS = 16;

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct AABB {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const AABB &o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(const Vec3 &p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Node {
  AABB bounds;
  int32_t left = -1, right = -1;
  int32_t leaf_start = 0, leaf_count = 0;
  int32_t axis = 0;
};

struct Builder {
  const float *tri_lo;  // [F,3]
  const float *tri_hi;  // [F,3]
  std::vector<Vec3> centroid;
  std::vector<int64_t> order;
  std::vector<Node> nodes;
  int leaf_size;

  AABB prim_bounds(int64_t i) const {
    AABB b;
    b.lo = {tri_lo[3 * i], tri_lo[3 * i + 1], tri_lo[3 * i + 2]};
    b.hi = {tri_hi[3 * i], tri_hi[3 * i + 1], tri_hi[3 * i + 2]};
    return b;
  }

  int build(int64_t start, int64_t end) {
    int node_id = (int)nodes.size();
    nodes.emplace_back();

    AABB bounds, cbounds;
    for (int64_t k = start; k < end; ++k) {
      bounds.grow(prim_bounds(order[k]));
      cbounds.grow(centroid[order[k]]);
    }
    nodes[node_id].bounds = bounds;
    int64_t count = end - start;
    if (count <= leaf_size) {
      nodes[node_id].leaf_start = (int32_t)start;
      nodes[node_id].leaf_count = (int32_t)count;
      return node_id;
    }

    // binned SAH over all 3 axes
    float best_cost = FLT_MAX;
    int best_axis = -1, best_split = -1;
    float ext[3] = {cbounds.hi.x - cbounds.lo.x, cbounds.hi.y - cbounds.lo.y,
                    cbounds.hi.z - cbounds.lo.z};
    const float clo[3] = {cbounds.lo.x, cbounds.lo.y, cbounds.lo.z};
    for (int ax = 0; ax < 3; ++ax) {
      if (ext[ax] <= 0.f) continue;
      float scale = N_BINS / ext[ax];
      AABB bins[N_BINS];
      int64_t bin_count[N_BINS] = {0};
      for (int64_t k = start; k < end; ++k) {
        const Vec3 &c = centroid[order[k]];
        float cc = ax == 0 ? c.x : (ax == 1 ? c.y : c.z);
        int b = std::min((int)((cc - clo[ax]) * scale), N_BINS - 1);
        bins[b].grow(prim_bounds(order[k]));
        bin_count[b]++;
      }
      AABB right_acc[N_BINS];
      AABB acc;
      for (int b = N_BINS - 1; b >= 1; --b) {
        acc.grow(bins[b]);
        right_acc[b] = acc;
      }
      AABB left_acc;
      int64_t n_left = 0;
      for (int s = 0; s < N_BINS - 1; ++s) {
        left_acc.grow(bins[s]);
        n_left += bin_count[s];
        int64_t n_right = count - n_left;
        if (n_left == 0 || n_right == 0) continue;
        float cost =
            left_acc.area() * n_left + right_acc[s + 1].area() * n_right;
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = ax;
          best_split = s;
        }
      }
    }

    int64_t mid;
    if (best_axis < 0) {
      mid = start + count / 2;
    } else {
      float scale = N_BINS / ext[best_axis];
      auto it = std::partition(
          order.begin() + start, order.begin() + end, [&](int64_t i) {
            const Vec3 &c = centroid[i];
            float cc =
                best_axis == 0 ? c.x : (best_axis == 1 ? c.y : c.z);
            int b =
                std::min((int)((cc - clo[best_axis]) * scale), N_BINS - 1);
            return b <= best_split;
          });
      mid = it - order.begin();
      if (mid == start || mid == end) mid = start + count / 2;
    }

    nodes[node_id].axis = best_axis >= 0 ? best_axis : 0;
    int l = build(start, mid);
    int r = build(mid, end);
    nodes[node_id].left = l;
    nodes[node_id].right = r;
    return node_id;
  }
};

}  // namespace

extern "C" {

// Builds the BVH. Returns node count. Output arrays must be preallocated
// for the worst case of 2*F nodes; prim_order must hold F entries.
int64_t bvh_build(const float *tri_lo, const float *tri_hi, int64_t n_tris,
                  int32_t leaf_size, float *out_bounds_min,
                  float *out_bounds_max, int32_t *out_left,
                  int32_t *out_right, int32_t *out_leaf_start,
                  int32_t *out_leaf_count, int32_t *out_axis,
                  int32_t *out_prim_order) {
  Builder b;
  b.tri_lo = tri_lo;
  b.tri_hi = tri_hi;
  b.leaf_size = leaf_size;
  b.centroid.resize(n_tris);
  b.order.resize(n_tris);
  for (int64_t i = 0; i < n_tris; ++i) {
    b.centroid[i] = {0.5f * (tri_lo[3 * i] + tri_hi[3 * i]),
                     0.5f * (tri_lo[3 * i + 1] + tri_hi[3 * i + 1]),
                     0.5f * (tri_lo[3 * i + 2] + tri_hi[3 * i + 2])};
    b.order[i] = i;
  }
  b.nodes.reserve(2 * n_tris);
  b.build(0, n_tris);

  int64_t n = (int64_t)b.nodes.size();
  for (int64_t i = 0; i < n; ++i) {
    const Node &nd = b.nodes[i];
    out_bounds_min[3 * i] = nd.bounds.lo.x;
    out_bounds_min[3 * i + 1] = nd.bounds.lo.y;
    out_bounds_min[3 * i + 2] = nd.bounds.lo.z;
    out_bounds_max[3 * i] = nd.bounds.hi.x;
    out_bounds_max[3 * i + 1] = nd.bounds.hi.y;
    out_bounds_max[3 * i + 2] = nd.bounds.hi.z;
    out_left[i] = nd.left;
    out_right[i] = nd.right;
    out_leaf_start[i] = nd.leaf_start;
    out_leaf_count[i] = nd.leaf_count;
    out_axis[i] = nd.axis;
  }
  for (int64_t i = 0; i < n_tris; ++i)
    out_prim_order[i] = (int32_t)b.order[i];
  return n;
}

// Bottom-up refit of node bounds for animated geometry (topology kept),
// the analog of the per-frame IAS rebuild (renderer.h:614-640).
void bvh_refit(const float *tri_lo, const float *tri_hi, int64_t n_nodes,
               const int32_t *left, const int32_t *right,
               const int32_t *leaf_start, const int32_t *leaf_count,
               const int32_t *prim_order, float *bounds_min,
               float *bounds_max) {
  for (int64_t i = n_nodes - 1; i >= 0; --i) {
    AABB b;
    if (left[i] < 0) {
      for (int32_t k = 0; k < leaf_count[i]; ++k) {
        int32_t p = prim_order[leaf_start[i] + k];
        AABB pb;
        pb.lo = {tri_lo[3 * p], tri_lo[3 * p + 1], tri_lo[3 * p + 2]};
        pb.hi = {tri_hi[3 * p], tri_hi[3 * p + 1], tri_hi[3 * p + 2]};
        b.grow(pb);
      }
    } else {
      AABB lb, rb;
      int32_t l = left[i], r = right[i];
      lb.lo = {bounds_min[3 * l], bounds_min[3 * l + 1], bounds_min[3 * l + 2]};
      lb.hi = {bounds_max[3 * l], bounds_max[3 * l + 1], bounds_max[3 * l + 2]};
      rb.lo = {bounds_min[3 * r], bounds_min[3 * r + 1], bounds_min[3 * r + 2]};
      rb.hi = {bounds_max[3 * r], bounds_max[3 * r + 1], bounds_max[3 * r + 2]};
      b.grow(lb);
      b.grow(rb);
    }
    bounds_min[3 * i] = b.lo.x;
    bounds_min[3 * i + 1] = b.lo.y;
    bounds_min[3 * i + 2] = b.lo.z;
    bounds_max[3 * i] = b.hi.x;
    bounds_max[3 * i + 1] = b.hi.y;
    bounds_max[3 * i + 2] = b.hi.z;
  }
}

// Fill the clustered traversal's triangle-block SoA from the cached
// slot->prim permutation (accel/cluster.py _fill_blocks twin): rows 0-8 =
// v0/e1/e2 components, row 9 = prim id (-1 pad), rows 10-15 = 16-triangle
// sub-group AABBs in the first n_slots/16-per-cluster columns. One memory
// pass; the hot per-frame cost of the animation refit path.
void blocks_fill(const int64_t *perm, const float *v0, const float *e1,
                 const float *e2, const int64_t *prim_ids, int64_t n_slots,
                 int64_t cluster_size, int64_t tri_group, float *blocks) {
  const float INF = 1e30f;
  float *rows[16];
  for (int r = 0; r < 16; ++r) rows[r] = blocks + r * n_slots;
  int64_t n_groups_per_cluster = cluster_size / tri_group;
  for (int64_t i = 0; i < n_slots; ++i) {
    rows[10][i] = INF;
    rows[11][i] = INF;
    rows[12][i] = INF;
    rows[13][i] = -INF;
    rows[14][i] = -INF;
    rows[15][i] = -INF;
  }
  for (int64_t g0 = 0; g0 < n_slots; g0 += tri_group) {
    float glo[3] = {INF, INF, INF};
    float ghi[3] = {-INF, -INF, -INF};
    for (int64_t i = g0; i < g0 + tri_group; ++i) {
      int64_t p = perm[i];
      if (p < 0) {
        for (int r = 0; r < 9; ++r) rows[r][i] = 0.0f;
        rows[9][i] = -1.0f;
        continue;
      }
      float a[3], b[3], c[3];
      for (int k = 0; k < 3; ++k) {
        a[k] = v0[3 * p + k];
        b[k] = e1[3 * p + k];
        c[k] = e2[3 * p + k];
        rows[k][i] = a[k];
        rows[3 + k][i] = b[k];
        rows[6 + k][i] = c[k];
        float p1 = a[k] + b[k], p2 = a[k] + c[k];
        float lo = a[k] < p1 ? a[k] : p1;
        lo = lo < p2 ? lo : p2;
        float hi = a[k] > p1 ? a[k] : p1;
        hi = hi > p2 ? hi : p2;
        if (lo < glo[k]) glo[k] = lo;
        if (hi > ghi[k]) ghi[k] = hi;
      }
      rows[9][i] = (float)prim_ids[p];
    }
    // group g of cluster ci lives in column ci*cluster_size + g
    int64_t gidx = g0 / tri_group;
    int64_t ci = gidx / n_groups_per_cluster;
    int64_t g = gidx % n_groups_per_cluster;
    int64_t col = ci * cluster_size + g;
    for (int k = 0; k < 3; ++k) {
      rows[10 + k][col] = glo[k];
      rows[13 + k][col] = ghi[k];
    }
  }
}

}  // extern "C"
