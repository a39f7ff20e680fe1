// d3ga_native: host-side geometry kernels for the asset pipeline.
//
// TPU-native replacements for the reference's CUDA/C++ submodules
// (tetra-sampler BVH point-in-tet queries, simple-knn, and the
// voxelize/marching-cubes/TetGen cage pipeline — see SURVEY.md §2.1):
//
//   * knn_mean_sq_dist  — kd-tree K-nearest-neighbor distances
//   * embed_points_in_tets — BVH-accelerated point-in-tetrahedron
//     barycentric assignment (replaces Zielon/bvh + tetra_sampler's
//     compute_bary, /root/reference/lib/cage.py:325-327)
//   * voxelize_mesh — conservative triangle voxelization + outside
//     flood-fill -> solid occupancy grid (replaces trimesh.voxel in
//     /root/reference/cager/ops.py:63-101)
//   * marching_tetrahedra — isosurface triangles from an SDF/occupancy
//     grid using the 6-tet cube split (replaces PyMCubes; tetrahedra
//     cases are derived from first principles, no 256-entry tables)
//
// Exposed as a plain C API for ctypes (no pybind11 in this image).

#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// kd-tree KNN

struct KDNode {
  int axis;
  float split;
  int left, right;    // child node indices, -1 if leaf
  int start, count;   // leaf range into the index array
};

struct KDTree {
  std::vector<KDNode> nodes;
  std::vector<int> idx;
  const float* pts;
  int n;

  int build(int start, int count, int depth) {
    KDNode node;
    if (count <= 16) {
      node.axis = -1;
      node.left = node.right = -1;
      node.start = start;
      node.count = count;
      nodes.push_back(node);
      return (int)nodes.size() - 1;
    }
    int axis = depth % 3;
    int mid = count / 2;
    std::nth_element(
        idx.begin() + start, idx.begin() + start + mid, idx.begin() + start + count,
        [&](int a, int b) { return pts[3 * a + axis] < pts[3 * b + axis]; });
    node.axis = axis;
    node.split = pts[3 * idx[start + mid] + axis];
    node.start = start;
    node.count = count;
    int self = (int)nodes.size();
    nodes.push_back(node);
    int l = build(start, mid, depth + 1);
    int r = build(start + mid, count - mid, depth + 1);
    nodes[self].left = l;
    nodes[self].right = r;
    return self;
  }
};

static void knn_search(const KDTree& tree, int node_id, const float* q, int k,
                       std::vector<std::pair<float, int>>& heap, int exclude) {
  const KDNode& node = tree.nodes[node_id];
  if (node.axis < 0) {
    for (int i = node.start; i < node.start + node.count; ++i) {
      int pi = tree.idx[i];
      if (pi == exclude) continue;
      const float* p = tree.pts + 3 * pi;
      float d2 = (p[0] - q[0]) * (p[0] - q[0]) + (p[1] - q[1]) * (p[1] - q[1]) +
                 (p[2] - q[2]) * (p[2] - q[2]);
      if ((int)heap.size() < k) {
        heap.push_back({d2, pi});
        std::push_heap(heap.begin(), heap.end());
      } else if (d2 < heap.front().first) {
        std::pop_heap(heap.begin(), heap.end());
        heap.back() = {d2, pi};
        std::push_heap(heap.begin(), heap.end());
      }
    }
    return;
  }
  float diff = q[node.axis] - node.split;
  int first = diff < 0 ? node.left : node.right;
  int second = diff < 0 ? node.right : node.left;
  knn_search(tree, first, q, k, heap, exclude);
  if ((int)heap.size() < k || diff * diff < heap.front().first)
    knn_search(tree, second, q, k, heap, exclude);
}

// mean squared distance to the k nearest neighbors of each point
// (simple-knn distCUDA2 semantics with k=3).
void knn_mean_sq_dist(const float* pts, int n, int k, float* out) {
  KDTree tree;
  tree.pts = pts;
  tree.n = n;
  tree.idx.resize(n);
  for (int i = 0; i < n; ++i) tree.idx[i] = i;
  tree.build(0, n, 0);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    std::vector<std::pair<float, int>> heap;
    heap.reserve(k + 1);
    knn_search(tree, 0, pts + 3 * i, k, heap, i);
    float s = 0.f;
    for (auto& h : heap) s += h.first;
    out[i] = std::max(s / std::max((int)heap.size(), 1), 1e-7f);
  }
}

// generic knn: indices of the k nearest points for each query
void knn_query(const float* pts, int n, const float* queries, int m, int k,
               int* out_idx) {
  KDTree tree;
  tree.pts = pts;
  tree.n = n;
  tree.idx.resize(n);
  for (int i = 0; i < n; ++i) tree.idx[i] = i;
  tree.build(0, n, 0);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < m; ++i) {
    std::vector<std::pair<float, int>> heap;
    heap.reserve(k + 1);
    knn_search(tree, 0, queries + 3 * i, k, heap, -1);
    std::sort_heap(heap.begin(), heap.end());
    for (int j = 0; j < k; ++j)
      out_idx[i * k + j] = j < (int)heap.size() ? heap[j].second : -1;
  }
}

// ---------------------------------------------------------------------------
// BVH over tetrahedra AABBs + point-in-tet barycentric assignment

struct AABB {
  float lo[3], hi[3];
};

struct BVHNode {
  AABB box;
  int left, right;   // -1 for leaf
  int start, count;  // leaf range
};

struct TetBVH {
  std::vector<BVHNode> nodes;
  std::vector<int> order;
  std::vector<AABB> boxes;
  std::vector<float> centroids;

  int build(int start, int count) {
    BVHNode node;
    node.box.lo[0] = node.box.lo[1] = node.box.lo[2] = 1e30f;
    node.box.hi[0] = node.box.hi[1] = node.box.hi[2] = -1e30f;
    for (int i = start; i < start + count; ++i) {
      const AABB& b = boxes[order[i]];
      for (int a = 0; a < 3; ++a) {
        node.box.lo[a] = std::min(node.box.lo[a], b.lo[a]);
        node.box.hi[a] = std::max(node.box.hi[a], b.hi[a]);
      }
    }
    if (count <= 8) {
      node.left = node.right = -1;
      node.start = start;
      node.count = count;
      nodes.push_back(node);
      return (int)nodes.size() - 1;
    }
    int axis = 0;
    float ext[3] = {node.box.hi[0] - node.box.lo[0], node.box.hi[1] - node.box.lo[1],
                    node.box.hi[2] - node.box.lo[2]};
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;
    int mid = count / 2;
    std::nth_element(order.begin() + start, order.begin() + start + mid,
                     order.begin() + start + count, [&](int a, int b) {
                       return centroids[3 * a + axis] < centroids[3 * b + axis];
                     });
    node.start = start;
    node.count = count;
    int self = (int)nodes.size();
    nodes.push_back(node);
    int l = build(start, mid);
    int r = build(start + mid, count - mid);
    nodes[self].left = l;
    nodes[self].right = r;
    return self;
  }
};

static inline bool solve3(const float M[9], const float b[3], float x[3]) {
  // Cramer's rule; returns false if near-singular.
  float det = M[0] * (M[4] * M[8] - M[5] * M[7]) - M[1] * (M[3] * M[8] - M[5] * M[6]) +
              M[2] * (M[3] * M[7] - M[4] * M[6]);
  if (std::fabs(det) < 1e-18f) return false;
  float inv = 1.0f / det;
  x[0] = inv * (b[0] * (M[4] * M[8] - M[5] * M[7]) - M[1] * (b[1] * M[8] - M[5] * b[2]) +
                M[2] * (b[1] * M[7] - M[4] * b[2]));
  x[1] = inv * (M[0] * (b[1] * M[8] - M[5] * b[2]) - b[0] * (M[3] * M[8] - M[5] * M[6]) +
                M[2] * (M[3] * b[2] - b[1] * M[6]));
  x[2] = inv * (M[0] * (M[4] * b[2] - b[1] * M[7]) - M[1] * (M[3] * b[2] - b[1] * M[6]) +
                b[0] * (M[3] * M[7] - M[4] * M[6]));
  return true;
}

static inline void tet_bary(const float* p, const float* v0, const float* v1,
                            const float* v2, const float* v3, float out[4]) {
  float M[9] = {v1[0] - v0[0], v2[0] - v0[0], v3[0] - v0[0],
                v1[1] - v0[1], v2[1] - v0[1], v3[1] - v0[1],
                v1[2] - v0[2], v2[2] - v0[2], v3[2] - v0[2]};
  float b[3] = {p[0] - v0[0], p[1] - v0[1], p[2] - v0[2]};
  float x[3];
  if (!solve3(M, b, x)) {
    out[0] = -1e9f;
    out[1] = out[2] = out[3] = 0.f;
    return;
  }
  out[1] = x[0];
  out[2] = x[1];
  out[3] = x[2];
  out[0] = 1.0f - x[0] - x[1] - x[2];
}

// Assign each point to its containing (or least-violating) tetrahedron.
void embed_points_in_tets(const float* points, int n, const float* tet_pts,
                          int n_verts, const int* tets, int n_tets, float eps,
                          float* out_bary, int* out_tet, uint8_t* out_active) {
  (void)n_verts;
  TetBVH bvh;
  bvh.boxes.resize(n_tets);
  bvh.centroids.resize(3 * n_tets);
  bvh.order.resize(n_tets);
  for (int t = 0; t < n_tets; ++t) {
    bvh.order[t] = t;
    AABB& b = bvh.boxes[t];
    b.lo[0] = b.lo[1] = b.lo[2] = 1e30f;
    b.hi[0] = b.hi[1] = b.hi[2] = -1e30f;
    float c[3] = {0, 0, 0};
    for (int k = 0; k < 4; ++k) {
      const float* v = tet_pts + 3 * tets[4 * t + k];
      for (int a = 0; a < 3; ++a) {
        b.lo[a] = std::min(b.lo[a], v[a]);
        b.hi[a] = std::max(b.hi[a], v[a]);
        c[a] += 0.25f * v[a];
      }
    }
    for (int a = 0; a < 3; ++a) bvh.centroids[3 * t + a] = c[a];
  }
  bvh.build(0, n_tets);

#pragma omp parallel for schedule(dynamic, 64)
  for (int i = 0; i < n; ++i) {
    const float* p = points + 3 * i;
    float best_score = -1e30f;
    int best_tet = 0;
    float best_bary[4] = {0, 0, 0, 0};
    // Pass 1: exact containment via BVH (expand boxes by eps margin).
    std::vector<int> stack;
    stack.push_back(0);
    float margin = 1e-5f;
    bool found = false;
    while (!stack.empty() && !found) {
      int ni = stack.back();
      stack.pop_back();
      const BVHNode& node = bvh.nodes[ni];
      bool inside = true;
      for (int a = 0; a < 3; ++a)
        inside &= (p[a] >= node.box.lo[a] - margin) && (p[a] <= node.box.hi[a] + margin);
      if (!inside) continue;
      if (node.left < 0) {
        for (int j = node.start; j < node.start + node.count; ++j) {
          int t = bvh.order[j];
          float bary[4];
          tet_bary(p, tet_pts + 3 * tets[4 * t + 0], tet_pts + 3 * tets[4 * t + 1],
                   tet_pts + 3 * tets[4 * t + 2], tet_pts + 3 * tets[4 * t + 3], bary);
          float score = std::min(std::min(bary[0], bary[1]), std::min(bary[2], bary[3]));
          if (score > best_score) {
            best_score = score;
            best_tet = t;
            std::memcpy(best_bary, bary, sizeof(bary));
          }
          if (score >= -eps) { found = true; break; }
        }
      } else {
        stack.push_back(node.left);
        stack.push_back(node.right);
      }
    }
    // Pass 2 fallback: nearest tet by centroid (point outside all boxes).
    if (best_score == -1e30f) {
      float best_d = 1e30f;
      int best_c = 0;
      for (int t = 0; t < n_tets; ++t) {
        float dx = p[0] - bvh.centroids[3 * t], dy = p[1] - bvh.centroids[3 * t + 1],
              dz = p[2] - bvh.centroids[3 * t + 2];
        float d = dx * dx + dy * dy + dz * dz;
        if (d < best_d) { best_d = d; best_c = t; }
      }
      int t = best_c;
      tet_bary(p, tet_pts + 3 * tets[4 * t + 0], tet_pts + 3 * tets[4 * t + 1],
               tet_pts + 3 * tets[4 * t + 2], tet_pts + 3 * tets[4 * t + 3], best_bary);
      best_tet = t;
      best_score = std::min(std::min(best_bary[0], best_bary[1]),
                            std::min(best_bary[2], best_bary[3]));
    }
    std::memcpy(out_bary + 4 * i, best_bary, sizeof(best_bary));
    out_tet[i] = best_tet;
    out_active[i] = best_score >= -eps ? 1 : 0;
  }
}

// ---------------------------------------------------------------------------
// Solid voxelization: conservative surface stamp + outside flood fill.

void voxelize_mesh(const float* verts, int n_verts, const int* faces, int n_faces,
                   const float* origin, float pitch, int nx, int ny, int nz,
                   uint8_t* occupancy /* nx*ny*nz, 1 = inside-or-surface */) {
  (void)n_verts;
  std::vector<uint8_t> surface((size_t)nx * ny * nz, 0);
  auto at = [&](int x, int y, int z) -> size_t {
    return ((size_t)x * ny + y) * nz + z;
  };
  // Stamp triangles: sample each triangle on a fine barycentric grid.
  for (int f = 0; f < n_faces; ++f) {
    const float* a = verts + 3 * faces[3 * f + 0];
    const float* b = verts + 3 * faces[3 * f + 1];
    const float* c = verts + 3 * faces[3 * f + 2];
    float e1 = 0.f, e2 = 0.f;
    for (int k = 0; k < 3; ++k) {
      e1 += (b[k] - a[k]) * (b[k] - a[k]);
      e2 += (c[k] - a[k]) * (c[k] - a[k]);
    }
    int steps = (int)(std::sqrt(std::max(e1, e2)) / (0.5f * pitch)) + 2;
    for (int i = 0; i <= steps; ++i) {
      for (int j = 0; j <= steps - i; ++j) {
        float u = (float)i / steps, v = (float)j / steps;
        float w = 1.f - u - v;
        float p[3];
        for (int k = 0; k < 3; ++k) p[k] = w * a[k] + u * b[k] + v * c[k];
        int xi = (int)std::floor((p[0] - origin[0]) / pitch);
        int yi = (int)std::floor((p[1] - origin[1]) / pitch);
        int zi = (int)std::floor((p[2] - origin[2]) / pitch);
        if (xi >= 0 && xi < nx && yi >= 0 && yi < ny && zi >= 0 && zi < nz)
          surface[at(xi, yi, zi)] = 1;
      }
    }
  }
  // Flood fill outside from the boundary.
  std::vector<uint8_t> outside((size_t)nx * ny * nz, 0);
  std::queue<std::array<int, 3>> q;
  auto push = [&](int x, int y, int z) {
    if (x < 0 || x >= nx || y < 0 || y >= ny || z < 0 || z >= nz) return;
    size_t id = at(x, y, z);
    if (outside[id] || surface[id]) return;
    outside[id] = 1;
    q.push({x, y, z});
  };
  for (int x = 0; x < nx; ++x)
    for (int y = 0; y < ny; ++y) {
      push(x, y, 0);
      push(x, y, nz - 1);
    }
  for (int x = 0; x < nx; ++x)
    for (int z = 0; z < nz; ++z) {
      push(x, 0, z);
      push(x, ny - 1, z);
    }
  for (int y = 0; y < ny; ++y)
    for (int z = 0; z < nz; ++z) {
      push(0, y, z);
      push(nx - 1, y, z);
    }
  while (!q.empty()) {
    auto [x, y, z] = q.front();
    q.pop();
    push(x + 1, y, z);
    push(x - 1, y, z);
    push(x, y + 1, z);
    push(x, y - 1, z);
    push(x, y, z + 1);
    push(x, y, z - 1);
  }
  for (size_t i = 0; i < (size_t)nx * ny * nz; ++i)
    occupancy[i] = outside[i] ? 0 : 1;
}

// ---------------------------------------------------------------------------
// Marching tetrahedra: isosurface of a scalar grid, 6-tet cube split.
// Each tetrahedron contributes 0, 1, or 2 triangles; vertices are
// emitted per-tet (caller may weld afterwards).

static const int CUBE_TETS_6[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6}, {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};

static inline void vert_lerp(const float* p0, const float* p1, float v0, float v1,
                             float iso, float* out) {
  float t = (std::fabs(v1 - v0) > 1e-12f) ? (iso - v0) / (v1 - v0) : 0.5f;
  t = std::min(std::max(t, 0.f), 1.f);
  for (int k = 0; k < 3; ++k) out[k] = p0[k] + t * (p1[k] - p0[k]);
}

int marching_tetrahedra(const float* grid, int nx, int ny, int nz,
                        const float* origin, float pitch, float iso,
                        float* out_verts, int max_tris) {
  // cube corner offsets (x, y, z)
  static const int C[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                              {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
  auto gv = [&](int x, int y, int z) -> float {
    return grid[((size_t)x * ny + y) * nz + z];
  };
  int n_tris = 0;
  for (int x = 0; x < nx - 1 && n_tris < max_tris; ++x)
    for (int y = 0; y < ny - 1 && n_tris < max_tris; ++y)
      for (int z = 0; z < nz - 1 && n_tris < max_tris; ++z) {
        float val[8];
        float pos[8][3];
        for (int c = 0; c < 8; ++c) {
          int cx = x + C[c][0], cy = y + C[c][1], cz = z + C[c][2];
          val[c] = gv(cx, cy, cz);
          pos[c][0] = origin[0] + cx * pitch;
          pos[c][1] = origin[1] + cy * pitch;
          pos[c][2] = origin[2] + cz * pitch;
        }
        for (int t = 0; t < 6 && n_tris < max_tris; ++t) {
          const int* T = CUBE_TETS_6[t];
          float tv[4] = {val[T[0]], val[T[1]], val[T[2]], val[T[3]]};
          const float* tp[4] = {pos[T[0]], pos[T[1]], pos[T[2]], pos[T[3]]};
          int mask = 0;
          for (int k = 0; k < 4; ++k)
            if (tv[k] < iso) mask |= 1 << k;
          if (mask == 0 || mask == 15) continue;
          // canonical: collect inside (below iso) and outside corners
          int in[4], out_[4], ni = 0, no = 0;
          for (int k = 0; k < 4; ++k)
            (tv[k] < iso ? in[ni++] : out_[no++]) = k;
          float* v = out_verts + (size_t)n_tris * 9;
          if (ni == 1) {
            // one triangle: edges in0-out0, in0-out1, in0-out2
            for (int e = 0; e < 3; ++e)
              vert_lerp(tp[in[0]], tp[out_[e]], tv[in[0]], tv[out_[e]], iso, v + 3 * e);
            ++n_tris;
          } else if (ni == 3) {
            for (int e = 0; e < 3; ++e)
              vert_lerp(tp[out_[0]], tp[in[e]], tv[out_[0]], tv[in[e]], iso, v + 3 * e);
            ++n_tris;
          } else {  // ni == 2: quad -> two triangles
            float q[4][3];
            vert_lerp(tp[in[0]], tp[out_[0]], tv[in[0]], tv[out_[0]], iso, q[0]);
            vert_lerp(tp[in[0]], tp[out_[1]], tv[in[0]], tv[out_[1]], iso, q[1]);
            vert_lerp(tp[in[1]], tp[out_[1]], tv[in[1]], tv[out_[1]], iso, q[2]);
            vert_lerp(tp[in[1]], tp[out_[0]], tv[in[1]], tv[out_[0]], iso, q[3]);
            std::memcpy(v, q[0], 12);
            std::memcpy(v + 3, q[1], 12);
            std::memcpy(v + 6, q[2], 12);
            ++n_tris;
            if (n_tris < max_tris) {
              float* v2 = out_verts + (size_t)n_tris * 9;
              std::memcpy(v2, q[0], 12);
              std::memcpy(v2 + 3, q[2], 12);
              std::memcpy(v2 + 6, q[3], 12);
              ++n_tris;
            }
          }
        }
      }
  return n_tris;
}

}  // extern "C"
