// Exact grid-hash 1-NN for map-scale label transfer (C API for ctypes).
//
// TPU-native framework host kernel: replaces the reference's per-point
// Open3D KDTreeFlann loops (reference dataset_utils.py:299-370,
// point_cloud_utils.py:144-174). References are bucketed into a uniform
// grid; each query scans expanding cell shells until the best distance is
// certified (< shell * cell). Exact, deterministic (lowest index wins ties
// via strict improvement over ordered scan).
//
// Build: make -C autoinst_tpu/native

#include <cstdint>
#include <cmath>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

struct Grid {
  double min[3];
  int64_t dims[3];
  double cell;
  // CSR layout: cell_start[k]..cell_start[k+1] index into point_ids
  std::vector<int64_t> cell_start;
  std::vector<int64_t> point_ids;
};

inline int64_t cell_key(const int64_t ijk[3], const int64_t dims[3]) {
  return (ijk[0] * dims[1] + ijk[1]) * dims[2] + ijk[2];
}

}  // namespace

extern "C" {

// queries: [m,3] f64, refs: [n,3] f64; out_idx: [m] i64, out_dist: [m] f64
void grid_nn1(const double* queries, int64_t m, const double* refs, int64_t n,
              double cell, int64_t* out_idx, double* out_dist) {
  Grid g;
  g.cell = cell;
  for (int k = 0; k < 3; ++k) {
    double lo = std::numeric_limits<double>::infinity();
    double hi = -lo;
    for (int64_t i = 0; i < n; ++i) {
      lo = std::min(lo, refs[i * 3 + k]);
      hi = std::max(hi, refs[i * 3 + k]);
    }
    g.min[k] = lo - cell;
    g.dims[k] = (int64_t)std::floor((hi - g.min[k]) / cell) + 2;
  }
  const int64_t ncells = g.dims[0] * g.dims[1] * g.dims[2];

  // counting sort of refs into cells (two passes, no hash map)
  std::vector<int64_t> keys(n);
  std::vector<int64_t> counts;
  // For very large maps dims can overflow memory if we allocate ncells;
  // fall back to sorted-key binary search in that case.
  const bool dense = ncells > 0 && ncells < ((int64_t)1 << 27);
  if (dense) {
    counts.assign(ncells + 1, 0);
    for (int64_t i = 0; i < n; ++i) {
      int64_t ijk[3];
      for (int k = 0; k < 3; ++k)
        ijk[k] = (int64_t)std::floor((refs[i * 3 + k] - g.min[k]) / cell);
      keys[i] = cell_key(ijk, g.dims);
      counts[keys[i] + 1]++;
    }
    for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
    g.cell_start = counts;
    g.point_ids.resize(n);
    std::vector<int64_t> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
    for (int64_t i = 0; i < n; ++i) g.point_ids[cursor[keys[i]]++] = i;
  } else {
    // sparse path: sort (key, id) pairs
    std::vector<std::pair<int64_t, int64_t>> kv(n);
    for (int64_t i = 0; i < n; ++i) {
      int64_t ijk[3];
      for (int k = 0; k < 3; ++k)
        ijk[k] = (int64_t)std::floor((refs[i * 3 + k] - g.min[k]) / cell);
      kv[i] = {cell_key(ijk, g.dims), i};
    }
    std::sort(kv.begin(), kv.end());
    g.point_ids.resize(n);
    keys.resize(n);
    for (int64_t i = 0; i < n; ++i) {
      keys[i] = kv[i].first;
      g.point_ids[i] = kv[i].second;
    }
  }

  auto scan_cell = [&](int64_t key, const double* q, double& best_d2,
                       int64_t& best_i) {
    int64_t lo, hi;
    if (dense) {
      if (key < 0 || key >= ncells) return;
      lo = g.cell_start[key];
      hi = g.cell_start[key + 1];
    } else {
      auto it_lo = std::lower_bound(keys.begin(), keys.end(), key);
      auto it_hi = std::upper_bound(keys.begin(), keys.end(), key);
      lo = it_lo - keys.begin();
      hi = it_hi - keys.begin();
    }
    for (int64_t s = lo; s < hi; ++s) {
      const int64_t i = g.point_ids[s];
      const double dx = refs[i * 3 + 0] - q[0];
      const double dy = refs[i * 3 + 1] - q[1];
      const double dz = refs[i * 3 + 2] - q[2];
      const double d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < best_d2 || (d2 == best_d2 && i < best_i)) {
        best_d2 = d2;
        best_i = i;
      }
    }
  };

  const int64_t max_dim = std::max(g.dims[0], std::max(g.dims[1], g.dims[2]));
  for (int64_t qi = 0; qi < m; ++qi) {
    const double* q = &queries[qi * 3];
    int64_t c[3];
    for (int k = 0; k < 3; ++k) {
      c[k] = (int64_t)std::floor((q[k] - g.min[k]) / cell);
      c[k] = std::max<int64_t>(0, std::min(g.dims[k] - 1, c[k]));
    }
    double best_d2 = std::numeric_limits<double>::infinity();
    int64_t best_i = -1;
    for (int64_t shell = 0; shell <= max_dim; ++shell) {
      // entering shell s, cells at Chebyshev distance >= s are unscanned;
      // their points are at distance >= (s-1)*cell from the query (which may
      // sit at its cell's edge), so a best within that bound is certified
      if (best_i >= 0 && shell >= 1) {
        const double bound = (double)(shell - 1) * cell;
        if (best_d2 <= bound * bound) break;
      }
      const int64_t i0 = std::max<int64_t>(0, c[0] - shell);
      const int64_t i1 = std::min(g.dims[0] - 1, c[0] + shell);
      const int64_t j0 = std::max<int64_t>(0, c[1] - shell);
      const int64_t j1 = std::min(g.dims[1] - 1, c[1] + shell);
      const int64_t k0 = std::max<int64_t>(0, c[2] - shell);
      const int64_t k1 = std::min(g.dims[2] - 1, c[2] + shell);
      for (int64_t i = i0; i <= i1; ++i) {
        const bool face_i = (i == c[0] - shell || i == c[0] + shell);
        for (int64_t j = j0; j <= j1; ++j) {
          const bool face_j = (j == c[1] - shell || j == c[1] + shell);
          if (face_i || face_j) {
            for (int64_t k = k0; k <= k1; ++k) {
              int64_t ijk[3] = {i, j, k};
              scan_cell(cell_key(ijk, g.dims), q, best_d2, best_i);
            }
          } else {
            for (int64_t k : {c[2] - shell, c[2] + shell}) {
              if (k < k0 || k > k1) continue;
              int64_t ijk[3] = {i, j, k};
              scan_cell(cell_key(ijk, g.dims), q, best_d2, best_i);
            }
          }
        }
      }
    }
    out_idx[qi] = best_i;
    out_dist[qi] = std::sqrt(best_d2);
  }
}

}  // extern "C"
