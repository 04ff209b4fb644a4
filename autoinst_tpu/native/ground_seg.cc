// Concentric-zone ground segmentation, host C++ twin of
// autoinst_tpu/ground/patchwork.py (Patchwork++-equivalent R-GPF).
//
// Same algorithm staging as the JAX version: CZM binning, lowest-point
// seeding, iterative per-bin PCA plane fits, uprightness/elevation/flatness
// gating. Used for host-side preprocessing when no accelerator is attached
// (replaces the reference's external pypatchworkpp dependency,
// aggregate_pointcloud.py:94-115).
//
// Build: make -C autoinst_tpu/native

#include <cstdint>
#include <cmath>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

struct Params {
  double sensor_height;
  double th_seeds;
  double th_dist;
  double uprightness_thr;
  int num_iter;
};

// zone layout mirroring ground/patchwork.py defaults
constexpr double kMinRanges[4] = {2.7, 12.36, 22.6, 41.0};
constexpr double kMaxRange = 80.0;
constexpr int kRings[4] = {2, 4, 4, 4};
constexpr int kSectors[4] = {16, 32, 54, 32};
constexpr double kElevThr[4] = {0.523, 0.746, 0.879, 1.125};
constexpr double kFlatThr[4] = {0.0005, 0.000725, 0.001, 0.001};

int num_bins() {
  int n = 0;
  for (int z = 0; z < 4; ++z) n += kRings[z] * kSectors[z];
  return n;
}

// eigen-decomposition of a symmetric 3x3 via Jacobi rotations
void eig3(const double a_in[3][3], double vals[3], double vecs[3][3]) {
  double a[3][3];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      a[i][j] = a_in[i][j];
      vecs[i][j] = (i == j) ? 1.0 : 0.0;
    }
  for (int sweep = 0; sweep < 24; ++sweep) {
    int p = 0, q = 1;
    double mx = std::fabs(a[0][1]);
    if (std::fabs(a[0][2]) > mx) { mx = std::fabs(a[0][2]); p = 0; q = 2; }
    if (std::fabs(a[1][2]) > mx) { mx = std::fabs(a[1][2]); p = 1; q = 2; }
    if (mx < 1e-14) break;
    const double app = a[p][p], aqq = a[q][q], apq = a[p][q];
    const double phi = 0.5 * std::atan2(2 * apq, aqq - app);
    const double c = std::cos(phi), s = std::sin(phi);
    double rp[3], rq[3];
    for (int k = 0; k < 3; ++k) {
      rp[k] = c * a[p][k] - s * a[q][k];
      rq[k] = s * a[p][k] + c * a[q][k];
    }
    for (int k = 0; k < 3; ++k) { a[p][k] = rp[k]; a[q][k] = rq[k]; }
    for (int k = 0; k < 3; ++k) {
      rp[k] = c * a[k][p] - s * a[k][q];
      rq[k] = s * a[k][p] + c * a[k][q];
    }
    for (int k = 0; k < 3; ++k) { a[k][p] = rp[k]; a[k][q] = rq[k]; }
    for (int k = 0; k < 3; ++k) {
      const double vp = c * vecs[k][p] - s * vecs[k][q];
      const double vq = s * vecs[k][p] + c * vecs[k][q];
      vecs[k][p] = vp;
      vecs[k][q] = vq;
    }
  }
  for (int i = 0; i < 3; ++i) vals[i] = a[i][i];
}

}  // namespace

extern "C" {

// points: [n,3] f64; out_ground: [n] uint8 (1 = ground)
void ground_segment(const double* points, int64_t n, double sensor_height,
                    double th_seeds, double th_dist, double uprightness_thr,
                    int num_iter, uint8_t* out_ground) {
  const int nbins = num_bins();
  std::vector<int32_t> bin_of(n, -1);
  std::vector<int> zone_of_bin(nbins, 0);
  {
    int off = 0;
    for (int z = 0; z < 4; ++z) {
      for (int b = 0; b < kRings[z] * kSectors[z]; ++b)
        zone_of_bin[off + b] = z;
      off += kRings[z] * kSectors[z];
    }
  }

  for (int64_t i = 0; i < n; ++i) {
    const double x = points[i * 3], y = points[i * 3 + 1];
    const double r = std::sqrt(x * x + y * y);
    const double theta = std::atan2(y, x) + M_PI;
    int off = 0;
    for (int z = 0; z < 4; ++z) {
      const double lo = kMinRanges[z];
      const double hi = (z == 3) ? kMaxRange : kMinRanges[z + 1];
      if (r >= lo && r < hi) {
        int ring = std::min<int>(kRings[z] - 1,
                                 (int)((r - lo) / (hi - lo) * kRings[z]));
        int sec = std::min<int>(kSectors[z] - 1,
                                (int)(theta / (2 * M_PI) * kSectors[z]));
        bin_of[i] = off + ring * kSectors[z] + sec;
        break;
      }
      off += kRings[z] * kSectors[z];
    }
  }

  // seeds: z <= bin z-min + th_seeds, above gross-reflection floor
  std::vector<double> zmin(nbins, std::numeric_limits<double>::infinity());
  for (int64_t i = 0; i < n; ++i)
    if (bin_of[i] >= 0)
      zmin[bin_of[i]] = std::min(zmin[bin_of[i]], points[i * 3 + 2]);
  std::vector<uint8_t> cand(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int b = bin_of[i];
    if (b < 0) continue;
    const double z = points[i * 3 + 2];
    cand[i] = (z <= zmin[b] + th_seeds) && (z > -sensor_height - 1.0);
  }

  std::vector<double> mean(nbins * 3), normal(nbins * 3), flat(nbins);
  std::vector<double> cnt(nbins);
  for (int it = 0; it < num_iter; ++it) {
    std::vector<double> s1(nbins * 3, 0.0), s2(nbins * 9, 0.0);
    std::fill(cnt.begin(), cnt.end(), 0.0);
    for (int64_t i = 0; i < n; ++i) {
      if (!cand[i]) continue;
      const int b = bin_of[i];
      cnt[b] += 1;
      for (int k = 0; k < 3; ++k) s1[b * 3 + k] += points[i * 3 + k];
    }
    for (int b = 0; b < nbins; ++b) {
      const double c = std::max(cnt[b], 1.0);
      for (int k = 0; k < 3; ++k) mean[b * 3 + k] = s1[b * 3 + k] / c;
    }
    for (int64_t i = 0; i < n; ++i) {
      if (!cand[i]) continue;
      const int b = bin_of[i];
      double d[3];
      for (int k = 0; k < 3; ++k) d[k] = points[i * 3 + k] - mean[b * 3 + k];
      for (int r = 0; r < 3; ++r)
        for (int c2 = 0; c2 < 3; ++c2) s2[b * 9 + r * 3 + c2] += d[r] * d[c2];
    }
    for (int b = 0; b < nbins; ++b) {
      const double c = std::max(cnt[b], 1.0);
      double cov[3][3];
      for (int r = 0; r < 3; ++r)
        for (int c2 = 0; c2 < 3; ++c2)
          cov[r][c2] = s2[b * 9 + r * 3 + c2] / c + (r == c2 ? 1e-9 : 0.0);
      double vals[3], vecs[3][3];
      eig3(cov, vals, vecs);
      int mi = 0;
      if (vals[1] < vals[mi]) mi = 1;
      if (vals[2] < vals[mi]) mi = 2;
      double nx = vecs[0][mi], ny = vecs[1][mi], nz = vecs[2][mi];
      if (nz < 0) { nx = -nx; ny = -ny; nz = -nz; }
      normal[b * 3] = nx; normal[b * 3 + 1] = ny; normal[b * 3 + 2] = nz;
      const double tr = vals[0] + vals[1] + vals[2];
      flat[b] = vals[mi] / std::max(tr, 1e-12);
    }
    for (int64_t i = 0; i < n; ++i) {
      const int b = bin_of[i];
      if (b < 0) { cand[i] = 0; continue; }
      double dist = 0;
      for (int k = 0; k < 3; ++k)
        dist += (points[i * 3 + k] - mean[b * 3 + k]) * normal[b * 3 + k];
      cand[i] = dist < th_dist;
    }
  }

  // GLE gating per bin
  std::vector<uint8_t> bin_ground(nbins, 0);
  for (int b = 0; b < nbins; ++b) {
    const int z = zone_of_bin[b];
    const bool upright = normal[b * 3 + 2] > uprightness_thr;
    const bool low = (mean[b * 3 + 2] + sensor_height) < kElevThr[z];
    const bool flat_ok = flat[b] < kFlatThr[z];
    bin_ground[b] = upright && (low || flat_ok);
  }
  for (int64_t i = 0; i < n; ++i) {
    const int b = bin_of[i];
    out_ground[i] = (b >= 0) && cand[i] && bin_ground[b];
  }
}

}  // extern "C"
