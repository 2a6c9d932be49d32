// Native FPFH for the rerank pipeline.
//
// C++ analogue of patchaugnet_tpu/data/fpfh.py (itself the TPU-framework
// port of the reference's open3d-backed SceneDataSet.get_fpfh,
// /root/reference/datasets/scene_dataset.py:756-780). The reference
// delegates to open3d's C++; this container has no open3d, and the
// vectorised-numpy port runs ~7.6 s per 4096-pt cloud on one core —
// unusable at rerank scale. This file reimplements the SAME math
// (formulas + binning + weighting documented in fpfh.py's docstring)
// with per-point threading; the python wrapper dispatches here when the
// library builds and falls back to numpy otherwise.
//
// Semantics match fpfh.py operation-for-operation (caveat: at the
// formulation's decision boundaries — theta = atan2 of cancellation
// noise at +-pi, and the source/target swap's acos tie under
// near-parallel normals — the outcome flips with last-ulp op order,
// so NO two implementations agree bit-for-bit there; ~0.05% of pairs
// on smooth surfaces, per-group mass conserved, see
// tests/test_fpfh.py::TestNativeFPFH):
//   - hybrid neighbourhoods: k = min(max_nn, N) nearest by (d2, index)
//     (ties index-ascending, like numpy's stable argsort; the numpy
//     path's argpartition boundary-tie arbitrariness is measure-zero
//     for float64 clouds), validity = d2 <= radius^2;
//   - normals: smallest-eigenvector of the valid-neighbour covariance
//     (cyclic Jacobi to ~1e-30 off-diagonal), flipped so the first
//     nonzero of (z, y, x) is >= 0, unit-normalised;
//   - SPFH: drop neighbour column 0 (the self row at distance 0), guard
//     d2 > 1e-24 duplicates, PCL source/target swap, 3x11 bins via
//     trunc(11*0.5*(x+1)) clipped to [0, 10], each valid pair
//     contributing 100 / n_pairs;
//   - FPFH: SPFH + per-11-bin-group renormalised sum of neighbour SPFH
//     weighted by 1/max(d2, 1e-24).
//
// Exposed C ABI (ctypes):
//   int compute_fpfh_f64(const double* points, int n,
//                        double radius_normal, double radius_feature,
//                        int max_nn_normal, int max_nn_feature,
//                        const double* normals_in,   // may be null
//                        double* out,                // n * 33
//                        double* normals_out,        // may be null, n * 3
//                        int n_threads);
// Returns 0 on success.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kBins = 11;
constexpr int kDim = 33;

struct Nbr {
  double d2;
  int idx;
};

// Uniform-grid spatial index (CSR layout). Cell size >= radius, so a
// query's in-radius neighbours all live in its 3x3x3 cell ring. The
// hybrid-search RESULT only depends on the min(max_nn, #in-radius)
// nearest in-radius points (out-of-radius slots of the brute-force
// formulation are masked no-ops downstream), so grid search with the
// same (d2, index) ordering is exactly equivalent — and turns the
// O(n^2) all-pairs scan into O(n * ring occupancy).
struct RadiusGrid {
  double cell, ox, oy, oz;
  int nx, ny, nz;
  std::vector<int> start;   // nx*ny*nz + 1
  std::vector<int> order;   // point ids grouped by cell

  void build(const double* pts, int n, double radius) {
    double lo[3] = {pts[0], pts[1], pts[2]};
    double hi[3] = {pts[0], pts[1], pts[2]};
    for (int i = 1; i < n; ++i)
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], pts[3 * i + a]);
        hi[a] = std::max(hi[a], pts[3 * i + a]);
      }
    const double ext = std::max(
        {hi[0] - lo[0], hi[1] - lo[1], hi[2] - lo[2], 1e-12});
    cell = std::max(radius, ext / 96.0);   // bound the cell count
    ox = lo[0];
    oy = lo[1];
    oz = lo[2];
    nx = static_cast<int>((hi[0] - lo[0]) / cell) + 1;
    ny = static_cast<int>((hi[1] - lo[1]) / cell) + 1;
    nz = static_cast<int>((hi[2] - lo[2]) / cell) + 1;
    const int cells = nx * ny * nz;
    std::vector<int> cnt(cells + 1, 0);
    std::vector<int> ci(n);
    for (int i = 0; i < n; ++i) {
      ci[i] = cell_of(&pts[3 * i]);
      ++cnt[ci[i] + 1];
    }
    for (int c = 0; c < cells; ++c) cnt[c + 1] += cnt[c];
    start = cnt;
    order.resize(n);
    std::vector<int> fill = start;
    for (int i = 0; i < n; ++i) order[fill[ci[i]]++] = i;
  }

  int cell_of(const double* p) const {
    int cx = static_cast<int>((p[0] - ox) / cell);
    int cy = static_cast<int>((p[1] - oy) / cell);
    int cz = static_cast<int>((p[2] - oz) / cell);
    cx = std::min(std::max(cx, 0), nx - 1);
    cy = std::min(std::max(cy, 0), ny - 1);
    cz = std::min(std::max(cz, 0), nz - 1);
    return (cx * ny + cy) * nz + cz;
  }
};

// In-radius k nearest of query i by (d2, index), ascending.
void radius_knn(const RadiusGrid& g, const double* pts, int i, int k,
                double r2, std::vector<Nbr>& row) {
  row.clear();
  const double xi = pts[3 * i], yi = pts[3 * i + 1], zi = pts[3 * i + 2];
  int cx = static_cast<int>((xi - g.ox) / g.cell);
  int cy = static_cast<int>((yi - g.oy) / g.cell);
  int cz = static_cast<int>((zi - g.oz) / g.cell);
  cx = std::min(std::max(cx, 0), g.nx - 1);
  cy = std::min(std::max(cy, 0), g.ny - 1);
  cz = std::min(std::max(cz, 0), g.nz - 1);
  for (int ax = std::max(cx - 1, 0); ax <= std::min(cx + 1, g.nx - 1); ++ax)
    for (int ay = std::max(cy - 1, 0); ay <= std::min(cy + 1, g.ny - 1); ++ay)
      for (int az = std::max(cz - 1, 0); az <= std::min(cz + 1, g.nz - 1);
           ++az) {
        const int c = (ax * g.ny + ay) * g.nz + az;
        for (int s = g.start[c]; s < g.start[c + 1]; ++s) {
          const int j = g.order[s];
          const double dx = pts[3 * j] - xi;
          const double dy = pts[3 * j + 1] - yi;
          const double dz = pts[3 * j + 2] - zi;
          const double d2 = dx * dx + dy * dy + dz * dz;
          if (d2 <= r2) row.push_back({d2, j});
        }
      }
  auto cmp = [](const Nbr& a, const Nbr& b) {
    return a.d2 != b.d2 ? a.d2 < b.d2 : a.idx < b.idx;
  };
  if (k < static_cast<int>(row.size())) {
    std::partial_sort(row.begin(), row.begin() + k, row.end(), cmp);
    row.resize(k);
  } else {
    std::sort(row.begin(), row.end(), cmp);
  }
}

// Eigenvector of the smallest eigenvalue of a symmetric 3x3 matrix,
// cyclic Jacobi. a is row-major upper data (full 9 doubles).
void smallest_eigenvector(double a[9], double v_out[3]) {
  double v[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  for (int sweep = 0; sweep < 64; ++sweep) {
    const double off = a[1] * a[1] + a[2] * a[2] + a[5] * a[5];
    if (off < 1e-60) break;
    static const int pq[3][2] = {{0, 1}, {0, 2}, {1, 2}};
    for (const auto& e : pq) {
      const int p = e[0], q = e[1];
      const double apq = a[3 * p + q];
      if (std::fabs(apq) < 1e-300) continue;
      const double app = a[3 * p + p], aqq = a[3 * q + q];
      const double tau = (aqq - app) / (2.0 * apq);
      const double t = (tau >= 0 ? 1.0 : -1.0) /
                       (std::fabs(tau) + std::sqrt(1.0 + tau * tau));
      const double c = 1.0 / std::sqrt(1.0 + t * t);
      const double s = t * c;
      // A = J^T A J for rotation in (p, q)
      for (int r = 0; r < 3; ++r) {
        const double arp = a[3 * r + p], arq = a[3 * r + q];
        a[3 * r + p] = c * arp - s * arq;
        a[3 * r + q] = s * arp + c * arq;
      }
      for (int r = 0; r < 3; ++r) {
        const double apr = a[3 * p + r], aqr = a[3 * q + r];
        a[3 * p + r] = c * apr - s * aqr;
        a[3 * q + r] = s * apr + c * aqr;
      }
      for (int r = 0; r < 3; ++r) {
        const double vrp = v[3 * r + p], vrq = v[3 * r + q];
        v[3 * r + p] = c * vrp - s * vrq;
        v[3 * r + q] = s * vrp + c * vrq;
      }
    }
  }
  int m = 0;
  if (a[4] < a[3 * m + m]) m = 1;
  if (a[8] < a[3 * m + m]) m = 2;
  v_out[0] = v[m];
  v_out[1] = v[3 + m];
  v_out[2] = v[6 + m];
}

void estimate_normal_row(const RadiusGrid& grid, const double* pts, int n,
                         int i, double radius, int max_nn, double* normal,
                         std::vector<Nbr>& row) {
  const int k = std::min(max_nn, n);
  const double r2 = radius * radius;
  radius_knn(grid, pts, i, k, r2, row);
  double mean[3] = {0, 0, 0};
  double cnt = 0;
  for (const auto& nb : row) {
    mean[0] += pts[3 * nb.idx];
    mean[1] += pts[3 * nb.idx + 1];
    mean[2] += pts[3 * nb.idx + 2];
    cnt += 1.0;
  }
  const double denom = cnt > 0 ? cnt : 1.0;
  mean[0] /= denom;
  mean[1] /= denom;
  mean[2] /= denom;
  double cov[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
  for (const auto& nb : row) {
    const double cx = pts[3 * nb.idx] - mean[0];
    const double cy = pts[3 * nb.idx + 1] - mean[1];
    const double cz = pts[3 * nb.idx + 2] - mean[2];
    cov[0] += cx * cx;
    cov[1] += cx * cy;
    cov[2] += cx * cz;
    cov[4] += cy * cy;
    cov[5] += cy * cz;
    cov[8] += cz * cz;
  }
  cov[3] = cov[1];
  cov[6] = cov[2];
  cov[7] = cov[5];
  for (int t = 0; t < 9; ++t) cov[t] /= denom;
  double nv[3];
  smallest_eigenvector(cov, nv);
  double flip = 1.0;
  if (nv[2] != 0.0) {
    flip = nv[2] > 0 ? 1.0 : -1.0;
  } else if (nv[1] != 0.0) {
    flip = nv[1] > 0 ? 1.0 : -1.0;
  } else if (nv[0] != 0.0) {
    flip = nv[0] > 0 ? 1.0 : -1.0;
  }
  const double norm = std::sqrt(nv[0] * nv[0] + nv[1] * nv[1] + nv[2] * nv[2]);
  const double inv = flip / std::max(norm, 1e-12);
  normal[0] = nv[0] * inv;
  normal[1] = nv[1] * inv;
  normal[2] = nv[2] * inv;
}

// (alpha, phi, theta, ok) for one (source, target) pair — the PCL
// swap applied exactly as fpfh.py::_pair_features.
bool pair_features(const double* ps, const double* ns, const double* pt,
                   const double* nt, double* alpha, double* phi,
                   double* theta) {
  double d[3] = {pt[0] - ps[0], pt[1] - ps[1], pt[2] - ps[2]};
  const double dist = std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
  if (dist <= 1e-12) return false;
  double dn[3] = {d[0] / dist, d[1] / dist, d[2] / dist};
  const double a1 = ns[0] * dn[0] + ns[1] * dn[1] + ns[2] * dn[2];
  const double a2 = nt[0] * dn[0] + nt[1] * dn[1] + nt[2] * dn[2];
  auto clip01 = [](double x) { return x < 0 ? 0.0 : (x > 1 ? 1.0 : x); };
  const bool swap =
      std::acos(clip01(std::fabs(a1))) > std::acos(clip01(std::fabs(a2)));
  const double* u = swap ? nt : ns;
  const double* n2 = swap ? ns : nt;
  double dd[3] = {dn[0], dn[1], dn[2]};
  if (swap) {
    dd[0] = -dd[0];
    dd[1] = -dd[1];
    dd[2] = -dd[2];
  }
  *phi = swap ? -a2 : a1;
  double v[3] = {dd[1] * u[2] - dd[2] * u[1], dd[2] * u[0] - dd[0] * u[2],
                 dd[0] * u[1] - dd[1] * u[0]};
  const double vn = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
  if (vn <= 1e-12) return false;
  v[0] /= vn;
  v[1] /= vn;
  v[2] /= vn;
  double w[3] = {u[1] * v[2] - u[2] * v[1], u[2] * v[0] - u[0] * v[2],
                 u[0] * v[1] - u[1] * v[0]};
  *alpha = v[0] * n2[0] + v[1] * n2[1] + v[2] * n2[2];
  *theta = std::atan2(w[0] * n2[0] + w[1] * n2[1] + w[2] * n2[2],
                      u[0] * n2[0] + u[1] * n2[1] + u[2] * n2[2]);
  return true;
}

inline int bin_of(double x) {  // trunc(11 * 0.5 * (x + 1)) clipped
  int b = static_cast<int>(kBins * 0.5 * (x + 1.0));
  return b < 0 ? 0 : (b >= kBins ? kBins - 1 : b);
}

template <typename F>
void parallel_rows(int n, int n_threads, F&& body) {
  if (n_threads <= 1) {
    for (int i = 0; i < n; ++i) body(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) body(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" int compute_fpfh_f64(const double* points, int n,
                                double radius_normal, double radius_feature,
                                int max_nn_normal, int max_nn_feature,
                                const double* normals_in, double* out,
                                double* normals_out, int n_threads) {
  if (n <= 0) return 0;
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads <= 0) n_threads = 1;

  std::vector<double> normals_buf;
  const double* normals = normals_in;
  if (!normals) {
    RadiusGrid ngrid;
    ngrid.build(points, n, radius_normal);
    normals_buf.resize(static_cast<size_t>(n) * 3);
    parallel_rows(n, n_threads, [&](int i) {
      thread_local std::vector<Nbr> row;
      estimate_normal_row(ngrid, points, n, i, radius_normal, max_nn_normal,
                          &normals_buf[3 * static_cast<size_t>(i)], row);
    });
    normals = normals_buf.data();
  }
  if (normals_out)
    std::memcpy(normals_out, normals, sizeof(double) * 3 * n);

  // feature neighbourhoods (first in-radius entry = the lowest-index
  // zero-distance candidate — the brute-force layout's column 0 —
  // dropped like fpfh.py)
  const int kf = std::min(max_nn_feature, n);
  const int km = kf - 1;  // neighbours kept per point
  std::vector<int> nbr_idx(static_cast<size_t>(n) * std::max(km, 0));
  std::vector<double> nbr_d2(static_cast<size_t>(n) * std::max(km, 0));
  std::vector<int> nbr_cnt(n, 0);
  std::vector<double> spfh(static_cast<size_t>(n) * kDim, 0.0);
  if (km <= 0) {
    std::memset(out, 0, sizeof(double) * kDim * n);
    return 0;
  }
  const double r2 = radius_feature * radius_feature;
  RadiusGrid fgrid;
  fgrid.build(points, n, radius_feature);
  parallel_rows(n, n_threads, [&](int i) {
    thread_local std::vector<Nbr> row;
    radius_knn(fgrid, points, i, kf, r2, row);
    int* ni = &nbr_idx[static_cast<size_t>(i) * km];
    double* nd = &nbr_d2[static_cast<size_t>(i) * km];
    struct Trip {
      double alpha, phi, theta;
    };
    thread_local std::vector<Trip> trips;
    trips.clear();
    int n_pairs = 0;
    int cnt = 0;
    for (size_t c = 1; c < row.size(); ++c) {
      const Nbr& nb = row[c];
      ni[cnt] = nb.idx;
      nd[cnt] = nb.d2;
      ++cnt;
      double alpha, phi, theta;
      if (nb.d2 > 1e-24 &&
          pair_features(&points[3 * i], &normals[3 * i],
                        &points[3 * nb.idx], &normals[3 * nb.idx],
                        &alpha, &phi, &theta)) {
        trips.push_back({alpha, phi, theta});
        ++n_pairs;
      }
    }
    nbr_cnt[i] = cnt;
    const double wpair = 100.0 / (n_pairs > 0 ? n_pairs : 1);
    double* h = &spfh[static_cast<size_t>(i) * kDim];
    for (const auto& t : trips) {
      h[bin_of(t.alpha)] += wpair;
      h[kBins + bin_of(t.phi)] += wpair;
      h[2 * kBins + bin_of(t.theta / M_PI)] += wpair;
    }
  });

  // FPFH: self SPFH + per-group renormalised 1/d2-weighted neighbour sum
  parallel_rows(n, n_threads, [&](int i) {
    const int* ni = &nbr_idx[static_cast<size_t>(i) * km];
    const double* nd = &nbr_d2[static_cast<size_t>(i) * km];
    double acc[kDim];
    std::memset(acc, 0, sizeof(acc));
    for (int c = 0; c < nbr_cnt[i]; ++c) {
      if (nd[c] <= 1e-24) continue;
      const double w = 1.0 / std::max(nd[c], 1e-24);
      const double* hs = &spfh[static_cast<size_t>(ni[c]) * kDim];
      for (int d = 0; d < kDim; ++d) acc[d] += w * hs[d];
    }
    double* o = &out[static_cast<size_t>(i) * kDim];
    const double* self = &spfh[static_cast<size_t>(i) * kDim];
    for (int g = 0; g < 3; ++g) {
      double gsum = 0;
      for (int d = 0; d < kBins; ++d) gsum += acc[g * kBins + d];
      const double scale = gsum > 0 ? 100.0 / gsum : 0.0;
      for (int d = 0; d < kBins; ++d) {
        const int t = g * kBins + d;
        o[t] = self[t] + acc[t] * scale;
      }
    }
  });
  return 0;
}
