// Native batch point-cloud loader.
//
// TPU-native runtime analogue of the reference's host-side data path:
// the reference reads raw float64 .bin submaps one-by-one in python
// DataLoader workers (utils/loading_pointclouds.py:14-48 np.fromfile +
// reshape; 4 workers, train_place_recognition.py:219). Here a C++
// thread pool streams many files per call, converts float64 -> float32
// in place, and optionally applies the unit-sphere normalisation
// (loading_pointclouds.py:51-75) — one ctypes call per tuple batch
// instead of per-file python dispatch.
//
// Exposed C ABI (ctypes):
//   int load_clouds_f64(const char** paths, int n_files, int n_points,
//                       float* out,            // n_files * n_points * 3
//                       float* norm_meta,      // n_files * 4 (cx,cy,cz,scale), may be null
//                       int normalize, int n_threads);
// Returns the number of files successfully read; files that are
// missing or short leave zeros in their slot (the reference prints a
// warning and returns zeros, loading_pointclouds.py:26-30).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

bool load_one(const char* path, int n_points, float* out, float* meta,
              bool normalize) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  const size_t want = static_cast<size_t>(n_points) * 3;
  std::vector<double> buf(want);
  const size_t got = std::fread(buf.data(), sizeof(double), want, f);
  std::fclose(f);
  if (got != want) return false;

  if (normalize) {
    double cx = 0, cy = 0, cz = 0;
    for (int i = 0; i < n_points; ++i) {
      cx += buf[i * 3 + 0];
      cy += buf[i * 3 + 1];
      cz += buf[i * 3 + 2];
    }
    cx /= n_points;
    cy /= n_points;
    cz /= n_points;
    double max_r2 = 0;
    for (int i = 0; i < n_points; ++i) {
      const double dx = buf[i * 3 + 0] - cx;
      const double dy = buf[i * 3 + 1] - cy;
      const double dz = buf[i * 3 + 2] - cz;
      const double r2 = dx * dx + dy * dy + dz * dz;
      if (r2 > max_r2) max_r2 = r2;
    }
    const double scale = max_r2 > 0 ? std::sqrt(max_r2) : 1.0;
    for (int i = 0; i < n_points; ++i) {
      out[i * 3 + 0] = static_cast<float>((buf[i * 3 + 0] - cx) / scale);
      out[i * 3 + 1] = static_cast<float>((buf[i * 3 + 1] - cy) / scale);
      out[i * 3 + 2] = static_cast<float>((buf[i * 3 + 2] - cz) / scale);
    }
    if (meta) {
      meta[0] = static_cast<float>(cx);
      meta[1] = static_cast<float>(cy);
      meta[2] = static_cast<float>(cz);
      meta[3] = static_cast<float>(scale);
    }
  } else {
    for (size_t i = 0; i < want; ++i) out[i] = static_cast<float>(buf[i]);
    if (meta) {
      meta[0] = meta[1] = meta[2] = 0.f;
      meta[3] = 1.f;
    }
  }
  return true;
}

}  // namespace

extern "C" {

int load_clouds_f64(const char** paths, int n_files, int n_points, float* out,
                    float* norm_meta, int normalize, int n_threads) {
  if (n_threads <= 0) n_threads = 4;
  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n_files) return;
      float* slot = out + static_cast<size_t>(i) * n_points * 3;
      float* meta = norm_meta ? norm_meta + static_cast<size_t>(i) * 4 : nullptr;
      std::memset(slot, 0, sizeof(float) * n_points * 3);
      if (load_one(paths[i], n_points, slot, meta, normalize != 0)) {
        ok.fetch_add(1);
      } else {
        std::fprintf(stderr, "fast_loader: failed to read %s\n", paths[i]);
      }
    }
  };
  std::vector<std::thread> pool;
  const int t = n_threads < n_files ? n_threads : (n_files > 0 ? n_files : 1);
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

}  // extern "C"
