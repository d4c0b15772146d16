// Native host kernels for volume reassembly and mesh IO.
//
// - densify: rebuild the dense occupancy volume from the sparse two-phase
//   result (recon/grid.py eval_grid_two_phase_sparse).  NumPy's advanced-
//   indexing block writes take 10-25s for this on one core; this loop is
//   memory-bound (~0.1s).
// - obj_write: OBJ export with per-vertex colors and the reference's
//   flipped winding (mesh_util.py:189-198).  Python f-string formatting
//   costs ~8s/Mvert; this is ~0.3s.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// vol: res^3 float32 (preallocated, uninitialized ok)
// fill: n^3 float32 per-cell fill values
// marks: n^3 uint8 (1 = materialize this cell's fill)
// top_idx: [K] int32 linear cell ids; refined: [K, f^3] float32 (unquantized)
void densify(float* vol, int64_t res, const float* fill,
             const uint8_t* marks, int64_t n, int factor,
             const int32_t* top_idx, int64_t K, const float* refined,
             int n_threads) {
  const int64_t f = factor;
  const int64_t res2 = res * res;
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  // sequential prefault: scattered first-touch page faults are pathologically
  // slow under sandboxed kernels; one linear pass maps the buffer cheaply
  std::memset(vol, 0, (size_t)(res * res2) * sizeof(float));

  auto fill_worker = [&](int t, int nt) {
    const int64_t total = n * n * n;
    const int64_t c0 = total * t / nt;
    const int64_t c1 = total * (t + 1) / nt;
    for (int64_t c = c0; c < c1; ++c) {
      if (!marks[c]) continue;
      const int64_t cx = c / (n * n), cy = (c / n) % n, cz = c % n;
      const float v = fill[c];
      const int64_t bx = cx * f, by = cy * f, bz = cz * f;
      for (int64_t x = 0; x < f; ++x)
        for (int64_t y = 0; y < f; ++y) {
          float* row = vol + (bx + x) * res2 + (by + y) * res + bz;
          for (int64_t z = 0; z < f; ++z) row[z] = v;
        }
    }
  };
  auto refined_worker = [&](int t, int nt) {
    const int64_t c0 = K * t / nt;
    const int64_t c1 = K * (t + 1) / nt;
    const int64_t f3 = f * f * f;
    for (int64_t k = c0; k < c1; ++k) {
      const int64_t c = top_idx[k];
      const int64_t cx = c / (n * n), cy = (c / n) % n, cz = c % n;
      const int64_t bx = cx * f, by = cy * f, bz = cz * f;
      const float* src = refined + k * f3;
      for (int64_t x = 0; x < f; ++x)
        for (int64_t y = 0; y < f; ++y) {
          std::memcpy(vol + (bx + x) * res2 + (by + y) * res + bz,
                      src + (x * f + y) * f, f * sizeof(float));
        }
    }
  };

  std::vector<std::thread> ths;
  for (int t = 0; t < n_threads; ++t) ths.emplace_back(fill_worker, t,
                                                       n_threads);
  for (auto& th : ths) th.join();
  ths.clear();
  for (int t = 0; t < n_threads; ++t) ths.emplace_back(refined_worker, t,
                                                       n_threads);
  for (auto& th : ths) th.join();
}

// OBJ export: v lines (with optional rgb), f lines with flipped winding.
// Returns 0 on success.
int obj_write(const char* path, const float* verts, const float* colors,
              int64_t nv, const int32_t* faces, int64_t nf) {
  FILE* fp = std::fopen(path, "w");
  if (!fp) return 1;
  std::vector<char> buf(1 << 22);
  std::setvbuf(fp, buf.data(), _IOFBF, buf.size());
  if (colors) {
    for (int64_t i = 0; i < nv; ++i) {
      const float* v = verts + i * 3;
      const float* c = colors + i * 3;
      std::fprintf(fp, "v %.4f %.4f %.4f %.4f %.4f %.4f\n",
                   v[0], v[1], v[2], c[0], c[1], c[2]);
    }
  } else {
    for (int64_t i = 0; i < nv; ++i) {
      const float* v = verts + i * 3;
      std::fprintf(fp, "v %.4f %.4f %.4f\n", v[0], v[1], v[2]);
    }
  }
  for (int64_t i = 0; i < nf; ++i) {
    const int32_t* f = faces + i * 3;
    std::fprintf(fp, "f %d %d %d\n", f[0] + 1, f[2] + 1, f[1] + 1);
  }
  std::fclose(fp);
  return 0;
}

}  // extern "C"
