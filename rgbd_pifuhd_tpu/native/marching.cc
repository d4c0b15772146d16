// Native marching tetrahedra: the host-side isosurface kernel.
//
// Same algorithm as recon/marching.py (6 positively-oriented tets per cube,
// case table passed in from Python so both paths share one derivation).
// Replaces the reference's skimage Cython marching-cubes dependency
// (/root/reference/mesh_util.py:84) with a dependency-free C++ kernel.
//
// Exposed as a C ABI for ctypes.  Parallelized over x-slabs with per-thread
// buffers; vertex dedup via a per-thread open-addressing hash on the global
// lattice-edge key, with a final cross-thread merge.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <thread>
#include <atomic>

namespace {

struct Vec3 {
  float x, y, z;
};

// open-addressing hash map: edge key (uint64) -> vertex index (int32)
struct EdgeMap {
  std::vector<uint64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  explicit EdgeMap(size_t expected) {
    size_t cap = 64;
    while (cap < expected * 2) cap <<= 1;
    keys.assign(cap, UINT64_MAX);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  void grow() {
    EdgeMap bigger(keys.size());
    for (size_t i = 0; i < keys.size(); ++i) {
      if (keys[i] != UINT64_MAX) bigger.insert_raw(keys[i], vals[i]);
    }
    keys.swap(bigger.keys);
    vals.swap(bigger.vals);
    mask = bigger.mask;
  }

  void insert_raw(uint64_t k, int32_t v) {
    uint64_t h = (k * 0x9E3779B97F4A7C15ull) & mask;
    while (keys[h] != UINT64_MAX) h = (h + 1) & mask;
    keys[h] = k;
    vals[h] = v;
  }

  size_t count = 0;

  // returns existing value, or -1 with the slot reserved for `put`
  int32_t find(uint64_t k) const {
    uint64_t h = (k * 0x9E3779B97F4A7C15ull) & mask;
    while (keys[h] != UINT64_MAX) {
      if (keys[h] == k) return vals[h];
      h = (h + 1) & mask;
    }
    return -1;
  }

  void put(uint64_t k, int32_t v) {
    if (2 * (count + 1) > keys.size()) grow();
    insert_raw(k, v);
    ++count;
  }
};

struct ThreadOut {
  std::vector<Vec3> verts;
  std::vector<uint64_t> vert_keys;  // edge key per vertex (for merge)
  std::vector<int32_t> faces;       // thread-local vertex indices
};

const int kTets[6][4] = {
    {0, 1, 2, 6}, {0, 2, 3, 6}, {0, 3, 7, 6},
    {0, 7, 4, 6}, {0, 4, 5, 6}, {0, 5, 1, 6},
};
const int kTetEdges[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};
const int kCorner[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

// process one cube at (x, y, z): emit triangles into `out`, dedup via `map`
static inline void process_cube(
    const float* vol, int64_t YZ, int64_t Y, int64_t Z, float thresh,
    const int8_t* case_table, int64_t x, int64_t y, int64_t z,
    ThreadOut& out, EdgeMap& map) {
  const float* p0 = vol + x * YZ + y * Z;
  const float* p1 = vol + x * YZ + (y + 1) * Z;
  const float* p2 = vol + (x + 1) * YZ + y * Z;
  const float* p3 = vol + (x + 1) * YZ + (y + 1) * Z;
  const float v000 = p0[z], v001 = p0[z + 1];
  const float v010 = p1[z], v011 = p1[z + 1];
  const float v100 = p2[z], v101 = p2[z + 1];
  const float v110 = p3[z], v111 = p3[z + 1];
  const bool b000 = v000 > thresh, b001 = v001 > thresh;
  const bool b010 = v010 > thresh, b011 = v011 > thresh;
  const bool b100 = v100 > thresh, b101 = v101 > thresh;
  const bool b110 = v110 > thresh, b111 = v111 > thresh;
  const int sum = b000 + b001 + b010 + b011 + b100 + b101 + b110 + b111;
  if (sum == 0 || sum == 8) return;

  const int64_t base = x * YZ + y * Z + z;
  int64_t ids[8];
  bool ins[8];
  ids[0] = base;
  ids[1] = base + YZ;
  ids[2] = base + YZ + Z;
  ids[3] = base + Z;
  ids[4] = base + 1;
  ids[5] = base + YZ + 1;
  ids[6] = base + YZ + Z + 1;
  ids[7] = base + Z + 1;
  ins[0] = b000; ins[1] = b100; ins[2] = b110; ins[3] = b010;
  ins[4] = b001; ins[5] = b101; ins[6] = b111; ins[7] = b011;

  for (int tet = 0; tet < 6; ++tet) {
    const int* tv = kTets[tet];
    const int c = (ins[tv[0]] ? 1 : 0) | (ins[tv[1]] ? 2 : 0) |
                  (ins[tv[2]] ? 4 : 0) | (ins[tv[3]] ? 8 : 0);
    if (c == 0 || c == 15) continue;
    const int8_t* row = case_table + c * 6;
    for (int tri = 0; tri < 2; ++tri) {
      if (row[tri * 3] < 0) break;
      int32_t vid[3];
      for (int k = 0; k < 3; ++k) {
        const int e = row[tri * 3 + k];
        int64_t a = ids[tv[kTetEdges[e][0]]];
        int64_t b = ids[tv[kTetEdges[e][1]]];
        if (a > b) { int64_t tmp = a; a = b; b = tmp; }
        const uint64_t key = ((uint64_t)a << 32) | (uint64_t)(uint32_t)b;
        int32_t found = map.find(key);
        if (found < 0) {
          const float va = vol[a];
          const float vb = vol[b];
          float tt = (vb - va) != 0.f ? (thresh - va) / (vb - va) : 0.5f;
          if (tt < 0.f) tt = 0.f;
          if (tt > 1.f) tt = 1.f;
          const float ax_ = (float)(a / YZ), ay_ = (float)((a / Z) % Y),
                      az_ = (float)(a % Z);
          const float bx_ = (float)(b / YZ), by_ = (float)((b / Z) % Y),
                      bz_ = (float)(b % Z);
          Vec3 v{ax_ + tt * (bx_ - ax_), ay_ + tt * (by_ - ay_),
                 az_ + tt * (bz_ - az_)};
          out.verts.push_back(v);
          out.vert_keys.push_back(key);
          found = (int32_t)(out.verts.size() - 1);
          map.put(key, found);
        }
        vid[k] = found;
      }
      if (vid[0] != vid[1] && vid[1] != vid[2] && vid[0] != vid[2]) {
        out.faces.push_back(vid[0]);
        out.faces.push_back(vid[1]);
        out.faces.push_back(vid[2]);
      }
    }
  }
}

// cross-thread merge with global edge-key dedup
static void merge_outputs(std::vector<ThreadOut>& outs,
                          float** verts_out, int64_t* n_verts,
                          int32_t** faces_out, int64_t* n_faces) {
  size_t total_v = 0, total_f = 0;
  for (auto& o : outs) {
    total_v += o.verts.size();
    total_f += o.faces.size();
  }
  EdgeMap gmap(total_v + 64);
  std::vector<Vec3> verts;
  verts.reserve(total_v);
  std::vector<int32_t> faces;
  faces.reserve(total_f);
  for (auto& o : outs) {
    std::vector<int32_t> remap(o.verts.size());
    for (size_t i = 0; i < o.verts.size(); ++i) {
      int32_t found = gmap.find(o.vert_keys[i]);
      if (found < 0) {
        verts.push_back(o.verts[i]);
        found = (int32_t)(verts.size() - 1);
        gmap.put(o.vert_keys[i], found);
      }
      remap[i] = found;
    }
    for (size_t i = 0; i < o.faces.size(); ++i)
      faces.push_back(remap[o.faces[i]]);
  }
  *n_verts = (int64_t)verts.size();
  *n_faces = (int64_t)(faces.size() / 3);
  *verts_out = (float*)std::malloc(verts.size() * sizeof(Vec3));
  std::memcpy(*verts_out, verts.data(), verts.size() * sizeof(Vec3));
  *faces_out = (int32_t*)std::malloc(faces.size() * sizeof(int32_t));
  std::memcpy(*faces_out, faces.data(), faces.size() * sizeof(int32_t));
}

}  // namespace

extern "C" {

// case_table: int8[16*6]; triangle edge ids, -1 padded (2 tris max/case).
// Returns 0 on success.  Caller frees *verts_out / *faces_out with mt_free.
int mt_run(const float* vol, int64_t X, int64_t Y, int64_t Z, float thresh,
           const int8_t* case_table, int n_threads,
           float** verts_out, int64_t* n_verts, int32_t** faces_out,
           int64_t* n_faces) {
  const int64_t YZ = Y * Z;
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  const int64_t nx = X - 1;
  if (n_threads > nx) n_threads = (int)nx;

  std::vector<ThreadOut> outs(n_threads);
  std::vector<std::thread> threads;

  auto worker = [&](int t) {
    ThreadOut& out = outs[t];
    EdgeMap map(1 << 16);
    const int64_t x0 = nx * t / n_threads;
    const int64_t x1 = nx * (t + 1) / n_threads;

    for (int64_t x = x0; x < x1; ++x)
      for (int64_t y = 0; y < Y - 1; ++y)
        for (int64_t z = 0; z < Z - 1; ++z)
          process_cube(vol, YZ, Y, Z, thresh, case_table, x, y, z, out, map);
  };

  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();

  merge_outputs(outs, verts_out, n_verts, faces_out, n_faces);
  return 0;
}

// Masked variant: process only the cubes of the given cells (voxel-origin
// triples, each covering factor^3 voxels) plus a one-cube overlap on the
// low side of each axis so crossings on cell borders into fill regions are
// caught.  A shared visited bitmap (atomic fetch-or) prevents duplicate
// cube emission when overlapping ranges collide across cells/threads.
int mt_run_cells(const float* vol, int64_t X, int64_t Y, int64_t Z,
                 float thresh, const int8_t* case_table, int n_threads,
                 const int32_t* cells, int64_t n_cells, int factor,
                 float** verts_out, int64_t* n_verts, int32_t** faces_out,
                 int64_t* n_faces) {
  const int64_t YZ = Y * Z;
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  if ((int64_t)n_threads > n_cells) n_threads = (int)(n_cells > 0 ? n_cells : 1);

  const int64_t ncx = X - 1, ncy = Y - 1, ncz = Z - 1;
  const int64_t n_cubes = ncx * ncy * ncz;
  std::vector<unsigned char> visited((n_cubes + 7) / 8, 0);
  unsigned char* vis = visited.data();

  std::vector<ThreadOut> outs(n_threads);
  std::vector<std::thread> threads;

  auto worker = [&](int t) {
    ThreadOut& out = outs[t];
    EdgeMap map(1 << 14);
    const int64_t c0 = n_cells * t / n_threads;
    const int64_t c1 = n_cells * (t + 1) / n_threads;
    for (int64_t ci = c0; ci < c1; ++ci) {
      const int64_t bx = cells[ci * 3 + 0];
      const int64_t by = cells[ci * 3 + 1];
      const int64_t bz = cells[ci * 3 + 2];
      const int64_t x0 = bx > 0 ? bx - 1 : 0;
      const int64_t y0 = by > 0 ? by - 1 : 0;
      const int64_t z0 = bz > 0 ? bz - 1 : 0;
      const int64_t x1 = bx + factor - 1 < ncx ? bx + factor - 1 : ncx - 1;
      const int64_t y1 = by + factor - 1 < ncy ? by + factor - 1 : ncy - 1;
      const int64_t z1 = bz + factor - 1 < ncz ? bz + factor - 1 : ncz - 1;
      for (int64_t x = x0; x <= x1; ++x)
        for (int64_t y = y0; y <= y1; ++y)
          for (int64_t z = z0; z <= z1; ++z) {
            const int64_t cid = (x * ncy + y) * ncz + z;
            const unsigned char bit = (unsigned char)(1u << (cid & 7));
            const unsigned char prev =
                __atomic_fetch_or(&vis[cid >> 3], bit, __ATOMIC_RELAXED);
            if (prev & bit) continue;  // already claimed
            process_cube(vol, YZ, Y, Z, thresh, case_table, x, y, z, out,
                         map);
          }
    }
  };

  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();

  merge_outputs(outs, verts_out, n_verts, faces_out, n_faces);
  return 0;
}

void mt_free(void* p) { std::free(p); }

}  // extern "C"
