// Marching-tetrahedra iso-surfacer, C++ core.
//
// Native-runtime counterpart of nerf_replication_tpu/utils/mesh_utils.py
// (the reference ships its mesh path on skimage's compiled
// marching_cubes_lewiner, src/utils/mesh_utils.py:8-46; our environment
// has no skimage, so this is the compiled implementation, loaded via
// ctypes with the numpy version as fallback).
//
// Build: make -C native   (produces libmarching_tets.so)
//
// API (C):
//   int mt_extract(const float* grid, int R, float level,
//                  float lo, float hi,
//                  float** out_verts, int* out_n_verts,
//                  int** out_faces, int* out_n_faces);
//   void mt_free(float* verts, int* faces);
// Vertices are deduplicated on shared tet edges via a hash map.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// cube corners, z-fastest: c = 4x + 2y + z
inline void corner_off(int c, int* d) {
  d[0] = (c >> 2) & 1;
  d[1] = (c >> 1) & 1;
  d[2] = c & 1;
}

// 6-tet decomposition of a cube (matches mesh_utils.py _TETS)
constexpr int kTets[6][4] = {
    {0, 5, 1, 3}, {0, 5, 3, 2}, {0, 5, 2, 4},
    {5, 2, 4, 6}, {5, 3, 2, 7}, {5, 2, 6, 7},
};

struct VertexKey {
  // canonical edge id: (min corner global id, max corner global id)
  uint64_t a, b;
  bool operator==(const VertexKey& o) const { return a == o.a && b == o.b; }
};

struct VertexKeyHash {
  size_t operator()(const VertexKey& k) const {
    return std::hash<uint64_t>()(k.a * 1000003ULL ^ k.b);
  }
};

}  // namespace

extern "C" {

int mt_extract(const float* grid, int R, float level, float lo, float hi,
               float** out_verts, int* out_n_verts, int** out_faces,
               int* out_n_faces) {
  const float scale = (hi - lo) / (R - 1);
  std::vector<float> verts;
  std::vector<int> faces;
  std::unordered_map<VertexKey, int, VertexKeyHash> edge_to_vertex;

  auto gidx = [R](int x, int y, int z) -> uint64_t {
    return (uint64_t)(x) * R * R + (uint64_t)(y) * R + z;
  };
  auto val = [&](int x, int y, int z) -> float {
    return grid[gidx(x, y, z)];
  };

  // emit (or reuse) the interpolated vertex on edge (ga, gb)
  auto edge_vertex = [&](uint64_t ga, uint64_t gb, const float* pa,
                         const float* pb, float va, float vb) -> int {
    VertexKey key{ga < gb ? ga : gb, ga < gb ? gb : ga};
    auto it = edge_to_vertex.find(key);
    if (it != edge_to_vertex.end()) return it->second;
    float denom = vb - va;
    if (denom > -1e-12f && denom < 1e-12f) denom = 1e-12f;
    float t = (level - va) / denom;
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    int id = (int)(verts.size() / 3);
    for (int i = 0; i < 3; ++i) {
      float g = pa[i] + t * (pb[i] - pa[i]);
      verts.push_back(lo + g * scale);
    }
    edge_to_vertex.emplace(key, id);
    return id;
  };

  int d[8][3];
  for (int c = 0; c < 8; ++c) corner_off(c, d[c]);

  for (int x = 0; x < R - 1; ++x) {
    for (int y = 0; y < R - 1; ++y) {
      for (int z = 0; z < R - 1; ++z) {
        float cv[8];
        uint64_t cg[8];
        float cp[8][3];
        float vmin = 1e30f, vmax = -1e30f;
        for (int c = 0; c < 8; ++c) {
          int cx = x + d[c][0], cy = y + d[c][1], cz = z + d[c][2];
          cv[c] = val(cx, cy, cz);
          cg[c] = gidx(cx, cy, cz);
          cp[c][0] = (float)cx;
          cp[c][1] = (float)cy;
          cp[c][2] = (float)cz;
          if (cv[c] < vmin) vmin = cv[c];
          if (cv[c] > vmax) vmax = cv[c];
        }
        if (vmin >= level || vmax <= level) continue;

        for (const auto& tet : kTets) {
          int vi[4] = {tet[0], tet[1], tet[2], tet[3]};
          bool in[4];
          int count = 0;
          for (int i = 0; i < 4; ++i) {
            in[i] = cv[vi[i]] > level;
            count += in[i];
          }
          if (count == 0 || count == 4) continue;

          auto EV = [&](int i, int j) {
            return edge_vertex(cg[vi[i]], cg[vi[j]], cp[vi[i]], cp[vi[j]],
                               cv[vi[i]], cv[vi[j]]);
          };

          if (count == 1 || count == 3) {
            // one vertex on the minority side -> single triangle
            int apex = -1;
            bool apex_in = (count == 1);
            for (int i = 0; i < 4; ++i)
              if (in[i] == apex_in) apex = i;
            int others[3], n = 0;
            for (int i = 0; i < 4; ++i)
              if (i != apex) others[n++] = i;
            int a = EV(apex, others[0]);
            int b = EV(apex, others[1]);
            int c2 = EV(apex, others[2]);
            if (count == 1) {
              faces.push_back(a); faces.push_back(b); faces.push_back(c2);
            } else {
              faces.push_back(a); faces.push_back(c2); faces.push_back(b);
            }
          } else {
            // 2 in / 2 out -> quad (two triangles)
            int ins[2], outs[2], ni = 0, no = 0;
            for (int i = 0; i < 4; ++i) (in[i] ? ins[ni++] : outs[no++]) = i;
            int e_ac = EV(ins[0], outs[0]);
            int e_ad = EV(ins[0], outs[1]);
            int e_bc = EV(ins[1], outs[0]);
            int e_bd = EV(ins[1], outs[1]);
            faces.push_back(e_ac); faces.push_back(e_ad); faces.push_back(e_bd);
            faces.push_back(e_ac); faces.push_back(e_bd); faces.push_back(e_bc);
          }
        }
      }
    }
  }

  *out_n_verts = (int)(verts.size() / 3);
  *out_n_faces = (int)(faces.size() / 3);
  *out_verts = (float*)std::malloc(verts.size() * sizeof(float));
  *out_faces = (int*)std::malloc(faces.size() * sizeof(int));
  if ((!*out_verts && !verts.empty()) || (!*out_faces && !faces.empty()))
    return -1;
  std::memcpy(*out_verts, verts.data(), verts.size() * sizeof(float));
  std::memcpy(*out_faces, faces.data(), faces.size() * sizeof(int));
  return 0;
}

void mt_free(float* verts, int* faces) {
  std::free(verts);
  std::free(faces);
}

}  // extern "C"
