// Native marching-tetrahedra isosurface kernel.
//
// TPU-native framework note: rendering/compute runs on TPU via XLA; this
// offline export-path kernel replaces the reference's external C++ deps
// (PyMCubes / nerfacc mesh utilities, SURVEY.md §2.3 N4). Same algorithm as
// scaledreamer_tpu/models/isosurface.py::marching_tetrahedra_numpy — Kuhn
// 6-tet cube decomposition, per-edge vertex dedup via hash map.
//
// Build: g++ -O3 -shared -fPIC -o libmarching_tets.so marching_tets.cpp
// ABI (C):
//   int marching_tets(const float* field, int n, float iso,
//                     float** out_verts, int** out_faces,
//                     int* n_verts, int* n_faces);
//   void mt_free(void* p);

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

const int kCubeTets[6][4] = {
    {0, 1, 3, 7}, {0, 1, 5, 7}, {0, 2, 3, 7},
    {0, 2, 6, 7}, {0, 4, 5, 7}, {0, 4, 6, 7},
};

const int kCornerOff[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1},
};

struct V3 {
  double x, y, z;
};

}  // namespace

extern "C" {

int marching_tets(const float* field, int n, float iso, float** out_verts,
                  int** out_faces, int* n_verts, int* n_faces) {
  const int64_t N = n;
  auto F = [&](int64_t i, int64_t j, int64_t k) -> double {
    return static_cast<double>(field[(i * N + j) * N + k]) - iso;
  };
  // edge key: two packed grid-corner ids (i*N+j)*N+k, ordered
  std::unordered_map<uint64_t, int> edge_cache;
  edge_cache.reserve(1 << 16);
  std::vector<float> verts;
  std::vector<int> faces;
  verts.reserve(1 << 16);
  faces.reserve(1 << 16);

  auto corner_id = [&](int64_t i, int64_t j, int64_t k) -> uint64_t {
    return static_cast<uint64_t>((i * N + j) * N + k);
  };

  auto vertex_on_edge = [&](int64_t ci[3], int a, int b, double va,
                            double vb) -> int {
    int64_t pa[3] = {ci[0] + kCornerOff[a][0], ci[1] + kCornerOff[a][1],
                     ci[2] + kCornerOff[a][2]};
    int64_t pb[3] = {ci[0] + kCornerOff[b][0], ci[1] + kCornerOff[b][1],
                     ci[2] + kCornerOff[b][2]};
    uint64_t ka = corner_id(pa[0], pa[1], pa[2]);
    uint64_t kb = corner_id(pb[0], pb[1], pb[2]);
    uint64_t key = ka < kb ? (ka << 32 | kb) : (kb << 32 | ka);
    auto it = edge_cache.find(key);
    if (it != edge_cache.end()) return it->second;
    double t = (va != vb) ? va / (va - vb) : 0.5;
    float vx = static_cast<float>(pa[0] + t * (pb[0] - pa[0]));
    float vy = static_cast<float>(pa[1] + t * (pb[1] - pa[1]));
    float vz = static_cast<float>(pa[2] + t * (pb[2] - pa[2]));
    int idx = static_cast<int>(verts.size() / 3);
    verts.push_back(vx);
    verts.push_back(vy);
    verts.push_back(vz);
    edge_cache.emplace(key, idx);
    return idx;
  };

  for (int64_t i = 0; i + 1 < N; ++i) {
    for (int64_t j = 0; j + 1 < N; ++j) {
      for (int64_t k = 0; k + 1 < N; ++k) {
        double cv[8];
        bool any_neg = false, any_pos = false;
        for (int c = 0; c < 8; ++c) {
          cv[c] = F(i + kCornerOff[c][0], j + kCornerOff[c][1],
                    k + kCornerOff[c][2]);
          any_neg |= cv[c] < 0;
          any_pos |= cv[c] >= 0;
        }
        if (!any_neg || !any_pos) continue;
        int64_t ci[3] = {i, j, k};
        for (const auto& tet : kCubeTets) {
          double tv[4] = {cv[tet[0]], cv[tet[1]], cv[tet[2]], cv[tet[3]]};
          int idx_in[4], idx_out[4], ni = 0, no = 0;
          for (int v = 0; v < 4; ++v) {
            if (tv[v] < 0) idx_in[ni++] = v;
            else idx_out[no++] = v;
          }
          if (ni == 0 || ni == 4) continue;
          // outward direction: inside-corner centroid -> outside centroid
          double pin[3] = {0, 0, 0}, pout[3] = {0, 0, 0};
          for (int v = 0; v < ni; ++v)
            for (int d = 0; d < 3; ++d)
              pin[d] += ci[d] + kCornerOff[tet[idx_in[v]]][d];
          for (int v = 0; v < no; ++v)
            for (int d = 0; d < 3; ++d)
              pout[d] += ci[d] + kCornerOff[tet[idx_out[v]]][d];
          double odir[3];
          for (int d = 0; d < 3; ++d)
            odir[d] = pout[d] / no - pin[d] / ni;
          auto emit = [&](int ea0, int ea1, int eb0, int eb1, int ec0,
                          int ec1) {
            int v0 = vertex_on_edge(ci, tet[ea0], tet[ea1], tv[ea0], tv[ea1]);
            int v1 = vertex_on_edge(ci, tet[eb0], tet[eb1], tv[eb0], tv[eb1]);
            int v2 = vertex_on_edge(ci, tet[ec0], tet[ec1], tv[ec0], tv[ec1]);
            if (v0 != v1 && v1 != v2 && v0 != v2) {
              // orient toward odir
              const float* a = &verts[3 * v0];
              const float* b = &verts[3 * v1];
              const float* c = &verts[3 * v2];
              double e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
              double e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
              double nx = e1[1] * e2[2] - e1[2] * e2[1];
              double ny = e1[2] * e2[0] - e1[0] * e2[2];
              double nz = e1[0] * e2[1] - e1[1] * e2[0];
              if (nx * odir[0] + ny * odir[1] + nz * odir[2] < 0) {
                int tmp = v1; v1 = v2; v2 = tmp;
              }
              faces.push_back(v0);
              faces.push_back(v1);
              faces.push_back(v2);
            }
          };
          if (ni == 1) {
            int a = idx_in[0];
            emit(a, idx_out[0], a, idx_out[1], a, idx_out[2]);
          } else if (ni == 3) {
            int a = idx_out[0];
            emit(idx_in[0], a, idx_in[2], a, idx_in[1], a);
          } else {  // ni == 2
            int a = idx_in[0], b = idx_in[1];
            int c = idx_out[0], d = idx_out[1];
            emit(a, c, a, d, b, d);
            emit(a, c, b, d, b, c);
          }
        }
      }
    }
  }

  *n_verts = static_cast<int>(verts.size() / 3);
  *n_faces = static_cast<int>(faces.size() / 3);
  *out_verts = static_cast<float*>(std::malloc(verts.size() * sizeof(float)));
  *out_faces = static_cast<int*>(std::malloc(faces.size() * sizeof(int)));
  if (!*out_verts || !*out_faces) return -1;
  std::memcpy(*out_verts, verts.data(), verts.size() * sizeof(float));
  std::memcpy(*out_faces, faces.data(), faces.size() * sizeof(int));
  return 0;
}

void mt_free(void* p) { std::free(p); }

}  // extern "C"
