// Native mesh-graph engine for midastouch_tpu (host-side preprocessing).
//
// Replaces the reference's potpourri3d (geometry-central C++) geodesic
// machinery (data_gen/utils.py:25-52) with a self-contained implementation:
//   * geodesic_path : Dijkstra shortest path over the mesh edge graph
//   * feature_edges : sharp/boundary edge extraction by dihedral angle
//     (pyvista extract_feature_edges equivalent, modules/mesh.py:46-69)
//
// Exposed as extern "C" for ctypes; see native/__init__.py for the Python
// wrapper and the scipy fallback used when the library isn't built.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct Edge {
  int to;
  float w;
};

inline uint64_t ekey(int a, int b) {
  if (a > b) std::swap(a, b);
  return (static_cast<uint64_t>(a) << 32) | static_cast<uint32_t>(b);
}

}  // namespace

extern "C" {

// Dijkstra over the vertex-edge graph. Returns path length (#vertices) or
// -1 if no path / truncated. out_path receives vertex ids src..dst.
int geodesic_path(const float* verts, int nv, const int* faces, int nf,
                  int src, int dst, int* out_path, int max_len) {
  if (src < 0 || src >= nv || dst < 0 || dst >= nv) return -1;
  std::vector<std::vector<Edge>> adj(nv);
  auto addedge = [&](int a, int b) {
    const float dx = verts[3 * a] - verts[3 * b];
    const float dy = verts[3 * a + 1] - verts[3 * b + 1];
    const float dz = verts[3 * a + 2] - verts[3 * b + 2];
    const float w = std::sqrt(dx * dx + dy * dy + dz * dz);
    adj[a].push_back({b, w});
    adj[b].push_back({a, w});
  };
  for (int f = 0; f < nf; ++f) {
    const int a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
    addedge(a, b);
    addedge(b, c);
    addedge(c, a);
  }

  std::vector<float> dist(nv, INFINITY);
  std::vector<int> prev(nv, -1);
  using QN = std::pair<float, int>;
  std::priority_queue<QN, std::vector<QN>, std::greater<QN>> pq;
  dist[src] = 0.f;
  pq.push({0.f, src});
  while (!pq.empty()) {
    auto [d, u] = pq.top();
    pq.pop();
    if (u == dst) break;
    if (d > dist[u]) continue;
    for (const Edge& e : adj[u]) {
      const float nd = d + e.w;
      if (nd < dist[e.to]) {
        dist[e.to] = nd;
        prev[e.to] = u;
        pq.push({nd, e.to});
      }
    }
  }
  if (!std::isfinite(dist[dst])) return -1;

  std::vector<int> path;
  for (int v = dst; v != -1; v = prev[v]) path.push_back(v);
  if (static_cast<int>(path.size()) > max_len) return -1;
  const int n = static_cast<int>(path.size());
  for (int i = 0; i < n; ++i) out_path[i] = path[n - 1 - i];
  return n;
}

// Sharp + boundary edges. out_edges must hold 2*max_edges ints. Returns the
// number of edges written (or -1 on overflow).
int feature_edges(const float* verts, int nv, const int* faces, int nf,
                  float angle_deg, int* out_edges, int max_edges) {
  (void)nv;
  // face normals
  std::vector<float> fn(3 * nf);
  for (int f = 0; f < nf; ++f) {
    const int a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
    float u[3], v[3];
    for (int k = 0; k < 3; ++k) {
      u[k] = verts[3 * b + k] - verts[3 * a + k];
      v[k] = verts[3 * c + k] - verts[3 * a + k];
    }
    float n[3] = {u[1] * v[2] - u[2] * v[1], u[2] * v[0] - u[0] * v[2],
                  u[0] * v[1] - u[1] * v[0]};
    const float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    for (int k = 0; k < 3; ++k) fn[3 * f + k] = len > 0 ? n[k] / len : 0.f;
  }

  std::unordered_map<uint64_t, int> first_face;
  first_face.reserve(3 * nf);
  const float cos_thresh = std::cos(angle_deg * 3.14159265358979f / 180.f);
  int count = 0;
  auto emit = [&](int a, int b) -> bool {
    if (count >= max_edges) return false;
    out_edges[2 * count] = a;
    out_edges[2 * count + 1] = b;
    ++count;
    return true;
  };

  std::unordered_map<uint64_t, int> seen_twice;
  for (int f = 0; f < nf; ++f) {
    const int vs[3] = {faces[3 * f], faces[3 * f + 1], faces[3 * f + 2]};
    for (int e = 0; e < 3; ++e) {
      const int a = vs[e], b = vs[(e + 1) % 3];
      const uint64_t k = ekey(a, b);
      auto it = first_face.find(k);
      if (it == first_face.end()) {
        first_face.emplace(k, f);
      } else {
        seen_twice[k] = 1;
        const int g = it->second;
        float dot = 0.f;
        for (int t = 0; t < 3; ++t) dot += fn[3 * f + t] * fn[3 * g + t];
        if (dot < cos_thresh) {
          if (!emit(a, b)) return -1;
        }
      }
    }
  }
  // boundary edges: seen exactly once
  for (const auto& [k, f] : first_face) {
    if (seen_twice.count(k)) continue;
    const int a = static_cast<int>(k >> 32);
    const int b = static_cast<int>(k & 0xffffffffu);
    if (!emit(a, b)) return -1;
  }
  return count;
}

}  // extern "C"
