// Quadric edge-collapse mesh simplification (Garland-Heckbert style).
//
// Native replacement for the reference's pymeshlab quadric decimation
// (reference volsurfs_py/utils/mesh_extraction.py:492-539 simplify_o3d_mesh:
// decimate to a faces ratio). Exposed through a plain C ABI and loaded from
// Python with ctypes (no pybind11 in this environment).
//
// Build: g++ -O2 -shared -fPIC -o libmesh_native.so mesh_simplify.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>
#include <unordered_set>
#include <algorithm>

namespace {

struct Quadric {
  // symmetric 4x4 stored as 10 coefficients
  double m[10] = {0};
  void add_plane(double a, double b, double c, double d) {
    m[0] += a * a; m[1] += a * b; m[2] += a * c; m[3] += a * d;
    m[4] += b * b; m[5] += b * c; m[6] += b * d;
    m[7] += c * c; m[8] += c * d;
    m[9] += d * d;
  }
  void add(const Quadric& o) {
    for (int i = 0; i < 10; i++) m[i] += o.m[i];
  }
  double eval(const double* v) const {
    double x = v[0], y = v[1], z = v[2];
    return m[0] * x * x + 2 * m[1] * x * y + 2 * m[2] * x * z + 2 * m[3] * x +
           m[4] * y * y + 2 * m[5] * y * z + 2 * m[6] * y +
           m[7] * z * z + 2 * m[8] * z + m[9];
  }
};

struct EdgeCand {
  double cost;
  int v0, v1;
  int stamp0, stamp1;  // vertex version stamps for lazy invalidation
  double pos[3];
  bool operator<(const EdgeCand& o) const { return cost > o.cost; }  // min-heap
};

inline uint64_t ekey(int a, int b) {
  if (a > b) std::swap(a, b);
  return (uint64_t(a) << 32) | uint64_t(b);
}

}  // namespace

extern "C" {

// Simplify a triangle mesh to approximately target_nf faces.
// verts: nv*3 doubles (modified in place is NOT done; outputs are compacted)
// faces: nf*3 ints
// out_verts: caller-allocated nv*3, out_faces: caller-allocated nf*3
// returns number of output faces; *out_nv receives vertex count.
int mesh_simplify(const double* verts, int nv, const int* faces, int nf,
                  int target_nf, double* out_verts, int* out_faces,
                  int* out_nv) {
  std::vector<double> V(verts, verts + size_t(nv) * 3);
  std::vector<int> F(faces, faces + size_t(nf) * 3);
  std::vector<Quadric> Q(nv);
  std::vector<int> stamp(nv, 0);
  std::vector<char> face_dead(nf, 0);
  std::vector<std::vector<int>> v_faces(nv);

  auto face_plane = [&](int f, double* abcd) -> bool {
    const int* t = &F[size_t(f) * 3];
    const double* p0 = &V[size_t(t[0]) * 3];
    const double* p1 = &V[size_t(t[1]) * 3];
    const double* p2 = &V[size_t(t[2]) * 3];
    double e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    double e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
    double n[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                   e1[2] * e2[0] - e1[0] * e2[2],
                   e1[0] * e2[1] - e1[1] * e2[0]};
    double len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (len < 1e-20) return false;
    for (int i = 0; i < 3; i++) n[i] /= len;
    abcd[0] = n[0]; abcd[1] = n[1]; abcd[2] = n[2];
    abcd[3] = -(n[0] * p0[0] + n[1] * p0[1] + n[2] * p0[2]);
    return true;
  };

  for (int f = 0; f < nf; f++) {
    double pl[4];
    if (!face_plane(f, pl)) { face_dead[f] = 1; continue; }
    for (int k = 0; k < 3; k++) {
      int v = F[size_t(f) * 3 + k];
      Q[v].add_plane(pl[0], pl[1], pl[2], pl[3]);
      v_faces[v].push_back(f);
    }
  }

  std::priority_queue<EdgeCand> heap;

  auto push_edge = [&](int a, int b) {
    if (a == b) return;
    Quadric q = Q[a];
    q.add(Q[b]);
    // candidate positions: endpoints and midpoint; pick cheapest (robust,
    // avoids solving the possibly-singular 4x4 system)
    const double* pa = &V[size_t(a) * 3];
    const double* pb = &V[size_t(b) * 3];
    double mid[3] = {(pa[0] + pb[0]) / 2, (pa[1] + pb[1]) / 2,
                     (pa[2] + pb[2]) / 2};
    const double* cands[3] = {pa, pb, mid};
    double best = 1e300;
    const double* bp = mid;
    for (auto* c : cands) {
      double e = q.eval(c);
      if (e < best) { best = e; bp = c; }
    }
    EdgeCand ec;
    ec.cost = best; ec.v0 = a; ec.v1 = b;
    ec.stamp0 = stamp[a]; ec.stamp1 = stamp[b];
    ec.pos[0] = bp[0]; ec.pos[1] = bp[1]; ec.pos[2] = bp[2];
    heap.push(ec);
  };

  {
    std::unordered_set<uint64_t> seen;
    seen.reserve(size_t(nf) * 3);
    for (int f = 0; f < nf; f++) {
      if (face_dead[f]) continue;
      for (int k = 0; k < 3; k++) {
        int a = F[size_t(f) * 3 + k];
        int b = F[size_t(f) * 3 + (k + 1) % 3];
        if (seen.insert(ekey(a, b)).second) push_edge(a, b);
      }
    }
  }

  std::vector<int> remap(nv);
  for (int i = 0; i < nv; i++) remap[i] = i;
  auto find = [&](int v) {
    while (remap[v] != v) { remap[v] = remap[remap[v]]; v = remap[v]; }
    return v;
  };

  int live_faces = 0;
  for (int f = 0; f < nf; f++) live_faces += !face_dead[f];

  while (live_faces > target_nf && !heap.empty()) {
    EdgeCand ec = heap.top();
    heap.pop();
    int a = find(ec.v0), b = find(ec.v1);
    if (a == b) continue;
    if (stamp[ec.v0] != ec.stamp0 || stamp[ec.v1] != ec.stamp1) continue;

    // normal-flip guard: reject collapse if any surviving face would flip
    bool flip = false;
    double newpos[3] = {ec.pos[0], ec.pos[1], ec.pos[2]};
    for (int pass = 0; pass < 2 && !flip; pass++) {
      int v = pass == 0 ? a : b;
      for (int f : v_faces[v]) {
        if (face_dead[f]) continue;
        int t[3] = {find(F[size_t(f) * 3]), find(F[size_t(f) * 3 + 1]),
                    find(F[size_t(f) * 3 + 2])};
        bool dies = false;
        for (int k = 0; k < 3; k++)
          if ((t[k] == a && (t[(k + 1) % 3] == b || t[(k + 2) % 3] == b)))
            dies = true;
        if (dies) continue;
        double before[4], pl[4];
        if (!face_plane(f, before)) continue;
        // evaluate plane normal with v moved to newpos
        double saved[3];
        std::memcpy(saved, &V[size_t(v) * 3], sizeof saved);
        std::memcpy(&V[size_t(v) * 3], newpos, sizeof saved);
        bool ok = face_plane(f, pl);
        std::memcpy(&V[size_t(v) * 3], saved, sizeof saved);
        if (!ok) { flip = true; break; }
        double dot = before[0] * pl[0] + before[1] * pl[1] + before[2] * pl[2];
        if (dot < 0.2) { flip = true; break; }
      }
    }
    if (flip) continue;

    // collapse b into a
    remap[b] = a;
    std::memcpy(&V[size_t(a) * 3], newpos, 3 * sizeof(double));
    Q[a].add(Q[b]);
    stamp[a]++; stamp[b]++;

    // merge face lists, kill degenerate faces
    for (int f : v_faces[b]) {
      if (face_dead[f]) continue;
      v_faces[a].push_back(f);
    }
    std::vector<int> keep;
    keep.reserve(v_faces[a].size());
    std::unordered_set<int> neighbors;
    for (int f : v_faces[a]) {
      if (face_dead[f]) continue;
      int t[3] = {find(F[size_t(f) * 3]), find(F[size_t(f) * 3 + 1]),
                  find(F[size_t(f) * 3 + 2])};
      if (t[0] == t[1] || t[1] == t[2] || t[0] == t[2]) {
        face_dead[f] = 1;
        live_faces--;
        continue;
      }
      keep.push_back(f);
      for (int k = 0; k < 3; k++)
        if (t[k] != a) neighbors.insert(t[k]);
    }
    v_faces[a] = std::move(keep);
    v_faces[b].clear();

    for (int nvtx : neighbors) push_edge(a, nvtx);
  }

  // compact output
  std::vector<int> new_id(nv, -1);
  int vcount = 0, fcount = 0;
  for (int f = 0; f < nf; f++) {
    if (face_dead[f]) continue;
    int t[3] = {find(F[size_t(f) * 3]), find(F[size_t(f) * 3 + 1]),
                find(F[size_t(f) * 3 + 2])};
    if (t[0] == t[1] || t[1] == t[2] || t[0] == t[2]) continue;
    for (int k = 0; k < 3; k++) {
      int v = t[k];
      if (new_id[v] < 0) {
        new_id[v] = vcount;
        std::memcpy(&out_verts[size_t(vcount) * 3], &V[size_t(v) * 3],
                    3 * sizeof(double));
        vcount++;
      }
      out_faces[size_t(fcount) * 3 + k] = new_id[v];
    }
    fcount++;
  }
  *out_nv = vcount;
  return fcount;
}

}  // extern "C"
