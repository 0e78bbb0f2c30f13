// Binned-SAH BVH builder producing a flattened, stackless (skip-pointer)
// layout consumed by the TPU traversal kernel (volsurfs_tpu/ops/bvh.py).
//
// Native equivalent of the reference's vendored CUDA raytracelib BVH build
// (SURVEY.md N8); the traversal itself runs on-TPU, so only the host-side
// build is native. SAH with 16 bins typically visits ~2x fewer nodes per ray
// than median split, which directly speeds up the baked-render path.
//
// Layout contract (matching ops/bvh.py:BVH):
//   nodes are emitted depth-first, left subtree before right, so the "hit"
//   pointer of an inner node is always node_id+1 and only the "miss" (skip)
//   pointer is stored. Leaves reference a run of `leaf_size` padded triangle
//   slots (pad = -1).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct AABB {
  Vec3 lo{1e30f, 1e30f, 1e30f};
  Vec3 hi{-1e30f, -1e30f, -1e30f};
  void grow(const AABB &o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(const Vec3 &p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
};

struct BuildNode {
  AABB box;
  int left = -1;   // inner: left child id (right = emitted after left subtree)
  int right = -1;
  int first = -1;  // leaf: first index into tri order
  int count = 0;   // leaf: triangle count
};

constexpr int kBins = 16;

struct Builder {
  const float *verts;
  const int *faces;
  int leaf_size;
  std::vector<AABB> tri_box;
  std::vector<Vec3> centroid;
  std::vector<int> order;  // triangle permutation, partitioned in place
  std::vector<BuildNode> nodes;

  Vec3 vert(int i) const { return {verts[3 * i], verts[3 * i + 1], verts[3 * i + 2]}; }

  int build(int begin, int end) {
    int node_id = (int)nodes.size();
    nodes.emplace_back();
    AABB box, cbox;
    for (int i = begin; i < end; ++i) {
      box.grow(tri_box[order[i]]);
      cbox.grow(centroid[order[i]]);
    }
    nodes[node_id].box = box;
    int count = end - begin;
    if (count <= leaf_size) {
      nodes[node_id].first = begin;
      nodes[node_id].count = count;
      return node_id;
    }

    // binned SAH over the widest centroid axis
    float ext[3] = {cbox.hi.x - cbox.lo.x, cbox.hi.y - cbox.lo.y,
                    cbox.hi.z - cbox.lo.z};
    int axis = ext[1] > ext[0] ? 1 : 0;
    if (ext[2] > ext[axis]) axis = 2;
    float lo_a = axis == 0 ? cbox.lo.x : axis == 1 ? cbox.lo.y : cbox.lo.z;
    float extent = ext[axis];

    int mid;
    if (extent < 1e-12f) {
      mid = begin + count / 2;  // all centroids coincide: median split
    } else {
      AABB bin_box[kBins];
      int bin_cnt[kBins] = {0};
      float scale = kBins / extent;
      auto bin_of = [&](int tri) {
        const Vec3 &c = centroid[tri];
        float v = axis == 0 ? c.x : axis == 1 ? c.y : c.z;
        int b = (int)((v - lo_a) * scale);
        return std::min(std::max(b, 0), kBins - 1);
      };
      for (int i = begin; i < end; ++i) {
        int b = bin_of(order[i]);
        bin_box[b].grow(tri_box[order[i]]);
        bin_cnt[b]++;
      }
      // sweep: cost(split after bin s) = Al*Nl + Ar*Nr
      float right_area[kBins];
      AABB acc;
      int acc_n = 0;
      for (int b = kBins - 1; b > 0; --b) {
        acc.grow(bin_box[b]);
        acc_n += bin_cnt[b];
        right_area[b] = acc_n ? acc.area() * acc_n : 0.f;
      }
      float best_cost = 1e30f;
      int best_split = -1;
      acc = AABB();
      acc_n = 0;
      for (int b = 0; b < kBins - 1; ++b) {
        acc.grow(bin_box[b]);
        acc_n += bin_cnt[b];
        if (acc_n == 0 || acc_n == count) continue;
        float cost = acc.area() * acc_n + right_area[b + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_split = b;
        }
      }
      if (best_split < 0) {
        mid = begin + count / 2;
        std::nth_element(order.begin() + begin, order.begin() + mid,
                         order.begin() + end, [&](int a, int b) {
                           const Vec3 &ca = centroid[a];
                           const Vec3 &cb = centroid[b];
                           float va = axis == 0 ? ca.x : axis == 1 ? ca.y : ca.z;
                           float vb = axis == 0 ? cb.x : axis == 1 ? cb.y : cb.z;
                           return va < vb;
                         });
      } else {
        auto it = std::partition(
            order.begin() + begin, order.begin() + end,
            [&](int tri) { return bin_of(tri) <= best_split; });
        mid = (int)(it - order.begin());
        if (mid == begin || mid == end) mid = begin + count / 2;
      }
    }

    int left = build(begin, mid);
    int right = build(mid, end);
    nodes[node_id].left = left;
    nodes[node_id].right = right;
    return node_id;
  }
};

void fill_skip(const std::vector<BuildNode> &nodes, std::vector<int> &skip,
               int node_id, int skip_to) {
  // iterative: (node, skip) worklist
  std::vector<std::pair<int, int>> stack{{node_id, skip_to}};
  while (!stack.empty()) {
    auto [id, s] = stack.back();
    stack.pop_back();
    skip[id] = s;
    const BuildNode &n = nodes[id];
    if (n.left >= 0) {
      stack.push_back({n.right, s});
      stack.push_back({n.left, n.right});
    }
  }
}

}  // namespace

extern "C" {

// Returns the number of nodes (<= 2*nf), or -1 on error.
// Caller-allocated outputs:
//   node_lo/node_hi: [2*nf, 3] float; node_skip/node_first: [2*nf] int
//   leaf_tri_id:     [2*nf*leaf_size] int (-1 padded); *n_leaf_slots set
int bvh_build_sah(const float *verts, int nv, const int *faces, int nf,
                  int leaf_size, float *node_lo, float *node_hi,
                  int *node_skip, int *node_first, int *leaf_tri_id,
                  int *n_leaf_slots) {
  if (nf <= 0 || leaf_size <= 0) return -1;
  Builder b;
  b.verts = verts;
  b.faces = faces;
  b.leaf_size = leaf_size;
  b.tri_box.resize(nf);
  b.centroid.resize(nf);
  b.order.resize(nf);
  b.nodes.reserve(2 * nf);
  for (int i = 0; i < nf; ++i) {
    Vec3 a = b.vert(faces[3 * i]);
    Vec3 v1 = b.vert(faces[3 * i + 1]);
    Vec3 v2 = b.vert(faces[3 * i + 2]);
    AABB box;
    box.grow(a);
    box.grow(v1);
    box.grow(v2);
    b.tri_box[i] = box;
    b.centroid[i] = {(a.x + v1.x + v2.x) / 3.f, (a.y + v1.y + v2.y) / 3.f,
                     (a.z + v1.z + v2.z) / 3.f};
    b.order[i] = i;
  }
  b.build(0, nf);

  int n = (int)b.nodes.size();
  std::vector<int> skip(n);
  fill_skip(b.nodes, skip, 0, n);

  int slot = 0;
  for (int i = 0; i < n; ++i) {
    const BuildNode &nd = b.nodes[i];
    node_lo[3 * i] = nd.box.lo.x;
    node_lo[3 * i + 1] = nd.box.lo.y;
    node_lo[3 * i + 2] = nd.box.lo.z;
    node_hi[3 * i] = nd.box.hi.x;
    node_hi[3 * i + 1] = nd.box.hi.y;
    node_hi[3 * i + 2] = nd.box.hi.z;
    node_skip[i] = skip[i];
    if (nd.count > 0) {
      node_first[i] = slot;
      for (int k = 0; k < leaf_size; ++k) {
        leaf_tri_id[slot + k] = k < nd.count ? b.order[nd.first + k] : -1;
      }
      slot += leaf_size;
    } else {
      node_first[i] = -1;
    }
  }
  *n_leaf_slots = slot;
  return n;
}

}  // extern "C"
