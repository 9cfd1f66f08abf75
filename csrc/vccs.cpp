// VCCS supervoxel clustering, self-contained (no PCL).
//
// TPU-native-framework replacement for the reference's
// pcl_related/supervoxel_clustering.cpp (a 98-line wrapper over
// pcl::SupervoxelClustering with voxel_res=0.5, seed_res=10.0, color=0.1,
// spatial=0.4, normal=1.0 and single_camera_transform=false).  Same algorithm
// family, implemented from the VCCS paper (Papon et al., CVPR 2013):
//
//   1. voxelize at voxel_resolution (hash grid), centroid per voxel;
//   2. per-voxel normal from the covariance of 26-adjacent voxel centroids;
//   3. seeds on a seed_resolution grid, snapped to the nearest occupied voxel,
//      pruned when isolated;
//   4. flow-constrained growing: multi-source best-first expansion through the
//      voxel adjacency graph, each voxel claimed by the supervoxel with minimal
//        D^2 = wc*Dc^2 + ws*Ds^2/(3*Rseed)^2 + wn*Dn^2     (no color here)
//      (expansion only through adjacency => supervoxels stay connected);
//   5. centroid/normal update + re-expansion for a few iterations.
//
// Labels are 1-based per supervoxel; 0 = unassigned (matches the PCL output
// convention the reference's prep script consumes, where label 0 is pruned —
// dataset/prepare_supervoxel_VCCS_sk.py:71-77).
//
// C ABI for ctypes:
//   int vccs_cluster(const float* xyz, long long n,
//                    float voxel_res, float seed_res,
//                    float color_w, float spatial_w, float normal_w,
//                    int iterations, unsigned* labels_out /* [n] */);
// Returns the number of supervoxels (>= 0) or -1 on error.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct VoxelKey {
  int32_t x, y, z;
  bool operator==(const VoxelKey& o) const { return x == o.x && y == o.y && z == o.z; }
};

struct VoxelKeyHash {
  size_t operator()(const VoxelKey& k) const {
    // 64-bit mix of the three 21-bit fields
    uint64_t v = (uint64_t)(uint32_t)k.x * 73856093ULL ^
                 (uint64_t)(uint32_t)k.y * 19349669ULL ^
                 (uint64_t)(uint32_t)k.z * 83492791ULL;
    return (size_t)v;
  }
};

struct Voxel {
  float cx = 0, cy = 0, cz = 0;  // centroid
  float nx = 0, ny = 0, nz = 1;  // normal
  int32_t count = 0;
  int32_t label = 0;  // 0 = unassigned
  float best_d = 0;   // distance of the current claim
};

struct Cluster {
  double cx = 0, cy = 0, cz = 0;
  double nx = 0, ny = 0, nz = 0;
  int64_t n = 0;
};

// smallest-eigenvalue eigenvector of a symmetric 3x3 (covariance) matrix
void smallest_evec(const double m[6], float* out) {
  // m = [xx, xy, xz, yy, yz, zz]; inverse power iteration with shifts is
  // overkill — use the cross-product method over column pairs of (m - l*I)
  // with l = smallest eigenvalue found by the closed-form cubic.
  double xx = m[0], xy = m[1], xz = m[2], yy = m[3], yz = m[4], zz = m[5];
  double q = (xx + yy + zz) / 3.0;
  double p1 = xy * xy + xz * xz + yz * yz;
  double p2 = (xx - q) * (xx - q) + (yy - q) * (yy - q) + (zz - q) * (zz - q) + 2.0 * p1;
  double p = std::sqrt(std::max(p2 / 6.0, 1e-30));
  double bxx = (xx - q) / p, bxy = xy / p, bxz = xz / p;
  double byy = (yy - q) / p, byz = yz / p, bzz = (zz - q) / p;
  double detb = bxx * (byy * bzz - byz * byz) - bxy * (bxy * bzz - byz * bxz) +
                bxz * (bxy * byz - byy * bxz);
  double r = detb / 2.0;
  r = std::min(1.0, std::max(-1.0, r));
  double phi = std::acos(r) / 3.0;
  double eig1 = q + 2.0 * p * std::cos(phi);                      // largest
  double eig3 = q + 2.0 * p * std::cos(phi + 2.0 * M_PI / 3.0);   // smallest
  double eig2 = 3.0 * q - eig1 - eig3;
  (void)eig2;
  // rows of (A - eig3 I)
  double r0[3] = {xx - eig3, xy, xz};
  double r1[3] = {xy, yy - eig3, yz};
  double r2[3] = {xz, yz, zz - eig3};
  double c01[3] = {r0[1] * r1[2] - r0[2] * r1[1], r0[2] * r1[0] - r0[0] * r1[2],
                   r0[0] * r1[1] - r0[1] * r1[0]};
  double c02[3] = {r0[1] * r2[2] - r0[2] * r2[1], r0[2] * r2[0] - r0[0] * r2[2],
                   r0[0] * r2[1] - r0[1] * r2[0]};
  double c12[3] = {r1[1] * r2[2] - r1[2] * r2[1], r1[2] * r2[0] - r1[0] * r2[2],
                   r1[0] * r2[1] - r1[1] * r2[0]};
  double n01 = c01[0] * c01[0] + c01[1] * c01[1] + c01[2] * c01[2];
  double n02 = c02[0] * c02[0] + c02[1] * c02[1] + c02[2] * c02[2];
  double n12 = c12[0] * c12[0] + c12[1] * c12[1] + c12[2] * c12[2];
  double* best = c01;
  double bn = n01;
  if (n02 > bn) { best = c02; bn = n02; }
  if (n12 > bn) { best = c12; bn = n12; }
  if (bn < 1e-24) { out[0] = 0; out[1] = 0; out[2] = 1; return; }
  double inv = 1.0 / std::sqrt(bn);
  out[0] = (float)(best[0] * inv);
  out[1] = (float)(best[1] * inv);
  out[2] = (float)(best[2] * inv);
}

struct QItem {
  float dist;
  int32_t voxel;
  int32_t label;
  bool operator<(const QItem& o) const { return dist > o.dist; }  // min-heap
};

}  // namespace

extern "C" int vccs_cluster(const float* xyz, long long n, float voxel_res,
                            float seed_res, float color_w, float spatial_w,
                            float normal_w, int iterations,
                            unsigned* labels_out) {
  (void)color_w;  // PointXYZ input: no color channel (reference uses PointXYZ too)
  if (n <= 0 || voxel_res <= 0 || seed_res <= 0 || !xyz || !labels_out) return -1;

  // ---- 1. voxelize ---------------------------------------------------------------
  std::unordered_map<VoxelKey, int32_t, VoxelKeyHash> vmap;
  vmap.reserve((size_t)n);
  std::vector<Voxel> voxels;
  std::vector<int32_t> point_voxel((size_t)n);
  const float inv_res = 1.0f / voxel_res;
  for (long long i = 0; i < n; ++i) {
    VoxelKey k{(int32_t)std::floor(xyz[3 * i] * inv_res),
               (int32_t)std::floor(xyz[3 * i + 1] * inv_res),
               (int32_t)std::floor(xyz[3 * i + 2] * inv_res)};
    auto it = vmap.find(k);
    int32_t vid;
    if (it == vmap.end()) {
      vid = (int32_t)voxels.size();
      vmap.emplace(k, vid);
      voxels.push_back(Voxel{});
    } else {
      vid = it->second;
    }
    Voxel& v = voxels[vid];
    v.cx += xyz[3 * i];
    v.cy += xyz[3 * i + 1];
    v.cz += xyz[3 * i + 2];
    v.count += 1;
    point_voxel[(size_t)i] = vid;
  }
  const int32_t nv = (int32_t)voxels.size();
  for (auto& v : voxels) {
    v.cx /= v.count; v.cy /= v.count; v.cz /= v.count;
  }

  // ---- adjacency (26-connectivity) ----------------------------------------------
  std::vector<int32_t> adj_start(nv + 1, 0);
  std::vector<int32_t> adj;
  adj.reserve((size_t)nv * 8);
  {
    std::vector<VoxelKey> keys(nv);
    for (const auto& kv : vmap) keys[kv.second] = kv.first;
    std::vector<std::vector<int32_t>> tmp(nv);
    for (int32_t v = 0; v < nv; ++v) {
      const VoxelKey& k = keys[v];
      for (int dx = -1; dx <= 1; ++dx)
        for (int dy = -1; dy <= 1; ++dy)
          for (int dz = -1; dz <= 1; ++dz) {
            if (!dx && !dy && !dz) continue;
            auto it = vmap.find(VoxelKey{k.x + dx, k.y + dy, k.z + dz});
            if (it != vmap.end()) tmp[v].push_back(it->second);
          }
    }
    for (int32_t v = 0; v < nv; ++v) {
      adj_start[v] = (int32_t)adj.size();
      adj.insert(adj.end(), tmp[v].begin(), tmp[v].end());
    }
    adj_start[nv] = (int32_t)adj.size();
  }

  // ---- 2. normals ----------------------------------------------------------------
  for (int32_t v = 0; v < nv; ++v) {
    double sx = voxels[v].cx, sy = voxels[v].cy, sz = voxels[v].cz;
    int cnt = 1;
    for (int32_t e = adj_start[v]; e < adj_start[v + 1]; ++e) {
      const Voxel& u = voxels[adj[e]];
      sx += u.cx; sy += u.cy; sz += u.cz; ++cnt;
    }
    double mx = sx / cnt, my = sy / cnt, mz = sz / cnt;
    double m[6] = {0, 0, 0, 0, 0, 0};
    auto acc = [&](const Voxel& u) {
      double dx = u.cx - mx, dy = u.cy - my, dz = u.cz - mz;
      m[0] += dx * dx; m[1] += dx * dy; m[2] += dx * dz;
      m[3] += dy * dy; m[4] += dy * dz; m[5] += dz * dz;
    };
    acc(voxels[v]);
    for (int32_t e = adj_start[v]; e < adj_start[v + 1]; ++e) acc(voxels[adj[e]]);
    float nrm[3];
    smallest_evec(m, nrm);
    voxels[v].nx = nrm[0]; voxels[v].ny = nrm[1]; voxels[v].nz = nrm[2];
  }

  // ---- 3. seeds ------------------------------------------------------------------
  std::unordered_map<VoxelKey, int32_t, VoxelKeyHash> seed_bins;  // bin -> voxel id
  const float inv_seed = 1.0f / seed_res;
  for (int32_t v = 0; v < nv; ++v) {
    VoxelKey b{(int32_t)std::floor(voxels[v].cx * inv_seed),
               (int32_t)std::floor(voxels[v].cy * inv_seed),
               (int32_t)std::floor(voxels[v].cz * inv_seed)};
    float bx = (b.x + 0.5f) * seed_res, by = (b.y + 0.5f) * seed_res,
          bz = (b.z + 0.5f) * seed_res;
    float d = (voxels[v].cx - bx) * (voxels[v].cx - bx) +
              (voxels[v].cy - by) * (voxels[v].cy - by) +
              (voxels[v].cz - bz) * (voxels[v].cz - bz);
    auto it = seed_bins.find(b);
    if (it == seed_bins.end()) {
      seed_bins.emplace(b, v);
    } else {
      const Voxel& cur = voxels[it->second];
      float dc = (cur.cx - bx) * (cur.cx - bx) + (cur.cy - by) * (cur.cy - by) +
                 (cur.cz - bz) * (cur.cz - bz);
      if (d < dc) it->second = v;
    }
  }
  std::vector<int32_t> seeds;
  for (const auto& kv : seed_bins) {
    int32_t v = kv.second;
    // prune isolated seeds (PCL prunes seeds with too few voxels nearby)
    if (adj_start[v + 1] - adj_start[v] >= 2) seeds.push_back(v);
  }
  std::sort(seeds.begin(), seeds.end());  // deterministic label order
  const int32_t k = (int32_t)seeds.size();
  if (k == 0) {
    std::memset(labels_out, 0, sizeof(unsigned) * (size_t)n);
    return 0;
  }

  // ---- 4-5. iterative flow-constrained growing -----------------------------------
  std::vector<Cluster> clusters((size_t)k);
  for (int32_t c = 0; c < k; ++c) {
    const Voxel& v = voxels[seeds[c]];
    clusters[c] = Cluster{v.cx, v.cy, v.cz, v.nx, v.ny, v.nz, 1};
  }
  const float norm_s = 1.0f / (3.0f * seed_res * 3.0f * seed_res);
  const float max_radius2 = seed_res * seed_res;  // growth horizon

  auto sv_dist = [&](const Cluster& c, const Voxel& v) -> float {
    float dx = v.cx - (float)c.cx, dy = v.cy - (float)c.cy, dz = v.cz - (float)c.cz;
    float ds2 = dx * dx + dy * dy + dz * dz;
    if (ds2 > max_radius2) return -1.0f;  // outside the supervoxel's reach
    float dot = v.nx * (float)c.nx + v.ny * (float)c.ny + v.nz * (float)c.nz;
    if (dot < 0) dot = -dot;  // unoriented normals
    float dn = 1.0f - dot;
    return spatial_w * ds2 * norm_s + normal_w * dn * dn;
  };

  std::vector<int32_t> order((size_t)nv);
  for (int it = 0; it < std::max(1, iterations); ++it) {
    for (auto& v : voxels) { v.label = 0; v.best_d = 0; }
    std::priority_queue<QItem> pq;
    for (int32_t c = 0; c < k; ++c) {
      const Voxel& sv = voxels[seeds[c]];
      float d = sv_dist(clusters[c], sv);
      if (d >= 0) pq.push(QItem{d, seeds[c], c + 1});
    }
    while (!pq.empty()) {
      QItem q = pq.top();
      pq.pop();
      Voxel& v = voxels[q.voxel];
      if (v.label != 0) continue;  // already claimed by a closer supervoxel
      v.label = q.label;
      v.best_d = q.dist;
      for (int32_t e = adj_start[q.voxel]; e < adj_start[q.voxel + 1]; ++e) {
        Voxel& u = voxels[adj[e]];
        if (u.label != 0) continue;
        float d = sv_dist(clusters[q.label - 1], u);
        if (d >= 0) pq.push(QItem{d, adj[e], q.label});
      }
    }
    // centroid/normal update
    for (auto& c : clusters) c = Cluster{};
    for (int32_t v = 0; v < nv; ++v) {
      if (!voxels[v].label) continue;
      Cluster& c = clusters[voxels[v].label - 1];
      c.cx += voxels[v].cx; c.cy += voxels[v].cy; c.cz += voxels[v].cz;
      c.nx += voxels[v].nx; c.ny += voxels[v].ny; c.nz += voxels[v].nz;
      c.n += 1;
    }
    for (auto& c : clusters) {
      if (!c.n) continue;
      c.cx /= c.n; c.cy /= c.n; c.cz /= c.n;
      double nn = std::sqrt(c.nx * c.nx + c.ny * c.ny + c.nz * c.nz);
      if (nn > 1e-12) { c.nx /= nn; c.ny /= nn; c.nz /= nn; }
      else { c.nx = 0; c.ny = 0; c.nz = 1; }
    }
  }
  (void)order;

  for (long long i = 0; i < n; ++i)
    labels_out[(size_t)i] = (unsigned)voxels[point_voxel[(size_t)i]].label;
  return k;
}
