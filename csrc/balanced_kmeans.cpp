// Size-balanced k-means (the reference's k_means_constrained replacement) —
// native implementation of the same greedy capacity-constrained assignment as
// lidal_tpu/prep/supervoxel_kmeans.py (which mirrors the semantics of
// dataset/prepare_supervoxel_kmeans_sk.py:17's KMeansConstrained 20-cluster
// +/-5% partition): kmeans++ seeding, regret-ordered greedy assignment under a
// per-cluster capacity, Lloyd centroid updates.
//
// C ABI for ctypes:
//   int balanced_kmeans(const float* xyz, long long n, int k, float size_tol,
//                       int lloyd_iters, unsigned long long seed,
//                       int* labels_out /* [n] */);
// Returns the number of clusters used (<= k) or -1 on error.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

// xoshiro-ish splitmix64 for deterministic seeding
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed + 0x9E3779B97F4A7C15ULL) {}
  uint64_t next() {
    uint64_t z = (s += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

inline float d2(const float* a, const float* b) {
  float dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
  return dx * dx + dy * dy + dz * dz;
}

}  // namespace

extern "C" int balanced_kmeans(const float* xyz, long long n, int k,
                               float size_tol, int lloyd_iters,
                               unsigned long long seed, int* labels_out) {
  if (n <= 0 || k <= 0 || !xyz || !labels_out) return -1;
  const int kk = (int)std::min<long long>(k, n);
  Rng rng(seed);

  // kmeans++ init
  std::vector<float> centers((size_t)kk * 3);
  std::vector<float> mind((size_t)n);
  {
    long long first = (long long)(rng.uniform() * n);
    if (first >= n) first = n - 1;
    std::copy(xyz + 3 * first, xyz + 3 * first + 3, centers.begin());
    for (long long i = 0; i < n; ++i) mind[(size_t)i] = d2(xyz + 3 * i, centers.data());
    for (int c = 1; c < kk; ++c) {
      double total = 0;
      for (long long i = 0; i < n; ++i) total += mind[(size_t)i];
      double r = rng.uniform() * total;
      long long pick = n - 1;
      double acc = 0;
      for (long long i = 0; i < n; ++i) {
        acc += mind[(size_t)i];
        if (acc >= r) { pick = i; break; }
      }
      std::copy(xyz + 3 * pick, xyz + 3 * pick + 3, centers.begin() + 3 * c);
      for (long long i = 0; i < n; ++i)
        mind[(size_t)i] = std::min(mind[(size_t)i], d2(xyz + 3 * i, centers.data() + 3 * c));
    }
  }

  // integer-robust capacity: floor(n * (1 + tol) / k), at least ceil(n / k)
  long long cap = (long long)(((double)n * (1.0 + (double)size_tol)) / kk);
  cap = std::max(cap, (n + kk - 1) / (long long)kk);
  std::vector<float> dist((size_t)n * kk);
  std::vector<int> pref((size_t)n * kk);
  std::vector<long long> order((size_t)n);
  std::vector<long long> counts((size_t)kk);
  std::vector<double> sums((size_t)kk * 3);

  for (int it = 0; it < std::max(1, lloyd_iters); ++it) {
    for (long long i = 0; i < n; ++i)
      for (int c = 0; c < kk; ++c)
        dist[(size_t)i * kk + c] = d2(xyz + 3 * i, centers.data() + 3 * c);

    // regret order: argsort(min - mean), most negative first (python parity)
    std::vector<float> regret((size_t)n);
    for (long long i = 0; i < n; ++i) {
      const float* di = &dist[(size_t)i * kk];
      float mn = di[0];
      double mean = 0;
      for (int c = 0; c < kk; ++c) { mn = std::min(mn, di[c]); mean += di[c]; }
      regret[(size_t)i] = mn - (float)(mean / kk);
    }
    std::iota(order.begin(), order.end(), 0LL);
    std::stable_sort(order.begin(), order.end(),
                     [&](long long a, long long b) { return regret[(size_t)a] < regret[(size_t)b]; });

    for (long long i = 0; i < n; ++i) {
      int* pi = &pref[(size_t)i * kk];
      std::iota(pi, pi + kk, 0);
      const float* di = &dist[(size_t)i * kk];
      std::stable_sort(pi, pi + kk, [&](int a, int b) { return di[a] < di[b]; });
    }

    std::fill(counts.begin(), counts.end(), 0LL);
    for (long long oi = 0; oi < n; ++oi) {
      long long p = order[(size_t)oi];
      const int* pi = &pref[(size_t)p * kk];
      for (int c = 0; c < kk; ++c) {
        if (counts[(size_t)pi[c]] < cap) {
          labels_out[(size_t)p] = pi[c];
          counts[(size_t)pi[c]] += 1;
          break;
        }
      }
    }

    std::fill(sums.begin(), sums.end(), 0.0);
    std::vector<long long> cnt((size_t)kk, 0);
    for (long long i = 0; i < n; ++i) {
      int c = labels_out[(size_t)i];
      sums[(size_t)c * 3] += xyz[3 * i];
      sums[(size_t)c * 3 + 1] += xyz[3 * i + 1];
      sums[(size_t)c * 3 + 2] += xyz[3 * i + 2];
      cnt[(size_t)c] += 1;
    }
    for (int c = 0; c < kk; ++c) {
      if (!cnt[(size_t)c]) continue;
      centers[(size_t)c * 3] = (float)(sums[(size_t)c * 3] / cnt[(size_t)c]);
      centers[(size_t)c * 3 + 1] = (float)(sums[(size_t)c * 3 + 1] / cnt[(size_t)c]);
      centers[(size_t)c * 3 + 2] = (float)(sums[(size_t)c * 3 + 2] / cnt[(size_t)c]);
    }
  }
  return kk;
}
