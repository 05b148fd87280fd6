// Native hierarchical k-majority vocabulary trainer.
//
// Replaces the training side of DBoW2 (reference Thirdparty/DBoW2 —
// SURVEY.md §1 layer 3): hierarchical clustering of 256-bit ORB
// descriptors with Hamming distance and majority-vote (k-majority)
// centroid updates.  This is host-side, CPU-bound work (EuRoC-scale
// training sets are ~10^5-10^6 descriptors); the descent/quantization at
// runtime stays on-device (ops/bow.py).  Exposed via a C ABI for ctypes.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC vocab.cc -o libvocab.so

#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline int hamming256(const uint64_t* a, const uint64_t* b) {
  return __builtin_popcountll(a[0] ^ b[0]) + __builtin_popcountll(a[1] ^ b[1]) +
         __builtin_popcountll(a[2] ^ b[2]) + __builtin_popcountll(a[3] ^ b[3]);
}

// k-majority clustering of the descriptors whose indices are in `idx`.
// Writes k centroids (32 bytes each) to `cents` and the per-point cluster
// id (0..k-1) into assign_out[i] for i in idx.
void kmajority(const uint64_t* descs, const std::vector<int32_t>& idx, int k,
               int iters, std::mt19937_64& rng, uint64_t* cents,
               int32_t* assign_out) {
  const int n = static_cast<int>(idx.size());
  // init: sample without replacement (or random bits when n < k)
  std::vector<int32_t> perm(idx);
  for (int i = 0; i < k && i < n; ++i) {
    std::uniform_int_distribution<int> d(i, n - 1);
    std::swap(perm[i], perm[d(rng)]);
    std::memcpy(cents + 4 * i, descs + 4 * perm[i], 32);
  }
  for (int i = n; i < k; ++i) {
    for (int w = 0; w < 4; ++w) cents[4 * i + w] = rng();
  }
  if (n == 0) return;

  std::vector<int32_t> assign(n, 0);
  std::vector<int32_t> counts(k);
  // bit counters: k x 256
  std::vector<int32_t> bitcount(static_cast<size_t>(k) * 256);

  for (int it = 0; it < iters; ++it) {
    // assignment
#pragma omp parallel for schedule(static)
    for (int i = 0; i < n; ++i) {
      const uint64_t* d = descs + 4 * idx[i];
      int best = 0, bestd = 257;
      for (int c = 0; c < k; ++c) {
        int h = hamming256(d, cents + 4 * c);
        if (h < bestd) {
          bestd = h;
          best = c;
        }
      }
      assign[i] = best;
    }
    // majority update
    std::fill(counts.begin(), counts.end(), 0);
    std::fill(bitcount.begin(), bitcount.end(), 0);
    for (int i = 0; i < n; ++i) {
      int c = assign[i];
      ++counts[c];
      const uint64_t* d = descs + 4 * idx[i];
      int32_t* bc = bitcount.data() + static_cast<size_t>(c) * 256;
      for (int w = 0; w < 4; ++w) {
        uint64_t v = d[w];
        while (v) {
          int b = __builtin_ctzll(v);
          ++bc[w * 64 + b];
          v &= v - 1;
        }
      }
    }
    for (int c = 0; c < k; ++c) {
      if (counts[c] == 0) {  // dead cluster: reseed from a random point
        std::uniform_int_distribution<int> d(0, n - 1);
        std::memcpy(cents + 4 * c, descs + 4 * idx[d(rng)], 32);
        continue;
      }
      const int32_t* bc = bitcount.data() + static_cast<size_t>(c) * 256;
      uint64_t out[4] = {0, 0, 0, 0};
      const int half = counts[c];  // bit set if 2*count >= n_c
      for (int b = 0; b < 256; ++b) {
        if (2 * bc[b] >= half) out[b / 64] |= (1ull << (b % 64));
      }
      std::memcpy(cents + 4 * c, out, 32);
    }
  }
  // final assignment
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    const uint64_t* d = descs + 4 * idx[i];
    int best = 0, bestd = 257;
    for (int c = 0; c < k; ++c) {
      int h = hamming256(d, cents + 4 * c);
      if (h < bestd) {
        bestd = h;
        best = c;
      }
    }
    assign_out[idx[i]] = best;
  }
}

}  // namespace

extern "C" {

// descs: n x 32 bytes.  out_centroids: concatenated per level —
// level l holds k^(l+1) centroids of 32 bytes, in node order (children of
// node m at slots m*k .. m*k+k-1).  Total = sum_l k^(l+1) centroids.
// out_leaf: n leaf word ids.  Returns 0 on success.
int build_vocab(const uint8_t* descs_u8, int64_t n, int k, int depth,
                int iters, uint64_t seed, uint8_t* out_centroids,
                int32_t* out_leaf) {
  if (n <= 0 || k < 2 || depth < 1 || depth > 6) return 1;
  const uint64_t* descs = reinterpret_cast<const uint64_t*>(descs_u8);
  std::mt19937_64 rng(seed);

  std::vector<int32_t> node_of(n, 0);   // current node id at this level
  std::vector<int32_t> assign(n, 0);    // within-parent cluster id
  uint8_t* level_out = out_centroids;

  int64_t n_parents = 1;
  for (int lvl = 0; lvl < depth; ++lvl) {
    // bucket points by parent node
    std::vector<std::vector<int32_t>> buckets(n_parents);
    for (int64_t i = 0; i < n; ++i) buckets[node_of[i]].push_back(i);

    uint64_t* cents = reinterpret_cast<uint64_t*>(level_out);
    for (int64_t p = 0; p < n_parents; ++p) {
      kmajority(descs, buckets[p], k, iters, rng, cents + 4 * k * p,
                assign.data());
    }
    for (int64_t i = 0; i < n; ++i)
      node_of[i] = node_of[i] * k + assign[i];
    level_out += static_cast<size_t>(n_parents) * k * 32;
    n_parents *= k;
  }
  std::memcpy(out_leaf, node_of.data(), sizeof(int32_t) * n);
  return 0;
}

}  // extern "C"
