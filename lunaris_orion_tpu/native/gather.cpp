// Native batch gatherer for the sprite data pipeline.
//
// The reference feeds batches through torch DataLoader worker *processes*
// (train_hybrid.py:560-573): per-item Python __getitem__, pickle IPC, and a
// float32 convert+permute per sample on the host. Here batch assembly is a
// single C++ call over the memory-mapped uint8 shards: sorted runs per
// shard, memcpy per row, optional threads, zero Python in the inner loop.
// uint8 stays uint8 — normalization happens on the TPU inside the jitted
// step.
//
// Built with: g++ -O3 -march=native -shared -fPIC -o libgather.so gather.cpp
// Bound via ctypes (lunaris_orion_tpu/data/native.py).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// Gather rows from multiple shards into `out`.
//   shard_ptrs:  base pointer of each shard's data (n_shards)
//   cum:         cumulative row counts, length n_shards+1 (cum[0]=0)
//   indices:     global row ids to gather (n_idx)
//   item_bytes:  bytes per row (H*W*C for uint8 sprites)
//   out:         n_idx * item_bytes destination
//   n_threads:   <=1 for single-threaded
void gather_u8(const uint8_t** shard_ptrs, const int64_t* cum,
               int64_t n_shards, const int64_t* indices, int64_t n_idx,
               int64_t item_bytes, uint8_t* out, int64_t n_threads) {
  auto worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const int64_t gid = indices[i];
      // binary search for the owning shard
      const int64_t* it = std::upper_bound(cum, cum + n_shards + 1, gid);
      const int64_t sid = (it - cum) - 1;
      const int64_t local = gid - cum[sid];
      std::memcpy(out + i * item_bytes,
                  shard_ptrs[sid] + local * item_bytes,
                  static_cast<size_t>(item_bytes));
    }
  };
  if (n_threads <= 1 || n_idx < 64) {
    worker(0, n_idx);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    const int64_t b = t * chunk;
    const int64_t e = std::min(n_idx, b + chunk);
    if (b >= e) break;
    pool.emplace_back(worker, b, e);
  }
  for (auto& th : pool) th.join();
}

// Fisher-Yates shuffle of an index array with SplitMix64 — the loader's
// per-epoch permutation without numpy allocation churn.
void shuffle_indices(int64_t* indices, int64_t n, uint64_t seed) {
  auto next = [&seed]() {
    seed += 0x9E3779B97F4A7C15ull;
    uint64_t z = seed;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  };
  for (int64_t i = n - 1; i > 0; --i) {
    const int64_t j = static_cast<int64_t>(next() % static_cast<uint64_t>(i + 1));
    std::swap(indices[i], indices[j]);
  }
}

}  // extern "C"
