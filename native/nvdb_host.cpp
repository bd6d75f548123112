// nvdb_tpu native host runtime.
//
// The TPU compute path is JAX/Pallas; this library covers the host-side duties
// the reference implements natively — streaming dtype conversion
// (tools/nvdb_convert_f16.cpp, apps/nvdb_quantize_i8.cpp), and an independent
// multithreaded exact top-k scan used as a correctness oracle / host GT builder
// (the role of flat_index_omp.cpp) — written fresh: plain C++17 + std::thread,
// auto-vectorized inner loops, C ABI for ctypes.
//
// Build: make -C native    (produces libnvdb_host.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int resolve_threads(int threads) {
  if (threads > 0) return threads;
  unsigned hw = std::thread::hardware_concurrency();
  return hw ? static_cast<int>(hw) : 4;
}

// Split [0, n) into nearly-equal contiguous ranges and run fn(begin, end) on a
// pool of std::threads.
template <typename Fn>
void parallel_ranges(int64_t n, int threads, Fn fn) {
  threads = resolve_threads(threads);
  if (n <= 0) return;
  int64_t per = (n + threads - 1) / threads;
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) {
    int64_t b = t * per;
    int64_t e = std::min(n, b + per);
    if (b >= e) break;
    pool.emplace_back([=] { fn(b, e); });
  }
  for (auto& th : pool) th.join();
}

inline uint16_t f32_to_bf16_rne(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  if ((x & 0x7FFFFFFFu) > 0x7F800000u) {           // NaN -> quiet NaN bf16
    return static_cast<uint16_t>((x >> 16) | 0x0040u);
  }
  uint32_t rounded = x + 0x7FFFu + ((x >> 16) & 1u);  // round-to-nearest-even
  return static_cast<uint16_t>(rounded >> 16);
}

}  // namespace

extern "C" {

// FP32 -> BF16 (round-to-nearest-even), threaded.
int nvdb_convert_f32_to_bf16(const float* src, uint16_t* dst, int64_t n,
                             int threads) {
  if (!src || !dst || n < 0) return -1;
  parallel_ranges(n, threads, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) dst[i] = f32_to_bf16_rne(src[i]);
  });
  return 0;
}

// FP32 rows -> INT8 rows + per-row scales, symmetric max-abs/127 (the scheme
// of the reference's quantizer), threaded over rows.
int nvdb_quantize_i8(const float* src, int8_t* dst, float* scales,
                     int64_t rows, int64_t dim, int threads) {
  if (!src || !dst || !scales || rows < 0 || dim <= 0) return -1;
  parallel_ranges(rows, threads, [&](int64_t b, int64_t e) {
    for (int64_t r = b; r < e; ++r) {
      const float* row = src + r * dim;
      float max_abs = 0.f;
      for (int64_t j = 0; j < dim; ++j) max_abs = std::max(max_abs, std::fabs(row[j]));
      float scale = max_abs > 0.f ? max_abs / 127.0f : 1.0f;
      scales[r] = scale;
      float inv = 1.0f / scale;
      int8_t* out = dst + r * dim;
      for (int64_t j = 0; j < dim; ++j) {
        float v = std::nearbyintf(row[j] * inv);
        v = std::min(127.0f, std::max(-127.0f, v));
        out[j] = static_cast<int8_t>(v);
      }
    }
  });
  return 0;
}

// Exact top-k by dot product: per-thread contiguous row ranges, per-thread
// running top-k (threshold insert), final k-way merge. Independent host-side
// oracle for the TPU kernels; also a host GT builder.
// out_scores/out_ids are [q, k], rows sorted descending.
int nvdb_topk_dot_f32(const float* base, int64_t n, int64_t d,
                      const float* queries, int64_t q, int k,
                      float* out_scores, uint32_t* out_ids, int threads) {
  if (!base || !queries || !out_scores || !out_ids) return -1;
  if (n <= 0 || d <= 0 || q <= 0 || k <= 0) return -2;
  int nt = resolve_threads(threads);
  int64_t per = (n + nt - 1) / nt;

  struct Cand { float s; uint32_t id; };
  // partials[t] holds q * k candidates from thread t's row range
  std::vector<std::vector<Cand>> partials(nt);

  parallel_ranges(n, nt, [&](int64_t rb, int64_t re) {
    int t = static_cast<int>(rb / per);
    auto& mine = partials[t];
    mine.assign(static_cast<size_t>(q) * k, Cand{-INFINITY, 0xFFFFFFFFu});
    for (int64_t qi = 0; qi < q; ++qi) {
      Cand* heap = mine.data() + qi * k;   // unsorted top-k, track worst slot
      const float* qv = queries + qi * d;
      float worst = -INFINITY;
      int worst_slot = 0;
      int filled = 0;
      for (int64_t r = rb; r < re; ++r) {
        const float* bv = base + r * d;
        float acc = 0.f;
        for (int64_t j = 0; j < d; ++j) acc += qv[j] * bv[j];
        if (filled < k) {
          heap[filled++] = Cand{acc, static_cast<uint32_t>(r)};
          if (filled == k) {
            worst_slot = 0;
            worst = heap[0].s;
            for (int i = 1; i < k; ++i)
              if (heap[i].s < worst) { worst = heap[i].s; worst_slot = i; }
          }
        } else if (acc > worst) {
          heap[worst_slot] = Cand{acc, static_cast<uint32_t>(r)};
          worst_slot = 0;
          worst = heap[0].s;
          for (int i = 1; i < k; ++i)
            if (heap[i].s < worst) { worst = heap[i].s; worst_slot = i; }
        }
      }
    }
  });

  // merge per-thread partials, sort descending (stable on score then id)
  parallel_ranges(q, nt, [&](int64_t qb, int64_t qe) {
    std::vector<Cand> all;
    for (int64_t qi = qb; qi < qe; ++qi) {
      all.clear();
      for (auto& part : partials) {
        if (part.empty()) continue;
        for (int i = 0; i < k; ++i) {
          Cand c = part[qi * k + i];
          if (c.id != 0xFFFFFFFFu) all.push_back(c);
        }
      }
      int kk = std::min<int64_t>(k, all.size());
      std::partial_sort(all.begin(), all.begin() + kk, all.end(),
                        [](const Cand& a, const Cand& b) {
                          return a.s != b.s ? a.s > b.s : a.id < b.id;
                        });
      for (int i = 0; i < k; ++i) {
        if (i < kk) {
          out_scores[qi * k + i] = all[i].s;
          out_ids[qi * k + i] = all[i].id;
        } else {
          out_scores[qi * k + i] = -INFINITY;
          out_ids[qi * k + i] = 0xFFFFFFFFu;
        }
      }
    }
  });
  return 0;
}

}  // extern "C"
