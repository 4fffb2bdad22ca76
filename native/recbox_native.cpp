// recbox_native: host-side retrieval kernels (the faiss-cpu analog).
//
// The reference delegates host-side ANN to faiss's C++ IndexFlatIP /
// IndexIVFFlat (`recbox/utils/ann/faiss.py:3-15`, requirements.txt:1) and
// annoy (`rechub/utils/match.py:161-188`). TPU serving uses the on-device
// sharded MIPS engine (recbox_tpu/retrieval/index.py); this library is the
// CPU-serving twin for environments without an accelerator: a multithreaded
// exact MIPS top-k (blocked dot products + bounded heaps) and an IVF-Flat
// approximate index (k-means coarse quantizer + inverted lists).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

// Bounded min-heap of (score, id) keeping the k largest scores.
struct TopK {
  explicit TopK(int k) : k_(k) {}
  void push(float score, int32_t id) {
    if (k_ <= 0) return;  // empty heap_.front() below would be UB
    if (static_cast<int>(heap_.size()) < k_) {
      heap_.emplace_back(score, id);
      std::push_heap(heap_.begin(), heap_.end(), cmp);
    } else if (score > heap_.front().first) {
      std::pop_heap(heap_.begin(), heap_.end(), cmp);
      heap_.back() = {score, id};
      std::push_heap(heap_.begin(), heap_.end(), cmp);
    }
  }
  void dump_sorted(float* scores, int32_t* ids) {
    std::sort_heap(heap_.begin(), heap_.end(), cmp);  // ascending pops → desc
    int n = static_cast<int>(heap_.size());
    for (int i = 0; i < n; ++i) {
      scores[i] = heap_[i].first;
      ids[i] = heap_[i].second;
    }
    for (int i = n; i < k_; ++i) {
      scores[i] = -INFINITY;
      ids[i] = -1;
    }
  }
  static bool cmp(const std::pair<float, int32_t>& a,
                  const std::pair<float, int32_t>& b) {
    return a.first > b.first;  // min-heap on score
  }
  int k_;
  std::vector<std::pair<float, int32_t>> heap_;
};

inline float dot(const float* a, const float* b, int d) {
  float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
  int i = 0;
  for (; i + 4 <= d; i += 4) {  // unrolled; -O3 vectorizes this
    s0 += a[i] * b[i];
    s1 += a[i + 1] * b[i + 1];
    s2 += a[i + 2] * b[i + 2];
    s3 += a[i + 3] * b[i + 3];
  }
  float s = s0 + s1 + s2 + s3;
  for (; i < d; ++i) s += a[i] * b[i];
  return s;
}

void parallel_for(int n, int n_threads, const std::function<void(int, int)>& fn) {
  if (n_threads <= 1 || n < 2) {
    fn(0, n);
    return;
  }
  n_threads = std::min(n_threads, n);
  std::vector<std::thread> threads;
  // 64-bit chunk math: n near INT_MAX would overflow (n + n_threads - 1)
  // in signed int (UB -> negative chunk -> uninitialized output)
  int chunk = static_cast<int>(
      (static_cast<int64_t>(n) + n_threads - 1) / n_threads);
  for (int t = 0; t < n_threads; ++t) {
    int lo = static_cast<int>(std::min<int64_t>(
        static_cast<int64_t>(t) * chunk, n));
    int hi = static_cast<int>(std::min<int64_t>(
        static_cast<int64_t>(lo) + chunk, n));
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Exact MIPS top-k: queries (nq, d) × items (ni, d) → top-k per query.
// out_scores (nq, k), out_ids (nq, k). Threads split queries.
void rbn_topk_ip(const float* queries, int nq, const float* items, int ni,
                 int d, int k, float* out_scores, int32_t* out_ids,
                 int n_threads) {
  parallel_for(nq, n_threads, [&](int lo, int hi) {
    for (int q = lo; q < hi; ++q) {
      const float* qv = queries + static_cast<int64_t>(q) * d;
      TopK top(k);
      for (int i = 0; i < ni; ++i) {
        top.push(dot(qv, items + static_cast<int64_t>(i) * d, d), i);
      }
      top.dump_sorted(out_scores + static_cast<int64_t>(q) * k,
                      out_ids + static_cast<int64_t>(q) * k);
    }
  });
}

// K-means coarse quantizer (IVF build step). items (ni, d) → centroids
// (nlist, d) and assignments (ni,). Lloyd iterations, k-means++-lite init
// (random distinct picks).
void rbn_kmeans(const float* items, int ni, int d, int nlist, int iters,
                uint64_t seed, float* centroids, int32_t* assignments,
                int n_threads) {
  std::mt19937_64 rng(seed);
  std::vector<int> picks(ni);
  for (int i = 0; i < ni; ++i) picks[i] = i;
  std::shuffle(picks.begin(), picks.end(), rng);
  for (int c = 0; c < nlist; ++c) {
    std::memcpy(centroids + static_cast<int64_t>(c) * d,
                items + static_cast<int64_t>(picks[c % ni]) * d,
                sizeof(float) * d);
  }
  std::vector<float> sums(static_cast<size_t>(nlist) * d);
  std::vector<int> counts(nlist);
  for (int it = 0; it < iters; ++it) {
    parallel_for(ni, n_threads, [&](int lo, int hi) {
      for (int i = lo; i < hi; ++i) {
        const float* x = items + static_cast<int64_t>(i) * d;
        int best = 0;
        float best_d = INFINITY;
        for (int c = 0; c < nlist; ++c) {
          const float* cv = centroids + static_cast<int64_t>(c) * d;
          float dist = 0.f;
          for (int j = 0; j < d; ++j) {
            float t = x[j] - cv[j];
            dist += t * t;
          }
          if (dist < best_d) {
            best_d = dist;
            best = c;
          }
        }
        assignments[i] = best;
      }
    });
    std::fill(sums.begin(), sums.end(), 0.f);
    std::fill(counts.begin(), counts.end(), 0);
    for (int i = 0; i < ni; ++i) {
      int c = assignments[i];
      counts[c]++;
      const float* x = items + static_cast<int64_t>(i) * d;
      float* s = sums.data() + static_cast<int64_t>(c) * d;
      for (int j = 0; j < d; ++j) s[j] += x[j];
    }
    for (int c = 0; c < nlist; ++c) {
      if (counts[c] == 0) continue;  // keep the old centroid
      float inv = 1.f / counts[c];
      float* cv = centroids + static_cast<int64_t>(c) * d;
      const float* s = sums.data() + static_cast<int64_t>(c) * d;
      for (int j = 0; j < d; ++j) cv[j] = s[j] * inv;
    }
  }
}

// IVF-Flat search. Inverted lists are provided in CSR form: list_offsets
// (nlist+1,), list_ids (ni,) — item ids grouped by centroid. For each query,
// scan the nprobe closest lists by centroid inner product.
void rbn_ivf_search(const float* queries, int nq, const float* items, int ni,
                    int d, const float* centroids, int nlist,
                    const int32_t* list_offsets, const int32_t* list_ids,
                    int nprobe, int k, float* out_scores, int32_t* out_ids,
                    int n_threads) {
  (void)ni;
  nprobe = std::min(nprobe, nlist);
  parallel_for(nq, n_threads, [&](int lo, int hi) {
    std::vector<std::pair<float, int>> cent_scores(nlist);
    for (int q = lo; q < hi; ++q) {
      const float* qv = queries + static_cast<int64_t>(q) * d;
      for (int c = 0; c < nlist; ++c) {
        cent_scores[c] = {dot(qv, centroids + static_cast<int64_t>(c) * d, d),
                          c};
      }
      std::partial_sort(cent_scores.begin(), cent_scores.begin() + nprobe,
                        cent_scores.end(),
                        [](const auto& a, const auto& b) {
                          return a.first > b.first;
                        });
      TopK top(k);
      for (int p = 0; p < nprobe; ++p) {
        int c = cent_scores[p].second;
        for (int32_t idx = list_offsets[c]; idx < list_offsets[c + 1]; ++idx) {
          int32_t id = list_ids[idx];
          top.push(dot(qv, items + static_cast<int64_t>(id) * d, d), id);
        }
      }
      top.dump_sorted(out_scores + static_cast<int64_t>(q) * k,
                      out_ids + static_cast<int64_t>(q) * k);
    }
  });
}

// Uniform negative sampling with positive-exclusion rejection
// (`h5_generator.py:72-95` sampling_block analog): for each row, draw
// num_negs ids from [0, n_items) rejecting the row's positive.
void rbn_sample_negatives(const int32_t* positives, int n_rows, int n_items,
                          int num_negs, uint64_t seed, int32_t* out,
                          int n_threads) {
  parallel_for(n_rows, n_threads, [&](int lo, int hi) {
    std::uniform_int_distribution<int32_t> dist(0, n_items - 1);
    for (int r = lo; r < hi; ++r) {
      // per-ROW seeding: results are identical for a fixed seed regardless
      // of the thread count / chunking (a per-chunk seed tied results to
      // the host's core count)
      std::mt19937_64 rng(seed + static_cast<uint64_t>(r)
                                     * 0x9E3779B97F4A7C15ull);
      int32_t pos = positives[r];
      int32_t* row = out + static_cast<int64_t>(r) * num_negs;
      for (int j = 0; j < num_negs; ++j) {
        int32_t v = dist(rng);
        // n_items==1 would spin forever; the Python wrapper rejects it
        while (v == pos && n_items > 1) v = dist(rng);
        row[j] = v;
      }
    }
  });
}

// Vocabulary lookup over fixed-width byte tokens (the categorical-encode
// hot path of FeatureEncoder.transform — `recbox/matching/preprocess.py`
// Tokenizer.encode semantics). Tokens arrive as numpy 'S' arrays: fixed
// `width` bytes per slot, zero-padded on the right. An open-addressing
// FNV-1a hash table over the vocab resolves each input token to its id,
// with byte-exact verification (hash collisions fall through to probing);
// misses produce `oov`.
void rbn_vocab_encode(const char* vocab_bytes, int nv, int vw,
                      const int32_t* vocab_ids,
                      const char* input_bytes, int32_t n, int iw,
                      int32_t oov, int32_t* out, int n_threads) {
  auto efflen = [](const char* p, int w) {
    int l = w;
    while (l > 0 && p[l - 1] == '\0') --l;
    return l;
  };
  auto fnv = [&](const char* p, int l) {
    uint64_t h = 1469598103934665603ull;
    for (int i = 0; i < l; ++i) {
      h ^= static_cast<unsigned char>(p[i]);
      h *= 1099511628211ull;
    }
    return h;
  };
  // table size = next power of two >= 2*nv (load factor <= .5)
  uint64_t cap = 16;
  while (cap < static_cast<uint64_t>(nv) * 2) cap <<= 1;
  std::vector<int32_t> slot(cap, -1);
  const uint64_t mask = cap - 1;
  for (int v = 0; v < nv; ++v) {
    const char* tok = vocab_bytes + static_cast<int64_t>(v) * vw;
    uint64_t h = fnv(tok, efflen(tok, vw)) & mask;
    while (slot[h] != -1) h = (h + 1) & mask;
    slot[h] = v;
  }
  parallel_for(n, n_threads, [&](int lo, int hi) {
    for (int64_t r = lo; r < hi; ++r) {
      const char* tok = input_bytes + r * iw;
      int l = efflen(tok, iw);
      uint64_t h = fnv(tok, l) & mask;
      int32_t id = oov;
      while (slot[h] != -1) {
        int32_t v = slot[h];
        const char* cand = vocab_bytes + static_cast<int64_t>(v) * vw;
        if (efflen(cand, vw) == l && std::memcmp(cand, tok, l) == 0) {
          id = vocab_ids[v];
          break;
        }
        h = (h + 1) & mask;
      }
      out[r] = id;
    }
  });
}

}  // extern "C"
