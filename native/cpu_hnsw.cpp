// cpu_hnsw — a faithful scalar-CPU HNSW search loop over this engine's
// graph arrays, used as the MEASURED reference baseline for bench.py.
//
// The reference extension's hot path is usearch's search_to_find_in_base_
// (/root/reference/src/include/usearch/index.hpp:3503-3573): greedy
// upper-level descent, then a base-layer beam with top/next heaps, a
// visited set, and one scalar distance call per (query, neighbor) pair
// (simsimd compile-time OFF by default -> autovectorized loops,
// CMakeLists.txt:11-17). This file reproduces that loop shape — visited
// epochs, binary heaps, early termination on the monotone radius bound —
// over the same adjacency the TPU engine searches, with one thread per
// core (the reference runs one query per scheduler thread,
// hnsw_index.cpp:301-309). That makes vs_baseline a measured
// like-for-like number on the bench host instead of round 1's 10k-QPS
// literature estimate (it is also GENEROUS to the reference: no SQL
// executor overhead on top).
//
// C ABI for ctypes.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

typedef struct {
  const float* vectors;    // [cap, d_pad]
  const int32_t* nbr0;     // [cap, m0] base-layer adjacency (-1 pad)
  const int32_t* upper;    // [cap_u, L, m] upper adjacency (-1 pad)
  const int32_t* upper_slot;  // [cap] node -> upper row (-1 none)
  const uint8_t* valid;    // [cap]
  int64_t cap, cap_u;
  int32_t d_pad, dims, m0, levels, m;
  int32_t entry_node, max_level;
} cpu_hnsw_graph;

static inline float l2sq(const float* a, const float* b, int d) {
  float acc = 0.f;
  for (int i = 0; i < d; i++) {
    float diff = a[i] - b[i];
    acc += diff * diff;
  }
  return acc;
}

struct Cand {
  float dist;
  int32_t id;
};
struct CloserFirst {
  bool operator()(const Cand& a, const Cand& b) const {
    return a.dist > b.dist;
  }
};
struct FartherFirst {
  bool operator()(const Cand& a, const Cand& b) const {
    return a.dist < b.dist;
  }
};

// One query: greedy descent (search_for_one_) + base beam
// (search_to_find_in_base_). visited is an epoch-stamped array.
static void search_one(const cpu_hnsw_graph* g, const float* q, int k,
                       int ef, uint32_t* visited, uint32_t epoch,
                       int32_t* out_ids, float* out_dist) {
  int32_t cur = g->entry_node;
  if (cur < 0) {
    for (int i = 0; i < k; i++) out_ids[i] = -1;
    return;
  }
  float cur_d = l2sq(q, g->vectors + (int64_t)cur * g->d_pad, g->dims);
  // greedy descent through upper levels (index.hpp:3383-3422)
  for (int lv = g->max_level; lv >= 1; lv--) {
    bool improved = true;
    while (improved) {
      improved = false;
      int32_t us = g->upper_slot[cur];
      if (us < 0) break;
      const int32_t* row =
          g->upper + ((int64_t)us * g->levels + (lv - 1)) * g->m;
      for (int j = 0; j < g->m; j++) {
        int32_t nb = row[j];
        if (nb < 0) break;
        float d = l2sq(q, g->vectors + (int64_t)nb * g->d_pad, g->dims);
        if (d < cur_d) {
          cur_d = d;
          cur = nb;
          improved = true;
        }
      }
    }
  }
  // base-layer beam (index.hpp:3503-3573): next (closer-first) frontier,
  // top (farther-first) result heap bounded by ef, monotone radius bound
  std::priority_queue<Cand, std::vector<Cand>, CloserFirst> next;
  std::priority_queue<Cand, std::vector<Cand>, FartherFirst> top;
  visited[cur] = epoch;
  next.push({cur_d, cur});
  top.push({cur_d, cur});
  while (!next.empty()) {
    Cand c = next.top();
    if ((int)top.size() >= ef && c.dist > top.top().dist) break;
    next.pop();
    const int32_t* row = g->nbr0 + (int64_t)c.id * g->m0;
    for (int j = 0; j < g->m0; j++) {
      int32_t nb = row[j];
      if (nb < 0) break;
      if (visited[nb] == epoch) continue;
      visited[nb] = epoch;
      float d = l2sq(q, g->vectors + (int64_t)nb * g->d_pad, g->dims);
      if ((int)top.size() < ef || d < top.top().dist) {
        next.push({d, nb});
        top.push({d, nb});
        if ((int)top.size() > ef) top.pop();
      }
    }
  }
  // drain top-k (filter tombstones like the allow-predicate,
  // index_dense.hpp:1797-1827)
  std::vector<Cand> res;
  res.reserve(top.size());
  while (!top.empty()) {
    if (g->valid == nullptr || g->valid[top.top().id]) res.push_back(top.top());
    top.pop();
  }
  std::sort(res.begin(), res.end(),
            [](const Cand& a, const Cand& b) { return a.dist < b.dist; });
  for (int i = 0; i < k; i++) {
    if (i < (int)res.size()) {
      out_ids[i] = res[i].id;
      if (out_dist) out_dist[i] = res[i].dist;
    } else {
      out_ids[i] = -1;
      if (out_dist) out_dist[i] = HUGE_VALF;
    }
  }
}

// Batch search with n_threads workers, one query per task (the
// reference's per-scan-thread model). Returns wall time in seconds.
double cpu_hnsw_search_batch(const cpu_hnsw_graph* g, const float* queries,
                             int64_t nq, int k, int ef, int n_threads,
                             int32_t* out_ids, float* out_dist) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  std::atomic<int64_t> cursor{0};
  auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> workers;
  workers.reserve(n_threads);
  for (int t = 0; t < n_threads; t++) {
    workers.emplace_back([&, t]() {
      std::vector<uint32_t> visited(g->cap, 0);
      uint32_t epoch = 0;
      while (true) {
        int64_t i = cursor.fetch_add(1);
        if (i >= nq) break;
        epoch++;
        if (epoch == 0) {  // wrapped: reset stamps
          std::fill(visited.begin(), visited.end(), 0);
          epoch = 1;
        }
        search_one(g, queries + i * g->d_pad, k, ef, visited.data(), epoch,
                   out_ids + i * k, out_dist ? out_dist + i * k : nullptr);
      }
    });
  }
  for (auto& w : workers) w.join();
  auto t1 = std::chrono::steady_clock::now();
  return std::chrono::duration<double>(t1 - t0).count();
}

}  // extern "C"
