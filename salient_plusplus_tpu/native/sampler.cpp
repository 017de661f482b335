// Native host-side multilayer neighbor sampler.
//
// TPU-native counterpart of the reference's C++ sampling core
// (fast_sampler/sample_cpu.hpp:25-143, fast_sampler.cpp:191-227): uniform
// per-hop neighbor sampling without replacement (Robert Floyd), cumulative
// frontier with first-seen global->local relabeling. Re-designed for the
// static-shape TPU pipeline: results are written directly into preallocated
// *padded* buffers (node/edge capacities per hop) with overflow counting, so
// batches leave the sampler ready for jax.device_put with zero further host
// work. Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Threading model: the sampler itself is single-threaded per call and
// re-entrant via per-thread Workspace objects; parallelism comes from Python
// worker threads (ctypes releases the GIL for the call duration), replacing
// the reference's in-C++ thread pool + lock-free queues (fast_sampler.cpp:
// 368-513) with a simpler design of equal capability.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 sampler.cpp -o libsptpu.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// splitmix64 — deterministic per-batch seeding (the analog of the
// reference's gen.seed(batch*17+5), fast_sampler.cpp:994).
static inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = splitmix64(seed);
    s1 = splitmix64(seed);
  }
  // xoroshiro128+
  inline uint64_t next() {
    const uint64_t a = s0;
    uint64_t b = s1;
    const uint64_t r = a + b;
    b ^= a;
    s0 = ((a << 24) | (a >> 40)) ^ b ^ (b << 16);
    s1 = (b << 37) | (b >> 27);
    return r;
  }
  // unbiased-enough bounded draw (n << 2^64)
  inline uint32_t bounded(uint32_t n) { return (uint32_t)(next() % n); }
};

// Open-addressing int32->int32 hash map with generation stamping: clearing
// between batches is O(1) (bump the generation) instead of a memset.
// Replaces the reference's phmap::flat_hash_map relabel table
// (sample_cpu.hpp:13-19) without vendoring the library. Slots are
// interleaved (key/val/stamp in one 16-byte record, 4 per cache line) so
// a probe costs ONE cache miss, not three — at frontier sizes the table
// far exceeds L2 and every probe is a miss, making this the sampler's
// dominant cost alongside the CSR column reads (see sptpu_sample_batch's
// prefetch pipeline).
struct Workspace {
  struct Slot {
    int32_t key;
    int32_t val;
    uint32_t stamp;
    uint32_t pad_;
  };
  std::vector<Slot> slots;
  uint32_t gen = 0;
  uint32_t mask = 0;
  uint32_t filled = 0;    // entries stamped this generation
  uint32_t fill_cap = 0;  // probe-safety bound (< capacity)
  std::vector<int32_t> floyd;  // Robert Floyd scratch

  void reserve(int64_t max_entries) {
    uint64_t cap = 64;
    while (cap < (uint64_t)max_entries * 2) cap <<= 1;
    if (slots.size() < cap) {
      slots.assign(cap, Slot{0, 0, 0u, 0u});
      gen = 0;
    }
    mask = (uint32_t)(slots.size() - 1);
    // Dropped (over-cap) nodes also occupy slots; bound total occupancy so
    // linear probing always terminates even when the graph has far more
    // distinct reachable nodes than the batch's node capacity.
    fill_cap = (uint32_t)(slots.size() - (slots.size() >> 2));  // 75%
  }
  inline void clear() {
    filled = 0;
    if (++gen == 0) {  // stamp wrap: full reset once per 2^32 batches
      for (auto& s : slots) s.stamp = 0u;
      gen = 1;
    }
  }
  static inline uint32_t hash(int32_t k) {
    uint32_t h = (uint32_t)k * 2654435761u;
    h ^= h >> 15;
    return h;
  }
  inline void prefetch(int32_t key) const {
    __builtin_prefetch(&slots[hash(key) & mask], 1 /*write*/, 1);
  }
  // Insert key if absent; returns (value, inserted). `next_val` used on
  // insert. When the table is at the occupancy bound, absent keys are
  // reported as dropped (value -1, not inserted) — only reachable when the
  // batch is already far past its node capacity.
  inline int32_t get_or_insert(int32_t key, int32_t next_val, bool* inserted) {
    uint32_t i = hash(key) & mask;
    while (true) {
      Slot& s = slots[i];
      if (s.stamp != gen) {
        if (filled >= fill_cap) {
          *inserted = false;
          return -1;
        }
        ++filled;
        s.stamp = gen;
        s.key = key;
        s.val = next_val;
        *inserted = true;
        return next_val;
      }
      if (s.key == key) {
        *inserted = false;
        return s.val;
      }
      i = (i + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

void* sptpu_ws_create(int64_t max_nodes) {
  auto* ws = new Workspace();
  ws->reserve(max_nodes);
  return ws;
}

void sptpu_ws_destroy(void* p) { delete static_cast<Workspace*>(p); }

// Sample one multilayer batch into padded buffers.
//
// Outputs (all preallocated by caller):
//   out_n_id        int32 [node_caps[L]]    cumulative frontier, zero-padded
//   out_level_sizes int32 [L+1]
//   out_edge_src    int32 [sum(edge_caps)]  hop h at offset edge_offsets[h]
//   out_edge_dst    int32 [sum(edge_caps)]
//   out_edge_counts int32 [L]
//   out_overflow    int32 [2]               {dropped_nodes, dropped_edges}
// Returns 0 on success.
int32_t sptpu_sample_batch(
    void* ws_ptr, const int64_t* rowptr, const int32_t* col,
    int64_t num_nodes, const int64_t* seeds, int32_t num_seeds,
    const int32_t* fanouts,
    int32_t num_hops, uint64_t rng_seed, const int32_t* node_caps,
    const int64_t* edge_offsets, const int32_t* edge_caps, int32_t* out_n_id,
    int32_t* out_level_sizes, int32_t* out_edge_src, int32_t* out_edge_dst,
    int32_t* out_edge_counts, int32_t* out_overflow) {
  Workspace& ws = *static_cast<Workspace*>(ws_ptr);
  ws.reserve(node_caps[num_hops]);
  ws.clear();
  Rng rng(rng_seed);

  int32_t n = 0;  // current frontier size
  const int32_t total_cap = node_caps[num_hops];
  if (num_seeds > node_caps[0]) return 1;
  for (int32_t i = 0; i < num_seeds; ++i) {
    if (seeds[i] < 0 || seeds[i] >= num_nodes) return 3;  // out-of-range seed
    bool ins;
    ws.get_or_insert((int32_t)seeds[i], n, &ins);
    if (!ins) return 2;  // duplicate seeds
    out_n_id[n++] = (int32_t)seeds[i];
  }
  out_level_sizes[0] = n;
  int32_t dropped_nodes = 0, dropped_edges = 0;

  // Software-pipelined edge processing. Sampling is pointer-chasing over
  // two tables that both miss cache at scale (the CSR column array and the
  // relabel hash table), so each edge's lookups are staged through a FIFO
  // ring: col addresses are prefetched at push, the column value is read
  // (and its hash slot prefetched) MID edges later, and the relabel+emit
  // happens at pop, RING edges after push. The FIFO preserves the exact
  // edge order (and RNG draw order happens at push), so results are
  // bit-identical to the unpipelined loop — the numpy-oracle tests pin
  // this. ~2x on the bench shape (51 -> 26 ns/edge single-thread).
  constexpr int32_t RING = 64;  // insert distance (edges)
  constexpr int32_t MID = 32;   // col-read + hash-prefetch distance
  struct Pending {
    int32_t tgt;
    int32_t cval;
    const int32_t* addr;
  };
  Pending ring[RING];
  int64_t rhead = 0, rmid = 0, rtail = 0;

  for (int32_t h = 0; h < num_hops; ++h) {
    const int32_t fanout = fanouts[h];
    const int32_t frontier = n;
    const int32_t node_cap = node_caps[h + 1];
    const int32_t edge_cap = edge_caps[h];
    int32_t* esrc = out_edge_src + edge_offsets[h];
    int32_t* edst = out_edge_dst + edge_offsets[h];
    int32_t e = 0;

    // add one sampled neighbor edge (target i, graph-node c). Nodes past the
    // level cap are remembered with value -1 so repeat hits also drop.
    const auto add_neighbor = [&](int32_t i, int32_t c) {
      bool ins;
      const int32_t val_if_new =
          (n < node_cap && n < total_cap) ? n : -1;
      const int32_t j = ws.get_or_insert(c, val_if_new, &ins);
      if (j < 0) {
        ++dropped_nodes;
        return;
      }
      if (ins) out_n_id[n++] = c;
      if (e >= edge_cap) {
        ++dropped_edges;
        return;
      }
      esrc[e] = j;
      edst[e] = i;
      ++e;
    };

    const auto do_mid = [&]() {
      Pending& p = ring[rmid & (RING - 1)];
      p.cval = *p.addr;
      ws.prefetch(p.cval);
      ++rmid;
    };
    const auto do_pop = [&]() {
      Pending& p = ring[rhead & (RING - 1)];
      add_neighbor(p.tgt, p.cval);
      ++rhead;
    };
    const auto push = [&](int32_t tgt, const int32_t* addr) {
      if (rtail - rhead == RING) {
        if (rmid == rhead) do_mid();
        do_pop();
      }
      Pending& p = ring[rtail & (RING - 1)];
      p.tgt = tgt;
      p.addr = addr;
      __builtin_prefetch(addr, 0, 1);
      ++rtail;
      if (rtail - rmid > MID) do_mid();
    };

    for (int32_t i = 0; i < frontier; ++i) {
      if (i + 8 < frontier)
        __builtin_prefetch(&rowptr[out_n_id[i + 8]], 0, 1);
      const int32_t u = out_n_id[i];
      const int64_t row_start = rowptr[u];
      const int32_t deg = (int32_t)(rowptr[u + 1] - row_start);
      if (deg <= 0) continue;
      if (fanout < 0 || deg <= fanout) {
        for (int32_t p = 0; p < deg; ++p) push(i, &col[row_start + p]);
      } else {
        // Robert Floyd sampling without replacement: k distinct of [0, deg)
        auto& perm = ws.floyd;
        perm.clear();
        for (int32_t j = deg - fanout; j < deg; ++j) {
          const int32_t option = (int32_t)rng.bounded((uint32_t)j);
          int32_t winner;
          if (std::find(perm.cbegin(), perm.cend(), option) == perm.cend()) {
            perm.push_back(option);
            winner = option;
          } else {
            perm.push_back(j);
            winner = j;
          }
          push(i, &col[row_start + winner]);
        }
      }
    }
    // drain the pipeline before this hop's pad fill: later hops must see
    // the complete frontier, and edge blocks may not cross hop boundaries
    while (rmid < rtail) do_mid();
    while (rhead < rtail) do_pop();
    // pad the tail of this hop's edge block: src→0, dst→out-level cap.
    // The dst pad keeps the (target-grouped) dst array globally
    // nondecreasing and self-dropping in segment reductions
    // (indices ≥ num_segments are discarded), and makes the per-target
    // CSR derivable on device via searchsorted.
    std::memset(esrc + e, 0, sizeof(int32_t) * (size_t)(edge_cap - e));
    const int32_t dst_pad = node_caps[h];
    for (int32_t t = e; t < edge_cap; ++t) edst[t] = dst_pad;
    out_edge_counts[h] = e;
    out_level_sizes[h + 1] = n;
  }

  std::memset(out_n_id + n, 0, sizeof(int32_t) * (size_t)(total_cap - n));
  out_overflow[0] = dropped_nodes;
  out_overflow[1] = dropped_edges;
  return 0;
}

}  // extern "C" — pause: partitioner internals are plain C++ below

namespace {

// ---- multi-constraint k-way partitioning internals ----------------------
// (METIS-replacement; reference capability: partitioners/partition.py:67-81
// four-constraint METIS with ubvec.)

// Seeded multi-source BFS growth under per-constraint capacities.
void grow_init(const int64_t* rowptr, const int32_t* col, int64_t V,
               int32_t k, const double* weights, int32_t nw,
               const double* caps, Rng& rng, int32_t* labels,
               std::vector<double>& loads) {
  loads.assign((size_t)k * nw, 0.0);
  std::vector<std::vector<int32_t>> frontier(k);
  std::vector<size_t> head(k, 0);
  std::fill(labels, labels + V, -1);

  const auto fits = [&](int32_t p, int64_t v) {
    for (int32_t c = 0; c < nw; ++c) {
      if (loads[(size_t)p * nw + c] + weights[(size_t)v * nw + c] > caps[c])
        return false;
    }
    return true;
  };
  const auto place = [&](int32_t p, int64_t v) {
    labels[v] = p;
    for (int32_t c = 0; c < nw; ++c)
      loads[(size_t)p * nw + c] += weights[(size_t)v * nw + c];
    frontier[p].push_back((int32_t)v);
  };

  for (int32_t p = 0; p < k && p < V; ++p) {  // distinct random seeds
    int64_t s;
    do {
      s = (int64_t)(rng.next() % (uint64_t)V);
    } while (labels[s] != -1);
    place(p, s);
  }

  int64_t unassigned = V - (k < V ? k : V);
  int64_t scan = 0;  // rotating cursor for disconnected remainders
  while (unassigned > 0) {
    bool progressed = false;
    for (int32_t p = 0; p < k; ++p) {
      int64_t budget = unassigned / (4 * (int64_t)k);
      if (budget < 1) budget = 1;
      int64_t grabbed = 0;
      while (head[p] < frontier[p].size() && grabbed < budget) {
        const int32_t u = frontier[p][head[p]++];
        for (int64_t e = rowptr[u]; e < rowptr[u + 1]; ++e) {
          const int32_t v = col[e];
          if (labels[v] != -1 || !fits(p, v)) continue;
          place(p, v);
          --unassigned;
          ++grabbed;
          progressed = true;
        }
      }
    }
    if (!progressed) {
      // disconnected remainder: reseed the least-loaded feasible
      // partition (forcing on the last constraint if none fits)
      while (scan < V && labels[scan] != -1) ++scan;
      if (scan >= V) break;
      int32_t best = 0;
      double best_load = 1e300;
      bool found = false;
      for (int32_t p = 0; p < k; ++p) {
        double tot = 0;
        for (int32_t c = 0; c < nw; ++c) tot += loads[(size_t)p * nw + c];
        if (fits(p, scan) && tot < best_load) {
          best = p;
          best_load = tot;
          found = true;
        }
      }
      if (!found) {
        best = 0;
        for (int32_t p = 1; p < k; ++p) {
          if (loads[(size_t)p * nw + (nw - 1)]
              < loads[(size_t)best * nw + (nw - 1)]) best = p;
        }
      }
      place(best, scan);
      --unassigned;
    }
  }
}

// Capacity-safe label-propagation refinement; moves a vertex to the
// partition holding the largest (edge-weighted) share of its neighbors.
// ewt == nullptr means unit edge weights (the finest level).
void lp_refine(const int64_t* rowptr, const int32_t* col, const float* ewt,
               int64_t V, int32_t k, const double* weights, int32_t nw,
               const double* caps, Rng& rng, int32_t passes,
               int32_t* labels, std::vector<double>& loads) {
  std::vector<int32_t> order(V);
  for (int64_t i = 0; i < V; ++i) order[i] = (int32_t)i;
  std::vector<double> cnt(k);
  for (int32_t pass = 0; pass < passes; ++pass) {
    for (int64_t i = V - 1; i > 0; --i) {  // Fisher-Yates
      const int64_t j = (int64_t)(rng.next() % (uint64_t)(i + 1));
      std::swap(order[i], order[j]);
    }
    int64_t moved = 0;
    for (int64_t i = 0; i < V; ++i) {
      const int32_t u = order[i];
      const int64_t r0 = rowptr[u], r1 = rowptr[u + 1];
      if (r0 == r1) continue;
      std::fill(cnt.begin(), cnt.end(), 0.0);
      for (int64_t e = r0; e < r1; ++e)
        cnt[labels[col[e]]] += ewt ? (double)ewt[e] : 1.0;
      const int32_t cur = labels[u];
      int32_t best = cur;
      for (int32_t p = 0; p < k; ++p)
        if (cnt[p] > cnt[best]) best = p;
      if (best == cur) continue;
      bool ok = true;
      for (int32_t c = 0; c < nw; ++c) {
        if (loads[(size_t)best * nw + c] + weights[(size_t)u * nw + c]
            > caps[c]) { ok = false; break; }
      }
      if (!ok) continue;
      for (int32_t c = 0; c < nw; ++c) {
        loads[(size_t)cur * nw + c] -= weights[(size_t)u * nw + c];
        loads[(size_t)best * nw + c] += weights[(size_t)u * nw + c];
      }
      labels[u] = best;
      ++moved;
    }
    if (moved < V / 1000) break;
  }
}

// Edge-weighted cut of a labeling (each undirected edge counted twice —
// only comparisons matter).
double weighted_cut(const int64_t* rowptr, const int32_t* col,
                    const float* ewt, int64_t V, const int32_t* labels) {
  double cut = 0.0;
  for (int64_t u = 0; u < V; ++u)
    for (int64_t e = rowptr[u]; e < rowptr[u + 1]; ++e)
      if (labels[col[e]] != labels[u]) cut += ewt ? (double)ewt[e] : 1.0;
  return cut;
}

// Weighted greedy graph growing (GGGP-style) — the coarsest-level initial
// partition. The coarse graph is dense and small-diameter, so BFS order
// carries no locality; the community structure lives in the ACCUMULATED
// EDGE WEIGHTS instead. Partitions take turns absorbing the unassigned
// vertex with the heaviest connection to their current set (capacity
// permitting). O(V^2 + E) — only run where V <= the coarsening target.
void greedy_grow_w(const int64_t* rowptr, const int32_t* col,
                   const float* ewt, int64_t V, int32_t k,
                   const double* weights, int32_t nw, const double* caps,
                   Rng& rng, int32_t* labels, std::vector<double>& loads) {
  loads.assign((size_t)k * nw, 0.0);
  std::fill(labels, labels + V, -1);
  std::vector<double> gain((size_t)k * V, 0.0);

  const auto fits = [&](int32_t p, int64_t v) {
    for (int32_t c = 0; c < nw; ++c) {
      if (loads[(size_t)p * nw + c] + weights[(size_t)v * nw + c] > caps[c])
        return false;
    }
    return true;
  };
  const auto place = [&](int32_t p, int64_t v) {
    labels[v] = p;
    for (int32_t c = 0; c < nw; ++c)
      loads[(size_t)p * nw + c] += weights[(size_t)v * nw + c];
    for (int64_t e = rowptr[v]; e < rowptr[v + 1]; ++e)
      gain[(size_t)p * V + col[e]] += ewt ? (double)ewt[e] : 1.0;
  };

  for (int32_t p = 0; p < k && p < V; ++p) {
    int64_t s;
    do {
      s = (int64_t)(rng.next() % (uint64_t)V);
    } while (labels[s] != -1);
    place(p, s);
  }

  int64_t unassigned = V - (k < V ? k : V);
  while (unassigned > 0) {
    bool progressed = false;
    for (int32_t p = 0; p < k && unassigned > 0; ++p) {
      const double* gp = &gain[(size_t)p * V];
      int64_t best = -1;
      double bg = -1.0;
      for (int64_t v = 0; v < V; ++v)
        if (labels[v] == -1 && gp[v] > bg && fits(p, v)) {
          bg = gp[v];
          best = v;
        }
      if (best < 0) continue;
      place(p, best);
      --unassigned;
      progressed = true;
    }
    if (!progressed) {  // nothing fits anywhere: force on last constraint
      int64_t v = 0;
      while (v < V && labels[v] != -1) ++v;
      if (v >= V) break;
      int32_t best = 0;
      for (int32_t p = 1; p < k; ++p)
        if (loads[(size_t)p * nw + (nw - 1)]
            < loads[(size_t)best * nw + (nw - 1)]) best = p;
      place(best, v);
      --unassigned;
    }
  }
}

// Final balance repair: while any (partition, constraint) load exceeds
// target[c], move boundary vertices of overloaded partitions to the
// feasible partition with the heaviest neighbor connection (accepting
// cut regression — balance is the contract, METIS ubvec analog).
void rebalance(const int64_t* rowptr, const int32_t* col, const float* ewt,
               int64_t V, int32_t k, const double* weights, int32_t nw,
               const double* target, Rng& rng, int32_t passes,
               int32_t* labels, std::vector<double>& loads) {
  std::vector<int32_t> order(V);
  for (int64_t i = 0; i < V; ++i) order[i] = (int32_t)i;
  std::vector<double> cnt(k);
  for (int32_t pass = 0; pass < passes; ++pass) {
    bool any_over = false;
    for (int32_t p = 0; p < k && !any_over; ++p)
      for (int32_t c = 0; c < nw; ++c)
        if (loads[(size_t)p * nw + c] > target[c]) { any_over = true; break; }
    if (!any_over) break;
    for (int64_t i = V - 1; i > 0; --i) {
      const int64_t j = (int64_t)(rng.next() % (uint64_t)(i + 1));
      std::swap(order[i], order[j]);
    }
    int64_t moved = 0;
    for (int64_t i = 0; i < V; ++i) {
      const int32_t u = order[i];
      const int32_t cur = labels[u];
      bool over = false;
      for (int32_t c = 0; c < nw; ++c) {
        if (loads[(size_t)cur * nw + c] > target[c] &&
            weights[(size_t)u * nw + c] > 0) { over = true; break; }
      }
      if (!over) continue;
      std::fill(cnt.begin(), cnt.end(), 0.0);
      for (int64_t e = rowptr[u]; e < rowptr[u + 1]; ++e)
        cnt[labels[col[e]]] += ewt ? (double)ewt[e] : 1.0;
      int32_t best = -1;
      double bg = -1.0;
      for (int32_t p = 0; p < k; ++p) {
        if (p == cur) continue;
        bool fits = true;
        for (int32_t c = 0; c < nw; ++c) {
          if (loads[(size_t)p * nw + c] + weights[(size_t)u * nw + c]
              > target[c]) { fits = false; break; }
        }
        if (fits && cnt[p] > bg) { bg = cnt[p]; best = p; }
      }
      if (best < 0) continue;
      for (int32_t c = 0; c < nw; ++c) {
        loads[(size_t)cur * nw + c] -= weights[(size_t)u * nw + c];
        loads[(size_t)best * nw + c] += weights[(size_t)u * nw + c];
      }
      labels[u] = best;
      ++moved;
    }
    if (!moved) break;
  }
}

// One coarsening level: CSR + accumulated edge weights + summed vertex
// weights + the finer-level id -> this level's id map.
struct Level {
  std::vector<int64_t> rowptr;
  std::vector<int32_t> col;
  std::vector<float> ewt;
  std::vector<double> vw;     // V * nw
  std::vector<int32_t> cmap;  // finer V -> coarse id
  int64_t V = 0;
};

// Heavy-edge matching + coarse-graph build (one level). Pairs each
// unmatched vertex with its heaviest unmatched neighbor whose combined
// vertex weight stays under maxvw (keeps coarse vertices placeable).
// Returns the coarse vertex count.
int64_t coarsen_once(const int64_t* rowptr, const int32_t* col,
                     const float* ewt, int64_t V, const double* vw,
                     int32_t nw, const double* maxvw, Rng& rng, Level& out) {
  std::vector<int32_t> order(V);
  for (int64_t i = 0; i < V; ++i) order[i] = (int32_t)i;
  for (int64_t i = V - 1; i > 0; --i) {
    const int64_t j = (int64_t)(rng.next() % (uint64_t)(i + 1));
    std::swap(order[i], order[j]);
  }
  std::vector<int32_t> match(V, -1);
  for (int64_t i = 0; i < V; ++i) {
    const int32_t u = order[i];
    if (match[u] != -1) continue;
    int32_t best = -1;
    float bw = 0.0f;
    for (int64_t e = rowptr[u]; e < rowptr[u + 1]; ++e) {
      const int32_t v = col[e];
      if (v == u || match[v] != -1) continue;
      const float w = ewt ? ewt[e] : 1.0f;
      if (w <= bw) continue;
      bool ok = true;
      for (int32_t c = 0; c < nw; ++c) {
        if (vw[(size_t)u * nw + c] + vw[(size_t)v * nw + c] > maxvw[c]) {
          ok = false;
          break;
        }
      }
      if (ok) { bw = w; best = v; }
    }
    match[u] = best >= 0 ? best : u;
    if (best >= 0) match[best] = u;
  }

  // coarse ids in ascending fine order (deterministic)
  out.cmap.assign(V, -1);
  int64_t cV = 0;
  for (int64_t u = 0; u < V; ++u) {
    if (out.cmap[u] != -1) continue;
    out.cmap[u] = (int32_t)cV;
    out.cmap[match[u]] = (int32_t)cV;
    ++cV;
  }

  out.vw.assign((size_t)cV * nw, 0.0);
  for (int64_t u = 0; u < V; ++u)
    for (int32_t c = 0; c < nw; ++c)
      out.vw[(size_t)out.cmap[u] * nw + c] += vw[(size_t)u * nw + c];

  // members[2c], members[2c+1] (-1 when singleton)
  std::vector<int32_t> members(2 * cV, -1);
  for (int64_t u = 0; u < V; ++u) {
    const int32_t c = out.cmap[u];
    if (members[2 * c] == -1) members[2 * c] = (int32_t)u;
    else members[2 * c + 1] = (int32_t)u;
  }

  // accumulate parallel edges into coarse adjacency (stamped scatter)
  out.rowptr.assign(cV + 1, 0);
  out.col.clear();
  out.ewt.clear();
  std::vector<uint32_t> stamp(cV, 0);
  std::vector<double> acc(cV, 0.0);
  std::vector<int32_t> touched;
  uint32_t gen = 0;
  for (int64_t c = 0; c < cV; ++c) {
    ++gen;
    touched.clear();
    for (int32_t m = 0; m < 2; ++m) {
      const int32_t u = members[2 * c + m];
      if (u < 0) break;
      for (int64_t e = rowptr[u]; e < rowptr[u + 1]; ++e) {
        const int32_t cn = out.cmap[col[e]];
        if (cn == (int32_t)c) continue;  // merged/self edges vanish
        if (stamp[cn] != gen) {
          stamp[cn] = gen;
          acc[cn] = 0.0;
          touched.push_back(cn);
        }
        acc[cn] += ewt ? (double)ewt[e] : 1.0;
      }
    }
    for (const int32_t cn : touched) {
      out.col.push_back(cn);
      out.ewt.push_back((float)acc[cn]);
    }
    out.rowptr[c + 1] = (int64_t)out.col.size();
  }
  out.V = cV;
  return cV;
}

}  // namespace

extern "C" {

// Single-level edition (BFS growth + label-prop refinement); kept as the
// coarsest-level initializer and for small graphs. O(passes * E).
void sptpu_partition(const int64_t* rowptr, const int32_t* col, int64_t V,
                     int32_t k, const double* weights /* V x nw */,
                     int32_t nw, const double* caps /* nw */, uint64_t seed,
                     int32_t refine_passes, int32_t* labels /* out V */) {
  Rng rng(seed ? seed : 1);
  std::vector<double> loads;
  grow_init(rowptr, col, V, k, weights, nw, caps, rng, labels, loads);
  lp_refine(rowptr, col, nullptr, V, k, weights, nw, caps, rng,
            refine_passes, labels, loads);
}

// Multilevel edition (the METIS recipe in miniature): heavy-edge-matching
// coarsening to <= `coarsest` vertices, BFS+LP initial partition there,
// then edge-weighted capacity-safe refinement at every uncoarsening level.
// Cut quality approaches multilevel partitioners' because refinement at
// the coarse levels moves whole regions, not single vertices.
void sptpu_partition_ml(const int64_t* rowptr, const int32_t* col,
                        int64_t V, int32_t k,
                        const double* weights /* V x nw */, int32_t nw,
                        const double* caps /* nw */, uint64_t seed,
                        int32_t refine_passes, int64_t coarsest,
                        int32_t* labels /* out V */) {
  Rng rng(seed ? seed : 1);
  // any coarse vertex must stay far below one partition's capacity
  std::vector<double> maxvw(nw);
  for (int32_t c = 0; c < nw; ++c) maxvw[c] = caps[c] / 8.0;

  std::vector<Level> levels;
  const int64_t target = std::max<int64_t>(coarsest, (int64_t)k * 2);
  const int64_t* rp = rowptr;
  const int32_t* cl = col;
  const float* ew = nullptr;
  const double* vwp = weights;
  int64_t curV = V;
  while (curV > target) {
    levels.emplace_back();
    const int64_t cV = coarsen_once(rp, cl, ew, curV, vwp, nw,
                                    maxvw.data(), rng, levels.back());
    if (cV > (int64_t)(0.95 * (double)curV)) {  // matching stalled
      levels.pop_back();
      break;
    }
    const Level& L = levels.back();
    rp = L.rowptr.data();
    cl = L.col.data();
    ew = L.ewt.data();
    vwp = L.vw.data();
    curV = cV;
  }

  // initial partition at the coarsest level: weighted greedy growing with
  // random restarts (METIS runs several initial attempts too), each
  // LP-polished; keep the lightest weighted cut
  std::vector<int32_t> clabels(curV), attempt(curV);
  std::vector<double> loads, best_loads;
  double best_cut = 1e300;
  const int32_t attempts = 4;
  for (int32_t a = 0; a < attempts; ++a) {
    greedy_grow_w(rp, cl, ew, curV, k, vwp, nw, caps, rng, attempt.data(),
                  loads);
    lp_refine(rp, cl, ew, curV, k, vwp, nw, caps, rng, refine_passes + 4,
              attempt.data(), loads);
    const double cut = weighted_cut(rp, cl, ew, curV, attempt.data());
    if (cut < best_cut) {
      best_cut = cut;
      clabels = attempt;
      best_loads = loads;
    }
  }
  loads = best_loads;

  for (int64_t li = (int64_t)levels.size() - 1; li >= 0; --li) {
    const Level& L = levels[li];
    const int64_t* frp;
    const int32_t* fcl;
    const float* few;
    const double* fvw;
    int64_t fV;
    if (li == 0) {
      frp = rowptr; fcl = col; few = nullptr; fvw = weights; fV = V;
    } else {
      const Level& P = levels[li - 1];
      frp = P.rowptr.data(); fcl = P.col.data(); few = P.ewt.data();
      fvw = P.vw.data(); fV = P.V;
    }
    std::vector<int32_t> flabels(fV);
    for (int64_t u = 0; u < fV; ++u) flabels[u] = clabels[L.cmap[u]];
    loads.assign((size_t)k * nw, 0.0);
    for (int64_t u = 0; u < fV; ++u)
      for (int32_t c = 0; c < nw; ++c)
        loads[(size_t)flabels[u] * nw + c] += fvw[(size_t)u * nw + c];
    lp_refine(frp, fcl, few, fV, k, fvw, nw, caps, rng, refine_passes,
              flabels.data(), loads);
    clabels.swap(flabels);
  }

  // final balance repair at the finest level: growth/refinement caps are
  // deliberately slack (sum/k*ub + max single weight), which lets hub
  // constraints drift; tighten to the ubvec-style target where feasible
  std::vector<double> total(nw, 0.0), maxw(nw, 0.0);
  for (int64_t u = 0; u < V; ++u)
    for (int32_t c = 0; c < nw; ++c) {
      const double w = weights[(size_t)u * nw + c];
      total[c] += w;
      if (w > maxw[c]) maxw[c] = w;
    }
  std::vector<double> bal_target(nw);
  for (int32_t c = 0; c < nw; ++c)
    bal_target[c] = std::min(caps[c],
                             std::max(total[c] / k * 1.05, maxw[c]));
  rebalance(rowptr, col, nullptr, V, k, weights, nw, bal_target.data(),
            rng, 4, clabels.data(), loads);
  std::copy(clabels.begin(), clabels.end(), labels);
}

// Build the src-sorted mirror of one hop's padded COO via counting sort.
//
// Input: (src, dst) with `count` real edges in the first slots of a
// `cap`-sized buffer. Output: msrc = src values ascending (stable), mdst =
// the matching dst values; pad slots get msrc = in_cap (dropping them in
// sorted-segment reductions, mirroring the dst padding convention above)
// and mdst = 0. The mirror lets the device run the backward aggregation
// as a second sorted-CSR pass (transposed adjacency) instead of a
// scatter — the TPU-side reason this exists (ops/mxu_segment.py).
// `counts_ws` must hold in_cap+1 int32 (caller-provided scratch).
void sptpu_mirror_by_src(const int32_t* src, const int32_t* dst,
                         int32_t count, int32_t cap, int32_t in_cap,
                         int32_t* counts_ws, int32_t* msrc, int32_t* mdst) {
  std::memset(counts_ws, 0, sizeof(int32_t) * (size_t)(in_cap + 1));
  for (int32_t e = 0; e < count; ++e) ++counts_ws[src[e] + 1];
  for (int32_t s = 0; s < in_cap; ++s) counts_ws[s + 1] += counts_ws[s];
  for (int32_t e = 0; e < count; ++e) {
    const int32_t p = counts_ws[src[e]]++;
    msrc[p] = src[e];
    mdst[p] = dst[e];
  }
  for (int32_t e = count; e < cap; ++e) {
    msrc[e] = in_cap;
    mdst[e] = 0;
  }
}

// Per-target degree counts of a (sorted or not) dst array — the uint8
// wire-compression payload (EdgeBlock.ddeg). Zero-fills [0, t) first.
void sptpu_count_dst(const int32_t* dst, int32_t count, int32_t t,
                     uint8_t* out) {
  std::memset(out, 0, (size_t)t);
  for (int32_t e = 0; e < count; ++e) ++out[dst[e]];
}

// In-place int32 take: idx[i] = vals[idx[i]] (global-src rewrite).
void sptpu_take_i32_inplace(const int32_t* vals, int32_t* idx, int64_t n) {
  for (int64_t i = 0; i < n; ++i) idx[i] = vals[idx[i]];
}

// Row-gather of a 2-D row-major array: out[i, :] = in[idx[i], :].
// The host-tier feature slicer (analog of the reference's serial_index,
// fast_sampler.cpp:238-279) for features that do not fit in HBM.
// elem_size in bytes (2 for fp16/bf16, 4 for fp32).
void sptpu_gather_rows(const void* in, const int64_t* idx, int64_t n_idx,
                       int64_t row_bytes, void* out) {
  const char* src = static_cast<const char*>(in);
  char* dst = static_cast<char*>(out);
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes,
                (size_t)row_bytes);
  }
}

// int32-index variant used for label slicing and cache assembly.
void sptpu_gather_rows_i32(const void* in, const int32_t* idx, int64_t n_idx,
                           int64_t row_bytes, void* out) {
  const char* src = static_cast<const char*>(in);
  char* dst = static_cast<char*>(out);
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(dst + i * row_bytes, src + (int64_t)idx[i] * row_bytes,
                (size_t)row_bytes);
  }
}

}  // extern "C"
