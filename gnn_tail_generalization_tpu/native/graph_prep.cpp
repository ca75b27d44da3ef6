// Native host-side graph preprocessing for the TPU framework.
//
// The reference delegates all native work to prebuilt CUDA kernels in its
// pip deps (SURVEY.md section 2: dgl/torch_sparse/torch_scatter); its own
// repo ships no native code. This framework's device compute is
// XLA/Pallas; the native layer lives on the HOST side of the pipeline,
// where graph preparation is genuinely hot for production-scale graphs:
//
//   - segment_matmul_plan: chunk dst-sorted edges into the Pallas kernel's
//     (row-block, edge-chunk) layout (ops/spmm_pallas.py:build_plan)
//   - ring_buckets: double-bucket edges by (dst_shard, src_shard) for the
//     ring-overlapped distributed SpMM (parallel/distributed.py)
//   - sort_edges_csr: stable dst-sort + CSR row pointers
//
// Exposed through a plain C ABI consumed via ctypes (no pybind11 in this
// image). Build: `make -C gnn_tail_generalization_tpu/native` (or the
// auto-build in native/__init__.py). Python fallbacks remain available.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Stable sort edges by receiver; writes permutation and CSR row_ptr.
// senders/receivers: int64[E]; out_perm: int64[E]; out_row_ptr: int64[N+1]
void sort_edges_csr(const int64_t* receivers, int64_t n_edge, int64_t n_node,
                    int64_t* out_perm, int64_t* out_row_ptr) {
  std::vector<int64_t> counts(n_node + 1, 0);
  for (int64_t i = 0; i < n_edge; ++i) counts[receivers[i] + 1]++;
  for (int64_t r = 0; r < n_node; ++r) counts[r + 1] += counts[r];
  std::memcpy(out_row_ptr, counts.data(), sizeof(int64_t) * (n_node + 1));
  std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
  for (int64_t i = 0; i < n_edge; ++i) {
    out_perm[cursor[receivers[i]]++] = i;  // stable: ascending i per bucket
  }
}

// Number of chunks the plan will need (call before segment_matmul_plan to
// size the output buffers). rb: rows per block, eb: edges per chunk.
int64_t plan_num_chunks(const int64_t* receivers_sorted, int64_t n_edge,
                        int64_t n_node, int64_t rb, int64_t eb) {
  int64_t n_blocks = (n_node + rb - 1) / rb;
  std::vector<int64_t> counts(n_blocks, 0);
  for (int64_t i = 0; i < n_edge; ++i) counts[receivers_sorted[i] / rb]++;
  int64_t chunks = 0;
  for (int64_t b = 0; b < n_blocks; ++b) {
    int64_t c = (counts[b] + eb - 1) / eb;
    chunks += c > 0 ? c : 1;
  }
  return chunks;
}

// Build the chunked layout for the Pallas segment-matmul kernel.
// Inputs are dst-sorted. Outputs sized n_chunks*eb (senders/dst_local/w)
// and n_chunks (block_of_chunk/first_of_block). Padding slots carry
// weight 0 (contribute nothing) and STRIPED sender indices
// (slot * 2654435761 % n_node): long runs of one repeated gather address
// serialize the XLA gather emitter (constant-index gathers measured 52
// vs 86 Mrow/s at ogbl-citation2 scale, RESULTS.md round 4), so pads
// must spread across the table like real edges do.
void segment_matmul_plan_v2(const int64_t* senders_sorted,
                            const int64_t* receivers_sorted,
                            const float* weights_sorted, int64_t n_edge,
                            int64_t n_node, int64_t rb, int64_t eb,
                            int64_t stripe_mod, int32_t* out_senders,
                            int32_t* out_dst_local, float* out_w,
                            int32_t* out_block_of_chunk,
                            int32_t* out_first_of_block) {
  // stripe_mod: range of the striped PAD sender indices. Equals n_node
  // when the gather table is the node table; smaller when the plan
  // gathers from a compacted side table (e.g. a cross-host halo buffer,
  // parallel/hier.py) whose row count is less than the output rows.
  int64_t n_blocks = (n_node + rb - 1) / rb;
  std::vector<int64_t> counts(n_blocks, 0);
  for (int64_t i = 0; i < n_edge; ++i) counts[receivers_sorted[i] / rb]++;

  int64_t ci = 0, edge = 0;
  std::vector<int64_t> order;
  for (int64_t b = 0; b < n_blocks; ++b) {
    int64_t c = (counts[b] + eb - 1) / eb;
    if (c == 0) c = 1;
    int64_t remaining = counts[b];
    // Within a row block, edge order is free (the one-hot segment matrix
    // absorbs any permutation): sort by SENDER so the device gather sees
    // quasi-monotonic indices (much better HBM locality).
    order.resize(counts[b]);
    std::iota(order.begin(), order.end(), edge);
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t bb) {
      return senders_sorted[a] < senders_sorted[bb];
    });
    int64_t taken = 0;
    for (int64_t k = 0; k < c; ++k, ++ci) {
      int64_t m = std::min(remaining, eb);
      remaining -= m;
      int64_t base = ci * eb;
      for (int64_t j = 0; j < m; ++j, ++taken) {
        int64_t eidx = order[taken];
        out_senders[base + j] = (int32_t)senders_sorted[eidx];
        out_dst_local[base + j] = (int32_t)(receivers_sorted[eidx] - b * rb);
        out_w[base + j] = weights_sorted[eidx];
      }
      // padding: weight/dst stay zero; senders striped (see above)
      for (int64_t j = m; j < eb; ++j) {
        out_senders[base + j] =
            (int32_t)(((uint64_t)(base + j) * 2654435761ULL) %
                      (uint64_t)stripe_mod);
      }
      out_block_of_chunk[ci] = (int32_t)b;
      out_first_of_block[ci] = (k == 0) ? 1 : 0;
    }
    edge += counts[b];
  }
}

// Back-compat wrapper: stripe range == node table.
void segment_matmul_plan(const int64_t* senders_sorted,
                         const int64_t* receivers_sorted,
                         const float* weights_sorted, int64_t n_edge,
                         int64_t n_node, int64_t rb, int64_t eb,
                         int32_t* out_senders, int32_t* out_dst_local,
                         float* out_w, int32_t* out_block_of_chunk,
                         int32_t* out_first_of_block) {
  segment_matmul_plan_v2(senders_sorted, receivers_sorted, weights_sorted,
                         n_edge, n_node, rb, eb, n_node, out_senders,
                         out_dst_local, out_w, out_block_of_chunk,
                         out_first_of_block);
}

// Max bucket size over the (dst_shard, src_shard) grid.
int64_t ring_max_bucket(const int64_t* senders, const int64_t* receivers,
                        int64_t n_edge, int64_t rows_per_shard,
                        int64_t n_shards) {
  std::vector<int64_t> counts(n_shards * n_shards, 0);
  for (int64_t i = 0; i < n_edge; ++i) {
    int64_t k = receivers[i] / rows_per_shard;
    int64_t j = senders[i] / rows_per_shard;
    counts[k * n_shards + j]++;
  }
  return *std::max_element(counts.begin(), counts.end());
}

// Fill [S, S, e_bucket] ring buckets with LOCAL indices; padding zeroed by
// the caller. Layout row-major (k, j, slot).
void ring_buckets(const int64_t* senders, const int64_t* receivers,
                  const float* weights, int64_t n_edge,
                  int64_t rows_per_shard, int64_t n_shards, int64_t e_bucket,
                  int32_t* out_senders_local, int32_t* out_recv_local,
                  float* out_w) {
  std::vector<int64_t> fill(n_shards * n_shards, 0);
  for (int64_t i = 0; i < n_edge; ++i) {
    int64_t k = receivers[i] / rows_per_shard;
    int64_t j = senders[i] / rows_per_shard;
    int64_t slot = fill[k * n_shards + j]++;
    int64_t base = (k * n_shards + j) * e_bucket + slot;
    out_senders_local[base] = (int32_t)(senders[i] - j * rows_per_shard);
    out_recv_local[base] = (int32_t)(receivers[i] - k * rows_per_shard);
    out_w[base] = weights[i];
  }
}

// ---- edge-graph expansion (linkpred/edge_lp.py:build_edge_graph) --------
//
// Two scored edges are adjacent iff they share an endpoint; per node the
// incident edge set (optionally uniformly subsampled to max_degree with a
// splitmix-style per-node generator) expands to all ordered distinct
// pairs. Python/numpy is the fallback; this path exists because the
// expansion is pure memory streaming that numpy does ~100x slower than C
// on some hosts (measured in RESULTS.md).

static inline uint64_t mix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

// Pass 1: number of ordered distinct pairs (excl. self loops) with the cap
// applied. max_degree <= 0 means uncapped.
int64_t edge_graph_num_pairs(const int64_t* src, const int64_t* dst,
                             int64_t m, int64_t max_degree) {
  int64_t n = 0;
  for (int64_t i = 0; i < m; ++i) {
    if (src[i] + 1 > n) n = src[i] + 1;
    if (dst[i] + 1 > n) n = dst[i] + 1;
  }
  std::vector<int64_t> counts(n, 0);
  for (int64_t i = 0; i < m; ++i) { counts[src[i]]++; counts[dst[i]]++; }
  int64_t pairs = 0;
  for (int64_t v = 0; v < n; ++v) {
    int64_t k = counts[v];
    if (max_degree > 0 && k > max_degree) k = max_degree;
    pairs += k * (k - 1);
  }
  return pairs;
}

// Pass 2: fill out_a/out_b (int64[m + n_pairs]) with m self loops followed
// by the pair expansion; returns the number of entries actually written
// (m + true pairs — edge_graph_num_pairs is an upper bound: a scored
// self-edge occupies two slots of its node's incidence list but must not
// pair with itself). int64 output and in-C self loops keep the Python
// side free of numpy copies (this image's numpy streams at ~10-50 MB/s).
int64_t edge_graph_pairs(const int64_t* src, const int64_t* dst, int64_t m,
                         int64_t max_degree, uint64_t seed, int64_t* out_a,
                         int64_t* out_b) {
  for (int64_t i = 0; i < m; ++i) { out_a[i] = i; out_b[i] = i; }
  out_a += m;
  out_b += m;
  int64_t n = 0;
  for (int64_t i = 0; i < m; ++i) {
    if (src[i] + 1 > n) n = src[i] + 1;
    if (dst[i] + 1 > n) n = dst[i] + 1;
  }
  std::vector<int64_t> row_ptr(n + 1, 0);
  for (int64_t i = 0; i < m; ++i) { row_ptr[src[i] + 1]++; row_ptr[dst[i] + 1]++; }
  for (int64_t v = 0; v < n; ++v) row_ptr[v + 1] += row_ptr[v];
  std::vector<int32_t> inc(row_ptr[n]);
  std::vector<int64_t> cur(row_ptr.begin(), row_ptr.end() - 1);
  for (int64_t i = 0; i < m; ++i) {
    inc[cur[src[i]]++] = (int32_t)i;
    inc[cur[dst[i]]++] = (int32_t)i;
  }
  int64_t p = 0;
  std::vector<int32_t> grp;
  for (int64_t v = 0; v < n; ++v) {
    int64_t k = row_ptr[v + 1] - row_ptr[v];
    int32_t* g = inc.data() + row_ptr[v];
    if (max_degree > 0 && k > max_degree) {
      // partial Fisher-Yates with a per-(seed, node) generator: the first
      // max_degree slots become a uniform sample without replacement
      uint64_t s = mix64(seed ^ (uint64_t)v * 0x9e3779b97f4a7c15ULL);
      for (int64_t t = 0; t < max_degree; ++t) {
        s = mix64(s);
        int64_t j = t + (int64_t)(s % (uint64_t)(k - t));
        std::swap(g[t], g[j]);
      }
      k = max_degree;
    }
    for (int64_t i = 0; i < k; ++i) {
      int32_t a = g[i];
      for (int64_t j = 0; j < k; ++j) {
        // compare VALUES: a scored self-edge (u == v) sits twice in its
        // node's incidence list and must not pair with itself
        if (a == g[j]) continue;
        out_a[p] = a;
        out_b[p] = g[j];
        ++p;
      }
    }
  }
  return m + p;
}

}  // extern "C"
