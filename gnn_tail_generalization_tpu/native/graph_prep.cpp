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
// and n_chunks (block_of_chunk/first_of_block); zero-filled padding.
void segment_matmul_plan(const int64_t* senders_sorted,
                         const int64_t* receivers_sorted,
                         const float* weights_sorted, int64_t n_edge,
                         int64_t n_node, int64_t rb, int64_t eb,
                         int32_t* out_senders, int32_t* out_dst_local,
                         float* out_w, int32_t* out_block_of_chunk,
                         int32_t* out_first_of_block) {
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
      // padding stays zero (weight 0 contributes nothing)
      out_block_of_chunk[ci] = (int32_t)b;
      out_first_of_block[ci] = (k == 0) ? 1 : 0;
    }
    edge += counts[b];
  }
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

}  // extern "C"
