"""Pallas TPU kernel: scatter-free sorted segment reduction as MXU matmuls.

The SpMM ``y[dst] += w_e * x[src_e]`` decomposes into (1) an unstructured
row gather ``g = x[senders]`` — which XLA's TPU gather already does at HBM
speed-of-light — and (2) a sorted segment reduction into destination rows.
XLA lowers (2) to a scatter-add, which TPUs serialize per duplicate index;
for power-law graphs (many edges per hub row) that is the bottleneck.

This kernel replaces the scatter with dense MXU work:

- Host-side plan: edges (already dst-sorted) are partitioned by output row
  block (RB rows); each block's edge range is padded to a multiple of the
  edge-chunk size EB. Chunks never cross a row-block boundary.
- Grid = one step per chunk, sequential (TPU grids are sequential): build
  the one-hot segment matrix S[r, e] = w_e * (dst_local_e == r) in VMEM
  with a broadcast compare, then ``y_block += S @ g_chunk`` on the MXU.
  The output BlockSpec's index_map reads the scalar-prefetched
  chunk->row-block table, so consecutive chunks of the same block revisit
  the same VMEM tile (flushed to HBM once per block).
- The scale-by-w is folded into S; padding edges carry w=0.

With the framework's transposed-graph custom VJP (ops/spmm.py), backward is
the same kernel on the reversed-edge plan — the framework emits NO scatter
in either direction.

FLOP cost: E_pad * RB * d * 2 per SpMM (RB=128 keeps the systolic array
full).

Measured roofline (v5e chip, 850k edges, d=256, f32):
  XLA gather+segment_sum (scatter):    19.5 ms
  this kernel, dst-order gather:       10.2 ms   (1.9x)
  this kernel, sender-sorted chunks:    7.74 ms  (2.5x)
  standalone sorted XLA row gather:     8.9 ms
Within a row block the edge order is free (S absorbs any permutation), so
the plan sorts each block's edges by SENDER: the gather sees
quasi-monotonic indices (locality), and overlapped with the MXU
segment-matmul the fused pipeline beats even the standalone sorted
gather. Residual frontier: XLA's row-gather emitter (row-op bound — bf16
inputs show no speedup); per-edge DMA in-kernel is issue-rate bound and
loses. eb=1024 is the sweet spot.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["senders", "dst_local", "weights", "block_of_chunk",
                 "first_of_block"],
    meta_fields=["n_node", "n_blocks", "n_chunks", "rb", "eb"],
)
@dataclass(frozen=True)
class SegmentMatmulPlan:
    """Chunked edge layout for the kernel (host-built, device-resident)."""

    senders: jax.Array  # [n_chunks * eb] int32, gather indices (pad -> 0)
    dst_local: jax.Array  # [n_chunks * eb] int32 in [0, rb)
    weights: jax.Array  # [n_chunks * eb] f32 (0 on padding)
    block_of_chunk: jax.Array  # [n_chunks] int32
    first_of_block: jax.Array  # [n_chunks] int32 (1 = first chunk of block)
    n_node: int
    n_blocks: int
    n_chunks: int
    rb: int
    eb: int


def build_plan(
    senders_sorted: np.ndarray,
    receivers_sorted: np.ndarray,
    weights: Optional[np.ndarray],
    n_node: int,
    rb: int = 128,
    eb: int = 1024,
) -> SegmentMatmulPlan:
    """Edges MUST be sorted by receiver. Pads each row block's edge list to a
    multiple of eb."""
    s = np.asarray(senders_sorted, np.int64)
    r = np.asarray(receivers_sorted, np.int64)
    w = (np.ones(len(s), np.float32) if weights is None
         else np.asarray(weights, np.float32))
    assert np.all(np.diff(r) >= 0), "edges must be dst-sorted"

    n_blocks = _round_up(n_node, rb) // rb

    # native (C++) fast path for the chunk layout
    from .. import native as _native

    nat = _native.segment_matmul_plan_arrays(s, r, w, n_node, rb, eb)
    if nat is not None:
        out_s, out_d, out_w, out_b, out_f, n_chunks = nat
        return SegmentMatmulPlan(
            senders=jnp.asarray(out_s),
            dst_local=jnp.asarray(out_d),
            weights=jnp.asarray(out_w),
            block_of_chunk=jnp.asarray(out_b),
            first_of_block=jnp.asarray(out_f),
            n_node=n_node,
            n_blocks=n_blocks,
            n_chunks=n_chunks,
            rb=rb,
            eb=eb,
        )

    block_of_edge = r // rb
    counts = np.bincount(block_of_edge, minlength=n_blocks)
    chunks_per_block = np.maximum((counts + eb - 1) // eb, 1)
    n_chunks = int(chunks_per_block.sum())

    senders = np.zeros((n_chunks, eb), np.int32)
    dst_local = np.zeros((n_chunks, eb), np.int32)
    ws = np.zeros((n_chunks, eb), np.float32)
    block_of_chunk = np.zeros(n_chunks, np.int32)
    first_of_block = np.zeros(n_chunks, np.int32)

    edge_starts = np.concatenate([[0], np.cumsum(counts)])
    ci = 0
    for b in range(n_blocks):
        e0, e1 = edge_starts[b], edge_starts[b + 1]
        # within-block sender sort (see graph_prep.cpp: gather locality)
        blk_order = e0 + np.argsort(s[e0:e1], kind="stable")
        for k in range(chunks_per_block[b]):
            lo = e0 + k * eb
            hi = min(lo + eb, e1)
            m = hi - lo
            if m > 0:
                sel = blk_order[lo - e0:hi - e0]
                senders[ci, :m] = s[sel]
                dst_local[ci, :m] = r[sel] - b * rb
                ws[ci, :m] = w[sel]
            block_of_chunk[ci] = b
            first_of_block[ci] = 1 if k == 0 else 0
            ci += 1
    assert ci == n_chunks

    return SegmentMatmulPlan(
        senders=jnp.asarray(senders.reshape(-1)),
        dst_local=jnp.asarray(dst_local.reshape(-1)),
        weights=jnp.asarray(ws.reshape(-1)),
        block_of_chunk=jnp.asarray(block_of_chunk),
        first_of_block=jnp.asarray(first_of_block),
        n_node=n_node,
        n_blocks=n_blocks,
        n_chunks=n_chunks,
        rb=rb,
        eb=eb,
    )


def _segment_matmul_kernel(block_ref, first_ref, dst_ref, w_ref, g_ref,
                           y_ref, *, rb: int, acc_dtype):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    dst = dst_ref[:]  # [eb] int32
    w = w_ref[:]  # [eb] f32
    rows = jax.lax.broadcasted_iota(jnp.int32, (rb, dst.shape[0]), 0)
    s = jnp.where(rows == dst[None, :], w[None, :], 0.0)  # [rb, eb]
    y_ref[:] += jnp.dot(
        s.astype(acc_dtype), g_ref[:].astype(acc_dtype),
        preferred_element_type=jnp.float32,
    )


def segment_matmul(plan: SegmentMatmulPlan, g: jax.Array,
                   interpret: bool = False,
                   compute_dtype=jnp.float32) -> jax.Array:
    """g: [n_chunks * eb, d] gathered source rows (chunk-order). Returns
    y: [n_blocks * rb, d] (slice to n_node outside). d must be a multiple
    of 128 (pad outside)."""
    d = g.shape[-1]
    assert d % 128 == 0, f"pad feature dim to 128 (got {d})"
    rb, eb = plan.rb, plan.eb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_of_chunk, first_of_block
        grid=(plan.n_chunks,),
        in_specs=[
            pl.BlockSpec((eb,), lambda i, blk, first: (i,),
                         memory_space=pltpu.VMEM),  # dst_local (flat)
            pl.BlockSpec((eb,), lambda i, blk, first: (i,),
                         memory_space=pltpu.VMEM),  # weights (flat)
            pl.BlockSpec((eb, d), lambda i, blk, first: (i, 0),
                         memory_space=pltpu.VMEM),  # g chunk
        ],
        out_specs=pl.BlockSpec((rb, d), lambda i, blk, first: (blk[i], 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = partial(_segment_matmul_kernel, rb=rb, acc_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_blocks * rb, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.n_chunks * eb * rb * d,
            bytes_accessed=plan.n_chunks * eb * d * 4
            + plan.n_blocks * rb * d * 4,
            transcendentals=0,
        ),
    )(plan.block_of_chunk, plan.first_of_block, plan.dst_local,
      plan.weights, g)


def spmm_via_plan(plan: SegmentMatmulPlan, x: jax.Array,
                  interpret: bool = False,
                  compute_dtype=jnp.float32) -> jax.Array:
    """Full SpMM: XLA gather + Pallas segment-matmul. x: [N, d_any].

    With ``compute_dtype=bfloat16`` the cast happens BEFORE the gather so
    the materialized [E, d] intermediate moves half the HBM bytes; the MXU
    still accumulates in f32 (preferred_element_type)."""
    d = x.shape[-1]
    d_pad = _round_up(d, 128)
    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
    if compute_dtype != x.dtype:
        x = x.astype(compute_dtype)
    g = x[plan.senders]  # [n_chunks*eb, d_pad] — XLA gather
    y = segment_matmul(plan, g, interpret=interpret,
                       compute_dtype=compute_dtype)
    return y[: plan.n_node, :d]


# --- differentiable pair (fwd plan + transposed plan) ---------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def spmm_pallas_pair(plans, x, interpret=False, compute_dtype=jnp.float32):
    """plans = (fwd_plan, transposed_plan); y = A @ x, dx = A^T @ dy —
    both directions scatter-free."""
    return spmm_via_plan(plans[0], x, interpret, compute_dtype)


def _pair_fwd(plans, x, interpret, compute_dtype):
    return spmm_via_plan(plans[0], x, interpret, compute_dtype), plans


def _pair_bwd(interpret, compute_dtype, plans, dy):
    dx = spmm_via_plan(plans[1], dy, interpret, compute_dtype)
    dplans = jax.tree.map(jnp.zeros_like, plans)
    return dplans, dx


spmm_pallas_pair.defvjp(_pair_fwd, _pair_bwd)


def build_plans(edge_index: np.ndarray, n_node: int,
                edge_weight: Optional[np.ndarray] = None,
                rb: int = 128, eb: int = 1024):
    """(fwd, transposed) plans from a HOST edge list [2, E]. Always build
    plans from host data: pulling edge arrays back off the device is a
    device->host transfer (pathologically slow on tunneled backends)."""
    e = np.asarray(edge_index, np.int64)
    w = (np.ones(e.shape[1], np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32))
    of = np.argsort(e[1], kind="stable")
    fwd = build_plan(e[0][of], e[1][of], w[of], n_node, rb, eb)
    ot = np.argsort(e[0], kind="stable")
    bwd = build_plan(e[1][ot], e[0][ot], w[ot], n_node, rb, eb)
    return fwd, bwd


def build_plans_from_graph(g, rb: int = 128, eb: int = 1024):
    """(fwd, transposed) plans from a graph/core.Graph. NOTE: forces
    device->host copies of the edge arrays — prefer build_plans with the
    host edge list."""
    fwd = build_plan(
        np.asarray(g.senders), np.asarray(g.receivers),
        np.asarray(g.edge_weight), g.n_node, rb, eb,
    )
    bwd = build_plan(
        np.asarray(g.senders_t), np.asarray(g.receivers_t),
        np.asarray(g.edge_weight_t), g.n_node, rb, eb,
    )
    return fwd, bwd


def spmm_pallas(g, x, interpret: bool = False):
    """One-shot helper for graph/core.Graph (plans rebuilt each call — for
    repeated use build plans once with build_plans_from_graph and call
    spmm_pallas_pair)."""
    plans = build_plans_from_graph(g)
    return spmm_pallas_pair(plans, x, interpret)
