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

Gather-emitter operating curve (measured, v5e, 2.8M rows from 169k):
  row width <= 512B AND <= 128 lanes:  ~300-320 Mrow/s  (327 GB/s r+w at 512B)
  bf16 d=256 (512B but 256 lanes):      202 Mrow/s
  any row  > 512B:                      60-73 Mrow/s    (emitter cliff)
  index order (random vs sorted):       no effect at this scale
The emitter is ROW-bound below 512B: narrow features gather at the same
rows/s as 512B rows, so padding d<128 to 128 lanes costs nothing — the
per-SpMM floor is E / 320M rows/s regardless of d.

Packed-pair gather (the round-2 redesign): for bf16 compute, each
256-feature group is packed host..device-side into ONE f32 [N, 128] array
(f32 lane l = bf16 features (l, l+128) bit-packed). The gather then runs
at the 512B/128-lane sweet spot — 1.6x the direct bf16-row gather — and
the kernel unpacks in VMEM with two bitcast+shift ops per half before the
MXU segment-matmuls. Bit-exact vs. the direct bf16 path.

Measured at ogbn-arxiv scale (2.5M edges, d=256, full SpMM):
  XLA gather+segment_sum f32:          ~44 ms
  this kernel f32 (sliced gathers):    ~21 ms
  this kernel bf16 (direct gather):    16.9 ms
  this kernel bf16 packed-pair:        11.7 ms   (3.7x vs XLA f32)
  packed gather alone 8.75 ms / kernel alone 6.18 ms -> the pipeline
  overlaps ~3ms of the two.
Per-edge DMA in-kernel remains issue-rate bound (~30-100ns/descriptor x
2.8M rows) and cannot beat the emitter; hub-resident VMEM panels were
evaluated and rejected (top-2048 senders cover only 5.9% of edges after
symmetrization on the arxiv-shaped benchmark graph).
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


#: default HBM budget for ONE materialized gather stream: plans whose
#: padded edge count exceeds this split into block-aligned pieces that
#: gather + reduce sequentially (piece_bounds). 6M rows x 512B = ~3 GB —
#: at ogbl-citation2 scale one unsplit gather would be 24 GB (> HBM), and
#: the citation2 train step measured 17.35G/15.75G at a 12M budget.
#: NOTE the budget is denominated in ROWS assuming ONE 512B/row stream —
#: true for the packed bf16 path at d<=256 and the f32 path at d<=128
#: (the production hot paths). f32 d>128 gathers d_pad*4 B/row and bf16
#: d>256 gathers one 512B stream PER 256-feature group: callers on those
#: shapes should pass a proportionally smaller max_gather_rows through
#: build_plan/build_graph. A single row block bigger than the budget
#: (extreme hub) becomes one oversized piece — pieces never cut inside a
#: block (output-revisit safety).
DEFAULT_MAX_GATHER_ROWS = 6_000_000

#: extra striped sender slots appended to every plan's (and piece's)
#: gather stream. XLA's TPU row-gather emitter drops to HALF rate when
#: the gathered row count is an exact multiple of 1024 (v5e, measured
#: round 5: 4,000,000 rows -> 208 Mrow/s, 3,999,744 (=1024*3906) -> 93,
#: +8 rows -> 209; multiples of 512/256/128 are unaffected). Plans are
#: n_chunks*1024 rows by construction — exactly the pathological case —
#: so every gather runs over R+8 rows; the kernel's BlockSpec grid
#: covers only the first n_chunks*eb rows (Mosaic allows operands larger
#: than the grid's coverage; validated on silicon, bit-identical y).
GATHER_TAIL_PAD = 8


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["senders", "dst_local", "weights", "block_of_chunk",
                 "first_of_block"],
    meta_fields=["n_node", "n_blocks", "n_chunks", "rb", "eb",
                 "piece_bounds", "piece_block_bounds"],
)
@dataclass(frozen=True)
class SegmentMatmulPlan:
    """Chunked edge layout for the kernel (host-built, device-resident)."""

    senders: jax.Array  # [n_chunks*eb + GATHER_TAIL_PAD] int32 gather idx
    #                     (pad slots + tail -> striped; the tail defeats
    #                     the 1024-multiple gather-emitter penalty)
    dst_local: jax.Array  # [n_chunks * eb] int32 in [0, rb)
    weights: jax.Array  # [n_chunks * eb] f32 (0 on padding)
    block_of_chunk: jax.Array  # [n_chunks] int32
    first_of_block: jax.Array  # [n_chunks] int32 (1 = first chunk of block)
    n_node: int
    n_blocks: int
    n_chunks: int
    rb: int
    eb: int
    #: static piece split for huge plans: chunk boundaries (len pieces+1,
    #: starting 0 ending n_chunks) and the matching block boundaries.
    #: Empty tuples = single piece. Pieces cut ONLY at row-block
    #: boundaries so each piece owns a disjoint contiguous output range.
    piece_bounds: tuple = ()
    piece_block_bounds: tuple = ()


def _piece_split(boc_host: np.ndarray, n_chunks: int, n_blocks: int,
                 eb: int, max_rows: Optional[int]):
    """Static piece boundaries (chunk idx, block idx) cut at row-block
    boundaries so each piece writes a disjoint contiguous output range."""
    if max_rows is None or n_chunks * eb <= max_rows:
        return (), ()
    per = max(1, max_rows // eb)
    bounds = [0]
    c = 0
    while c < n_chunks:
        c2 = min(c + per, n_chunks)
        while c2 < n_chunks and boc_host[c2] == boc_host[c2 - 1]:
            c2 += 1  # never cut inside a block (output-revisit safety)
        bounds.append(c2)
        c = c2
    blocks = [int(boc_host[b]) for b in bounds[:-1]] + [n_blocks]
    return tuple(bounds), tuple(blocks)


def choose_plan_rb(receivers: np.ndarray, n_node: int,
                   candidates=tuple(range(128, 289, 8)),
                   eb: int = 1024) -> int:
    """Pick the row-block size minimizing modeled SpMM time for THIS degree
    distribution. E_pad = sum_b ceil(edges_b/eb)*eb depends strongly on rb
    when the mean edges-per-block sits near eb (ogbl-citation2: rb=128 pads
    54%, rb=184 pads 12%); the kernel's MXU work grows linearly with rb.
    Cost model (v5e, re-measured round 5 after the 1024-multiple gather
    fix): gather ~4.8 ns/padded row at GB-scale tables (207 Mrow/s),
    segment-matmul ~1.65 ns/row at rb=128 and d=256 (1.98-2.5 us/chunk at
    rb=192 — scratch/probe_kernel_ceiling.py: the kernel beats XLA's own
    batched matmul of the same shapes, so plan geometry is the only
    lever), scaling with rb. All candidates keep the 8-sublane tiling
    rule (rb % 8 == 0). One edge sort, then searchsorted per candidate —
    the full default sweep costs one O(E log E) pass, not 21 bincounts."""
    r = np.sort(np.asarray(receivers))
    best_rb, best_cost = candidates[0], np.inf
    for rb in candidates:
        assert rb % 8 == 0, rb
        nb = (n_node + rb - 1) // rb
        bounds = np.arange(1, nb, dtype=r.dtype) * rb
        counts = np.diff(np.searchsorted(r, bounds, side="left"),
                         prepend=0, append=len(r))
        e_pad = int(np.maximum((counts + eb - 1) // eb, 1).sum()) * eb
        cost = e_pad * (4.8 + 1.65 * rb / 128)
        if cost < best_cost:
            best_rb, best_cost = rb, cost
    return best_rb


def build_plan(
    senders_sorted: np.ndarray,
    receivers_sorted: np.ndarray,
    weights: Optional[np.ndarray],
    n_node: int,
    rb: int = 128,
    eb: int = 1024,
    max_gather_rows: Optional[int] = -1,
    stripe_mod: Optional[int] = None,
) -> SegmentMatmulPlan:
    """Edges MUST be sorted by receiver. Pads each row block's edge list to a
    multiple of eb.

    eb cannot go below 1024: the per-chunk metadata rides as 1-D blocked
    pallas operands whose s32/f32 tile is 1024 elements (Mosaic rejects
    smaller blocks, and (1, eb)/[n_chunks, eb] reshapes hit the 8x128
    2-D tile rule — both measured on v5e). The ~13% edge padding at arxiv
    scale is the price of that tile constraint.

    ``max_gather_rows``: plans above this padded edge count get static
    piece boundaries; spmm_via_plan then gathers + reduces piece by piece
    so the materialized [E_pad, 128] stream never exceeds the HBM budget
    (at ogbl-citation2 scale one unsplit gather is 24 GB).

    ``stripe_mod``: range of the striped pad/tail senders — defaults to
    ``n_node``. Pass the gather-table row count when senders index a
    SIDE table whose size differs from the output row space (cross-host
    halo buffers, parallel/hier.py)."""
    if max_gather_rows == -1:  # resolve at call time (testable)
        max_gather_rows = DEFAULT_MAX_GATHER_ROWS
    sm = n_node if stripe_mod is None else int(stripe_mod)
    s = np.asarray(senders_sorted, np.int64)
    r = np.asarray(receivers_sorted, np.int64)
    w = (np.ones(len(s), np.float32) if weights is None
         else np.asarray(weights, np.float32))
    assert np.all(np.diff(r) >= 0), "edges must be dst-sorted"

    n_blocks = _round_up(n_node, rb) // rb

    # native (C++) fast path for the chunk layout
    from .. import native as _native

    nat = _native.segment_matmul_plan_arrays(s, r, w, n_node, rb, eb,
                                             stripe_mod=sm)
    if nat is not None:
        out_s, out_d, out_w, out_b, out_f, n_chunks = nat
        pb, pbb = _piece_split(out_b, n_chunks, n_blocks, eb,
                               max_gather_rows)
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
            piece_bounds=pb,
            piece_block_bounds=pbb,
        )

    block_of_edge = r // rb
    counts = np.bincount(block_of_edge, minlength=n_blocks)
    chunks_per_block = np.maximum((counts + eb - 1) // eb, 1)
    n_chunks = int(chunks_per_block.sum())

    # padding slots carry weight 0 (contribute nothing) and STRIPED sender
    # indices: long runs of one repeated gather address serialize the XLA
    # gather emitter (constant-index gathers measured 52 vs 86 Mrow/s at
    # ogbl-citation2 scale, RESULTS.md round 4). Same formula as the C++
    # path (bit-identical plans). The flat array carries GATHER_TAIL_PAD
    # extra striped slots (1024-multiple penalty, see constant above).
    senders_flat = ((np.arange(n_chunks * eb + GATHER_TAIL_PAD,
                               dtype=np.uint64) *
                     np.uint64(2654435761)) % np.uint64(sm)).astype(
        np.int32)
    senders = senders_flat[: n_chunks * eb].reshape(n_chunks, eb)
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

    pb, pbb = _piece_split(block_of_chunk, n_chunks, n_blocks, eb,
                           max_gather_rows)
    return SegmentMatmulPlan(
        senders=jnp.asarray(senders_flat),
        dst_local=jnp.asarray(dst_local.reshape(-1)),
        weights=jnp.asarray(ws.reshape(-1)),
        block_of_chunk=jnp.asarray(block_of_chunk),
        first_of_block=jnp.asarray(first_of_block),
        n_node=n_node,
        n_blocks=n_blocks,
        n_chunks=n_chunks,
        rb=rb,
        eb=eb,
        piece_bounds=pb,
        piece_block_bounds=pbb,
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


# --- packed-pair bf16 path -------------------------------------------------


def pack_bf16_pairs(x: jax.Array) -> jax.Array:
    """[N, d] float, d a multiple of 256 -> [N, d//2] f32 where, within each
    256-feature group g, f32 lane l packs bf16 features (g*256+l+128) in the
    high 16 bits and (g*256+l) in the low 16. The cast to bf16 is RTNE
    (jnp astype) — bit-identical operands to the direct-bf16 path."""
    n, d = x.shape
    assert d % 256 == 0, d
    xb = x.astype(jnp.bfloat16).reshape(n, d // 256, 2, 128)
    lo = xb[:, :, 0, :].astype(jnp.float32)
    hi = xb[:, :, 1, :].astype(jnp.float32)
    ulo = jax.lax.bitcast_convert_type(lo, jnp.uint32)
    uhi = jax.lax.bitcast_convert_type(hi, jnp.uint32)
    u = (uhi & np.uint32(0xFFFF0000)) | (ulo >> 16)
    return jax.lax.bitcast_convert_type(u, jnp.float32).reshape(n, d // 2)


def _unpack_pair(u):
    """uint32 [m, 128] -> (lo, hi) bf16 [m, 128] (values, not bit views)."""
    f_lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    f_hi = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000), jnp.float32)
    return f_lo.astype(jnp.bfloat16), f_hi.astype(jnp.bfloat16)


def _segment_matmul_packed_kernel(block_ref, first_ref, dst_ref, w_ref,
                                  *rest, rb: int, n_groups: int):
    gp_refs, y_ref = rest[:n_groups], rest[n_groups]
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    dst = dst_ref[:]
    w = w_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (rb, dst.shape[0]), 0)
    s = jnp.where(rows == dst[None, :], w[None, :], 0.0).astype(jnp.bfloat16)

    # ONE wide dot instead of 2*n_groups skinny [rb,eb]@[eb,128] dots: with
    # N=128 the matmul occupies a single 128x128 MXU tile and the kernel is
    # MXU-issue-bound (measured 6.2 ms at arxiv scale = ~30 TFLOP/s, 15% of
    # bf16 peak); concatenating the unpacked halves to [eb, 256*n_groups]
    # lets the lane dimension fan out across MXUs (measured ~2x).
    fs = []
    for k in range(n_groups):
        u = jax.lax.bitcast_convert_type(gp_refs[k][:], jnp.uint32)
        f_lo, f_hi = _unpack_pair(u)
        fs.append(f_lo)
        fs.append(f_hi)
    f = jnp.concatenate(fs, axis=1) if len(fs) > 1 else fs[0]
    y_ref[:] += jnp.dot(s, f, preferred_element_type=jnp.float32)


def segment_matmul_packed(plan: SegmentMatmulPlan, gps, interpret=False):
    """gps: tuple of [n_chunks*eb, 128] f32 packed-pair gathers (one per
    256-feature group). Returns y: [n_blocks*rb, 256*len(gps)] f32."""
    rb, eb = plan.rb, plan.eb
    n_groups = len(gps)
    d_out = 256 * n_groups
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.n_chunks,),
        in_specs=[
            pl.BlockSpec((eb,), lambda i, blk, first: (i,),
                         memory_space=pltpu.VMEM),  # dst_local
            pl.BlockSpec((eb,), lambda i, blk, first: (i,),
                         memory_space=pltpu.VMEM),  # weights
        ] + [
            pl.BlockSpec((eb, 128), lambda i, blk, first: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_groups)
        ],
        out_specs=pl.BlockSpec((rb, d_out), lambda i, blk, first: (blk[i], 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = partial(_segment_matmul_packed_kernel, rb=rb, n_groups=n_groups)
    # measured on v5e at arxiv scale (2750 chunks): attaching a
    # CostEstimate costs ~0.3 ms and a raised VMEM cap helps the input
    # pipeline slightly — so: no cost estimate, 100MB limit
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_blocks * rb, d_out),
                                       jnp.float32),
        interpret=interpret,
        **kwargs,
    )(plan.block_of_chunk, plan.first_of_block, plan.dst_local,
      plan.weights, *gps)


def _gather_sliced(x: jax.Array, senders: jax.Array) -> jax.Array:
    """Row gather. Wide f32 rows (>512B) sit on the slow side of the
    emitter cliff, but every workaround measured WORSE on the tunneled v5e:
    lane slicing (x[:, a:b][senders]) gets fused back into a full-width
    gather, and [N, k*128] -> [N*k, 128] reshapes are physical retilings on
    TPU (row 77ms vs 43ms plain at arxiv scale). The fast wide path is the
    bf16 packed-pair pipeline; plain gather is kept for f32."""
    return x[senders]


def _piece_view(plan: SegmentMatmulPlan, i: int) -> SegmentMatmulPlan:
    """Piece i as a standalone plan with LOCAL block ids (its output is a
    disjoint contiguous row range [b0*rb, b1*rb))."""
    c0, c1 = plan.piece_bounds[i], plan.piece_bounds[i + 1]
    b0, b1 = plan.piece_block_bounds[i], plan.piece_block_bounds[i + 1]
    eb = plan.eb
    return SegmentMatmulPlan(
        # the +GATHER_TAIL_PAD rows keep every piece's gather row count
        # off the 1024-multiple emitter cliff; the kernel grid never
        # reads them
        senders=plan.senders[c0 * eb: c1 * eb + GATHER_TAIL_PAD],
        dst_local=plan.dst_local[c0 * eb: c1 * eb],
        weights=plan.weights[c0 * eb: c1 * eb],
        block_of_chunk=plan.block_of_chunk[c0:c1] - b0,
        first_of_block=plan.first_of_block[c0:c1],
        n_node=(b1 - b0) * plan.rb,
        n_blocks=b1 - b0,
        n_chunks=c1 - c0,
        rb=plan.rb,
        eb=eb,
    )


#: how many pieces may be in flight in _run_piecewise. 1 = strictly
#: serial (the round-3/4 behavior: at most one [piece_rows, 128] gather
#: stream live). 2 = lookahead-1 double buffering: piece i+1's gather is
#: barrier-tied to piece i-1's output, so XLA may overlap piece i+1's
#: gather with piece i's kernel at the cost of one extra live stream
#: (~2 GB at 4M-row pieces). Callers sizing DEFAULT_MAX_GATHER_ROWS must
#: budget PIECE_LOOKAHEAD streams.
PIECE_LOOKAHEAD = 1


def _run_piecewise(plan: SegmentMatmulPlan, run):
    """Execute ``run(sub_plan)`` per piece with at most PIECE_LOOKAHEAD
    pieces in flight (optimization barriers tie each piece's gather to an
    earlier piece's output, bounding how many [piece_rows, 128] gather
    streams XLA's allocator keeps live), and concatenate the disjoint
    output row ranges."""
    if not plan.piece_bounds:
        return run(plan)
    ys = []
    for i in range(len(plan.piece_bounds) - 1):
        p = _piece_view(plan, i)
        if i >= PIECE_LOOKAHEAD:
            token = ys[i - PIECE_LOOKAHEAD][0, 0]
            s, _ = jax.lax.optimization_barrier((p.senders, token))
            p = dataclasses.replace(p, senders=s)
        ys.append(run(p))
    return jnp.concatenate(ys, axis=0)


def spmm_via_plan(plan: SegmentMatmulPlan, x: jax.Array,
                  interpret: bool = False,
                  compute_dtype=jnp.float32) -> jax.Array:
    """Full SpMM: XLA gather + Pallas segment-matmul. x: [N, d_any].

    ``compute_dtype=bfloat16``: packed-pair path — x is cast to bf16 (RTNE)
    and bit-packed two-features-per-f32-lane BEFORE the gather, so the
    gather moves 512B 128-lane rows (the emitter sweet spot) and half the
    direct-bf16 HBM bytes; the kernel unpacks in VMEM and the MXU still
    accumulates in f32. ``float32``: 128-lane sliced gathers + plain
    kernel. Plans with piece_bounds gather + reduce piecewise (HBM
    budget, build_plan docstring)."""
    d = x.shape[-1]
    if compute_dtype == jnp.bfloat16 and d > 128:
        d_pad = _round_up(d, 256)
        if d_pad != d:
            x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
        # pack PER GROUP so each gather operand is its own [N, 128] array:
        # slicing one wide packed array re-fuses into a full-width gather
        # (the emitter then fetches >512B rows — the cliff)
        packed = tuple(pack_bf16_pairs(x[:, k: k + 256])
                       for k in range(0, d_pad, 256))

        def run(p):
            gps = tuple(pk[p.senders] for pk in packed)
            return segment_matmul_packed(p, gps, interpret=interpret)

        y = _run_piecewise(plan, run)
        return y[: plan.n_node, :d]
    d_pad = _round_up(d, 128)
    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
    if compute_dtype != x.dtype:
        x = x.astype(compute_dtype)
    xc = x

    def run(p):
        g = _gather_sliced(xc, p.senders)  # [piece_chunks*eb, d_pad]
        return segment_matmul(p, g, interpret=interpret,
                              compute_dtype=compute_dtype)

    y = _run_piecewise(plan, run)
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
