"""DistGraph: the sharded drop-in for graph/core.Graph — the full model on a mesh.

Round-1 multi-chip ran a bespoke 2-layer GCN (parallel/distributed.py);
this module makes the REAL TricksComb teacher (norms, residual tricks, SE,
Adam, eval suite) run across chips unchanged:

- ``DistGraph`` is a pytree that duck-types the ``Graph`` surface the model
  layer actually touches (``deg_in`` / ``deg_out`` row-sharded vectors and
  dispatch inside ``ops.spmm.spmm``), so ``GCNConv``/``TricksComb``/
  ``train_teacher`` need no sharding-specific code. Everything outside the
  SpMM (dense matmuls, norms, dropout, optimizer, metrics) is row-parallel
  or replicated and is partitioned automatically by GSPMD from the input
  shardings; only the SpMM carries explicit collectives via ``shard_map``.
- Edges are double-bucketed by (dst_shard, src_shard) exactly like
  ``RingShardedGraph``; additionally every bucket gets a
  ``SegmentMatmulPlan`` in LOCAL coordinates, padded to a common chunk
  count, so each ring step runs the scatter-free Pallas segment-matmul
  kernel (ops/spmm_pallas.py) on its local rows — the sharded path emits
  NO scatter in either direction (tests/test_distgraph.py asserts this on
  the lowered HLO).
- The ring: at step t device k holds source shard j=(k+t)%S's feature
  block and aggregates bucket (k, j); blocks move via ``ppermute`` over
  ICI, overlapping transfer with the local segment-matmul (the
  ring-attention pattern applied to neighborhood aggregation, SURVEY.md
  section 5).

Replaces (semantics): /root/reference/GNN_model/GCN.py:18-150 executed
single-device; the reference has no multi-device story at all
(SURVEY.md section 2.9).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.spmm_pallas import SegmentMatmulPlan, build_plan, spmm_via_plan


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "bkt_senders", "bkt_receivers", "bkt_weight",
        "bkt_senders_t", "bkt_receivers_t", "bkt_weight_t",
        "p_senders", "p_dst", "p_w", "p_block", "p_first",
        "pt_senders", "pt_dst", "pt_w", "pt_block", "pt_first",
        "deg_out", "deg_in",
        "bkt_gid", "bkt_gid_t", "p_gid", "pt_gid",
        "edge_src", "edge_dst", "edge_w", "edge_src_perm",
    ],
    meta_fields=[
        "n_node", "n_node_pad", "rows_per_shard", "n_shards", "e_bucket",
        "rb", "eb", "n_chunks", "n_chunks_t", "mesh", "axis", "model_axis",
    ],
)
@dataclass(frozen=True)
class DistGraph:
    """Row-sharded graph over a 1-D ``(axis,)`` mesh dimension.

    Bucket arrays are [S, S, E_b]: bucket (k, j) holds edges with dst in
    shard k (receivers local to k) and src in shard j (senders local to j);
    padding entries carry weight 0. Plan arrays hold one stacked
    SegmentMatmulPlan per bucket ([S, S, n_chunks*eb] / [S, S, n_chunks]),
    plus the transposed set (``pt_*``) for the backward ring."""

    bkt_senders: jax.Array
    bkt_receivers: jax.Array
    bkt_weight: jax.Array
    #: pre-transposed bucket arrays (bucket (k,j) of A^T = bucket (j,k) of
    #: A, roles swapped), built host-side so the backward of the
    #: segment-sum fallback never re-shards [S,S,E_b] across devices
    bkt_senders_t: jax.Array
    bkt_receivers_t: jax.Array
    bkt_weight_t: jax.Array
    p_senders: Optional[jax.Array]
    p_dst: Optional[jax.Array]
    p_w: Optional[jax.Array]
    p_block: Optional[jax.Array]
    p_first: Optional[jax.Array]
    pt_senders: Optional[jax.Array]
    pt_dst: Optional[jax.Array]
    pt_w: Optional[jax.Array]
    pt_block: Optional[jax.Array]
    pt_first: Optional[jax.Array]
    deg_out: jax.Array  # [n_node_pad] f32, row-sharded
    deg_in: jax.Array
    #: edge-view fields (``with_edge_view=True``): global edge ids per
    #: bucket/plan slot (pad -> -1) plus the canonical dst-sorted global
    #: edge list, replicated. They let graph-dropout tricks draw one
    #: per-edge mask [E] and apply it CONSISTENTLY to every weight array
    #: (fwd + transposed, bucket + plan) without rebuilding plans — the
    #: sharded path stays scatter-free under dropout, which the
    #: single-device path cannot do (nn/graph_dropout.masked_graph drops
    #: its plans).
    bkt_gid: Optional[jax.Array] = None  # [S, S, E_b] int32
    bkt_gid_t: Optional[jax.Array] = None
    p_gid: Optional[jax.Array] = None  # [S, S, n_chunks*eb] int32
    pt_gid: Optional[jax.Array] = None
    edge_src: Optional[jax.Array] = None  # [E] int32, replicated
    edge_dst: Optional[jax.Array] = None  # [E] int32, dst-sorted
    edge_w: Optional[jax.Array] = None  # [E] f32
    #: canonical->src-sorted permutation: deg_out after masking uses a
    #: SORTED segment_sum (keeps the sharded path scatter-free). Not
    #: swapped by transpose() — masks apply to forward graphs.
    edge_src_perm: Optional[jax.Array] = None  # [E] int32
    n_node: int = 0
    n_node_pad: int = 0
    rows_per_shard: int = 0
    n_shards: int = 1
    e_bucket: int = 0
    rb: int = 128
    eb: int = 512
    n_chunks: int = 0
    n_chunks_t: int = 0
    mesh: Optional[Mesh] = None
    axis: str = "graph"
    #: optional second mesh axis: activations/SE shard their FEATURE dim
    #: over it (tensor parallel); plans/buckets stay replicated across it
    model_axis: Optional[str] = None

    @property
    def has_plans(self) -> bool:
        return self.p_senders is not None

    @property
    def has_edge_view(self) -> bool:
        return self.edge_src is not None

    def transpose(self) -> "DistGraph":
        """A^T: swap to the pre-built transposed bucket/plan sets (no
        device data movement)."""
        return dataclasses.replace(
            self,
            bkt_senders=self.bkt_senders_t,
            bkt_receivers=self.bkt_receivers_t,
            bkt_weight=self.bkt_weight_t,
            bkt_senders_t=self.bkt_senders,
            bkt_receivers_t=self.bkt_receivers,
            bkt_weight_t=self.bkt_weight,
            p_senders=self.pt_senders, p_dst=self.pt_dst, p_w=self.pt_w,
            p_block=self.pt_block, p_first=self.pt_first,
            pt_senders=self.p_senders, pt_dst=self.p_dst, pt_w=self.p_w,
            pt_block=self.p_block, pt_first=self.p_first,
            deg_out=self.deg_in, deg_in=self.deg_out,
            bkt_gid=self.bkt_gid_t, bkt_gid_t=self.bkt_gid,
            p_gid=self.pt_gid, pt_gid=self.p_gid,
            edge_src=self.edge_dst, edge_dst=self.edge_src,
            edge_src_perm=None,
            n_chunks=self.n_chunks_t, n_chunks_t=self.n_chunks,
        )


def _stack_bucket_plans(buckets, rows, rb, eb):
    """buckets: [S][S] of (senders_local, receivers_local, w[, gid]) numpy
    tuples. Returns stacked plan arrays padded to a common chunk count
    (+ a stacked gid array when gids are present). Padding chunks target
    the last block with weight 0 and first_of_block=0 (adds zero, never
    re-zeroes)."""
    s = len(buckets)
    with_gids = len(buckets[0][0]) == 4
    plans = []
    gid_plans = [] if with_gids else None
    n_chunks_max = 0
    for k in range(s):
        row = []
        grow = []
        for j in range(s):
            sl, rl, w, *rest = buckets[k][j]
            order = np.argsort(rl, kind="stable")
            # no piece splitting: dist_spmm reconstructs plans per ring
            # step (piece metadata would not survive the stacking anyway)
            p = build_plan(sl[order], rl[order], w[order], rows, rb=rb,
                           eb=eb, max_gather_rows=None)
            n_chunks_max = max(n_chunks_max, p.n_chunks)
            row.append(p)
            if with_gids:
                # the chunk layout of build_plan depends only on (senders,
                # receivers) — weights ride along — so a second plan built
                # with f32-encoded gid+1 as weights lands every edge's gid
                # in exactly the slot its weight occupies. Exact for
                # E < 2^24 (f32 integer range). Known inefficiency: this
                # doubles host-side plan construction per bucket; the
                # layout-agnostic alternative (build_plan returning its
                # slot permutation, incl. from the C++ path) is a one-time
                # build cost, deferred.
                gid = rest[0]
                assert len(gid) == 0 or gid.max() + 1 < 2 ** 24
                gp = build_plan(sl[order], rl[order],
                                (gid[order] + 1).astype(np.float32),
                                rows, rb=rb, eb=eb, max_gather_rows=None)
                grow.append(
                    np.asarray(gp.weights).astype(np.int64).astype(np.int32)
                    - 1)
        plans.append(row)
        if with_gids:
            gid_plans.append(grow)

    n_blocks = rows // rb

    def field(name, per_chunk):
        width = eb if not per_chunk else 1
        # padding chunks MUST keep the output-block walk consecutive:
        # Pallas does not reload an output window on a non-consecutive
        # revisit, so a pad chunk pointing at block 0 after the real
        # chunks would flush stale buffer contents over block 0's rows on
        # real TPUs (interpret mode hides this). Pad with the LAST block
        # (where every bucket plan ends) and weight 0 -> adds nothing.
        if name == "block_of_chunk":
            out = np.full((s, s, n_chunks_max * width), n_blocks - 1,
                          np.int32)
        elif name == "senders":
            # striped pad senders, like build_plan's in-plan padding:
            # a constant repeated gather address serializes the emitter
            # (52 vs 86 Mrow/s measured, RESULTS.md round 4). Width
            # carries the +GATHER_TAIL_PAD slots so each ring step's
            # gather row count stays off the 1024-multiple emitter
            # cliff (ops/spmm_pallas.GATHER_TAIL_PAD).
            from ..ops.spmm_pallas import GATHER_TAIL_PAD

            stripe = ((np.arange(n_chunks_max * width + GATHER_TAIL_PAD,
                                 dtype=np.uint64)
                       * np.uint64(2654435761))
                      % np.uint64(max(rows, 1))).astype(np.int32)
            out = np.broadcast_to(stripe, (s, s, len(stripe))).copy()
        else:
            out = np.zeros((s, s, n_chunks_max * width),
                           np.float32 if name == "weights" else np.int32)
        for k in range(s):
            for j in range(s):
                arr = np.asarray(getattr(plans[k][j], name))
                out[k, j, : arr.shape[0]] = arr
        return out

    gid_stack = None
    if with_gids:
        gid_stack = np.full((s, s, n_chunks_max * eb), -1, np.int32)
        for k in range(s):
            for j in range(s):
                arr = gid_plans[k][j]
                gid_stack[k, j, : arr.shape[0]] = arr

    return (
        field("senders", False),
        field("dst_local", False),
        field("weights", False),
        field("block_of_chunk", True),
        field("first_of_block", True),
        gid_stack,
        n_chunks_max,
    )


def build_dist_graph(
    edge_index: np.ndarray,
    n_node: int,
    mesh: Mesh,
    edge_weight: Optional[np.ndarray] = None,
    *,
    axis: str = "graph",
    model_axis: Optional[str] = None,
    rb: int = 128,
    eb: int = 1024,
    with_plans: bool = True,
    with_edge_view: bool = False,
    pad_multiple: int = 8,
) -> DistGraph:
    """Host-side build + device_put with the mesh's shardings. The dst-shard
    leading axis of every bucket/plan array is sharded over ``axis``; degree
    vectors are row-sharded. ``with_edge_view=True`` additionally stores the
    canonical (dst-sorted) global edge list and per-slot global edge ids so
    graph-dropout masks can be applied in-graph (masked_dist_graph)."""
    n_shards = mesh.shape[axis]
    e = np.asarray(edge_index, np.int64)
    w = (np.ones(e.shape[1], np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32))
    # canonical edge order: dst-sorted (then src) — edge gids index this
    # order, and the edge view's receivers are sorted for segment_sum
    can = np.lexsort((e[0], e[1]))
    e = e[:, can]
    w = w[can]
    n_node_pad = _round_up(n_node, n_shards * rb)
    rows = n_node_pad // n_shards

    deg_out = np.bincount(e[0], minlength=n_node_pad).astype(np.float32)
    deg_in = np.bincount(e[1], minlength=n_node_pad).astype(np.float32)

    dst_shard = e[1] // rows
    src_shard = e[0] // rows
    counts = np.zeros((n_shards, n_shards), np.int64)
    np.add.at(counts, (dst_shard, src_shard), 1)
    e_b = max(_round_up(int(counts.max()), pad_multiple), pad_multiple)

    sl = np.zeros((n_shards, n_shards, e_b), np.int32)
    rl = np.zeros((n_shards, n_shards, e_b), np.int32)
    ws = np.zeros((n_shards, n_shards, e_b), np.float32)
    gd = (np.full((n_shards, n_shards, e_b), -1, np.int32)
          if with_edge_view else None)
    buckets = [[None] * n_shards for _ in range(n_shards)]
    bid = dst_shard * n_shards + src_shard
    order = np.argsort(bid, kind="stable")
    eo = e[:, order]
    wo = w[order]
    bounds = np.searchsorted(bid[order], np.arange(n_shards * n_shards + 1))
    for k in range(n_shards):
        for j in range(n_shards):
            lo, hi = bounds[k * n_shards + j], bounds[k * n_shards + j + 1]
            bs = (eo[0, lo:hi] - j * rows).astype(np.int64)
            br = (eo[1, lo:hi] - k * rows).astype(np.int64)
            bw = wo[lo:hi]
            m = hi - lo
            sl[k, j, :m], rl[k, j, :m], ws[k, j, :m] = bs, br, bw
            if with_edge_view:
                bgid = order[lo:hi].astype(np.int32)  # canonical edge ids
                gd[k, j, :m] = bgid
                buckets[k][j] = (bs, br, bw, bgid)
            else:
                buckets[k][j] = (bs, br, bw)

    p = pt = (None,) * 6
    n_chunks = n_chunks_t = 0
    if with_plans:
        *p, n_chunks = _stack_bucket_plans(buckets, rows, rb, eb)
        bt = [[(buckets[j][k][1], buckets[j][k][0]) + buckets[j][k][2:]
               for j in range(n_shards)] for k in range(n_shards)]
        *pt, n_chunks_t = _stack_bucket_plans(bt, rows, rb, eb)

    sh_b = NamedSharding(mesh, P(axis, None, None))
    sh_v = NamedSharding(mesh, P(axis))
    sh_r = NamedSharding(mesh, P())  # replicated
    put = lambda a, sh: None if a is None else global_put(a, sh)
    # pre-transposed buckets: bucket (k,j) of A^T = (j,k) of A, swapped
    sl_t = np.swapaxes(rl, 0, 1).copy()
    rl_t = np.swapaxes(sl, 0, 1).copy()
    ws_t = np.swapaxes(ws, 0, 1).copy()
    gd_t = None if gd is None else np.swapaxes(gd, 0, 1).copy()
    return DistGraph(
        bkt_senders=put(sl, sh_b),
        bkt_receivers=put(rl, sh_b),
        bkt_weight=put(ws, sh_b),
        bkt_senders_t=put(sl_t, sh_b),
        bkt_receivers_t=put(rl_t, sh_b),
        bkt_weight_t=put(ws_t, sh_b),
        p_senders=put(p[0], sh_b), p_dst=put(p[1], sh_b),
        p_w=put(p[2], sh_b), p_block=put(p[3], sh_b),
        p_first=put(p[4], sh_b),
        pt_senders=put(pt[0], sh_b), pt_dst=put(pt[1], sh_b),
        pt_w=put(pt[2], sh_b), pt_block=put(pt[3], sh_b),
        pt_first=put(pt[4], sh_b),
        deg_out=put(deg_out, sh_v),
        deg_in=put(deg_in, sh_v),
        bkt_gid=put(gd, sh_b),
        bkt_gid_t=put(gd_t, sh_b),
        p_gid=put(p[5], sh_b),
        pt_gid=put(pt[5], sh_b),
        edge_src=(put(e[0].astype(np.int32), sh_r)
                  if with_edge_view else None),
        edge_dst=(put(e[1].astype(np.int32), sh_r)
                  if with_edge_view else None),
        edge_w=put(w, sh_r) if with_edge_view else None,
        edge_src_perm=(
            put(np.argsort(e[0], kind="stable").astype(np.int32), sh_r)
            if with_edge_view else None),
        n_node=n_node,
        n_node_pad=n_node_pad,
        rows_per_shard=rows,
        n_shards=n_shards,
        e_bucket=e_b,
        rb=rb,
        eb=eb,
        n_chunks=n_chunks,
        n_chunks_t=n_chunks_t,
        mesh=mesh,
        axis=axis,
        model_axis=model_axis,
    )


def dist_spmm(g: DistGraph, x: jax.Array,
              compute_dtype=jnp.float32) -> jax.Array:
    """y = A @ x, x/y row-sharded [n_node_pad, d]. Ring-streamed: blocks
    ppermute around the mesh axis while each device aggregates the matching
    (dst, src) bucket — with per-bucket Pallas plans when available
    (scatter-free), sorted segment-sum otherwise."""
    s = g.n_shards
    axis = g.axis
    interpret = jax.default_backend() != "tpu"
    # Mosaic's rank-1 operand tiling needs eb % 1024 == 0 on real TPUs
    # (interpret mode has no such constraint); plans built with a smaller
    # eb (tests, tiny dryruns) fall back to the segment-sum ring there
    use_plans = g.has_plans and (interpret or g.eb % 1024 == 0)
    assert x.shape[0] == g.n_node_pad, (
        f"x has {x.shape[0]} rows; DistGraph needs n_node_pad="
        f"{g.n_node_pad} (pad with parallel.distgraph.pad_rows_np)")

    # on a 2-D (graph x model) mesh, the feature dim rides sharded over
    # the model axis: each device ring-streams only its feature slice (the
    # segment-matmul is feature-wise, so no cross-feature collective).
    # Feature dims that don't divide the axis (e.g. the classes-wide last
    # layer) fall back to replicated-over-model.
    m_axis = g.model_axis
    if m_axis is not None and x.shape[1] % g.mesh.shape[m_axis] != 0:
        m_axis = None
    xspec = P(axis, m_axis)
    if use_plans:
        n_blocks = g.rows_per_shard // g.rb
        specs_in = (xspec,) + (P(axis, None, None),) * 5
        operands = (g.p_senders, g.p_dst, g.p_w, g.p_block, g.p_first)
    else:
        specs_in = (xspec,) + (P(axis, None, None),) * 3
        operands = (g.bkt_senders, g.bkt_receivers, g.bkt_weight)

    @partial(
        shard_map, mesh=g.mesh, in_specs=specs_in,
        out_specs=xspec, check_vma=False,
    )
    def f(x_local, *ops):
        ops = tuple(o[0] for o in ops)  # drop the sharded leading dim
        k = jax.lax.axis_index(axis)
        y = jnp.zeros((g.rows_per_shard, x_local.shape[1]), jnp.float32)
        blk = x_local
        for t in range(s):
            j = (k + t) % s
            take = lambda a: jnp.take(a, j, axis=0)
            if use_plans:
                plan = SegmentMatmulPlan(
                    senders=take(ops[0]), dst_local=take(ops[1]),
                    weights=take(ops[2]), block_of_chunk=take(ops[3]),
                    first_of_block=take(ops[4]),
                    n_node=g.rows_per_shard, n_blocks=n_blocks,
                    n_chunks=g.n_chunks, rb=g.rb, eb=g.eb,
                )
                y = y + spmm_via_plan(plan, blk, interpret=interpret,
                                      compute_dtype=compute_dtype)
            else:
                sl, rl, wb = (take(o) for o in ops)
                contrib = blk[sl] * wb[:, None].astype(blk.dtype)
                y = y + jax.ops.segment_sum(
                    contrib, rl, num_segments=g.rows_per_shard)
            if t < s - 1:
                blk = jax.lax.ppermute(
                    blk, axis, [(i, (i - 1) % s) for i in range(s)])
        return y.astype(x_local.dtype)

    return f(x, *operands)


def dist_take_rows(g: DistGraph, h: jax.Array, idx: jax.Array) -> jax.Array:
    """Replicated gather of a FEW rows from a row-sharded [n_node_pad, d]
    array: each device contributes its local rows (others zero) and one
    psum over the graph axis assembles the full [K, d] result on every
    device. The TPU-native answer to 'DistMult needs rows of ``common``
    for sampled (src, dst) pairs' (edgewise aux loss under sharding,
    trainer_node_classification.py:435-563): K is a few thousand, so the
    psum moves K*d floats instead of all-gathering the embedding table."""
    axis = g.axis
    rows = g.rows_per_shard
    m_axis = g.model_axis
    if m_axis is not None and h.shape[1] % g.mesh.shape[m_axis] != 0:
        m_axis = None

    @partial(
        shard_map, mesh=g.mesh, in_specs=(P(axis, m_axis), P()),
        out_specs=P(None, m_axis), check_vma=False,
    )
    def f(h_local, idx):
        k = jax.lax.axis_index(axis)
        local = idx.astype(jnp.int32) - k * rows
        ok = (local >= 0) & (local < rows)
        safe = jnp.clip(local, 0, rows - 1)
        vals = jnp.where(ok[:, None], h_local[safe], 0.0)
        return jax.lax.psum(vals, axis)

    return f(h, idx)


class _EdgeView:
    """Duck-typed Graph view over the canonical global edge list — exactly
    the attribute surface nn/graph_dropout's mask samplers touch (senders /
    receivers / edge_weight / e_pad / n_node). receivers are dst-sorted, so
    ``indices_are_sorted=True`` segment-sums are valid."""

    __slots__ = ("senders", "receivers", "edge_weight", "e_pad", "n_node")

    def __init__(self, g: "DistGraph"):
        assert g.has_edge_view, (
            "DistGraph was built without with_edge_view=True — rebuild it "
            "(data.prepare_sharded does this when cfg.apply_graph_dropout)")
        assert g.edge_src_perm is not None, (
            "edge view requires the FORWARD DistGraph: transpose() drops "
            "the src-sorted permutation and its edge list is no longer "
            "dst-sorted (mask samplers run sorted segment sums over it)")
        self.senders = g.edge_src
        self.receivers = g.edge_dst
        self.edge_weight = g.edge_w
        self.e_pad = g.edge_w.shape[0]
        self.n_node = g.n_node


def global_edge_view(g: "DistGraph") -> _EdgeView:
    return _EdgeView(g)


def masked_dist_graph(g: DistGraph, mask: jax.Array) -> DistGraph:
    """Apply a per-edge mask (canonical global edge order, 1 keep / 0 drop)
    to every weight array — forward + transposed, bucket + plan — via the
    per-slot gid maps, and recompute degrees from the surviving edges.

    Unlike the single-device ``nn/graph_dropout.masked_graph`` (which must
    drop its baked Pallas plans and fall back to the scatter path), the
    sharded plans stay valid: masking only scales plan weights, so the ring
    aggregation remains scatter-free under DropEdge/DropNode/FastGCN/LADIES.
    """
    assert g.has_edge_view
    mask = jax.lax.stop_gradient(mask.astype(jnp.float32))
    ext = jnp.concatenate([jnp.ones((1,), jnp.float32), mask])

    # the gather (replicated mask, dst-shard-sharded gid slots) runs under
    # shard_map so each device scales its local slots — no ambiguous
    # sharded-gather, no collectives
    spec = P(g.axis, None, None)

    @partial(shard_map, mesh=g.mesh, in_specs=(spec, spec, P()),
             out_specs=spec, check_vma=False)
    def _scale_local(warr, gidarr, ext):
        return warr * jnp.take(ext, gidarr + 1)

    def scale(warr, gidarr):
        if warr is None:
            return None
        return jax.lax.stop_gradient(_scale_local(warr, gidarr, ext))

    assert g.edge_src_perm is not None, (
        "masked_dist_graph applies to forward graphs (transpose() drops "
        "the src-sorted permutation)")
    keep = mask * jnp.sign(jnp.abs(g.edge_w))
    deg_in = jax.lax.stop_gradient(jax.ops.segment_sum(
        keep, g.edge_dst, num_segments=g.n_node_pad,
        indices_are_sorted=True))
    perm = g.edge_src_perm
    deg_out = jax.lax.stop_gradient(jax.ops.segment_sum(
        jnp.take(keep, perm), jnp.take(g.edge_src, perm),
        num_segments=g.n_node_pad, indices_are_sorted=True))

    return dataclasses.replace(
        g,
        bkt_weight=scale(g.bkt_weight, g.bkt_gid),
        bkt_weight_t=scale(g.bkt_weight_t, g.bkt_gid_t),
        p_w=scale(g.p_w, g.p_gid),
        pt_w=scale(g.pt_w, g.pt_gid),
        deg_in=deg_in,
        deg_out=deg_out,
    )


def comm_volume_stats(edge_index: np.ndarray, n_node: int, n_shards: int,
                      d_feat: int = 128, itemsize: int = 4,
                      rb: int = 128) -> dict:
    """Communication accounting for one ``dist_spmm`` over an S-shard ring
    vs the partition's halo lower bound (VERDICT r4 next #4).

    The ring ppermutes each device's FULL [rows_per_shard, d] feature block
    S-1 times, so the volume is deterministic (no runtime counter needed):

      ring_rows  = (S-1) * n_node_pad          rows moved per SpMM
      ring_bytes = ring_rows * d_feat * itemsize

    The information-theoretic floor for a point-to-point exchange is the
    HALO: for each (dst_shard k, src_shard j != k) bucket, shard k needs
    each distinct off-shard source row once:

      halo_rows  = sum_{k != j} |unique senders in bucket (k, j)|

    ``ring_over_halo`` = ring_rows / halo_rows is the ring's volume
    overhead. On power-law graphs at small S the halo approaches
    (S-1)/S * E_unique-ish saturation (hubs are needed by every shard), so
    the ring's dense block streaming is close to optimal precisely when
    the graph is dense/hubby per shard; the stat makes that check
    quantitative (tests/test_distgraph.py asserts it on power-law graphs
    at 2/4/8 shards).

    Returns a dict with rows/bytes for both, per-shard maxima (the ring is
    bulk-synchronous: the slowest link paces every step), and
    ``project_scaling_efficiency`` inputs. Reference: none — the reference
    is single-GPU (trainer_node_classification.py:258)."""
    e = np.asarray(edge_index, np.int64)
    n_node_pad = _round_up(n_node, n_shards * rb)
    rows = n_node_pad // n_shards
    dst_shard = e[1] // rows
    src_shard = e[0] // rows
    halo_rows = 0
    halo_per_dst = np.zeros(n_shards, np.int64)
    for k in range(n_shards):
        for j in range(n_shards):
            if k == j:
                continue
            m = (dst_shard == k) & (src_shard == j)
            u = len(np.unique(e[0][m]))
            halo_rows += u
            halo_per_dst[k] += u
    ring_rows = (n_shards - 1) * n_node_pad
    return {
        "n_shards": n_shards,
        "n_node_pad": int(n_node_pad),
        "rows_per_shard": int(rows),
        "ring_rows_per_spmm": int(ring_rows),
        "ring_bytes_per_spmm": int(ring_rows * d_feat * itemsize),
        "ring_bytes_per_chip_per_spmm": int(
            (n_shards - 1) * rows * d_feat * itemsize),
        "halo_rows_lower_bound": int(halo_rows),
        "halo_bytes_lower_bound": int(halo_rows * d_feat * itemsize),
        "halo_rows_max_dst_shard": int(halo_per_dst.max()),
        "ring_over_halo": float(ring_rows / max(halo_rows, 1)),
    }


def project_scaling_efficiency(step_ms_1chip: float, n_spmm_per_step: int,
                               stats: dict, d_feat: int = 128,
                               itemsize: int = 4,
                               ici_gbps: float = 45.0,
                               dcn_gbps_per_chip: float = 3.125,
                               dcn_links: int = 0) -> dict:
    """Projected S-chip scaling efficiency from the measured 1-chip step
    and the ring volume model (the only attainable evidence toward the
    >=80% 2-host target in an image with one real chip — BASELINE.md).

    Model: compute scales 1/S (edges split across shards); each SpMM adds
    S-1 ring hops of [rows_per_shard, d] blocks. Per hop every chip
    sends/receives one block concurrently, so hop time = block_bytes /
    link_bw; with ``dcn_links`` > 0 of the S ring links crossing DCN, the
    bulk-synchronous ring is paced by the slowest link. Overlap credit is
    0 (conservative: dist_spmm does overlap ppermute with the local
    segment-matmul, but the projection must not assume it hides
    everything).

    Bandwidth assumptions (documented, adjustable): v5e ICI = 45 GB/s per
    link per direction (one hop uses one link); DCN = 25 GB/s per host /
    8 chips = 3.125 GB/s per chip when a hop crosses hosts.

    efficiency = T_1 / (S * T_S),  T_S = T_1/S + n_spmm * t_ring."""
    s = stats["n_shards"]
    block_bytes = stats["rows_per_shard"] * d_feat * itemsize
    hop_ici_ms = block_bytes / (ici_gbps * 1e9) * 1e3
    hop_dcn_ms = block_bytes / (dcn_gbps_per_chip * 1e9) * 1e3
    # per ring step, ALL chips exchange concurrently; the step is paced by
    # the slowest participating link. dcn_links of the S ring links cross
    # DCN; a hop is DCN-paced whenever any block crosses one of them.
    hop_ms = hop_dcn_ms if dcn_links > 0 else hop_ici_ms
    t_ring_ms = (s - 1) * hop_ms
    t_s = step_ms_1chip / s + n_spmm_per_step * t_ring_ms
    eff = step_ms_1chip / (s * t_s)
    return {
        "t_step_projected_ms": round(t_s, 3),
        "t_ring_per_spmm_ms": round(t_ring_ms, 3),
        "hop_ms": round(hop_ms, 4),
        "efficiency": round(eff, 4),
        "assumptions": {
            "ici_gbps_per_link": ici_gbps,
            "dcn_gbps_per_chip": dcn_gbps_per_chip,
            "dcn_links_in_ring": dcn_links,
            "overlap_credit": 0.0,
        },
    }


def global_put(a: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Multi-process-safe device placement: every process holds the same
    full host array (SPMD data build) and contributes only its addressable
    shards. Identical to device_put in single-process runs; required on
    multi-host meshes where no process can address every device."""
    a = np.asarray(a)
    return jax.make_array_from_callback(
        a.shape, sharding, lambda idx: a[idx])


def pad_rows_np(a: np.ndarray, n_node_pad: int, fill=0):
    pad = n_node_pad - a.shape[0]
    if pad == 0:
        return a
    return np.concatenate(
        [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)


def shard_params(mesh: Mesh, params, axis: str = "graph",
                 model_axis: Optional[str] = None):
    """Canonical parameter shardings for the teacher on a graph mesh: SE
    tables (name 'se') row-sharded (and feature-sharded over model_axis on
    a 2-D mesh); dense kernels column-parallel over model_axis; everything
    else replicated."""

    m_size = mesh.shape[model_axis] if model_axis is not None else 1

    def spec(path, leaf):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        # feature dims that don't divide the model axis (e.g. num_classes)
        # stay replicated on that axis
        feat_ok = (model_axis is not None and leaf.ndim == 2
                   and leaf.shape[1] % m_size == 0)
        if any(n == "se" for n in names):
            return jax.device_put(
                leaf, NamedSharding(
                    mesh, P(axis, model_axis if feat_ok else None)))
        if feat_ok and "kernel" in names:
            return jax.device_put(
                leaf, NamedSharding(mesh, P(None, model_axis)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(spec, params)
