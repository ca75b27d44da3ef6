"""Static-shape graph container and host-side graph builders.

TPU-first design notes
----------------------
XLA compiles one program per shape, so the graph is stored with *padded,
static* shapes: the edge list is padded to a multiple of ``pad_multiple`` and
padding edges carry ``edge_weight == 0`` (they point at the last node so the
edge list stays sorted by destination). All hot ops treat edge weight 0 as
"no edge", which makes padding, DropEdge-style edge masking and isolation
crafting the *same* mechanism.

Edges are kept twice, sorted by destination (for the forward SpMM
``y[dst] += w * x[src]``) and sorted by source (the transposed view used by
the SpMM backward pass). Both orders are built once on the host.

Reference parity (semantics, not code):
- edge utilities: ``/root/reference/utils.py:1119-1326`` (graphUtils)
- symmetrize:     ``/root/reference/utils.py:667-674``  (A + A^T, coalesced)
- loader pipeline symmetrize -> remove self loops -> add self loops:
  ``/root/reference/trainer_node_classification.py:655-662``
- degree semantics of the conv normalization (in/out degree of the directed
  edge list, *including* self loops, clamped to >= 1):
  ``/root/reference/GNN_model/GCN.py:205-213,242-250``
- GCN normalization D^-1/2 (A+I) D^-1/2: ``/root/reference/utils.py:1225-1241``
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "senders",
        "receivers",
        "edge_weight",
        "senders_t",
        "receivers_t",
        "edge_weight_t",
        "t_from_fwd",
        "deg_out",
        "deg_in",
        "dense_adj",
        "plans",
        "plans_norm",
    ],
    meta_fields=["n_node", "n_edge"],
)
@dataclasses.dataclass(frozen=True)
class Graph:
    """Immutable device-resident graph.

    ``senders/receivers/edge_weight`` are sorted by ``receivers`` (dst-major).
    ``*_t`` holds the reversed edges (senders_t = original receivers' role
    swap) sorted by ``receivers_t``, i.e. the ready-to-run forward edge list
    of A^T. ``n_edge`` is the true (unpadded) edge count; arrays have length
    ``E_pad >= n_edge``.

    ``dense_adj`` is an optional [N, N] dense materialization ``A[dst, src] =
    w`` used on small graphs where a single MXU matmul beats any sparse
    gather (see ops/spmm.py); ``None`` for large graphs.
    """

    senders: jax.Array
    receivers: jax.Array
    edge_weight: jax.Array
    senders_t: jax.Array
    receivers_t: jax.Array
    edge_weight_t: jax.Array
    t_from_fwd: jax.Array  # [E_pad] int32: edge_weight_t == edge_weight[t_from_fwd]
    deg_out: jax.Array  # [N] float32, includes self loops and duplicates
    deg_in: jax.Array  # [N] float32
    dense_adj: Optional[jax.Array]
    #: optional (fwd, transposed) ops.spmm_pallas.SegmentMatmulPlan pair for
    #: the Pallas SpMM path (built host-side via build_graph(with_plans=True))
    plans: Optional[tuple] = None
    #: optional plan pair with the DGL 'both' degree normalization BAKED
    #: into the edge weights (w'_e = deg_in[dst]^-1/2 * w_e *
    #: deg_out[src]^-1/2, degrees clamped >= 1); spmm_normalized then runs
    #: one SpMM with no pre/post scale passes. NOTE measured perf-neutral
    #: at arxiv scale (+0.04 ms/layer fwd+bwd): XLA already fuses the two
    #: [N, d] scale passes into the adjacent elementwise chains. Opt-in
    #: (build_graph(with_norm_plans=True)) as an API convenience only.
    plans_norm: Optional[tuple] = None
    n_node: int = 0
    n_edge: int = 0

    @property
    def e_pad(self) -> int:
        return self.senders.shape[0]

    def transpose(self) -> "Graph":
        """The reversed-edge graph (dst-sorted view is the *_t arrays)."""
        dense_t = None if self.dense_adj is None else self.dense_adj.T
        inv = jnp.argsort(self.t_from_fwd)
        plans_t = None if self.plans is None else (self.plans[1], self.plans[0])
        plans_norm_t = (None if self.plans_norm is None
                        else (self.plans_norm[1], self.plans_norm[0]))
        return Graph(
            senders=self.senders_t,
            receivers=self.receivers_t,
            edge_weight=self.edge_weight_t,
            senders_t=self.senders,
            receivers_t=self.receivers,
            edge_weight_t=self.edge_weight,
            t_from_fwd=inv,
            deg_out=self.deg_in,
            deg_in=self.deg_out,
            dense_adj=dense_t,
            plans=plans_t,
            plans_norm=plans_norm_t,
            n_node=self.n_node,
            n_edge=self.n_edge,
        )

    def with_edge_weight(
        self, w: jax.Array, w_t: Optional[jax.Array] = None,
        rebuild_dense: bool = False,
    ) -> "Graph":
        """Replace edge weights (dst-sorted order). ``w_t`` defaults to the
        consistent permutation of ``w``. ``rebuild_dense=False`` drops the
        dense materialization (auto SpMM then uses the gather path).

        Padding slots are force-masked to 0: the static-shape padding edges
        are (last_node -> last_node) self-loops, and caller-provided
        weights (learned edge weights, sigmoid outputs, ...) would
        otherwise aggregate real values through them."""
        real = jnp.arange(self.e_pad) < self.n_edge
        w = jnp.where(real, w, 0.0)
        if w_t is None:
            w_t = w[self.t_from_fwd]
        else:
            w_t = jnp.where(real, w_t, 0.0)
        dense = None
        if rebuild_dense and self.dense_adj is not None:
            dense = _dense_from_coo_jnp(
                self.senders, self.receivers, w, self.n_node
            )
        return dataclasses.replace(
            self, edge_weight=w, edge_weight_t=w_t, dense_adj=dense,
            plans=None, plans_norm=None,
        )


def _dense_from_coo_jnp(senders, receivers, w, n_node):
    dense = jnp.zeros((n_node, n_node), dtype=w.dtype)
    return dense.at[receivers, senders].add(w)


# ---------------------------------------------------------------------------
# Host-side edge-index transforms (numpy; run once at data-load time)
# ---------------------------------------------------------------------------


def _as_np(edge_index) -> np.ndarray:
    e = np.asarray(edge_index)
    assert e.ndim == 2 and e.shape[0] == 2, f"edge_index shape {e.shape}"
    return e.astype(np.int64)


def coalesce(edge_index: np.ndarray, n_node: int) -> np.ndarray:
    """Deduplicate edges, returning them sorted by (dst, src) (row-major on
    dst to match the coalesced COO order of utils.py:667-674)."""
    e = _as_np(edge_index)
    keys = e[1] * n_node + e[0]
    keys = np.unique(keys)
    return np.stack([keys % n_node, keys // n_node])


def symmetrize(edge_index: np.ndarray, n_node: Optional[int] = None) -> np.ndarray:
    """A <- A + A^T with deduplication (utils.py:667-674 semantics)."""
    e = _as_np(edge_index)
    if n_node is None:
        n_node = int(e.max()) + 1
    both = np.concatenate([e, e[::-1]], axis=1)
    return coalesce(both, n_node)


def remove_self_loops(edge_index: np.ndarray) -> np.ndarray:
    e = _as_np(edge_index)
    return e[:, e[0] != e[1]]


def add_self_loops(edge_index: np.ndarray, n_node: int) -> np.ndarray:
    e = _as_np(edge_index)
    loops = np.arange(n_node, dtype=np.int64)
    return np.concatenate([e, np.stack([loops, loops])], axis=1)


def standard_pipeline(edge_index: np.ndarray, n_node: int) -> np.ndarray:
    """symmetrize -> remove self loops -> add self loops, the node-classification
    loader pipeline of trainer_node_classification.py:655-662."""
    e = symmetrize(edge_index, n_node)
    e = remove_self_loops(e)
    return add_self_loops(e, n_node)


def degrees(edge_index: np.ndarray, n_node: int):
    """(out_degree, in_degree) of the directed edge list, including self loops
    and duplicates — matches dgl out_degrees/in_degrees used at
    GNN_model/GCN.py:206,243 and graph_analyze at utils.py:300-334."""
    e = _as_np(edge_index)
    deg_out = np.bincount(e[0], minlength=n_node).astype(np.float32)
    deg_in = np.bincount(e[1], minlength=n_node).astype(np.float32)
    return deg_out, deg_in


def gcn_norm_weights(edge_index: np.ndarray, n_node: int) -> np.ndarray:
    """Edge weights of D^-1/2 (A) D^-1/2 over the *given* edges, where D is the
    (in+out symmetric assumed) degree computed from the given edge list.

    For the normalized adjacency of utils.py:1225-1241 pass an edge list that
    already went through remove_self_loops+add_self_loops.
    """
    e = _as_np(edge_index)
    deg = np.bincount(e[1], minlength=n_node).astype(np.float64)
    dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    return (dinv[e[0]] * dinv[e[1]]).astype(np.float32)


def build_graph(
    edge_index: np.ndarray,
    n_node: int,
    edge_weight: Optional[np.ndarray] = None,
    *,
    pad_multiple: int = 128,
    pad_to: Optional[int] = None,
    dense_threshold: int = 8192,
    with_dense: Optional[bool] = None,
    with_plans: bool = False,
    with_norm_plans: bool = False,
    plan_rb: int = 128,
    plan_eb: int = 1024,
    lean: bool = False,
) -> Graph:
    """Build the device Graph from a host edge list.

    ``edge_weight=None`` means unit weights (plain adjacency; the GCN degree
    normalization is applied *outside* the SpMM, see nn/gcn.py).

    ``dense_threshold``: graphs with ``n_node <= dense_threshold`` also get a
    dense [N, N] adjacency so the SpMM can run as one MXU matmul. Override
    with ``with_dense``.

    ``lean=True`` (requires ``with_plans``): store ZERO-length COO edge
    arrays — the Pallas plans fully determine aggregation in both
    directions, and at ogbl scale the 7 [E_pad] COO arrays are ~0.9 GB of
    dead HBM + tunnel transfer. Anything needing per-edge views (gather
    fallback, edge masking, spmm_edge_grad) must use a non-lean graph.
    """
    e = _as_np(edge_index)
    n_edge = e.shape[1]
    if edge_weight is None:
        w = np.ones(n_edge, dtype=np.float32)
    else:
        w = np.asarray(edge_weight, dtype=np.float32)
        assert w.shape == (n_edge,)

    deg_out, deg_in = degrees(e, n_node)

    e_pad = pad_to if pad_to is not None else max(round_up(max(n_edge, 1), pad_multiple), pad_multiple)
    assert e_pad >= n_edge

    def sorted_padded(src, dst, w, order):
        src, dst, w = src[order], dst[order], w[order]
        pad = e_pad - n_edge
        # Padding edges: (last_node -> last_node) with weight 0; keeps the
        # dst-sorted order and contributes nothing to weighted aggregation.
        src = np.concatenate([src, np.full(pad, n_node - 1, np.int64)])
        dst = np.concatenate([dst, np.full(pad, n_node - 1, np.int64)])
        w = np.concatenate([w, np.zeros(pad, np.float32)])
        return (
            jnp.asarray(src, jnp.int32),
            jnp.asarray(dst, jnp.int32),
            jnp.asarray(w, jnp.float32),
        )

    if lean:
        assert with_plans, "lean graphs carry plans only"
        z = jnp.zeros((0,), jnp.int32)
        zf = jnp.zeros((0,), jnp.float32)
        senders = receivers = senders_t = receivers_t = z
        ew = ew_t = zf
        t_from_fwd = np.zeros((0,), np.int64)
    else:
        order_f = np.argsort(e[1], kind="stable")
        order_t = np.argsort(e[0], kind="stable")
        senders, receivers, ew = sorted_padded(e[0], e[1], w, order_f)
        # transposed view: reversed edges sorted by their destination
        # (= original senders)
        senders_t, receivers_t, ew_t = sorted_padded(e[1], e[0], w, order_t)
        # permutation: edge_weight_t == edge_weight[t_from_fwd]
        inv_order_f = np.empty(n_edge, dtype=np.int64)
        inv_order_f[order_f] = np.arange(n_edge)
        t_from_fwd = np.concatenate(
            [inv_order_f[order_t], np.arange(n_edge, e_pad, dtype=np.int64)]
        )

    if with_dense is None:
        with_dense = n_node <= dense_threshold
    dense = None
    if with_dense:
        dense_np = np.zeros((n_node, n_node), dtype=np.float32)
        np.add.at(dense_np, (e[1], e[0]), w)
        dense = jnp.asarray(dense_np)

    plans = None
    plans_norm = None
    if with_norm_plans:
        with_plans = True  # norm plans share the base plans' index arrays
    if with_plans:
        from ..ops.spmm_pallas import build_plans

        plans = build_plans(e, n_node, w, rb=plan_rb, eb=plan_eb)
        if with_norm_plans:
            # Bake the DGL 'both' normalization (GCN.py:205-250 semantics,
            # degrees clamped >= 1) into a second weight set. The chunk
            # layout is a function of the edge structure only, so the
            # index/metadata arrays are shared with `plans` — only the
            # per-edge weights differ. Computed in f64 host-side.
            dl = np.clip(deg_out.astype(np.float64), 1.0, None) ** -0.5
            dr = np.clip(deg_in.astype(np.float64), 1.0, None) ** -0.5
            wn = (dr[e[1]] * w.astype(np.float64) * dl[e[0]]).astype(
                np.float32)
            pn = build_plans(e, n_node, wn, rb=plan_rb, eb=plan_eb)
            plans_norm = tuple(
                dataclasses.replace(
                    pni, senders=pi.senders, dst_local=pi.dst_local,
                    block_of_chunk=pi.block_of_chunk,
                    first_of_block=pi.first_of_block,
                )
                for pi, pni in zip(plans, pn)
            )

    return Graph(
        senders=senders,
        receivers=receivers,
        edge_weight=ew,
        senders_t=senders_t,
        receivers_t=receivers_t,
        edge_weight_t=ew_t,
        t_from_fwd=jnp.asarray(t_from_fwd, jnp.int32),
        deg_out=jnp.asarray(deg_out),
        deg_in=jnp.asarray(deg_in),
        dense_adj=dense,
        plans=plans,
        plans_norm=plans_norm,
        n_node=n_node,
        n_edge=n_edge,
    )


def loss_masked_view(
    g: Graph,
    edge_index: np.ndarray,
    dst_mask: np.ndarray,
    edge_weight: Optional[np.ndarray] = None,
    *,
    plan_rb: int = 128,
    plan_eb: int = 1024,
    with_dense: Optional[bool] = None,
    with_plans: Optional[bool] = None,
) -> Graph:
    """A final-layer training view of ``g``: only edges whose destination is
    inside ``dst_mask`` are kept, but the degree arrays (i.e. the GCN
    normalization, GCN.py:205-250) stay those of the FULL graph.

    Rationale (TPU-first): when only loss-masked rows of the last conv's
    output feed the loss (NLL over the train mask), aggregating the other
    rows is dead compute — the gradient of the step is mathematically
    identical with them dropped, and the row-gather emitter is the measured
    bound of the step (RESULTS.md), so the final layer's fwd+bwd SpMMs
    shrink proportionally to the mask. Rows outside the mask aggregate to
    zero — the returned view must ONLY be used when nothing row-coupling
    (cross-row norms, edgewise losses, collect_SE) consumes them.

    ``edge_index``/``edge_weight`` are the HOST arrays ``g`` was built from
    (plans must be built from host data — see ops/spmm_pallas.build_plans).
    """
    e = _as_np(edge_index)
    m = np.asarray(dst_mask, bool)
    keep = m[e[1]]
    e_sub = e[:, keep]
    w_sub = None if edge_weight is None else np.asarray(edge_weight)[keep]
    if with_dense is None:
        with_dense = g.dense_adj is not None
    if with_plans is None:
        with_plans = g.plans is not None
    sub = build_graph(
        e_sub, g.n_node, w_sub,
        with_dense=with_dense, with_plans=with_plans,
        plan_rb=plan_rb, plan_eb=plan_eb,
    )
    return dataclasses.replace(sub, deg_out=g.deg_out, deg_in=g.deg_in)


def subgraph_edges(
    edge_index: np.ndarray,
    subset: np.ndarray,
    n_node: int,
    relabel: bool = True,
    edge_attr: Optional[np.ndarray] = None,
):
    """Crop edges to a node subset, optionally relabeling (utils.py:1250-1267)."""
    e = _as_np(edge_index)
    mask = np.zeros(n_node, dtype=bool)
    mask[np.asarray(subset)] = True
    emask = mask[e[0]] & mask[e[1]]
    e = e[:, emask]
    attr = None if edge_attr is None else np.asarray(edge_attr)[emask]
    if relabel:
        new_id = np.zeros(n_node, dtype=np.int64)
        new_id[np.asarray(subset)] = np.arange(len(np.asarray(subset)))
        e = new_id[e]
    return e, attr
