"""Sparse neighborhood aggregation (SpMM): ``y[dst] = sum_e w_e * x[src_e]``.

This is THE hot op of the framework — the reference delegates it to DGL's
CUDA ``update_all(copy_src, sum)`` (``/root/reference/GNN_model/GCN.py:238``)
and to torch_sparse ``adj @ x`` in label propagation
(``/root/reference/Label_propagation_model/outcome_correlation.py:139``).

TPU-native design
-----------------
Three interchangeable execution paths behind one differentiable entry point:

``dense``
    For small graphs (N <= a few thousand — Cora/Citeseer/Pubmed territory)
    the *fastest* TPU formulation is a single dense matmul on the MXU with a
    pre-materialized [N, N] adjacency: 2708^2 x 64 is a ~1 GFLOP matmul that
    the 128x128 systolic array eats in microseconds, with zero gather
    irregularity. The memory cost (N^2 * 4B) is irrelevant at this scale.

``gather``
    For large graphs: gather rows by sender, scale by edge weight, and
    ``segment_sum`` into receivers. Edges are pre-sorted by receiver
    (graph/core.py) so the reduction is a sorted-segment sum, which XLA
    lowers without a full scatter. HBM traffic ~ E * d * 4B per pass —
    the bandwidth-bound speed-of-light for an unstructured gather.

``pallas`` / ``pallas_bf16``
    Scatter-free kernel (ops/spmm_pallas.py): an XLA row gather materializes
    the [E_pad, d] (bf16: bit-packed [E_pad, d/2]) intermediate in HBM, and
    a Pallas kernel turns the segment reduction into MXU matmuls against an
    on-the-fly one-hot segment matrix. The gather is the measured bound
    (~320 Mrow/s emitter cap); the bf16 path packs two features per f32
    lane so the gather runs in its 512B/128-lane fast regime.

The VJP is the transposed-graph SpMM (dx = A^T dy), using the sender-sorted
edge view built once at graph construction; the per-edge-weight cotangent is
the SDDMM ``dw_e = dy[dst_e] . x[src_e]``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..graph.core import Graph

Precision = jax.lax.Precision


def _spmm_gather(senders, receivers, w, x, n_node):
    gathered = x[senders] * w[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        gathered,
        receivers,
        num_segments=n_node,
        indices_are_sorted=True,
    )


def _spmm_dense(dense_adj, x, precision):
    return jnp.matmul(
        dense_adj.astype(x.dtype), x, precision=precision
    )


def _spmm_impl(g: Graph, x, method: str, precision):
    from ..parallel.distgraph import DistGraph, dist_spmm
    from ..parallel.hier import HierGraph, hier_spmm

    if isinstance(g, DistGraph):
        # sharded path: ring-streamed shard_map SpMM (scatter-free when the
        # DistGraph carries per-bucket Pallas plans). Transparent to the
        # model layer — GCNConv calls spmm() identically on a mesh.
        dtype = jnp.bfloat16 if method == "pallas_bf16" else jnp.float32
        return dist_spmm(g, x, compute_dtype=dtype)
    if isinstance(g, HierGraph):
        # two-level (host x chip) path: ICI ring within hosts, halo-only
        # DCN exchange across hosts (parallel/hier.py)
        dtype = jnp.bfloat16 if method == "pallas_bf16" else jnp.float32
        return hier_spmm(g, x, compute_dtype=dtype)
    if method == "auto":
        # dense MXU matmul for small graphs; the Pallas scatter-free kernel
        # when a plan was built (~2x over XLA's scatter on TPU); sorted
        # gather+segment_sum otherwise.
        if g.dense_adj is not None:
            method = "dense"
        elif g.plans is not None:
            method = "pallas"
        else:
            method = "gather"
    if method == "dense":
        assert g.dense_adj is not None, "graph built without dense_adj"
        return _spmm_dense(g.dense_adj, x, precision)
    if method == "gather":
        return _spmm_gather(g.senders, g.receivers, g.edge_weight, x, g.n_node)
    if method in ("pallas", "pallas_bf16"):
        bf16 = method == "pallas_bf16"
        if g.plans is None:
            # graceful fallback when no plan was built (small graphs use the
            # dense path): keep the bf16-operand / f32-accumulate intent on
            # the MXU matmul; gather falls back to f32 (bf16 segment_sum
            # would accumulate in bf16 — unsafe for hub rows).
            if g.dense_adj is not None:
                if bf16:
                    return jnp.matmul(
                        g.dense_adj.astype(jnp.bfloat16),
                        x.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    )
                return _spmm_dense(g.dense_adj, x, precision)
            return _spmm_gather(g.senders, g.receivers, g.edge_weight, x,
                                g.n_node)
        from .spmm_pallas import spmm_via_plan

        # Mosaic only targets real TPUs; interpret elsewhere (tests)
        interpret = jax.default_backend() != "tpu"
        dtype = jnp.bfloat16 if bf16 else jnp.float32
        return spmm_via_plan(g.plans[0], x, interpret=interpret,
                             compute_dtype=dtype)
    raise ValueError(f"unknown spmm method {method!r}")


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def spmm(g: Graph, x: jax.Array, method: str = "auto", precision=Precision.HIGHEST):
    """y = A @ x with A[dst, src] = w_e. ``x``: [N, d] -> ``y``: [N, d]."""
    return _spmm_impl(g, x, method, precision)


def _spmm_fwd(g, x, method, precision):
    return _spmm_impl(g, x, method, precision), (g, x)


def _spmm_bwd(method, precision, res, dy):
    g, x = res
    dx = _spmm_impl(g.transpose(), dy, method, precision)
    # Graph cotangents are symbolic zeros: adjacency weights are structural
    # constants everywhere in this framework (normalizations, masks), so
    # spending an SDDMM on dw every backward would be pure waste. Use
    # spmm_edge_grad when edge weights must be trained.
    dg = jax.tree.map(jnp.zeros_like, g)
    return dg, dx


spmm.defvjp(_spmm_fwd, _spmm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def spmm_edge_grad(g: Graph, x: jax.Array, w: jax.Array,
                   method: str = "auto", precision=Precision.HIGHEST):
    """SpMM with differentiable edge weights ``w`` (dst-sorted order):
    dw_e = dy[dst_e] . x[src_e] (SDDMM). For learned-edge-weight models.
    method='dense' rebuilds the dense adjacency from the new weights
    (with_edge_weight drops it by default)."""
    return _spmm_impl(
        g.with_edge_weight(w, rebuild_dense=method == "dense"),
        x, method, precision)


def _seg_fwd(g, x, w, method, precision):
    gw = g.with_edge_weight(w, rebuild_dense=method == "dense")
    return _spmm_impl(gw, x, method, precision), (g, x, w)


def _seg_bwd(method, precision, res, dy):
    from .sddmm import edge_dot

    g, x, w = res
    gw = g.with_edge_weight(w, rebuild_dense=method == "dense")
    dx = _spmm_impl(gw.transpose(), dy, method, precision)
    dw = edge_dot(dy[g.receivers], x[g.senders]).astype(w.dtype)
    # padding slots (appended after the n_edge real edges) point at the
    # last node; zero their cotangent or trained weights drift off 0 there
    real = jnp.arange(g.e_pad) < g.n_edge
    dw = jnp.where(real, dw, 0.0)
    dg = jax.tree.map(jnp.zeros_like, g)
    return dg, dx, dw


spmm_edge_grad.defvjp(_seg_fwd, _seg_bwd)


def _norm_baked_graph(g) -> Optional[Graph]:
    """The graph with 'both'-normalized weights baked into its Pallas plans
    (graph/core.py build_graph(with_norm_plans=True)), if the Pallas path
    would actually be taken — else None. Lets callers skip the pre/post
    degree-scale passes entirely (one baked SpMM == D_in^-1/2 A D_out^-1/2)."""
    if (isinstance(g, Graph) and g.plans_norm is not None
            and g.dense_adj is None):
        return dataclasses.replace(g, plans=g.plans_norm, plans_norm=None)
    return None


def spmm_normalized(g: Graph, x, norm: str = "both", method: str = "auto"):
    """DGL-style degree-normalized aggregation used by the GCN conv:
    ``D_in^-1/2 A D_out^-1/2 x`` for 'both' (GNN_model/GCN.py:205-250),
    degrees clamped to >= 1. 'left' / 'right' use 1/deg on one side."""
    if norm == "both" and method in ("auto", "pallas", "pallas_bf16"):
        gn = _norm_baked_graph(g)
        if gn is not None:
            return spmm(gn, x, method)
    if norm in ("left", "both"):
        d = jnp.clip(g.deg_out, 1.0, None)
        scale = d**-0.5 if norm == "both" else 1.0 / d
        x = x * scale[:, None].astype(x.dtype)
    y = spmm(g, x, method)
    if norm in ("right", "both"):
        d = jnp.clip(g.deg_in, 1.0, None)
        scale = d**-0.5 if norm == "both" else 1.0 / d
        y = y * scale[:, None].astype(y.dtype)
    return y
