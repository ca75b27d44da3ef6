"""Link-prediction encoders: MLP / SAGE / GCN / WSAGE / Transformer.

Reference parity: ``/root/reference/Link_prediction_model/layer.py:19-83``
(PyG conv stacks, relu+dropout between layers, no activation after last).

Conv semantics (matching the PyG layers the reference instantiates):
- SAGEConv:   h = W_l x + W_r mean_{j in N(i)} x_j         (mean aggr, root)
- GCNConv(normalize=False): h = W (A @ x) + b              (A as given;
  the trainer pre-normalizes adj via gcn_normalization,
  Link_prediction_model/utils.py:93-99)
- GraphConv (WSAGE): h = W_1 x + W_2 sum_{j in N(i)} x_j   (sum aggr)
- TransformerConv: single-head dot-product attention over in-edges

All aggregations ride the framework SpMM; the attention softmax uses sorted
segment max/sum (no scatter thanks to dst-sorted edges... XLA segment ops).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.core import Graph
from ..ops.spmm import spmm


def _mean_agg(g: Graph, x, method: str = "auto"):
    s = spmm(g, x, method)
    deg = jnp.clip(g.deg_in, 1.0, None)
    return s / deg[:, None].astype(s.dtype)


class SAGEConv(nn.Module):
    out_channels: int
    spmm_method: str = "auto"

    @nn.compact
    def __call__(self, g: Graph, x):
        agg = _mean_agg(g, x, self.spmm_method)
        return (nn.Dense(self.out_channels)(x)
                + nn.Dense(self.out_channels, use_bias=False)(agg))


class GCNConvRaw(nn.Module):
    """PyG GCNConv(normalize=False): aggregate with the (pre-normalized)
    adjacency weights baked into the graph."""

    out_channels: int
    spmm_method: str = "auto"

    @nn.compact
    def __call__(self, g: Graph, x):
        h = nn.Dense(self.out_channels, use_bias=False)(x)
        y = spmm(g, h, self.spmm_method)
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return y + b


class WSAGEConv(nn.Module):
    """PyG GraphConv: root Dense + sum-aggregated Dense."""

    out_channels: int
    spmm_method: str = "auto"

    @nn.compact
    def __call__(self, g: Graph, x):
        agg = spmm(g, x, self.spmm_method)
        return (nn.Dense(self.out_channels)(x)
                + nn.Dense(self.out_channels, use_bias=False)(agg))


class TransformerConv(nn.Module):
    """Single-head TransformerConv (layer.py:77-83): per-edge attention
    alpha_e = softmax_{e into dst}(q[dst] . k[src] / sqrt(d))."""

    out_channels: int
    spmm_method: str = "auto"  # accepted for factory uniformity (unused)

    @nn.compact
    def __call__(self, g: Graph, x):
        assert g.e_pad > 0, (
            "TransformerConv attends over the COO edge arrays — rebuild "
            "the graph without lean=True")
        d = self.out_channels
        q = nn.Dense(d)(x)
        k = nn.Dense(d)(x)
        v = nn.Dense(d)(x)
        logits = jnp.sum(
            q[g.receivers] * k[g.senders], axis=-1
        ) / jnp.sqrt(float(d))
        # mask padding edges
        logits = jnp.where(g.edge_weight != 0, logits, -jnp.inf)
        seg_max = jax.ops.segment_max(
            logits, g.receivers, num_segments=g.n_node,
            indices_are_sorted=True,
        )
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        expd = jnp.where(
            g.edge_weight != 0,
            jnp.exp(logits - seg_max[g.receivers]), 0.0,
        )
        denom = jax.ops.segment_sum(
            expd, g.receivers, num_segments=g.n_node, indices_are_sorted=True
        )
        alpha = expd / jnp.maximum(denom[g.receivers], 1e-16)
        contrib = v[g.senders] * alpha[:, None]
        out = jax.ops.segment_sum(
            contrib, g.receivers, num_segments=g.n_node,
            indices_are_sorted=True,
        )
        # skip connection (PyG TransformerConv root_weight=True)
        return out + nn.Dense(d)(x)


_CONVS = {
    "SAGE": SAGEConv,
    "GCN": GCNConvRaw,
    "WSAGE": WSAGEConv,
    "Transformer": TransformerConv,
}


class GNNEncoder(nn.Module):
    """BaseGNN stack (layer.py:19-35): conv -> relu -> dropout between
    layers, bare conv at the end. kind='MLP' uses Linears and ignores g."""

    kind: str
    hidden_channels: int
    out_channels: int
    num_layers: int
    dropout: float = 0.0
    spmm_method: str = "auto"  # 'pallas_bf16' = bf16-operand aggregation

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        for i in range(self.num_layers):
            out = (self.out_channels if i == self.num_layers - 1
                   else self.hidden_channels)
            if self.kind == "MLP":
                x = nn.Dense(out)(x)
            else:
                x = _CONVS[self.kind](out, spmm_method=self.spmm_method)(g, x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
