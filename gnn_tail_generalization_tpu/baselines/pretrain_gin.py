"""GIN pretraining variants: attribute/degree masking and context prediction.

Reference parity:
- masking_GIN (``/root/reference/Link_prediction_baseline/models/pretrain_masking_gin.py:197-240``):
  GIN encoder + degree classifier trained with NLL against the node-degree
  bucket labels (optionally restricted to a masked node subset).
- contextpred_GIN (``/root/reference/Link_prediction_baseline/models/pretrain_contextpred_gin.py:173-233``):
  substructure representation (GIN at the center) scored against the
  mean-pooled context-ring representation; negatives are cycled context
  rows; loss = BCE(pos) + neg_samples * BCE(neg). The reference materializes
  per-center DGL context graphs; here the context representation is the
  l1-step mean-propagated output of a separate context encoder — the same
  "surrounding ring summary" signal with static shapes.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.core import Graph
from ..ops.spmm import spmm
from .encoders import GINEncoder


class MaskingGIN(nn.Module):
    hidden_dim: int
    num_layers: int = 2
    num_degree_classes: int = 32

    def setup(self):
        self.encoder = GINEncoder(self.hidden_dim, self.num_layers)
        self.degree_classifier = nn.Dense(self.num_degree_classes)

    def embed(self, g: Graph, x, *, train: bool = False):
        return self.encoder(g, x, train=train)

    def __call__(self, g: Graph, x, degree_labels, mask=None, *,
                 train: bool = False):
        emb = self.encoder(g, x, train=train)
        logp = jax.nn.log_softmax(self.degree_classifier(emb), axis=1)
        picked = jnp.take_along_axis(logp, degree_labels[:, None], axis=1)[:, 0]
        if mask is not None:
            m = mask.astype(jnp.float32)
            return -jnp.sum(picked * m) / jnp.maximum(m.sum(), 1.0)
        return -jnp.mean(picked)


class ContextPredGIN(nn.Module):
    hidden_dim: int
    l1: int = 1  # substruct depth
    l2: int = 3  # context outer radius
    neg_samples: int = 2

    def setup(self):
        self.substruct = GINEncoder(self.hidden_dim, self.l1)
        self.context = GINEncoder(self.hidden_dim, self.l2 - self.l1)

    def embed(self, g: Graph, x, *, train: bool = False):
        return self.substruct(g, x, train=train)

    def _context_rep(self, g: Graph, x, train):
        h = self.context(g, x, train=train)
        deg = jnp.clip(g.deg_in, 1.0, None)[:, None]
        for _ in range(self.l1):
            h = spmm(g, h) / deg
        return h

    def __call__(self, g: Graph, x, *, train: bool = False):
        sub = self.substruct(g, x, train=train)
        ctx = self._context_rep(g, x, train)
        pos = jnp.sum(sub * ctx, axis=1)
        loss = jnp.mean(jax.nn.softplus(-pos))  # BCE vs label 1
        neg_total = 0.0
        for i in range(self.neg_samples):
            ctx_neg = jnp.roll(ctx, i + 1, axis=0)  # cycle_index negatives
            neg = jnp.sum(sub * ctx_neg, axis=1)
            neg_total = neg_total + jnp.mean(jax.nn.softplus(neg))
        return loss + self.neg_samples * neg_total / max(self.neg_samples, 1)


def train_pretrain_gin(g: Graph, x, variant: str = "masking",
                       hidden_dim: int = 64, epochs: int = 50,
                       lr: float = 1e-3, seed: int = 0, log_every: int = 0,
                       degree_labels=None, mask=None):
    """run loop; returns (embeddings, params)."""
    import optax

    if variant == "masking":
        model = MaskingGIN(hidden_dim)
        if degree_labels is None:
            degree_labels = jnp.minimum(
                g.deg_in.astype(jnp.int32), model.num_degree_classes - 1
            )
        args = (g, x, degree_labels, mask)
    elif variant == "contextpred":
        model = ContextPredGIN(hidden_dim)
        args = (g, x)
    else:
        raise ValueError(variant)

    k = jax.random.PRNGKey(seed)
    variables = jax.jit(
        lambda *a: model.init({"params": k}, *a, train=True)
    )(*args)
    params, bs = variables["params"], variables.get("batch_stats")
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bs, opt_state, *args):
        def loss_fn(p):
            vs = {"params": p}
            if bs is not None:
                vs["batch_stats"] = bs
            out, nv = model.apply(
                vs, *args, train=True,
                mutable=["batch_stats"] if bs is not None else [],
            )
            return out, nv.get("batch_stats") if bs is not None else None

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bs, opt_state, loss

    for ep in range(epochs):
        params, bs, opt_state, loss = step(params, bs, opt_state, *args)
        if log_every and ep % log_every == 0:
            print(f"{variant} ep {ep}: loss={float(loss):.4f}")

    vs = {"params": params}
    if bs is not None:
        vs["batch_stats"] = bs
    embs = model.apply(vs, g, x, train=False, method=model.embed)
    return jax.lax.stop_gradient(embs), params
