"""EGI (Ego-Graph Infomax) pretraining.

Reference parity: ``/root/reference/Link_prediction_baseline/models/subgi.py:16-474``
(SubGI): a GIN encoder plus a subgraph discriminator that scores the
agreement between a center node's embedding and its (reversed-edge) ego
graph, trained with JSD positive/negative expectations — negatives are the
same ego structure scored against a shuffled center embedding.

TPU-first reformulation: the reference walks DGL NodeFlow blocks with
per-layer GRU message functions; here the k-hop ego context is the k-step
neighbor aggregation of the *input features* over the reversed graph (the
same information the NodeFlow sampler exposes), combined with the center
embedding through an edgewise MLP discriminator. Fixed shapes, no
sampler. Same objective family (JSD fenchel-dual on center-vs-ego pairs).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.core import Graph
from ..ops.spmm import spmm
from .encoders import GINEncoder
from .mi import fenchel_dual_loss


class EGI(nn.Module):
    hidden_dim: int
    num_layers: int = 2
    measure: str = "JSD"

    def setup(self):
        self.encoder = GINEncoder(self.hidden_dim, self.num_layers)
        self.d1 = nn.Dense(self.hidden_dim)
        self.d2 = nn.Dense(1)

    def embed(self, g: Graph, x, *, train: bool = False):
        return self.encoder(g, x, train=train)

    def _ego_context(self, g: Graph, x):
        """k-hop mean aggregation of raw features over reversed edges
        (the NodeFlow ego view, subgi.py:158-219)."""
        gt = g.transpose()
        h = x
        deg = jnp.clip(gt.deg_in, 1.0, None)[:, None]
        for _ in range(self.num_layers):
            h = spmm(gt, h) / deg
        return h

    def score(self, center, ego):
        h = nn.relu(self.d1(jnp.concatenate([center, ego], axis=-1)))
        return self.d2(h)[..., 0]

    def __call__(self, g: Graph, x, perm, *, train: bool = False):
        z = self.encoder(g, x, train=train)
        ego = self._ego_context(g, x)
        pos = self.score(z, ego)
        neg = self.score(z[perm], ego)  # shuffled centers vs true ego
        return fenchel_dual_loss(pos, neg, self.measure)


def train_egi(g: Graph, x, hidden_dim: int = 64, num_layers: int = 2,
              epochs: int = 100, lr: float = 1e-3, seed: int = 0,
              patience: int = 20, log_every: int = 0):
    import optax

    model = EGI(hidden_dim, num_layers)
    n = x.shape[0]
    k = jax.random.PRNGKey(seed)
    variables = jax.jit(
        lambda g, x: model.init(
            {"params": k}, g, x, jnp.arange(n, dtype=jnp.int32), train=True
        )
    )(g, x)
    params, bs = variables["params"], variables.get("batch_stats")
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bs, opt_state, rng, g, x):
        perm = jax.random.permutation(rng, n)

        def loss_fn(p):
            vs = {"params": p}
            if bs is not None:
                vs["batch_stats"] = bs
            out, nv = model.apply(
                vs, g, x, perm, train=True,
                mutable=["batch_stats"] if bs is not None else [],
            )
            return out, nv.get("batch_stats") if bs is not None else None

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_bs, opt_state, loss

    best_loss, best, bad = jnp.inf, (params, bs), 0
    for ep in range(epochs):
        k, kk = jax.random.split(k)
        params, bs, opt_state, loss = step(params, bs, opt_state, kk, g, x)
        lv = float(loss)
        if lv < float(best_loss):
            best_loss, best, bad = lv, (params, bs), 0
        else:
            bad += 1
            if bad >= patience:
                break
        if log_every and ep % log_every == 0:
            print(f"egi ep {ep}: loss={lv:.4f}")

    params, bs = best
    vs = {"params": params}
    if bs is not None:
        vs["batch_stats"] = bs
    embs = model.apply(vs, g, x, train=False, method=model.embed)
    return jax.lax.stop_gradient(embs), params
