"""Link-prediction losses (/root/reference/Link_prediction_model/loss.py:4-30)."""
from __future__ import annotations

import jax.numpy as jnp
from jax.nn import sigmoid


def auc_loss(pos_out, neg_out, num_neg):
    pos = pos_out.reshape(-1, 1)
    neg = neg_out.reshape(-1, num_neg)
    return jnp.sum(jnp.square(1 - (pos - neg)))


def adaptive_auc_loss(pos_out, neg_out, num_neg, weight):
    w = weight.reshape(-1, 1)
    pos = pos_out.reshape(-1, 1)
    neg = neg_out.reshape(-1, num_neg)
    return jnp.sum(w * jnp.square(1 - (pos - neg)))


def log_rank_loss(pos_out, neg_out, num_neg):
    pos = pos_out.reshape(-1, 1)
    neg = neg_out.reshape(-1, num_neg)
    return -jnp.mean(jnp.log(sigmoid(pos - neg) + 1e-15))


def ce_loss(pos_out, neg_out):
    pos_loss = -jnp.mean(jnp.log(sigmoid(pos_out) + 1e-15))
    neg_loss = -jnp.mean(jnp.log(1 - sigmoid(neg_out) + 1e-15))
    return pos_loss + neg_loss


def info_nce_loss(pos_out, neg_out, num_neg):
    pos = pos_out.reshape(-1, 1)
    neg = neg_out.reshape(-1, num_neg)
    pos_exp = jnp.exp(pos)
    neg_exp = jnp.sum(jnp.exp(neg), axis=1, keepdims=True)
    return -jnp.mean(jnp.log(pos_exp / (pos_exp + neg_exp) + 1e-15))


LOSSES = {
    "AUC": auc_loss,
    "ce_loss": ce_loss,
    "log_rank_loss": log_rank_loss,
    "info_nce_loss": info_nce_loss,
}
