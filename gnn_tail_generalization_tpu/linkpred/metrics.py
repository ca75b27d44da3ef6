"""Link-prediction evaluators: hits@K, MRR, top-k recall.

Reference parity: ``/root/reference/Link_prediction_model/utils.py:43-91``
(OGB Evaluator semantics re-implemented in jnp) and ``cal_recall``
(``/root/reference/utils.py:568-586``).
"""
from __future__ import annotations

import jax.numpy as jnp


def hits_at_k(pos_pred, neg_pred, k: int) -> float:
    """OGB hits@K: fraction of positives scoring above the K-th best
    negative."""
    neg_sorted = jnp.sort(neg_pred)[::-1]
    if neg_sorted.shape[0] < k:
        return 1.0
    thresh = neg_sorted[k - 1]
    return float(jnp.mean((pos_pred > thresh).astype(jnp.float32)))


def evaluate_hits(pos_val, neg_val, pos_test, neg_test,
                  ks=(20, 50, 100)):
    return {
        f"Hits@{k}": (hits_at_k(pos_val, neg_val, k),
                      hits_at_k(pos_test, neg_test, k))
        for k in ks
    }


def mrr(pos_pred, neg_pred) -> float:
    """OGB mrr_list.mean(): per-positive rank among its own negatives,
    rank = mean(optimistic, pessimistic). neg_pred: [B, num_neg]."""
    pos = pos_pred.reshape(-1, 1)
    opt = jnp.sum(neg_pred > pos, axis=1) + 1
    pess = jnp.sum(neg_pred >= pos, axis=1) + 1
    rank = 0.5 * (opt + pess)
    return float(jnp.mean(1.0 / rank))


def evaluate_mrr(pos_val, neg_val, pos_test, neg_test):
    return {"MRR": (mrr(pos_val, neg_val.reshape(pos_val.shape[0], -1)),
                    mrr(pos_test, neg_test.reshape(pos_test.shape[0], -1)))}


def cal_recall(pos_pred, neg_pred, topk=None) -> float:
    """utils.py:568-586: sort all scores desc, recall = positives within the
    top-k / total positives. topk float => fraction of N_pos; topk None or
    0 => threshold 0.5 on sigmoid-like scores is NOT used — reference
    defaults to k = N_pos."""
    n_pos = pos_pred.shape[0]
    if topk is None:
        k = n_pos
    elif isinstance(topk, float):
        k = int(round(topk * n_pos))
    else:
        k = int(topk)
    scores = jnp.concatenate([pos_pred.reshape(-1), neg_pred.reshape(-1)])
    labels = jnp.concatenate(
        [jnp.ones(n_pos), jnp.zeros(neg_pred.reshape(-1).shape[0])]
    )
    order = jnp.argsort(-scores)
    k = min(max(k, 0), scores.shape[0])
    return float(jnp.sum(labels[order[:k]]) / n_pos)


def evaluate_recall_my(pos_train, neg_train, pos_val, neg_val,
                       pos_test, neg_test, topk=None):
    return {"recall@100%": (cal_recall(pos_train, neg_train, topk),
                            cal_recall(pos_val, neg_val, topk),
                            cal_recall(pos_test, neg_test, topk))}
