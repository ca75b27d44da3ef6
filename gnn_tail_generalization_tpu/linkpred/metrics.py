"""Link-prediction evaluators: hits@K, MRR, top-k recall.

Reference parity: ``/root/reference/Link_prediction_model/utils.py:43-91``
(OGB Evaluator semantics re-implemented in jnp) and ``cal_recall``
(``/root/reference/utils.py:568-586``).
"""
from __future__ import annotations

import numpy as np

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


def _group_negs(pos, neg):
    """[n_neg]-flat negatives -> [n_pos, k] per-positive groups. Splits
    evenly when divisible (OGB layout); otherwise truncates to k =
    n_neg // n_pos groups, or — when there are fewer negatives than
    positives — ranks every positive against the SHARED pool (global-
    negatives MRR)."""
    import jax.numpy as jnp

    n_pos = pos.shape[0]
    n_neg = neg.reshape(-1).shape[0]
    flat = neg.reshape(-1)
    k = n_neg // max(n_pos, 1)
    if k >= 1:
        return flat[: n_pos * k].reshape(n_pos, k)
    return jnp.broadcast_to(flat[None, :], (n_pos, n_neg))


def evaluate_mrr(pos_val, neg_val, pos_test, neg_test):
    return {"MRR": (mrr(pos_val, _group_negs(pos_val, neg_val)),
                    mrr(pos_test, _group_negs(pos_test, neg_test)))}


def cal_recall(pos_pred, neg_pred, topk=None) -> float:
    """utils.py:568-586 exactly:
    - topk None or 0: threshold at 0 — fraction of positives scoring > 0
    - topk > 5: absolute top-k count
    - otherwise: relative, k = topk * N_pos
    Positives with score <= 0 are dropped before the sort (force_greater_0)
    but N_pos_total keeps the full count."""
    # host-side eval metric: plain numpy (dynamic shapes are fine here)
    pos = np.asarray(pos_pred).reshape(-1)
    neg = np.asarray(neg_pred).reshape(-1)
    n_pos = pos.shape[0]
    if topk is None or float(topk) == 0:
        return float((pos > 0).sum() / n_pos)
    k = int(topk) if float(topk) > 5 else int(float(topk) * n_pos)
    pos_f = pos[pos > 0]
    scores = np.concatenate([pos_f, neg])
    labels = np.concatenate(
        [np.ones(pos_f.shape[0]), np.zeros(neg.shape[0])]
    )
    order = np.argsort(-scores, kind="stable")
    k = min(max(k, 0), scores.shape[0])
    return float(labels[order[:k]].sum() / n_pos)


def evaluate_recall_my(pos_train, neg_train, pos_val, neg_val,
                       pos_test, neg_test, topk=None):
    return {"recall@100%": (cal_recall(pos_train, neg_train, topk),
                            cal_recall(pos_val, neg_val, topk),
                            cal_recall(pos_test, neg_test, topk))}
