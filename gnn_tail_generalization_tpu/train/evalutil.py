"""Accuracy evaluators incl. the head/tail/isolation breakdown.

Reference parity: ``/root/reference/trainer_node_classification.py:672-693``
(evaluate, cal_acc_rounded100) and ``226-235`` (eval_headtail__traintest_v2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_accuracy(logits, y, mask=None):
    """argmax accuracy, optionally over a boolean mask (evaluate)."""
    pred = jnp.argmax(logits, axis=1)
    correct = (pred == y).astype(jnp.float32)
    if mask is None:
        return jnp.mean(correct)
    m = mask.astype(jnp.float32)
    return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)


def subset_traintest_accuracy(logits_full, y, subset_mask, train_mask):
    """(acc over subset∩train, acc over subset∩~train) — the v2 evaluator
    applied to full-graph logits (trainer_node_classification.py:226-235)."""
    acc_tr = masked_accuracy(logits_full, y, subset_mask & train_mask)
    acc_te = masked_accuracy(logits_full, y, subset_mask & ~train_mask)
    return acc_tr, acc_te


def headtail_accuracies(logits_full, y, train_mask, large_mask, small_mask,
                        zero_mask=None):
    """dict of head/tail(/iso) test accuracies (x100 like
    cal_acc_rounded100)."""
    _, head = subset_traintest_accuracy(logits_full, y, large_mask, train_mask)
    _, tail = subset_traintest_accuracy(logits_full, y, small_mask, train_mask)
    out = {"head": head * 100.0, "tail": tail * 100.0}
    if zero_mask is not None:
        _, iso = subset_traintest_accuracy(logits_full, y, zero_mask, train_mask)
        out["iso"] = iso * 100.0
    return out
