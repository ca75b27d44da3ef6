"""Batched latent-neighbor discovery (the Cold Brew "replacement" op).

The reference loops over every node in Python, doing a (1 x se_dim) @
(se_dim x N) matvec, argsort, top-K softmax and a tiny matmul per node
(``/root/reference/MLP_model/__init__.py:143-156``) — its #2 hot spot.

TPU-native formulation: ONE [B, se_dim] x [se_dim, N] MXU matmul for all
scores, ``jax.lax.top_k`` for neighbor selection, masked softmax over the K
selected scores, and a batched gather-weighted-sum — the Python loop
collapses into four fused XLA ops.

Semantics preserved exactly: softmax over the top-K *raw* scores, weighted
sum of the corresponding teacher-SE rows, all detached from the gradient
tape (the caller stops gradients).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def latent_neighbor_replace(
    le_guess: jax.Array,  # [B, se_dim] student's guessed embedding
    teacher_se: jax.Array,  # [N, se_dim] teacher embedding table
    top_k: int,
    precision=jax.lax.Precision.HIGHEST,
    row_chunk: int = 8192,
    score_dtype=None,
) -> jax.Array:
    """Virtual-neighborhood embedding per batch row (MLP_model/__init__.py:143-156).

    Returns [B, se_dim]: softmax(top-K of le_guess @ SE^T) @ SE[selected].

    The [B, N] score matrix is never fully materialized: rows are processed
    in ``row_chunk`` blocks under lax.map, so arxiv-scale batches
    (90k x 169k scores = 61 GB dense) stay within a ~169k x 8k working set.

    ``score_dtype=jnp.bfloat16`` runs the [B,N] scoring matmul (the 90+%
    FLOP term: ~17 TFLOP at arxiv scale) with bf16 operands and f32 MXU
    accumulation — ~4x the MXU rate; selection/softmax/weighted-sum stay
    f32. Ranking by f32-accumulated scores is robust to the operand cast;
    defaults to the reference-faithful full-precision path."""
    b = le_guess.shape[0]

    def block(rows):
        if score_dtype is not None:
            scores = jnp.matmul(rows.astype(score_dtype),
                                teacher_se.T.astype(score_dtype),
                                preferred_element_type=jnp.float32)
        else:
            scores = jnp.matmul(rows, teacher_se.T, precision=precision)
        top_scores, top_idx = jax.lax.top_k(scores, top_k)
        attn = jax.nn.softmax(top_scores, axis=-1)
        neigh = teacher_se[top_idx]
        return jnp.einsum("bk,bkd->bd", attn, neigh, precision=precision)

    if b <= row_chunk:
        return block(le_guess)
    pad = (-b) % row_chunk
    padded = jnp.pad(le_guess, ((0, pad), (0, 0)))
    chunks = padded.reshape(-1, row_chunk, le_guess.shape[1])
    out = jax.lax.map(block, chunks)
    return out.reshape(-1, teacher_se.shape[1])[:b]
