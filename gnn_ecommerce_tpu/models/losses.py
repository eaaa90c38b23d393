"""Training losses: BPR ranking loss and ego-embedding L2 regularization.

Reference semantics:
- ``BPRLoss.forward`` (``src/lightgcn.py:262-286``):
  ``(-mean(logsigmoid(pos - neg)) + lambda_reg * ||params||^2) / n_pairs``.
- The training driver wires it as ``recommendation_loss(pos, neg, 0) * B``
  (``src/train_lightgcn.py:141``) — lambda 0, then multiplied back by batch
  size, so the NET loss is plain ``-mean(logsigmoid(pos - neg))``. We
  implement the net math directly (``bpr_loss``) and keep the reference's
  convoluted form available for parity checks (``bpr_loss_reference``).
- ``regularization_loss`` (``src/utils_v2.py:193-211``):
  ``decay * 0.5 * (||E0[u]||^2 + ||E0[p]||^2 + ||E0[n]||^2) / batch_size``
  on layer-0 (ego) embeddings; duplicate indices in a batch are counted every
  time they appear, exactly as a gather-then-norm does.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bpr_loss(pos_scores: jax.Array, neg_scores: jax.Array) -> jax.Array:
    """Mean BPR loss, the net training objective of the reference driver."""
    return -jnp.mean(jax.nn.log_sigmoid(pos_scores - neg_scores))


def bpr_loss_reference(
    pos_scores: jax.Array,
    neg_scores: jax.Array,
    embedding: jax.Array,
    lambda_reg: float = 0.0,
) -> jax.Array:
    """Literal reference form ``(-mean logsigmoid + lambda*||E||^2) / n_pairs``
    (``src/lightgcn.py:279-286``) for parity tests."""
    n_pairs = pos_scores.shape[0]
    log_prob = jnp.mean(jax.nn.log_sigmoid(pos_scores - neg_scores))
    reg = lambda_reg * jnp.sum(embedding.astype(jnp.float32) ** 2)
    return (-log_prob + reg) / n_pairs


def reg_loss(
    embedding: jax.Array,
    users: jax.Array,
    pos_items: jax.Array,
    neg_items: jax.Array,
    decay: float,
) -> jax.Array:
    """L2 on the gathered ego embeddings of the batch triplets."""
    batch_size = users.shape[0]
    sq = (
        jnp.sum(embedding[users].astype(jnp.float32) ** 2)
        + jnp.sum(embedding[pos_items].astype(jnp.float32) ** 2)
        + jnp.sum(embedding[neg_items].astype(jnp.float32) ** 2)
    )
    return decay * 0.5 * sq / batch_size


def link_pred_loss(pred_logits: jax.Array, edge_label: jax.Array) -> jax.Array:
    """Binary cross-entropy with logits for the link-prediction head
    (reference ``src/lightgcn.py:191-203`` → ``torch.nn.BCEWithLogitsLoss``)."""
    x, y = pred_logits, edge_label.astype(pred_logits.dtype)
    # Numerically stable BCE-with-logits.
    return jnp.mean(jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x))))
