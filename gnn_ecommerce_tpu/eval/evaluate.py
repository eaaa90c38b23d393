"""Evaluation driver: blocked top-K recommendation + MARK over eval users.

Replaces the reference's ``recommendK`` + ``MARK_MAPK`` path
(``src/lightgcn.py:169-189``, called per epoch from
``src/train_lightgcn.py:155-162``): instead of materializing the full
user×item score matrix and shipping it to the CPU for pandas set math, users
are processed in tiles on device, items stream through a running top-K
(``ops/topk_score.py``), and recall/precision reduce on device; only the
final per-user vectors (and optionally the top-K lists) reach the host.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.prepare import EvalSplit
from ..ops.topk_score import topk_scores
from .metrics import recall_precision_at_k


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EvalBatch:
    """Padded, device-resident evaluation structures for one split."""

    user_ids: jax.Array   # [Nu] int32
    truth: jax.Array      # [Nu, T] local item ids, -1 padded
    mask: jax.Array       # [Nu, M] train-purchased local item ids, -1 padded
    num_users: int = dataclasses.field(metadata=dict(static=True))


def _pad_csr(indptr: np.ndarray, values: np.ndarray, width: int) -> np.ndarray:
    rows = len(indptr) - 1
    out = np.full((rows, width), -1, dtype=np.int32)
    lens = np.diff(indptr)
    # Row-major fill via flat assignment (vectorized; no python loop per row).
    row_idx = np.repeat(np.arange(rows), lens)
    starts = np.repeat(indptr[:-1], lens)
    col_idx = np.arange(int(lens.sum()), dtype=np.int64) - starts
    out[row_idx, col_idx] = values
    return out


def build_eval_batch(split: EvalSplit) -> EvalBatch:
    t_width = max(1, int(split.truth.lengths().max(initial=0)))
    m_width = max(1, int(split.train_mask.lengths().max(initial=0)))
    return EvalBatch(
        user_ids=jnp.asarray(split.user_ids, jnp.int32),
        truth=jnp.asarray(_pad_csr(split.truth.indptr, split.truth.values, t_width)),
        mask=jnp.asarray(
            _pad_csr(split.train_mask.indptr, split.train_mask.values, m_width)
        ),
        num_users=len(split.user_ids),
    )


@partial(
    jax.jit,
    static_argnames=("n_users", "k", "user_tile", "item_tile", "mask_mode"),
)
def _evaluate_tiles(
    final_emb: jax.Array,
    batch: EvalBatch,
    n_users: int,
    k: int,
    user_tile: int,
    item_tile: int,
    mask_mode: str,
):
    item_emb = final_emb[n_users:]
    nu = batch.user_ids.shape[0]
    n_tiles = -(-nu // user_tile)
    pad = n_tiles * user_tile - nu
    uids = jnp.pad(batch.user_ids, (0, pad)).reshape(n_tiles, user_tile)
    truth = jnp.pad(batch.truth, ((0, pad), (0, 0)), constant_values=-1)
    mask = jnp.pad(batch.mask, ((0, pad), (0, 0)), constant_values=-1)
    truth = truth.reshape(n_tiles, user_tile, -1)
    mask = mask.reshape(n_tiles, user_tile, -1)

    def tile_step(_, inputs):
        tile_uids, tile_truth, tile_mask = inputs
        u_emb = final_emb[tile_uids]
        vals, idx = topk_scores(u_emb, item_emb, tile_mask, k, item_tile, mask_mode)
        recall, precision = recall_precision_at_k(idx, tile_truth, k)
        return None, (idx, recall, precision)

    _, (topk_idx, recall, precision) = jax.lax.scan(
        tile_step, None, (uids, truth, mask)
    )
    flat = lambda x: x.reshape(-1, *x.shape[2:])[:nu]
    return flat(topk_idx), flat(recall), flat(precision)


def evaluate(
    final_emb: jax.Array,
    batch: EvalBatch,
    n_users: int,
    k: int = 20,
    user_tile: int = 1024,
    item_tile: int = 8192,
    mask_mode: str = "neginf",
):
    """Compute MARK over an eval split from the propagated final embeddings.

    Returns (precision, recall, per_user_recall, per_user_precision,
    topk_idx) — the scalar means mirror the reference's
    ``MARK_MAPK`` return (``src/lightgcn.py:189``).
    """
    user_tile = min(user_tile, max(1, batch.num_users))
    topk_idx, recall, precision = _evaluate_tiles(
        final_emb, batch, n_users, k, user_tile, item_tile, mask_mode
    )
    return (
        float(jnp.mean(precision)),
        float(jnp.mean(recall)),
        np.asarray(recall),
        np.asarray(precision),
        np.asarray(topk_idx),
    )


def recommend_users(
    final_emb: jax.Array,
    user_ids: jax.Array,
    mask_idx: jax.Array,
    n_users: int,
    k: int = 20,
    item_tile: int = 8192,
    mask_mode: str = "neginf",
) -> np.ndarray:
    """Top-K local item ids for arbitrary users (serving path; reference
    ``recommendK`` without the pandas wrapper)."""
    _, idx = topk_scores(
        final_emb[user_ids], final_emb[n_users:], mask_idx, k, item_tile, mask_mode
    )
    return np.asarray(idx)
