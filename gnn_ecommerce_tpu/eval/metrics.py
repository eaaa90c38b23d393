"""MARK / MAPK metrics: mean Recall@K and Precision@K.

Reference ``MARK_MAPK`` (``src/lightgcn.py:184-189``): per eval user,
overlap = |top-K ∩ truth|; recall = overlap / |truth|; precision = overlap / K;
means over eval users. The reference computes this with pandas set
intersections per row; here the overlap count is a vectorized membership test
on device, with an optional pandas frame (``mark_frame``) reproducing the
reference's per-user metrics output columns for parity/persistence.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


def recall_precision_at_k(
    topk_idx: jax.Array,   # [N, K] recommended local item ids
    truth: jax.Array,      # [N, T] ground-truth local item ids, -1 padded
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-user (recall, precision) arrays.

    A recommended id counts as a hit if it appears anywhere in the user's
    truth list. Truth ids are unique per user (they come from a grouped edge
    list), so the hit count equals the set-intersection size.
    """
    hits = (topk_idx[:, :, None] == truth[:, None, :]).any(axis=2).sum(axis=1)
    truth_len = jnp.maximum((truth >= 0).sum(axis=1), 1)
    recall = hits / truth_len
    precision = hits / k
    return recall, precision


def mark_frame(
    user_ids: np.ndarray,
    truth_lists: list,
    topk_idx: np.ndarray,
    recall: np.ndarray,
    precision: np.ndarray,
) -> pd.DataFrame:
    """Per-user metrics frame with the reference's columns
    (``src/lightgcn.py:185-189``: user_id_idx, item_id_idx_list,
    top_rlvnt_itm, overlap_item, recall, precision)."""
    top_lists = [list(map(int, row)) for row in topk_idx]
    overlap = [sorted(set(t) & set(g)) for t, g in zip(top_lists, truth_lists)]
    return pd.DataFrame(
        {
            "user_id_idx": user_ids,
            "item_id_idx_list": [list(map(int, t)) for t in truth_lists],
            "top_rlvnt_itm": top_lists,
            "overlap_item": overlap,
            "recall": recall,
            "precision": precision,
        }
    )
