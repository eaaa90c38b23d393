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

from ..data.prepare import CsrList, EvalSplit
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


def build_eval_buckets(split: EvalSplit, width_floor: int = 64) -> list[EvalBatch]:
    """Split one eval split into mask-width power-of-2 buckets.

    A single padded batch pads EVERY user's train-purchase mask to the global
    max — with a power-law degree tail (max-degree user ≈ 20K events,
    reference eda cell 25) that is a [Nu, max_deg] int32 tensor measured in
    GB at cosmetics scale. Bucketing users by pow2(mask length) bounds the
    padding to <2x total entries and gives a handful of compiled shapes
    (TPU rule here: every loop hits one compiled shape per pow2 bucket).
    """
    ml = split.train_mask.lengths()
    if len(ml) == 0:
        return [build_eval_batch(split)]
    width = np.maximum(ml, 1)
    bucket_w = np.power(2, np.ceil(np.log2(np.maximum(width, width_floor)))).astype(
        np.int64
    )
    batches = []
    for w in np.unique(bucket_w):
        sel = np.flatnonzero(bucket_w == w)
        sub = EvalSplit(
            user_ids=split.user_ids[sel],
            truth=CsrList(*_csr_take(split.truth, sel)),
            train_mask=CsrList(*_csr_take(split.train_mask, sel)),
        )
        # Truth width rounded to pow2 as well: remote TPU compiles cost
        # minutes each here, so every padded dim must come from a small
        # closed set of shapes.
        t_width = 1 << int(
            max(1, int(sub.truth.lengths().max(initial=0))) - 1
        ).bit_length()
        # Row count padded to pow2 (>= 64): buckets across splits/epochs then
        # share compiled shapes (remote compiles cost minutes here); the
        # static num_users keeps the means exact.
        n_real = len(sub.user_ids)
        n_rows = 1 << int(max(n_real, 64) - 1).bit_length()
        uids = np.zeros(n_rows, np.int64)
        uids[:n_real] = sub.user_ids
        truth_pad = np.full((n_rows, t_width), -1, np.int32)
        truth_pad[:n_real] = _pad_csr(sub.truth.indptr, sub.truth.values, t_width)
        mask_pad = np.full((n_rows, int(w)), -1, np.int32)
        mask_pad[:n_real] = _pad_csr(
            sub.train_mask.indptr, sub.train_mask.values, int(w)
        )
        batches.append(
            EvalBatch(
                user_ids=jnp.asarray(uids, jnp.int32),
                truth=jnp.asarray(truth_pad),
                mask=jnp.asarray(mask_pad),
                num_users=n_real,
            )
        )
    return batches


def _csr_take(csr, rows: np.ndarray):
    """Select CSR rows (returns new indptr, values)."""
    lens = np.diff(csr.indptr)[rows]
    starts = csr.indptr[rows]
    take = np.repeat(starts, lens) + (
        np.arange(int(lens.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(np.append(0, lens[:-1])), lens)
    )
    return np.append(0, np.cumsum(lens)), csr.values[take]


def evaluate_bucketed(
    final_emb: jax.Array,
    buckets: list[EvalBatch],
    n_users: int,
    k: int = 20,
    user_tile: int = 1024,
    item_tile: int = 8192,
    mask_mode: str = "neginf",
    topk_impl: str = "exact",
) -> tuple[float, float]:
    """Mean (precision, recall) over a bucketed split (user-weighted, so the
    result equals the single-batch :func:`evaluate` means exactly)."""
    tot_p = tot_r = 0.0
    tot_n = 0
    for batch in buckets:
        p, r, _, _, _ = evaluate(
            final_emb, batch, n_users, k, user_tile, item_tile, mask_mode,
            topk_impl,
        )
        tot_p += p * batch.num_users
        tot_r += r * batch.num_users
        tot_n += batch.num_users
    return tot_p / max(tot_n, 1), tot_r / max(tot_n, 1)


@partial(
    jax.jit,
    static_argnames=(
        "n_users", "k", "user_tile", "item_tile", "mask_mode", "topk_impl",
    ),
)
def _evaluate_tiles(
    final_emb: jax.Array,
    batch: EvalBatch,
    n_users: int,
    k: int,
    user_tile: int,
    item_tile: int,
    mask_mode: str,
    topk_impl: str = "exact",
):
    item_emb = final_emb[n_users:]
    # Rows may carry pow2 padding (build_eval_buckets) so many buckets share
    # ONE compiled shape; the STATIC num_users field slices the real users
    # back out below — padded rows never reach the means.
    nu_rows = batch.user_ids.shape[0]
    nu = min(batch.num_users, nu_rows)
    n_tiles = -(-nu_rows // user_tile)
    pad = n_tiles * user_tile - nu_rows
    uids = jnp.pad(batch.user_ids, (0, pad)).reshape(n_tiles, user_tile)
    truth = jnp.pad(batch.truth, ((0, pad), (0, 0)), constant_values=-1)
    mask = jnp.pad(batch.mask, ((0, pad), (0, 0)), constant_values=-1)
    truth = truth.reshape(n_tiles, user_tile, -1)
    mask = mask.reshape(n_tiles, user_tile, -1)

    def tile_step(_, inputs):
        tile_uids, tile_truth, tile_mask = inputs
        u_emb = final_emb[tile_uids]
        vals, idx = topk_scores(
            u_emb, item_emb, tile_mask, k, item_tile, mask_mode, topk_impl
        )
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
    topk_impl: str = "exact",
):
    """Compute MARK over an eval split from the propagated final embeddings.

    Returns (precision, recall, per_user_recall, per_user_precision,
    topk_idx) — the scalar means mirror the reference's
    ``MARK_MAPK`` return (``src/lightgcn.py:189``).
    """
    user_tile = min(user_tile, max(1, int(batch.user_ids.shape[0])))
    topk_idx, recall, precision = _evaluate_tiles(
        final_emb, batch, n_users, k, user_tile, item_tile, mask_mode,
        topk_impl,
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
