"""Blocked user×item top-K scorer with purchased-item masking.

The reference materializes the FULL score matrix ``src[user_list] @ dst.T``
on device, downloads it to CPU, multiplies by ``(1 - interactions)`` and runs
``topk`` (``src/lightgcn.py:169-182``) — at full scale that is a 1.6M × 54K
float matrix per eval. This TPU-first design streams item tiles through the
MXU and keeps a running top-K, never materializing more than
``[user_tile, item_tile]`` scores; masking is applied per tile.

Masking modes:
- ``"neginf"`` (default): masked entries get -inf-like scores so they can
  never outrank true candidates. This deliberately FIXES the reference's
  mask-by-multiply quirk where a zeroed purchased item can outrank items with
  negative scores (SURVEY.md §7.4).
- ``"multiply"``: exact reference parity (``pred * (1 - interactions)``,
  ``src/lightgcn.py:175``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_NEG = jnp.float32(-3.0e38)


@partial(jax.jit, static_argnames=("k", "item_tile", "mask_mode", "topk_impl"))
def topk_scores(
    user_emb: jax.Array,   # [B, D] final embeddings of the user tile
    item_emb: jax.Array,   # [I, D] final embeddings of ALL items (local space)
    mask_idx: jax.Array,   # [B, M] local item ids to exclude per user, -1 padded
    k: int,
    item_tile: int = 8192,
    mask_mode: str = "neginf",
    topk_impl: str = "exact",
) -> tuple[jax.Array, jax.Array]:
    """Return (top-k scores [B, k], top-k local item ids [B, k]).

    ``topk_impl="approx"`` uses ``jax.lax.approx_max_k`` (the TPU-native
    partial-reduction top-k, recall_target 0.99) for the per-tile selection —
    a serving-latency option; evaluation parity paths keep "exact".
    """
    n_items, dim = item_emb.shape
    bsz = user_emb.shape[0]
    n_tiles = -(-n_items // item_tile)
    pad = n_tiles * item_tile - n_items
    items_p = jnp.pad(item_emb, ((0, pad), (0, 0))).reshape(n_tiles, item_tile, dim)
    rows = jnp.arange(bsz)[:, None]
    u32 = user_emb.astype(jnp.float32)

    # Exclusion masking is a vectorized binary search, NOT a scatter: mask
    # rows are ascending with trailing -1 padding, so mapping -1 -> INT32_MAX
    # keeps them sorted; per item tile each user row answers membership for
    # the tile's (shared) item ids in O(T log M) VPU compares. The previous
    # scatter formulation (`scores.at[rows, local].add`) serialized B x M
    # updates per tile and dominated full-eval wall clock.
    big = jnp.int32(np.iinfo(np.int32).max)
    msorted = jnp.sort(
        jnp.where(mask_idx < 0, big, mask_idx.astype(jnp.int32)), axis=1
    )  # rows ascending regardless of where -1 padding sits

    def tile_step(carry, inputs):
        best_v, best_i = carry
        tile_idx, tile_items = inputs
        lo = tile_idx * item_tile
        scores = jnp.dot(u32, tile_items.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32)
        # Invalidate padding columns.
        col = lo + jnp.arange(item_tile)[None, :]
        scores = jnp.where(col < n_items, scores, _NEG)
        # Membership of the tile's item ids in each user's exclusion row.
        tile_ids = (lo + jnp.arange(item_tile)).astype(jnp.int32)
        pos = jax.vmap(lambda row: jnp.searchsorted(row, tile_ids))(msorted)
        hit = (
            jnp.take_along_axis(
                msorted, jnp.clip(pos, 0, msorted.shape[1] - 1), axis=1
            )
            == tile_ids[None, :]
        )
        if mask_mode == "neginf":
            scores = jnp.where(hit, _NEG, scores)
        elif mask_mode == "multiply":
            scores = jnp.where(hit, 0.0, scores)
        else:
            raise ValueError(f"unknown mask_mode {mask_mode!r}")
        if topk_impl == "approx":
            tv, ti = jax.lax.approx_max_k(scores, k, recall_target=0.99)
            ti = ti.astype(jnp.int32)
        else:
            tv, ti = jax.lax.top_k(scores, k)
        merged_v = jnp.concatenate([best_v, tv], axis=1)
        merged_i = jnp.concatenate([best_i, lo + ti], axis=1)
        best_v, sel = jax.lax.top_k(merged_v, k)
        best_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return (best_v, best_i), None

    init = (jnp.full((bsz, k), _NEG), jnp.zeros((bsz, k), jnp.int32))
    (vals, idx), _ = jax.lax.scan(tile_step, init, (jnp.arange(n_tiles), items_p))
    return vals, idx
