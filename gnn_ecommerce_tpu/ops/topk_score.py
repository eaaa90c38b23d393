"""Blocked user×item top-K scorer with purchased-item masking.

The reference materializes the FULL score matrix ``src[user_list] @ dst.T``
on device, downloads it to CPU, multiplies by ``(1 - interactions)`` and runs
``topk`` (``src/lightgcn.py:169-182``) — at full scale that is a 1.6M × 54K
float matrix per eval shipped over the wire. This TPU-first design scores one
USER TILE against all items at a time (a [B, I] tile — ~224 MB at cosmetics
scale for B=1024, never the 358 GB full matrix), masks with ONE scatter per
user tile (mask entries are unique per row), and selects top-k on device;
only [B, k] indices reach the host.

Design note: an earlier variant streamed item tiles with a running top-k and
per-item-tile mask scatters; the per-tile scatters repeated every mask entry
once per item tile and dominated eval wall-clock, and a searchsorted-based
membership rewrite compiled pathologically through the TPU toolchain. One
full-width matmul + one scatter per user tile is both the fastest and the
simplest formulation measured.

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

# A numpy scalar, NOT jnp: a module-level jnp constant would initialize the
# XLA backend at import time, which breaks any process that must call
# jax.distributed.initialize() first (the multi-host bootstrap).
_NEG = np.float32(-3.0e38)


def _mask_scores(scores, mask_idx, mask_mode: str):
    """Apply the per-user exclusion list (one scatter; -1 entries are no-ops)."""
    n_items = scores.shape[1]
    rows = jnp.arange(scores.shape[0])[:, None]
    valid = mask_idx >= 0
    cols = jnp.clip(mask_idx, 0, n_items - 1)
    if mask_mode == "neginf":
        return scores.at[rows, cols].add(
            jnp.where(valid, _NEG, 0.0), unique_indices=True
        )
    if mask_mode == "multiply":
        return scores.at[rows, cols].multiply(
            jnp.where(valid, 0.0, 1.0), unique_indices=True
        )
    raise ValueError(f"unknown mask_mode {mask_mode!r}")


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
    partial-reduction top-k, recall_target 0.99) — a serving-latency option;
    evaluation parity paths keep "exact" (tile-max-pruned, still exact);
    ``topk_impl="tiled"`` keeps the per-tile-sort variant for comparison.
    """
    scores = jnp.dot(
        user_emb.astype(jnp.float32),
        item_emb.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    scores = _mask_scores(scores, mask_idx, mask_mode)
    if topk_impl == "approx":
        vals, idx = jax.lax.approx_max_k(scores, k, recall_target=0.99)
        return vals, idx.astype(jnp.int32)
    if topk_impl == "tiled":
        return _tiled_top_k(scores, k, item_tile)
    return _hier_top_k(scores, k)


def _tiled_top_k(scores: jax.Array, k: int, tile: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k via per-tile top-k + candidate merge.

    ``lax.top_k`` over the full 54K-item row costs ~0.8s per 1024-user tile
    on v5e (sort-dominated); selecting k per 8K tile and merging the n_tiles·k
    candidates is exact (a global top-k element is a top-k element of its
    tile) and ~an order of magnitude cheaper.
    """
    bsz, n = scores.shape
    n_tiles = -(-n // tile)
    if n_tiles <= 1:
        return jax.lax.top_k(scores, k)
    pad = n_tiles * tile - n
    s = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=_NEG)
    tv, ti = jax.lax.top_k(s.reshape(bsz, n_tiles, tile), k)
    cand_v = tv.reshape(bsz, n_tiles * k)
    cand_i = (ti + (jnp.arange(n_tiles) * tile)[None, :, None]).reshape(
        bsz, n_tiles * k
    )
    vals, sel = jax.lax.top_k(cand_v, k)
    return vals, jnp.take_along_axis(cand_i, sel, axis=1).astype(jnp.int32)


def _hier_top_k(
    scores: jax.Array, k: int, tile: int = 128
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k via tile-max pruning — sorts ~k·tile elements per row.

    Every true top-k element lives in one of the k tiles with the largest
    per-tile MAX: if element x sat in a tile outside that set, each of the k
    selected tiles would hold an element (its max) ≥ tile-max(x) ≥ x — k
    elements beating x, so x is not top-k (tie-consistent with any top-k).
    So: one cheap max-reduction pass over the row, a k-of-T tile select, a
    gather of k·tile candidates, and one small sort — instead of sorting
    every tile of the row. ~20x less sort work than per-tile top-k at
    k=20, tile=128, n=54.6K.
    """
    bsz, n = scores.shape
    n_tiles = -(-n // tile)
    if n_tiles <= k or n <= 2 * k * tile:
        return jax.lax.top_k(scores, k)
    pad = n_tiles * tile - n
    s3 = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=_NEG).reshape(
        bsz, n_tiles, tile
    )
    tmax = jnp.max(s3, axis=-1)                       # [B, T]
    _, top_tiles = jax.lax.top_k(tmax, k)             # [B, k]
    cand = jnp.take_along_axis(s3, top_tiles[:, :, None], axis=1)  # [B, k, tile]
    vals, sel = jax.lax.top_k(cand.reshape(bsz, k * tile), k)
    idx = (
        jnp.take_along_axis(top_tiles, sel // tile, axis=1) * tile + sel % tile
    )
    return vals, idx.astype(jnp.int32)
