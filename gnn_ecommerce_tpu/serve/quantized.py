"""Int8-quantized embedding cache for serving.

TPU-native serving optimization with no reference counterpart (the reference
serves f32 through TorchServe): the cached final embeddings are quantized
once per refresh to int8 with per-row scales (symmetric absmax), and request
scoring runs int8×int8 matmuls on the MXU with f32 rescale — 4× less HBM
traffic and higher MXU throughput than f32 at a small, measured ranking
error (top-K overlap typically >95% on trained embeddings; tests assert the
bound on synthetic data).

Score math: r̂[u, i] = (s_u·q_u)·(s_i·q_i) = s_u·s_i·(q_u·q_i) where
q = round(clip(x / s, -127, 127)), s = absmax(x)/127 per row.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_NEG = jnp.float32(-3.0e38)


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric absmax int8 quantization -> (q [N, D] i8, s [N] f32)."""
    absmax = jnp.max(jnp.abs(x), axis=1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


@partial(jax.jit, static_argnames=("k", "item_tile"))
def topk_scores_int8(
    user_q: jax.Array,     # [B, D] int8
    user_s: jax.Array,     # [B] f32
    item_q: jax.Array,     # [I, D] int8
    item_s: jax.Array,     # [I] f32
    mask_idx: jax.Array,   # [B, M] ascending local item ids, -1 padded
    k: int,
    item_tile: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Blocked top-k over int8 embeddings (neginf masking)."""
    n_items, dim = item_q.shape
    bsz = user_q.shape[0]
    n_tiles = -(-n_items // item_tile)
    pad = n_tiles * item_tile - n_items
    items_p = jnp.pad(item_q, ((0, pad), (0, 0))).reshape(n_tiles, item_tile, dim)
    scales_p = jnp.pad(item_s, (0, pad)).reshape(n_tiles, item_tile)
    big = jnp.int32(np.iinfo(np.int32).max)
    msorted = jnp.sort(
        jnp.where(mask_idx < 0, big, mask_idx.astype(jnp.int32)), axis=1
    )  # rows ascending regardless of where -1 padding sits

    def tile_step(carry, inputs):
        best_v, best_i = carry
        tile_idx, tile_items, tile_scales = inputs
        lo = tile_idx * item_tile
        acc = jax.lax.dot_general(
            user_q,
            tile_items.T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = acc.astype(jnp.float32) * user_s[:, None] * tile_scales[None, :]
        col = lo + jnp.arange(item_tile)[None, :]
        scores = jnp.where(col < n_items, scores, _NEG)
        tile_ids = (lo + jnp.arange(item_tile)).astype(jnp.int32)
        pos = jax.vmap(lambda row: jnp.searchsorted(row, tile_ids))(msorted)
        hit = (
            jnp.take_along_axis(
                msorted, jnp.clip(pos, 0, msorted.shape[1] - 1), axis=1
            )
            == tile_ids[None, :]
        )
        scores = jnp.where(hit, _NEG, scores)
        tv, ti = jax.lax.top_k(scores, k)
        merged_v = jnp.concatenate([best_v, tv], axis=1)
        merged_i = jnp.concatenate([best_i, lo + ti], axis=1)
        best_v, sel = jax.lax.top_k(merged_v, k)
        best_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return (best_v, best_i), None

    init = (jnp.full((bsz, k), _NEG), jnp.zeros((bsz, k), jnp.int32))
    (vals, idx), _ = jax.lax.scan(
        tile_step, init, (jnp.arange(n_tiles), items_p, scales_p)
    )
    return vals, idx


class QuantizedCache:
    """Quantized view of the final embeddings for the request path."""

    def __init__(self, final_emb: jax.Array, n_users: int):
        self.n_users = n_users
        self.user_q, self.user_s = quantize_rows(final_emb[:n_users])
        self.item_q, self.item_s = quantize_rows(final_emb[n_users:])

    def recommend(self, user_ids, mask_idx, k: int = 20) -> np.ndarray:
        ids = jnp.asarray(user_ids, jnp.int32)
        _, idx = topk_scores_int8(
            self.user_q[ids],
            self.user_s[ids],
            self.item_q,
            self.item_s,
            jnp.asarray(mask_idx),
            k,
        )
        return np.asarray(idx)
