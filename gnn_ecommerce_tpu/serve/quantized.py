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
    mask_idx: jax.Array,   # [B, M] local item ids to exclude, -1 padded
    k: int,
    item_tile: int = 8192,  # kept for API compatibility; unused
) -> tuple[jax.Array, jax.Array]:
    """Top-k over int8 embeddings (neginf masking, one scatter per call)."""
    del item_tile
    from ..ops.topk_score import _mask_scores

    acc = jax.lax.dot_general(
        user_q,
        item_q.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc.astype(jnp.float32) * user_s[:, None] * item_s[None, :]
    scores = _mask_scores(scores, mask_idx, "neginf")
    return jax.lax.top_k(scores, k)


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
