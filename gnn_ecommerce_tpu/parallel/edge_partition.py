"""Explicit edge-partitioned propagation: shard_map + all_to_all boundary
exchange — the graph analog of sequence/context parallelism (SURVEY.md §2.3).

Layout
------
The unified node space is padded to ``S · R`` rows (S shards, R rows each);
shard ``s`` owns embedding rows ``[sR, (s+1)R)``. Every arc is assigned to
the shard owning its DESTINATION — arcs are already sorted by destination
(graph CSR invariant), so shard arc sets are contiguous slices of the global
arc arrays and each shard's partial segment-sum is complete (no cross-shard
reduction of outputs is ever needed).

What must move is SOURCE embeddings for cut arcs. At build time we compute,
per (owner, consumer) shard pair, the sorted unique source rows the consumer
needs; per layer each shard gathers those rows of its freshly-computed x into
a ``[S, max_send, D]`` buffer and one ``all_to_all`` delivers every shard its
boundary rows.

Overlap (SURVEY.md §7.3 hard part 5): each shard's arcs are SPLIT at build
time into local-source and remote-source lists (both destination-sorted).
Per layer the local partial segment-sum has NO data dependency on the
all_to_all, so XLA's async collectives run the boundary exchange over ICI
concurrently with the local SpMM; only the (smaller) remote partial sum
waits on the receive. Compare GSPMD's fallback for the same program:
all-gathering the full ``[N, D]`` table per layer, serialized.

Cost per layer per shard: D·Σ_p |need(s,p)| exchanged over ICI (bounded by
the edge cut of the contiguous partition), hidden behind the local-arc
aggregation whenever local work ≥ exchange time.

Differentiation: everything here is composed of gather / segment-sum /
all_to_all, all linear with well-defined transposes, so ``jax.grad`` through
the shard_map yields the exact backward exchange (all_to_all transposes to
the reverse all_to_all) with no custom VJP.

No reference counterpart — the reference is single-device
(``src/train_lightgcn.py:13``).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..graph.build import BipartiteGraph
from ..models.lightgcn import LightGCNConfig
from ..models.losses import bpr_loss, reg_loss
from ..sampling.bpr import BprSamplerData, sample_batch


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgePartition:
    """Per-shard arc data + boundary-exchange tables (leading dim = shards).

    Arcs are split by source ownership so the local partial sum can overlap
    the boundary all_to_all (module docstring)."""

    src_loc: jax.Array     # [S, Al] i32: local source row (within shard)
    dst_loc: jax.Array     # [S, Al] i32: destination - shard offset (sorted)
    w_loc: jax.Array       # [S, Al] f32: 0 on padding arcs
    src_rem: jax.Array     # [S, Ar] i32: slot into the flattened recv buffer
    dst_rem: jax.Array     # [S, Ar] i32: destination - shard offset (sorted)
    w_rem: jax.Array       # [S, Ar] f32: 0 on padding arcs
    send_idx: jax.Array    # [S, S, Ms] i32: local rows shard s sends to peer p
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    max_send: int = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))  # unpadded

    @property
    def padded_nodes(self) -> int:
        return self.rows_per_shard * self.n_shards


def build_edge_partition(graph: BipartiteGraph, n_shards: int) -> EdgePartition:
    """Host-side partition construction (numpy; one-time per static graph)."""
    src = np.asarray(graph.src, dtype=np.int64)
    dst = np.asarray(graph.dst, dtype=np.int64)
    w = np.asarray(graph.w_norm, dtype=np.float32)
    n = graph.num_nodes
    S = n_shards
    R = -(-n // S)

    bounds = np.searchsorted(dst, np.arange(S + 1) * R)
    shard_arcs = [slice(int(bounds[s]), int(bounds[s + 1])) for s in range(S)]

    # need[consumer][owner] = sorted unique global source rows.
    need = [[np.empty(0, np.int64)] * S for _ in range(S)]
    for s in range(S):
        s_src = src[shard_arcs[s]]
        owner = s_src // R
        for p in np.unique(owner):
            p = int(p)
            if p != s:
                need[s][p] = np.unique(s_src[owner == p])
    max_send = max((len(need[c][o]) for c in range(S) for o in range(S)), default=1) or 1

    # Arcs split by source ownership; per-kind padded widths.
    loc_masks, rem_masks = [], []
    for s in range(S):
        owner = src[shard_arcs[s]] // R
        loc_masks.append(owner == s)
        rem_masks.append(owner != s)
    Al = max((int(m.sum()) for m in loc_masks), default=1) or 1
    Ar = max((int(m.sum()) for m in rem_masks), default=1) or 1

    src_loc = np.zeros((S, Al), np.int32)
    dst_loc = np.full((S, Al), R - 1, np.int32)
    w_loc = np.zeros((S, Al), np.float32)
    src_rem = np.zeros((S, Ar), np.int32)
    dst_rem = np.full((S, Ar), R - 1, np.int32)
    w_rem = np.zeros((S, Ar), np.float32)
    send_idx = np.zeros((S, S, max_send), np.int32)

    for s in range(S):
        sl = shard_arcs[s]
        s_src, s_dst, s_w = src[sl], dst[sl], w[sl]
        owner = s_src // R
        lm, rm = loc_masks[s], rem_masks[s]
        kl, kr = int(lm.sum()), int(rm.sum())
        src_loc[s, :kl] = (s_src[lm] - s * R).astype(np.int32)
        dst_loc[s, :kl] = (s_dst[lm] - s * R).astype(np.int32)
        w_loc[s, :kl] = s_w[lm]
        # Remote arcs: slot into the flattened [S * max_send] recv buffer.
        r_src, r_owner = s_src[rm], owner[rm]
        slot = np.empty(kr, np.int64)
        for p in range(S):
            if p == s:
                continue
            m = r_owner == p
            if m.any():
                pos = np.searchsorted(need[s][p], r_src[m])
                slot[m] = p * max_send + pos
            # Rows shard s must SEND to consumer p = need[p][s] (owned by s).
            rows = need[p][s]
            send_idx[s, p, : len(rows)] = (rows - s * R).astype(np.int32)
        src_rem[s, :kr] = slot.astype(np.int32)
        dst_rem[s, :kr] = (s_dst[rm] - s * R).astype(np.int32)
        w_rem[s, :kr] = s_w[rm]

    return EdgePartition(
        src_loc=jnp.asarray(src_loc),
        dst_loc=jnp.asarray(dst_loc),
        w_loc=jnp.asarray(w_loc),
        src_rem=jnp.asarray(src_rem),
        dst_rem=jnp.asarray(dst_rem),
        w_rem=jnp.asarray(w_rem),
        send_idx=jnp.asarray(send_idx),
        rows_per_shard=R,
        n_shards=S,
        max_send=max_send,
        num_nodes=n,
    )


def _exchange_spmm(x, part_local, R, axis="model"):
    """One propagation layer on one shard. The boundary all_to_all and the
    local-source partial segment-sum have no data dependency, so XLA's async
    collectives overlap the ICI exchange with the local SpMM; only the remote
    partial sum waits on the receive. x: [R, D] local rows."""
    src_loc, dst_loc, w_loc, src_rem, dst_rem, w_rem, send_idx = part_local
    send = x[send_idx]                                   # [S, Ms, D]
    recv = jax.lax.all_to_all(send, axis, 0, 0)          # [S, Ms, D]
    out = jax.ops.segment_sum(
        x[src_loc] * w_loc[:, None], dst_loc, num_segments=R,
        indices_are_sorted=True,
    )
    rem = recv.reshape(-1, x.shape[1])
    return out + jax.ops.segment_sum(
        rem[src_rem] * w_rem[:, None], dst_rem, num_segments=R,
        indices_are_sorted=True,
    )


def _embed_local(emb_local, part_local, alpha, num_layers, R):
    x = emb_local.astype(jnp.float32)
    out = alpha[0] * x
    for l in range(num_layers):
        x = _exchange_spmm(x, part_local, R)
        out = out + alpha[l + 1] * x
    return out


def _lookup(out_local, ids, R, axis="model"):
    """Gather rows of the shard-distributed [R, D] output by global ids:
    mask-and-psum (each id is owned by exactly one shard)."""
    base = jax.lax.axis_index(axis) * R
    local = ids - base
    ok = (local >= 0) & (local < R)
    vals = jnp.where(ok[:, None], out_local[jnp.clip(local, 0, R - 1)], 0.0)
    return jax.lax.psum(vals, axis)


def pad_params(params: dict, part: EdgePartition, mesh: Mesh) -> dict:
    """Zero-pad the embedding table to S·R rows and shard it over 'model'."""
    emb = params["embedding"]
    pad = part.padded_nodes - emb.shape[0]
    emb = jnp.pad(emb, ((0, pad), (0, 0)))
    s = NamedSharding(mesh, P("model", None))
    return {"embedding": jax.device_put(emb, s)}


def make_explicit_fns(
    cfg: LightGCNConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    part: EdgePartition,
    batch_size: int,
    decay: float,
):
    """Build (embed, train_step) over an explicit edge partition.

    embed(params, part) -> [S·R, D] final embedding, sharded P('model', None)
    train_step(params, opt_state, part, sdata, key)
        -> (params, opt_state, metrics); params carry the padded table.
    """
    R = part.rows_per_shard
    alpha = jnp.full((cfg.num_layers + 1,), 1.0 / (cfg.num_layers + 1), jnp.float32)
    part_spec = EdgePartition(
        src_loc=P("model", None),
        dst_loc=P("model", None),
        w_loc=P("model", None),
        src_rem=P("model", None),
        dst_rem=P("model", None),
        w_rem=P("model", None),
        send_idx=P("model", None, None),
        rows_per_shard=R,
        n_shards=part.n_shards,
        max_send=part.max_send,
        num_nodes=part.num_nodes,
    )

    def _locals(part_s):
        return (
            part_s.src_loc[0], part_s.dst_loc[0], part_s.w_loc[0],
            part_s.src_rem[0], part_s.dst_rem[0], part_s.w_rem[0],
            part_s.send_idx[0],
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("model", None), part_spec),
        out_specs=P("model", None),
    )
    def embed_sm(emb, part_s):
        return _embed_local(emb, _locals(part_s), alpha, cfg.num_layers, R)

    def embed(params, part_: EdgePartition):
        return embed_sm(params["embedding"], part_)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("model", None), part_spec, P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
    )
    def losses_sm(emb, part_s, users, pos, neg, _alpha):
        out = _embed_local(emb, _locals(part_s), _alpha, cfg.num_layers, R)
        u = _lookup(out, users, R)
        p = _lookup(out, pos, R)
        n = _lookup(out, neg, R)
        pos_scores = jnp.sum(u * p, axis=-1)
        neg_scores = jnp.sum(u * n, axis=-1)
        bpr = bpr_loss(pos_scores, neg_scores)
        # Ego-embedding L2 on the batch rows (reference utils_v2.py:193-211):
        # gather layer-0 rows the same mask-and-psum way.
        e_u = _lookup(emb.astype(jnp.float32), users, R)
        e_p = _lookup(emb.astype(jnp.float32), pos, R)
        e_n = _lookup(emb.astype(jnp.float32), neg, R)
        reg = (
            decay
            * 0.5
            * (jnp.sum(e_u**2) + jnp.sum(e_p**2) + jnp.sum(e_n**2))
            / users.shape[0]
        )
        return bpr, reg, bpr + reg

    def loss_fn(params, part_, users, pos, neg):
        bpr, reg, total = losses_sm(
            params["embedding"], part_, users, pos, neg, alpha
        )
        return total, (bpr, reg)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, part_, sdata: BprSamplerData, key):
        users, pos, neg = sample_batch(key, sdata, batch_size)
        (loss, (bpr, reg)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, part_, users, pos, neg
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "bpr_loss": bpr, "reg_loss": reg}

    return embed, train_step
