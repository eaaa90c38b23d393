"""Fast edge-partitioned propagation: the B_ii factorization + measured-
optimal SpMM plans + dense heavy-user head, carried to the EXPLICIT edge-
partition strategy (round-3 VERDICT item 1 — the declared multi-host design
previously ran the slow per-layer segment path).

Partition layout (TPU-first redesign, not a port — the reference is single
device, ``src/train_lightgcn.py:13``)
--------------------------------------------------------------------------
Ownership is by USER. The user rows are padded to ``S · R`` (R a multiple of
the Pallas output tile) and shard ``s`` owns rows ``[sR, (s+1)R)`` of the
user embedding; the ITEM side — embedding, every item-chain activation, and
the final item output — is replicated (items are the small side of the
bipartite graph: [I, D] is ~20 MB f32 at cosmetics scale, users are 30x
more). Each arc is assigned to the shard owning its USER endpoint:

- ``to_items`` (Â_iu · x_users): arcs partitioned by SOURCE-user owner.
  Every gather is from the shard's OWN [R, D] user rows — no user-table
  communication at all (GSPMD's fallback for the same program all-gathers
  the full [n_users, D] table per direction, ~590 MB at cosmetics scale) —
  and the per-shard partial item sums combine with ONE psum of the
  replicated-size [I, D] f32 output (~20 MB, rides ICI). Bonus: the local
  gather table has R = n_users/S rows, which for S ≥ 8 drops below the
  measured 262K-row gather cliff (~161M rows/s vs ~96M from the full 1.64M-
  row table — scripts/microbench_r3*_results.json).
- ``to_users`` (Â_ui · S_i): arcs partitioned by DESTINATION-user owner.
  Gathers are from the replicated [I, D] item activations; each shard
  produces exactly its own user rows — ZERO output communication.
- dense item-item chain: B_ii rows sharded over the mesh (each shard
  multiplies its row band against the replicated item activations; GSPMD
  all-gathers the [I_s, D] band outputs, ~20 MB/layer).
- dense heavy-user head: the top-K users' [I, K] weight matrix is SHARDED by
  user ownership into per-shard [I, K_s] column blocks (memory K_s ≈ K/S per
  chip vs the replicated single-chip head), contributing through the same
  psum (to_items) / own-rows (to_users) paths as the sparse tails.

The per-layer communication is therefore O(I · D) — independent of the edge
cut — versus the round-1..3 explicit design's per-layer all_to_all of
boundary USER rows (bounded by the edge cut, which for power-law bipartite
graphs approaches all of it). The pair (src-owned to_items, dst-owned
to_users) is an exact self-transpose INCLUDING layout: arc (u, i) lives on
owner(u) in both directions with the same weight, so each op's VJP is the
other applied to the cotangent, with matching shardings — the same two plan
stacks serve forward and backward, as on the single-chip fast path
(``ops/bipartite.py``).

Reference hot op being replaced at multi-host scale: torch_scatter CUDA
scatter-add inside PyG ``MessagePassing.propagate`` (``src/lightgcn.py:82,
96``; ``requirements.txt:12``).
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

from ..models.lightgcn import LightGCNConfig
from ..models.losses import bpr_loss
from ..ops.bipartite import (
    BipartiteSplit,
    _mm_precision,
    item_chain_core,
    split_heavy_users,
)
from ..ops.spmm_fast import build_segreduce_plan
from ..ops.spmm_sharded import PlanStack, _local_segreduce, _plan_specs, _stack_plans
from ..sampling.bpr import BprSamplerData, sample_batch


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FastEdgePartition:
    """Per-shard fast-SpMM plan stacks + sharded heavy head + local batch CSR.

    All leading-``S`` arrays are placed sharded over the mesh's ``model``
    axis so each device holds exactly its shard's slab.
    """

    items_stack: PlanStack   # src-owned ui tail arcs; LOCAL src ids; psum out
    users_stack: PlanStack   # dst-owned iu tail arcs; own user rows out
    # Batched-train CSR over the shard's LOCAL users — FULL arcs (heavy
    # users included; the batched forward aggregates a batch user's own arcs
    # directly, as on the single-chip path).
    indptr_loc: jax.Array    # [S, R+1] i64 offsets into the arc slabs
    batch_item: jax.Array    # [S, A] i32 local item ids (dst-sorted)
    batch_w: jax.Array       # [S, A] f32
    # Heavy head, sharded by user ownership (None when heavy_users == 0).
    hi_loc: jax.Array | None = None   # [S, Kp] i32 local user rows (pad: 0)
    w_hi: jax.Array | None = None     # [S, I, Kp] dense weights (pad cols: 0)
    # Dense 2-hop operator B_ii, rows padded to S and sharded P('model').
    # A DATA field (rides the pytree into every jitted call) — closing over
    # it would bake a 6 GB-at-scale constant into the executable.
    item_op: jax.Array | None = None  # [I_pad, I]
    rows_per_shard: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_users: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_items: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_shards: int = dataclasses.field(default=0, metadata=dict(static=True))
    msgs_dtype: str = dataclasses.field(
        default="float32", metadata=dict(static=True)
    )
    mesh: Mesh = dataclasses.field(default=None, metadata=dict(static=True))

    @property
    def padded_users(self) -> int:
        return self.rows_per_shard * self.n_shards


def build_fast_edge_partition(
    split: BipartiteSplit,
    mesh: Mesh,
    item_op: jax.Array | None = None,
    msgs_dtype: str = "float32",
    heavy_users: int = 0,
    heavy_dtype: str = "float32",
    ot: int = 512,
    ch: int = 2048,
) -> FastEdgePartition:
    """Host-side partition + plan construction (numpy; one-time per graph).

    ``item_op`` is the dense B_ii from ``ops.bipartite.build_item_operator``;
    it is row-padded to the shard count and placed P('model', None) here."""
    S = int(mesh.size)
    n_users, n_items = split.n_users, split.n_items
    # R: per-shard user rows, a multiple of the Pallas output tile so each
    # shard's to_users tiles cover exactly its rows.
    R = -(-n_users // (S * ot)) * ot

    (hi_ids, _, ui_src, ui_dst, ui_w, iu_indptr_tail, iu_src_tail, iu_w_tail,
     head_coo) = split_heavy_users(
        split, heavy_users, heavy_dtype, build_head=False
    )

    # --- to_items: arcs by SOURCE-user owner; src ids localized ---
    owner = ui_src // R
    items_plans = []
    for s in range(S):
        m = owner == s
        items_plans.append(
            build_segreduce_plan(
                (ui_src[m] - s * R).astype(np.int32), ui_dst[m], ui_w[m],
                n_items, ot=ot, ch=ch, device=False,
            )
        )

    # --- to_users: arcs by DESTINATION-user owner (contiguous CSR ranges of
    # the dst-sorted iu tail); destinations localized ---
    iu_dst_tail = np.repeat(
        np.arange(n_users, dtype=np.int64), np.diff(iu_indptr_tail)
    )
    users_plans = []
    for s in range(S):
        lo, hi = min(s * R, n_users), min((s + 1) * R, n_users)
        a0, a1 = int(iu_indptr_tail[lo]), int(iu_indptr_tail[hi])
        users_plans.append(
            build_segreduce_plan(
                iu_src_tail[a0:a1], iu_dst_tail[a0:a1] - s * R,
                iu_w_tail[a0:a1], R, ot=ot, ch=ch, device=False,
            )
        )

    # --- batched-train CSR slabs over LOCAL users (FULL arcs) ---
    full_indptr = np.asarray(split.iu_indptr, dtype=np.int64)
    full_item = np.asarray(split.iu_src_item)
    full_w = np.asarray(split.iu_w)
    a_max = max(
        int(full_indptr[min((s + 1) * R, n_users)] - full_indptr[min(s * R, n_users)])
        for s in range(S)
    ) or 1
    indptr_loc = np.zeros((S, R + 1), np.int64)
    batch_item = np.zeros((S, a_max), np.int32)
    batch_w = np.zeros((S, a_max), np.float32)
    for s in range(S):
        lo, hi = min(s * R, n_users), min((s + 1) * R, n_users)
        a0, a1 = int(full_indptr[lo]), int(full_indptr[hi])
        ip = full_indptr[lo : hi + 1] - a0
        indptr_loc[s, : hi - lo + 1] = ip
        indptr_loc[s, hi - lo + 1 :] = ip[-1]  # padded users: degree 0
        batch_item[s, : a1 - a0] = full_item[a0:a1]
        batch_w[s, : a1 - a0] = full_w[a0:a1]

    # --- heavy head: per-shard column blocks ---
    hi_loc = w_hi = None
    if hi_ids is not None and head_coo is not None:
        hi_np = np.asarray(hi_ids, dtype=np.int64)
        K = len(hi_np)
        h_owner = hi_np // R  # hi_ids ascending -> owners are contiguous runs
        counts = np.bincount(h_owner, minlength=S)
        Kp = int(counts.max())
        if Kp > 0:
            r_lo = np.concatenate([[0], np.cumsum(counts)[:-1]])
            hi_loc_np = np.zeros((S, Kp), np.int32)
            for s in range(S):
                rows = hi_np[r_lo[s] : r_lo[s] + counts[s]] - s * R
                hi_loc_np[s, : counts[s]] = rows.astype(np.int32)
            keys, w_sum = head_coo
            item = keys // K
            rank = keys % K
            s_of = h_owner[rank]
            col = rank - r_lo[s_of]
            flat = (s_of * n_items + item) * Kp + col
            dt = jnp.bfloat16 if heavy_dtype == "bfloat16" else jnp.float32
            head_sh = NamedSharding(mesh, P("model", None, None))
            # Build on device from the ~MB-scale COO (a dense host fill plus
            # upload would move GBs through the tunnel at cosmetics scale).
            w_hi = jax.jit(
                lambda f, v: jnp.zeros((S * n_items * Kp,), dt)
                .at[f]
                .set(v.astype(dt), unique_indices=True)
                .reshape(S, n_items, Kp),
                out_shardings=head_sh,
            )(jnp.asarray(flat), jnp.asarray(w_sum))
            hi_loc = jax.device_put(
                jnp.asarray(hi_loc_np), NamedSharding(mesh, P("model", None))
            )

    slab = NamedSharding(mesh, P("model"))

    def place_stack(stack: PlanStack) -> PlanStack:
        # P("model") shards the leading (device) axis; trailing dims replicate.
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("model"))), stack
        )

    row2 = NamedSharding(mesh, P("model", None))
    return FastEdgePartition(
        items_stack=place_stack(_stack_plans(items_plans)),
        users_stack=place_stack(_stack_plans(users_plans)),
        indptr_loc=jax.device_put(jnp.asarray(indptr_loc), row2),
        batch_item=jax.device_put(jnp.asarray(batch_item), row2),
        batch_w=jax.device_put(jnp.asarray(batch_w), row2),
        hi_loc=hi_loc,
        w_hi=w_hi,
        item_op=None if item_op is None else place_item_op(item_op, mesh),
        rows_per_shard=R,
        n_users=n_users,
        n_items=n_items,
        n_shards=S,
        msgs_dtype=msgs_dtype,
        mesh=mesh,
    )


def place_item_op(item_op: jax.Array, mesh: Mesh) -> jax.Array:
    """Row-shard B_ii over the mesh (rows padded to the shard count; the
    chain slices the zero padding back off, ``ops.bipartite.item_chain_core``)."""
    S = int(mesh.size)
    rpad = (-int(item_op.shape[0])) % S
    if rpad:
        item_op = jnp.concatenate(
            [item_op, jnp.zeros((rpad, item_op.shape[1]), item_op.dtype)]
        )
    return jax.device_put(item_op, NamedSharding(mesh, P("model", None)))


# ---------------------------------------------------------------------------
# The self-transpose shard_map SpMM pair
# ---------------------------------------------------------------------------


def _msgs_dtype(fep: FastEdgePartition):
    return jnp.bfloat16 if fep.msgs_dtype == "bfloat16" else jnp.float32


def _head_args(fep: FastEdgePartition):
    return () if fep.w_hi is None else (fep.hi_loc, fep.w_hi)


def _head_specs(fep: FastEdgePartition):
    return () if fep.w_hi is None else (P("model", None), P("model", None, None))


@jax.custom_vjp
def ep_to_items(x_users, fep: FastEdgePartition):
    """out_items [I, D] f32 replicated = Â_iu · x_users over the mesh.

    x_users: [S·R, D] user rows sharded P('model', None). Local gathers from
    the shard's own rows; ONE [I, D] psum combines sparse tail + heavy head.
    """
    interpret = jax.default_backend() != "tpu"
    md = _msgs_dtype(fep)
    n_items = fep.n_items

    def local(x, stack, *head):
        out = _local_segreduce(x, stack, md, interpret)[:n_items]
        if head:
            hi_loc, w_hi = head
            xh = x[hi_loc[0]].astype(w_hi.dtype)
            out = out + jnp.dot(
                w_hi[0], xh,
                preferred_element_type=jnp.float32,
                precision=_mm_precision(w_hi.dtype),
            )
        return jax.lax.psum(out, "model")

    return shard_map(
        local,
        mesh=fep.mesh,
        in_specs=(P("model", None), _plan_specs(fep.items_stack, ("model",)))
        + _head_specs(fep),
        out_specs=P(),
        check_vma=False,
    )(x_users, fep.items_stack, *_head_args(fep))


@jax.custom_vjp
def ep_to_users(x_items, fep: FastEdgePartition):
    """out_users [S·R, D] f32 sharded = Â_ui · x_items over the mesh.

    x_items replicated; each shard emits exactly its own user rows — zero
    output communication.
    """
    interpret = jax.default_backend() != "tpu"
    md = _msgs_dtype(fep)
    R = fep.rows_per_shard

    def local(x, stack, *head):
        out = _local_segreduce(x, stack, md, interpret)[:R]
        if head:
            hi_loc, w_hi = head
            heavy = jnp.dot(
                w_hi[0].T, x.astype(w_hi.dtype),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(w_hi.dtype),
            )
            out = out.at[hi_loc[0]].add(heavy)  # pad cols are all-zero
        return out

    return shard_map(
        local,
        mesh=fep.mesh,
        in_specs=(P(), _plan_specs(fep.users_stack, ("model",)))
        + _head_specs(fep),
        out_specs=P("model", None),
        check_vma=False,
    )(x_items, fep.users_stack, *_head_args(fep))


def _ep_ti_fwd(x, fep):
    return ep_to_items(x, fep), fep


def _ep_ti_bwd(fep, g):
    # Per shard, arc (u, i) lives on owner(u) in BOTH directions with the
    # same weight, and the heavy column blocks are shared — so the transpose
    # of to_items is exactly to_users applied to the cotangent, with the
    # matching sharded layout.
    return ep_to_users(g, fep), None


def _ep_tu_fwd(x, fep):
    return ep_to_users(x, fep), fep


def _ep_tu_bwd(fep, g):
    return ep_to_items(g, fep), None


ep_to_items.defvjp(_ep_ti_fwd, _ep_ti_bwd)
ep_to_users.defvjp(_ep_tu_fwd, _ep_tu_bwd)


# ---------------------------------------------------------------------------
# Params layout: sharded user rows + replicated item rows
# ---------------------------------------------------------------------------


def _is_unified(node) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {"embedding"}


def _is_split(node) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {
        "emb_users", "emb_items",
    }


def split_ep_tree(tree, fep: FastEdgePartition, mesh: Mesh):
    """Map every ``{"embedding": [N, D]}`` node (params or an optimizer-
    moment dict) to the partition layout: user rows zero-padded to S·R and
    sharded over 'model', item rows replicated."""
    row = NamedSharding(mesh, P("model", None))
    rep = NamedSharding(mesh, P())

    def one(node):
        if not _is_unified(node):  # ordinary leaves (e.g. adam's count)
            return node
        emb = node["embedding"]
        pad = fep.padded_users - fep.n_users
        users = jnp.pad(emb[: fep.n_users], ((0, pad), (0, 0)))
        return {
            "emb_users": jax.device_put(users, row),
            "emb_items": jax.device_put(emb[fep.n_users :], rep),
        }

    return jax.tree_util.tree_map(one, tree, is_leaf=_is_unified)


def merge_ep_view(tree, fep: FastEdgePartition):
    """Inverse of :func:`split_ep_tree` (the checkpoint view): unified
    UNPADDED ``{"embedding": [N, D]}`` nodes — strategy-portable."""

    def one(node):
        if not _is_split(node):  # ordinary leaves (e.g. adam's count)
            return node
        return {
            "embedding": jnp.concatenate(
                [node["emb_users"][: fep.n_users], node["emb_items"]], axis=0
            )
        }

    return jax.tree_util.tree_map(one, tree, is_leaf=_is_split)


# ---------------------------------------------------------------------------
# Training / embedding functions
# ---------------------------------------------------------------------------


def make_fast_edge_fns(
    cfg: LightGCNConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    fep: FastEdgePartition,
    batch_size: int,
    decay: float,
    edge_cap: int,
):
    """Build (embed, train_step) over the fast edge partition.

    embed(params, fep) -> [n_users + n_items, D] f32 final embedding
    train_step(params, opt_state, fep, sdata, key)
        -> (params, opt_state, metrics); params in the split layout.

    ``fep`` here supplies only STATIC metadata (shard geometry); the array
    leaves reach the jitted programs through the per-call ``fep`` argument —
    never as closed-over constants (CLAUDE.md: captured big arrays get baked
    into the executable).
    """
    L = cfg.num_layers
    alpha = jnp.full((L + 1,), 1.0 / (L + 1), jnp.float32)
    n_users, n_items, R = fep.n_users, fep.n_items, fep.rows_per_shard
    row = NamedSharding(mesh, P("model", None))
    rep = NamedSharding(mesh, P())

    def chain(params, fep_):
        return item_chain_core(
            params["emb_users"],
            params["emb_items"],
            lambda x: ep_to_items(x, fep_),
            fep_.item_op,
            L,
            alpha,
        )

    def embed(params, fep_: FastEdgePartition):
        out_i, S_i = chain(params, fep_)
        out_u = alpha[0] * params["emb_users"].astype(jnp.float32) + ep_to_users(
            S_i, fep_
        )
        return jnp.concatenate([out_u[:n_users], out_i], axis=0)

    def _batch_partial(E_u_loc, indptr, item, w, S_i, users):
        """One shard's contribution to the batch users' aggregation: local
        layer-0 rows + local-arc messages from the replicated S_i, psum'd.
        Mirrors ``ops.bipartite.fast_batch_embeddings`` per shard."""
        B = users.shape[0]
        base = jax.lax.axis_index("model") * R
        loc = users - base
        owned = (loc >= 0) & (loc < R)
        locc = jnp.clip(loc, 0, R - 1)
        indptr0 = indptr[0]
        start = indptr0[locc].astype(jnp.int32)
        deg = jnp.where(
            owned, (indptr0[locc + 1] - indptr0[locc]).astype(jnp.int32), 0
        )
        cum = jnp.cumsum(deg)
        total = cum[-1]
        k = jnp.arange(edge_cap, dtype=jnp.int32)
        slot = jnp.searchsorted(cum, k, side="right").astype(jnp.int32)
        slot_c = jnp.minimum(slot, B - 1)
        valid = k < total
        basec = cum - deg
        e_idx = jnp.where(valid, start[slot_c] + (k - basec[slot_c]), 0)
        it = item[0][e_idx]
        ww = jnp.where(valid, w[0][e_idx], 0.0)
        msgs = S_i[it] * ww[:, None]
        agg = jax.ops.segment_sum(
            msgs, slot_c, num_segments=B, indices_are_sorted=True
        )
        e0 = jnp.where(owned[:, None], E_u_loc[locc].astype(jnp.float32), 0.0)
        dropped = jnp.maximum(total - edge_cap, 0)
        return (
            jax.lax.psum(e0, "model"),
            jax.lax.psum(agg, "model"),
            jax.lax.psum(dropped, "model"),
        )

    batch_sm = shard_map(
        _batch_partial,
        mesh=mesh,
        in_specs=(
            P("model", None), P("model", None), P("model", None),
            P("model", None), P(), P(),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def loss_fn(params, fep_, users, pos, neg):
        out_i, S_i = chain(params, fep_)
        e_u, agg, dropped = batch_sm(
            params["emb_users"], fep_.indptr_loc, fep_.batch_item,
            fep_.batch_w, S_i, users,
        )
        u_out = alpha[0] * e_u + agg
        p_out = out_i[pos - n_users]
        n_out = out_i[neg - n_users]
        pos_scores = jnp.sum(u_out * p_out, axis=-1)
        neg_scores = jnp.sum(u_out * n_out, axis=-1)
        bpr = bpr_loss(pos_scores, neg_scores)
        # Ego-embedding L2 on the batch rows (reference utils_v2.py:193-211);
        # e_u is already the gathered layer-0 user rows.
        E_i32 = params["emb_items"].astype(jnp.float32)
        e_p = E_i32[pos - n_users]
        e_n = E_i32[neg - n_users]
        reg = (
            decay
            * 0.5
            * (jnp.sum(e_u**2) + jnp.sum(e_p**2) + jnp.sum(e_n**2))
            / users.shape[0]
        )
        return bpr + reg, (bpr, reg, dropped)

    param_shardings = {"emb_users": row, "emb_items": rep}

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, fep_, sdata: BprSamplerData, key):
        users, pos, neg = sample_batch(key, sdata, batch_size)
        (loss, (bpr, reg, dropped)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, fep_, users, pos, neg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {
            k: jax.lax.with_sharding_constraint(v, param_shardings[k])
            for k, v in params.items()
        }
        return params, opt_state, {
            "loss": loss,
            "bpr_loss": bpr,
            "reg_loss": reg,
            "dropped_arcs": jnp.asarray(dropped, jnp.float32),
        }

    return embed, train_step
