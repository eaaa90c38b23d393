"""Mesh-sharded measured-optimal SpMM pair (shard_map + per-device plans).

Round-2 shipped the fast SpMM plans (``ops/spmm_fast.py``) single-chip only:
the mesh path fell back to the plain segment-sum SpMMs, degrading per-chip
step time ~1.6x the moment you shard (VERDICT r2 item 3). This module carries
the plans to the mesh the TPU-idiomatic way:

- the ARCS of each direction are partitioned across ALL mesh devices —
  to_items by contiguous arc ranges (each device reduces partial item sums
  over every item tile, combined with ONE psum of the [n_items, D] f32
  output, ~17 MB at cosmetics scale — rides ICI); to_users by contiguous
  DESTINATION (user-row) ranges (each device owns its users' rows outright:
  zero communication on the output, results concatenate along the device
  axis);
- each device runs the SAME Pallas one-hot-MXU segment-reduce program
  (``spmm_fast._seg_reduce_call``) on its own plan slab: per-device plans
  are padded to one shared (n_chunks, E_pad) shape, so the whole mesh
  compiles ONE Mosaic kernel per direction;
- the dense heavy-user head (w_hi) stays OUTSIDE shard_map as plain GSPMD
  matmuls — XLA already shards dense contractions optimally, only the
  sparse/Pallas work needs explicit placement;
- the pair is self-transpose (Â_ui^T = Â_iu), so each direction's VJP is the
  other direction applied to the cotangent — the same two plan stacks serve
  forward and backward.

The gather TABLE (x_users for to_items, x_items for to_users) enters
shard_map replicated; GSPMD inserts the all-gather from the row-sharded
embedding at the boundary. This matches the single-chip fast path's memory
shape — the win over it is arc-work / n_devices per chip.

Reference baseline being replaced: torch_scatter CUDA scatter-add inside PyG
``MessagePassing.propagate`` (used via ``LGConv``, reference
``src/lightgcn.py:82,96``) — single GPU only (``src/train_lightgcn.py:13``).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .bipartite import BipartiteSplit, _mm_precision, split_heavy_users
from .spmm_fast import SegReducePlan, _pad_plan_chunks, _seg_reduce_call, build_segreduce_plan


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlanStack:
    """Per-device :class:`SegReducePlan` slabs stacked on a leading device
    axis (all padded to one shared shape — one Mosaic program mesh-wide)."""

    gidx: jax.Array      # [n_dev, E_pad]
    gw: jax.Array        # [n_dev, E_pad]
    seg: jax.Array       # [n_dev, n_chunks, 8, CH/8]
    tile_map: jax.Array  # [n_dev, n_chunks]
    first: jax.Array     # [n_dev, n_chunks]
    n_out: int = dataclasses.field(metadata=dict(static=True))  # per-device rows
    ot: int = dataclasses.field(metadata=dict(static=True))
    ch: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedFastOps:
    """Sharded plans for both SpMM directions + optional dense heavy head.

    ``mesh``/``axes`` are static: the shard_map programs are bound to the
    mesh the plans were laid out for.
    """

    items_stack: PlanStack   # arcs -> item rows; outputs psum-combined
    users_stack: PlanStack   # arcs -> per-device user row ranges; concat
    hi_ids: jax.Array | None = None   # [K] int32 heavy user ids
    w_hi: jax.Array | None = None     # [n_items, K] dense normalized weights
    n_users: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_items: int = dataclasses.field(default=0, metadata=dict(static=True))
    msgs_dtype: str = dataclasses.field(
        default="float32", metadata=dict(static=True)
    )
    mesh: Mesh = dataclasses.field(default=None, metadata=dict(static=True))
    axes: tuple = dataclasses.field(
        default=("data", "model"), metadata=dict(static=True)
    )


def _stack_plans(plans: list[SegReducePlan]) -> PlanStack:
    """Stack per-device host plans (``build_segreduce_plan(device=False)``)
    into one host-resident PlanStack. Leaves stay numpy so the caller's
    ``device_put`` with the device-axis sharding uploads each slab straight
    to its own chip — no [n_dev, E_pad] transient on the default device."""
    n_tiles = -(-plans[0].n_out // plans[0].ot)
    n_max = max(int(p.tile_map.shape[0]) for p in plans)
    plans = [_pad_plan_chunks(p, n_max, n_tiles) for p in plans]
    return PlanStack(
        gidx=np.stack([np.asarray(p.gidx) for p in plans]),
        gw=np.stack([np.asarray(p.gw) for p in plans]),
        seg=np.stack([np.asarray(p.seg) for p in plans]),
        tile_map=np.stack([np.asarray(p.tile_map) for p in plans]),
        first=np.stack([np.asarray(p.first) for p in plans]),
        n_out=plans[0].n_out,
        ot=plans[0].ot,
        ch=plans[0].ch,
    )


def build_sharded_fast_ops(
    split: BipartiteSplit,
    mesh: Mesh,
    msgs_dtype: str = "float32",
    heavy_users: int = 0,
    heavy_dtype: str = "float32",
    ot: int = 512,
    ch: int = 2048,
) -> ShardedFastOps:
    # The sparse work partitions over the ENTIRE mesh (every chip takes an
    # equal arc share regardless of the 2-D (data, model) logical layout).
    n_dev = int(mesh.size)
    n_users, n_items = split.n_users, split.n_items
    hi_ids, w_hi, ui_src, ui_dst, ui_w, iu_indptr, iu_src, iu_w, _ = (
        split_heavy_users(split, heavy_users, heavy_dtype)
    )

    # to_items: contiguous arc ranges (dst-sorted within each range, so the
    # per-range plan's sorted-destination promise holds).
    e = len(ui_src)
    bounds = np.linspace(0, e, n_dev + 1).astype(np.int64)
    items_plans = [
        build_segreduce_plan(
            ui_src[lo:hi], ui_dst[lo:hi], ui_w[lo:hi], n_items, ot=ot, ch=ch,
            device=False,
        )
        for lo, hi in zip(bounds[:-1], bounds[1:])
    ]

    # to_users: contiguous user-row ranges of equal padded size (a multiple
    # of the output tile, so each device's tiles cover exactly its rows).
    rows_local = -(-n_users // (n_dev * ot)) * ot
    iu_dst = np.repeat(
        np.arange(n_users, dtype=np.int64), np.diff(iu_indptr)
    )
    users_plans = []
    for dev in range(n_dev):
        lo = min(dev * rows_local, n_users)
        hi = min((dev + 1) * rows_local, n_users)
        a0, a1 = int(iu_indptr[lo]), int(iu_indptr[hi])
        users_plans.append(
            build_segreduce_plan(
                iu_src[a0:a1], (iu_dst[a0:a1] - dev * rows_local),
                iu_w[a0:a1], rows_local, ot=ot, ch=ch, device=False,
            )
        )
    return ShardedFastOps(
        items_stack=_stack_plans(items_plans),
        users_stack=_stack_plans(users_plans),
        hi_ids=hi_ids,
        w_hi=w_hi,
        n_users=n_users,
        n_items=n_items,
        msgs_dtype=msgs_dtype,
        mesh=mesh,
        axes=tuple(mesh.axis_names),
    )


def _local_segreduce(table, stack: PlanStack, msgs_dtype, interpret):
    """One device's gather + Pallas reduce over its [1, ...] plan slab."""
    gidx, gw = stack.gidx[0], stack.gw[0]
    seg, tile_map, first = stack.seg[0], stack.tile_map[0], stack.first[0]
    d = int(table.shape[-1])
    n_tiles = -(-stack.n_out // stack.ot)
    if msgs_dtype == jnp.bfloat16:
        msgs = jnp.take(table.astype(jnp.bfloat16), gidx, axis=0)
        w_seg = gw.reshape(-1, 8, stack.ch // 8)
        out = _seg_reduce_call(
            tile_map, first, seg, w_seg, msgs, None,
            ot=stack.ot, ch=stack.ch, d=d, n_tiles=n_tiles,
            interpret=interpret, weighted=True,
        )
    else:
        msgs = jnp.take(table, gidx, axis=0) * gw[:, None]
        out = _seg_reduce_call(
            tile_map, first, seg, None, msgs, None,
            ot=stack.ot, ch=stack.ch, d=d, n_tiles=n_tiles,
            interpret=interpret,
        )
    return out  # [n_tiles*ot, d] f32


def _plan_specs(stack: PlanStack, axes: tuple):
    """PartitionSpec tree matching ``stack``'s treedef (leading device axis
    split over ALL mesh axes)."""
    return jax.tree.map(lambda _: P(axes), stack)


def _tail_to_items(x_users, sfo: ShardedFastOps):
    from jax import shard_map

    interpret = jax.default_backend() != "tpu"
    msgs_dtype = (
        jnp.bfloat16 if sfo.msgs_dtype == "bfloat16" else jnp.float32
    )
    axes = sfo.axes

    def local(x, stack):
        out = _local_segreduce(x, stack, msgs_dtype, interpret)
        return jax.lax.psum(out, axes)

    out = shard_map(
        local,
        mesh=sfo.mesh,
        in_specs=(P(), _plan_specs(sfo.items_stack, axes)),
        out_specs=P(),
        check_vma=False,
    )(x_users, sfo.items_stack)
    return out[: sfo.n_items]


def _tail_to_users(x_items, sfo: ShardedFastOps):
    from jax import shard_map

    interpret = jax.default_backend() != "tpu"
    msgs_dtype = (
        jnp.bfloat16 if sfo.msgs_dtype == "bfloat16" else jnp.float32
    )
    axes = sfo.axes

    def local(x, stack):
        return _local_segreduce(x, stack, msgs_dtype, interpret)

    out = shard_map(
        local,
        mesh=sfo.mesh,
        in_specs=(P(), _plan_specs(sfo.users_stack, axes)),
        out_specs=P(axes),
        check_vma=False,
    )(x_items, sfo.users_stack)
    return out[: sfo.n_users]


@jax.custom_vjp
def sharded_to_items(x_users, sfo: ShardedFastOps):
    """out_items = Â_iu · x_users over the mesh (tail shard_map + heavy
    GSPMD head). Same math as ``ops.bipartite.fast_to_items``."""
    out = _tail_to_items(x_users, sfo)
    if sfo.w_hi is not None:
        xh = jnp.take(x_users, sfo.hi_ids, axis=0).astype(sfo.w_hi.dtype)
        out = out + jnp.dot(
            sfo.w_hi, xh,
            preferred_element_type=jnp.float32,
            precision=_mm_precision(sfo.w_hi.dtype),
        )
    return out


@jax.custom_vjp
def sharded_to_users(x_items, sfo: ShardedFastOps):
    """out_users = Â_ui · x_items over the mesh."""
    out = _tail_to_users(x_items, sfo)
    if sfo.w_hi is not None:
        heavy = jnp.dot(
            sfo.w_hi.T, x_items.astype(sfo.w_hi.dtype),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(sfo.w_hi.dtype),
        )
        out = out.at[sfo.hi_ids].add(heavy)
    return out


def _sti_fwd(x, sfo):
    return sharded_to_items(x, sfo), sfo


def _sti_bwd(sfo, g):
    # (Â_iu)^T = Â_ui exactly (symmetric normalization, duplicated arcs).
    return sharded_to_users(g, sfo), None


def _stu_fwd(x, sfo):
    return sharded_to_users(x, sfo), sfo


def _stu_bwd(sfo, g):
    return sharded_to_items(g, sfo), None


sharded_to_items.defvjp(_sti_fwd, _sti_bwd)
sharded_to_users.defvjp(_stu_fwd, _stu_bwd)
