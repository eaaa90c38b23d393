"""Measured-optimal SpMM pair for the bipartite hot path.

The two |E|-sized sparse ops left in the fast bipartite forward
(``ops/bipartite.py``) are ``to_items = Â_iu·x_users`` and
``to_users = Â_ui·x_items``. Round-1 shipped both as ``take`` + sorted
``jax.ops.segment_sum``; microbenchmarks on the target v5e chip
(``scripts/microbench_results*.json``) showed that splits as:

    random-row take (10.16M arcs):   ~96 ms big (1.64M-row) table,
                                     ~69 ms small (54.6K-row) table
    sorted segment_sum:             ~128 ms  (XLA lowers it as scatter-add,
                                              even with sorted indices!)

i.e. the REDUCE costs more than the gather. Two replacements, one per
direction, each picked by measurement:

- ``to_users`` (gather from the SMALL item table, reduce over 1.64M users):
  degree-binned ELL — per power-of-2 width bin, ``take`` a [rows, W] index
  matrix and reduce over the STATIC width axis, which XLA fuses into the
  gather (no scatter anywhere). Measured 69 ms for the padded 12.3M gathers
  (vs 132 ms shipped), plus one [n_users]-row gather to undo the
  degree-sort row permutation.

- ``to_items`` (gather from the BIG user table, reduce over 54.6K items):
  big-table ELL measured WORSE (84M padded rows/s — the weight multiply
  breaks XLA's gather+reduce fusion and the padded gathers pay full price),
  so the arc-major gather stays (its 96 ms is the descriptor-rate floor:
  ~9.5 ns/row regardless of dtype, sortedness, or row width) and only the
  reduce moves to a Pallas kernel: messages stream through VMEM in
  dst-sorted chunks and accumulate into revisited 512-row output tiles via
  one-hot matmuls on the MXU (~10 ms vs 128 ms for XLA's segment_sum).

Both ops are exact restructurings (summation ORDER differs from the
reference's scatter order, so equality is allclose-level, not bitwise;
``msgs_dtype=bfloat16`` additionally rounds each message once and is the
benchmarked training mode — see ``SegReducePlan``).

The pair is self-transpose: Â_ui^T = Â_iu (symmetric normalization,
duplicated arcs), so each op's VJP is the other op applied to the cotangent
— exactly two plans serve forward AND backward of both directions.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BucketedSegReducePlan",
    "EllPlan",
    "SegReducePlan",
    "build_bucketed_segreduce_plan",
    "build_ell_plan",
    "build_segreduce_plan",
    "ell_apply",
    "gather_segreduce",
    "gather_segreduce_bucketed",
]


# ---------------------------------------------------------------------------
# Degree-binned ELL (gather + static-axis reduce; no scatter)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllPlan:
    """Rows grouped into power-of-2 degree bins; each bin is a dense
    [rows_b, W_b] (index, weight) pair. Outputs come back in bin order and
    are un-permuted by one row gather at ``inv_order``."""

    idx: tuple      # per bin: [rows_b, W_b] int32 gather rows into the table
    w: tuple        # per bin: [rows_b, W_b] float32 normalized weights
    inv_order: jax.Array  # [n_out] int32; out = concat(bin outs)[inv_order]
    n_out: int = dataclasses.field(metadata=dict(static=True))
    widths: tuple = dataclasses.field(metadata=dict(static=True))


def _ell_widths(max_deg: int) -> list[int]:
    """×1.5 width schedule (1, 2, 3, 5, 8, 12, 18, ...): ~17% mean padding vs
    ~35% for power-of-2 bins on the measured power-law tails, at the cost of
    a handful more gather dispatches."""
    ws, W = [1, 2, 3], 3
    while W < max_deg:
        W = int(np.ceil(W * 1.5))
        ws.append(W)
    return ws


def build_ell_plan(
    indptr: np.ndarray, src: np.ndarray, w: np.ndarray, n_out: int
) -> EllPlan:
    """Build from a CSR over destinations (``indptr`` [n_out+1] into
    dst-sorted ``src``/``w`` arc arrays)."""
    from .. import native

    indptr = np.asarray(indptr, dtype=np.int64)
    src = np.asarray(src)
    w = np.asarray(w)
    deg = np.diff(indptr)
    sorted_native = native.ell_sort_by_degree(indptr) if n_out else None
    if sorted_native is not None:
        order, _ = sorted_native
    else:
        order = np.argsort(deg, kind="stable")  # ascending degree
    dsort = deg[order]
    idx_bins, w_bins, widths = [], [], []
    lo = 0
    for W in _ell_widths(int(dsort[-1]) if n_out else 1):
        if lo >= n_out:
            break
        hi = int(np.searchsorted(dsort, W, side="right"))
        if hi <= lo:
            continue
        rows = order[lo:hi]
        nb = len(rows)
        filled = native.ell_fill_bin(indptr, src, w, rows, W)
        if filled is not None:
            ib, wb = filled
        else:
            d = deg[rows]
            ib = np.zeros((nb, W), np.int32)
            wb = np.zeros((nb, W), np.float32)
            flat_rows = np.repeat(np.arange(nb), d)
            flat_cols = np.arange(int(d.sum())) - np.repeat(
                np.cumsum(np.append(0, d[:-1])), d
            )
            take = np.repeat(indptr[rows], d) + flat_cols
            ib[flat_rows, flat_cols] = src[take]
            wb[flat_rows, flat_cols] = w[take]
        idx_bins.append(jnp.asarray(ib))
        w_bins.append(jnp.asarray(wb))
        widths.append(W)
        lo = hi
    inv = np.empty(n_out, np.int32)
    inv[order] = np.arange(n_out, dtype=np.int32)
    return EllPlan(
        idx=tuple(idx_bins),
        w=tuple(w_bins),
        inv_order=jnp.asarray(inv),
        n_out=int(n_out),
        widths=tuple(widths),
    )


def ell_apply(table: jax.Array, plan: EllPlan, gather_dtype=None) -> jax.Array:
    """[n_out, D] float32 = Â · table via per-bin gather + fused width-sum.

    ``gather_dtype=bfloat16`` casts the table once before the gathers (bf16
    small-table rows gather ~17% faster, 172 vs 147 Mrows/s measured) at one
    rounding per message — the benchmarked training mode; weights and the
    width-sum accumulate in f32 either way."""
    if gather_dtype is not None:
        table = table.astype(gather_dtype)
    outs = [
        jnp.sum(
            jnp.take(table, ib, axis=0).astype(jnp.float32) * wb[..., None],
            axis=1,
        )
        for ib, wb in zip(plan.idx, plan.w)
    ]
    return jnp.concatenate(outs, axis=0)[plan.inv_order]


# ---------------------------------------------------------------------------
# Arc-major gather + Pallas one-hot-MXU segment reduce
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SegReducePlan:
    """Dst-sorted arcs padded so each OT-row output tile owns whole CH-arc
    chunks; ``tile_map``/``first`` drive the Pallas grid (scalar prefetch).

    ``msgs_dtype`` trades reduce throughput for message precision:
    ``float32`` keeps the full f32 message (exact up to summation order);
    ``bfloat16`` rounds once per term (measured mode): the table is cast to
    bf16 ONCE per call, the gather then streams raw bf16 rows with no
    elementwise epilogue (a fused gather+cast measured 150 ms vs 94 ms for
    the plain gather at 10.16M arcs; 128-lane padding was ALSO measured and
    rejected — the padded-table gather is slower, ~157 ms), and the arc
    weight is applied INSIDE the kernel by scaling the one-hot column
    (``w_seg``) — f32 accumulation either way.
    """

    gidx: jax.Array      # [E_pad] int32 rows to gather from the table
    gw: jax.Array        # [E_pad] float32 weights (0 on padding)
    seg: jax.Array       # [n_chunks, 8, CH/8] int32 local segment ids
    tile_map: jax.Array  # [n_chunks] int32 output tile per chunk
    first: jax.Array     # [n_chunks] int32 1 on a tile's first chunk
    n_out: int = dataclasses.field(metadata=dict(static=True))
    ot: int = dataclasses.field(metadata=dict(static=True))
    ch: int = dataclasses.field(metadata=dict(static=True))


def build_segreduce_plan(
    src: np.ndarray,
    dst_sorted: np.ndarray,
    w: np.ndarray,
    n_out: int,
    ot: int = 512,
    ch: int = 2048,
    device: bool = True,
) -> SegReducePlan:
    """``device=False`` keeps the plan's leaves as host numpy arrays — used
    by the sharded builder (``spmm_sharded._stack_plans``) so per-device
    slabs are stacked on the host and ``device_put`` straight to their
    shards, instead of materializing every slab plus the full stack on the
    default device first (a ~GB-scale transient at cosmetics scale)."""
    from .. import native

    asarray = jnp.asarray if device else np.asarray
    src = np.asarray(src)
    dst_sorted = np.asarray(dst_sorted)
    w = np.asarray(w)
    planned = native.segreduce_plan(src, dst_sorted, w, n_out, ot, ch)
    if planned is not None:
        gidx, gw, seg, tile_map, first = planned
        return SegReducePlan(
            gidx=asarray(gidx),
            gw=asarray(gw),
            seg=asarray(seg.reshape(-1, 8, ch // 8)),
            tile_map=asarray(tile_map),
            first=asarray(first),
            n_out=int(n_out),
            ot=int(ot),
            ch=int(ch),
        )
    n_tiles = -(-n_out // ot)
    bounds = np.searchsorted(dst_sorted, np.arange(n_tiles + 1) * ot)
    cnt = np.diff(bounds)
    chunks = np.maximum(1, -(-cnt // ch))
    padded = chunks * ch
    starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
    e_pad = int(padded.sum())
    gidx = np.zeros(e_pad, np.int32)
    gw = np.zeros(e_pad, np.float32)
    seg = np.zeros(e_pad, np.int32)
    # positions of the real (unpadded) arcs inside the padded layout
    take_pos = np.repeat(starts, cnt) + (
        np.arange(int(cnt.sum())) - np.repeat(np.cumsum(np.append(0, cnt[:-1])), cnt)
    )
    gidx[take_pos] = src
    gw[take_pos] = w
    seg[take_pos] = dst_sorted - np.repeat(np.arange(n_tiles) * ot, cnt).astype(
        dst_sorted.dtype
    )
    tile_map = np.repeat(np.arange(n_tiles, dtype=np.int32), chunks)
    first = np.zeros(len(tile_map), np.int32)
    first[np.concatenate([[0], np.cumsum(chunks)[:-1]])] = 1
    return SegReducePlan(
        gidx=asarray(gidx),
        gw=asarray(gw),
        seg=asarray(seg.reshape(-1, 8, ch // 8)),
        tile_map=asarray(tile_map),
        first=asarray(first),
        n_out=int(n_out),
        ot=int(ot),
        ch=int(ch),
    )


@partial(
    jax.jit,
    static_argnames=(
        "ot", "ch", "d", "n_tiles", "interpret", "weighted", "fast_f32",
    ),
)
def _seg_reduce_call(
    tile_map, first, seg, w_seg, msgs, prev=None,
    *, ot, ch, d, n_tiles, interpret, weighted=False, fast_f32=False,
):
    """``weighted=False``: msgs already carry the arc weight (one-hot is 0/1).
    ``weighted=True``: msgs are RAW gathered rows; the arc weight scales the
    one-hot column instead. ``fast_f32``: f32 msgs reduced with ONE bf16 MXU
    pass (DEFAULT precision) — the benchmarked mode's rounding, without ever
    materializing a bf16 copy of the message stream.

    ``prev`` (optional [n_tiles*ot, d] f32): accumulate INTO prev instead of
    zero-initializing each tile — every output tile must then be visited by
    at least one chunk (the plan builders guarantee ≥1 chunk per tile), since
    unvisited out blocks are never written. Used to chain per-src-bucket
    calls (see :func:`gather_segreduce_bucketed`); bucketed plans are padded
    to ONE shared (n_chunks, E_pad) shape by their builder, so every
    per-bucket call lowers to the SAME Mosaic program (one remote kernel
    compile instead of n_buckets — pad chunks carry zero weights and cost
    one no-op chunk pass each).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c8 = ch // 8
    msgs_dtype = msgs.dtype
    n_chunks = seg.shape[0]
    accum = prev is not None

    def kernel(tile_map_ref, first_ref, *rest):
        rest = list(rest)
        seg_ref = rest.pop(0)
        w_ref = rest.pop(0) if weighted else None
        prev_ref = rest.pop(0) if accum else None
        msgs_ref, out_ref = rest
        c = pl.program_id(0)

        @pl.when(first_ref[c] == 1)
        def _():
            if accum:
                out_ref[:] = prev_ref[:]
            else:
                out_ref[:] = jnp.zeros_like(out_ref)

        rows = jax.lax.broadcasted_iota(jnp.int32, (ot, c8), 0)
        # Exact f32 needs HIGHEST precision: the MXU's default f32 dot is a
        # single bf16 pass (~3 decimal digits), measured 5e-3 relative error.
        prec = (
            jax.lax.Precision.HIGHEST
            if msgs_dtype == jnp.float32 and not fast_f32
            else jax.lax.Precision.DEFAULT
        )
        # One [ot, CH] one-hot per chunk (8 lane-aligned [ot, CH/8] pieces
        # concatenated) feeding a SINGLE MXU dot — 8 small K=CH/8 dots per
        # chunk measured ~2x slower than their input-DMA floor.
        oh_dtype = msgs_dtype

        pieces = []
        for r in range(8):
            hit = rows == seg_ref[0, r, :][None, :]
            if weighted:
                pieces.append(
                    jnp.where(hit, w_ref[0, r, :][None, :], 0.0).astype(oh_dtype)
                )
            else:
                pieces.append(hit.astype(oh_dtype))
        oh = jnp.concatenate(pieces, axis=1)  # [ot, CH]
        out_ref[:] += jnp.dot(
            oh,
            msgs_ref[:, :],
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    seg_spec = pl.BlockSpec((1, 8, c8), lambda c, tm, fr: (c, 0, 0))
    out_like_spec = pl.BlockSpec((ot, d), lambda c, tm, fr: (tm[c], 0))
    msgs_spec = pl.BlockSpec((ch, d), lambda c, tm, fr: (c, 0))
    prefetch = (tile_map, first)
    in_specs = (
        [seg_spec]
        + ([seg_spec] if weighted else [])
        + ([out_like_spec] if accum else [])
        + [msgs_spec]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_like_spec,
    )
    args = (
        prefetch
        + (seg,)
        + ((w_seg,) if weighted else ())
        + ((prev,) if accum else ())
        + (msgs,)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * ot, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*args)


def _segreduce_one(table, plan: SegReducePlan, msgs_dtype, interpret, prev):
    """One gather + kernel pass for ``plan``; accumulates into ``prev`` when
    given (padded [n_tiles*ot, d] f32). Returns the PADDED output."""
    d = int(table.shape[-1])
    n_tiles = -(-plan.n_out // plan.ot)
    if msgs_dtype == jnp.bfloat16:
        # bf16 mode: the caller pre-casts the table (once, not per bucket);
        # gather raw bf16 rows and apply the arc weight inside the kernel by
        # scaling the one-hot column. Rationale (all measured at 10.16M
        # arcs): a bf16 cast epilogue fused into the gather costs 150 ms vs
        # 94 raw, and an f32 message temp pays TPU's 80→128 lane padding at
        # f32 width — 3.83 GB live, which OOMs the train step next to the
        # 6 GB B_ii.
        msgs = jnp.take(table, plan.gidx, axis=0)
        w_seg = plan.gw.reshape(-1, 8, plan.ch // 8)
        return _seg_reduce_call(
            plan.tile_map, plan.first, plan.seg, w_seg, msgs, prev,
            ot=plan.ot, ch=plan.ch, d=d, n_tiles=n_tiles, interpret=interpret,
            weighted=True,
        )
    msgs = jnp.take(table, plan.gidx, axis=0) * plan.gw[:, None]
    return _seg_reduce_call(
        plan.tile_map, plan.first, plan.seg, None, msgs, prev,
        ot=plan.ot, ch=plan.ch, d=d, n_tiles=n_tiles, interpret=interpret,
    )


def gather_segreduce(
    table: jax.Array,
    plan: SegReducePlan,
    msgs_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jax.Array:
    """[n_out, D] float32 = Â · table: XLA row gather then the Pallas chunked
    one-hot segment reduce. ``interpret=None`` auto-selects interpreter mode
    off-TPU (the kernel is Mosaic-only).

    bf16 mode casts the table once and streams RAW bf16 rows at native
    width (descriptor-rate gather, no elementwise epilogue; 128-lane padding
    measured SLOWER), applying the weight inside the kernel via the scaled
    one-hot; f32 mode keeps the exact external multiply."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if msgs_dtype == jnp.bfloat16:
        table = table.astype(jnp.bfloat16)
    out = _segreduce_one(table, plan, msgs_dtype, interpret, None)
    return out[: plan.n_out]


# ---------------------------------------------------------------------------
# Src-range-bucketed variant: gathers from sliced sub-tables
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BucketedSegReducePlan:
    """Per-src-range bucketed :class:`SegReducePlan` stack.

    Measured on the target chip (scripts/microbench_r3*_results.json): the
    arbitrary-row gather rate CLIFFS with table size — ~161M rows/s from
    tables ≤262K rows vs ~96M from the 1.64M-row user table. Splitting the
    src ids into equal ranges lets each bucket gather from a ≤262K-row
    STATIC SLICE of the table at the fast rate. Each bucket holds a full
    per-tile chunk layout over ONLY its arcs (every tile keeps ≥1 chunk),
    and the kernel passes chain: bucket b accumulates into bucket b-1's
    padded output (``prev``), so revisited-tile ordering stays consecutive
    within every pallas_call. Cost: one padded chunk tail per (bucket, tile)
    pair (a few % of arcs at cosmetics scale with 8 buckets).
    """

    buckets: tuple  # SegReducePlan per src range (gidx LOCAL to the range)
    spans: tuple = dataclasses.field(metadata=dict(static=True))  # ((lo, hi), ...)
    n_out: int = dataclasses.field(metadata=dict(static=True))
    ot: int = dataclasses.field(metadata=dict(static=True))


def build_bucketed_segreduce_plan(
    src: np.ndarray,
    dst_sorted: np.ndarray,
    w: np.ndarray,
    n_out: int,
    n_src: int,
    n_buckets: int = 8,
    ot: int = 512,
    ch: int = 2048,
) -> BucketedSegReducePlan:
    src = np.asarray(src)
    dst_sorted = np.asarray(dst_sorted)
    w = np.asarray(w)
    bounds = np.linspace(0, n_src, n_buckets + 1).astype(np.int64)
    plans, spans = [], []
    for b in range(n_buckets):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        m = (src >= lo) & (src < hi)
        plans.append(
            build_segreduce_plan(
                (src[m] - lo).astype(src.dtype), dst_sorted[m], w[m], n_out,
                ot=ot, ch=ch,
            )
        )
        spans.append((lo, hi))
    # Pad every bucket to the max chunk count so all per-bucket pallas_calls
    # share ONE (n_chunks, E_pad) shape — a single Mosaic program (remote
    # kernel compiles cost minutes each here) instead of one per bucket. Pad
    # chunks carry zero weights / zero messages aimed at the last tile with
    # first=0, so they accumulate nothing.
    n_max = max(int(p.tile_map.shape[0]) for p in plans)
    n_tiles = -(-n_out // ot)
    plans = [_pad_plan_chunks(p, n_max, n_tiles) for p in plans]
    return BucketedSegReducePlan(
        buckets=tuple(plans), spans=tuple(spans), n_out=int(n_out), ot=int(ot)
    )


def _pad_plan_chunks(p: SegReducePlan, n_chunks: int, n_tiles: int) -> SegReducePlan:
    have = int(p.tile_map.shape[0])
    extra = n_chunks - have
    if extra == 0:
        return p
    ch = p.ch
    # Host plans (device=False) stay host: numpy in -> numpy out.
    xp = np if isinstance(p.gidx, np.ndarray) else jnp
    return SegReducePlan(
        gidx=xp.concatenate([p.gidx, xp.zeros((extra * ch,), p.gidx.dtype)]),
        gw=xp.concatenate([p.gw, xp.zeros((extra * ch,), p.gw.dtype)]),
        seg=xp.concatenate(
            [p.seg, xp.zeros((extra, 8, ch // 8), p.seg.dtype)]
        ),
        tile_map=xp.concatenate(
            [p.tile_map, xp.full((extra,), n_tiles - 1, p.tile_map.dtype)]
        ),
        first=xp.concatenate([p.first, xp.zeros((extra,), p.first.dtype)]),
        n_out=p.n_out,
        ot=p.ot,
        ch=p.ch,
    )


def gather_segreduce_bucketed(
    table: jax.Array,
    plan: BucketedSegReducePlan,
    msgs_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jax.Array:
    """Bucketed :func:`gather_segreduce`: per src range, gather from a static
    table slice (fast-rate sub-table) and chain the kernel passes through the
    running padded accumulator."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = int(table.shape[-1])
    n_tiles = -(-plan.n_out // plan.ot)
    if msgs_dtype == jnp.bfloat16:
        table = table.astype(jnp.bfloat16)
    out = jnp.zeros((n_tiles * plan.ot, d), jnp.float32)
    for (lo, hi), p in zip(plan.spans, plan.buckets):
        sub = jax.lax.slice_in_dim(table, lo, hi)
        out = _segreduce_one(sub, p, msgs_dtype, interpret, out)
    return out[: plan.n_out]
