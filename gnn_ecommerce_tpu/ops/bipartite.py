"""Bipartite-factorized LightGCN propagation — the flagship TPU-first design.

The reference (and our layered oracle path) runs 2·L sparse gather/scatter
SpMMs per forward pass (L LGConv layers over the unified node space,
``src/lightgcn.py:91-99``). On TPU, arbitrary-row gather/scatter is
descriptor-rate-limited (~100 GB/s measured vs ~800 GB/s HBM), so sparse ops
are the wall. This module removes almost all of them with an algebraic
restructure that is exact (no approximation beyond float arithmetic):

Propagation alternates sides of the bipartite graph:

    u^{l+1} = Â_ui · i^l          i^{l+1} = Â_iu · u^l

so every item layer for l ≥ 2 satisfies  i^{l+1} = (Â_iu Â_ui) · i^{l-1}
=: B_ii · i^{l-1}, where B_ii is the ITEM-ITEM 2-hop operator — a dense
[n_items, n_items] matrix (items number ~54.6K at cosmetics scale: 6 GB in
bf16) that the MXU multiplies in milliseconds. The user-side layers only
matter through the final alpha-weighted sum:

    out_u = α_0 E_u + Â_ui · S_i,     S_i = Σ_{l=1..L} α_l i^{l-1}
    out_i = Σ_l α_l i^l,              i^1 = Â_iu · E_u

Total sparse work per forward: exactly TWO big SpMMs (one per direction),
independent of depth — plus (L-1) dense B_ii matmuls. Backward is symmetric
(Â_ui^T = Â_iu exactly; B_ii^T = B_ii), so a train step needs 4 big SpMMs
total instead of 6·L gather/scatter passes.

B_ii is precomputed once per (static) graph on device: degree-binned — light
users contribute W-padded outer products via scatter-add; heavy users are
densified per chunk and contribute via MXU matmuls (Σ_u deg_u² flops would
explode through the scatter path for power-law tails).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.build import BipartiteGraph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteSplit:
    """Direction-split arc lists (derived from the unified sorted-by-dst
    arrays — arcs with dst < n_users form the item→user prefix)."""

    # items → users (output users): sorted by dst user
    iu_src_item: jax.Array   # [E] local item ids
    iu_dst_user: jax.Array   # [E] user ids
    iu_w: jax.Array          # [E] normalized weights
    iu_indptr: jax.Array     # [n_users+1] CSR offsets into the iu arrays
    # users → items (output items): sorted by dst item
    ui_src_user: jax.Array   # [E] user ids
    ui_dst_item: jax.Array   # [E] local item ids
    ui_w: jax.Array          # [E] normalized weights
    n_users: int = dataclasses.field(metadata=dict(static=True))
    n_items: int = dataclasses.field(metadata=dict(static=True))


def split_graph(graph: BipartiteGraph) -> BipartiteSplit:
    n_users = graph.n_users
    # Unified arcs are sorted by dst; user-destinations are the prefix.
    dst_host = np.asarray(graph.dst)
    n_iu = int(np.searchsorted(dst_host, n_users))
    iu_indptr = np.searchsorted(
        dst_host[:n_iu], np.arange(n_users + 1, dtype=np.int64)
    ).astype(np.int32)
    return BipartiteSplit(
        iu_src_item=graph.src[:n_iu] - n_users,
        iu_dst_user=graph.dst[:n_iu],
        iu_w=graph.w_norm[:n_iu],
        iu_indptr=jnp.asarray(iu_indptr),
        ui_src_user=graph.src[n_iu:],
        ui_dst_item=graph.dst[n_iu:] - n_users,
        ui_w=graph.w_norm[n_iu:],
        n_users=n_users,
        n_items=graph.n_items,
    )


def _seg_spmm(x, src, dst, w, n_out: int):
    msgs = x[src].astype(jnp.float32) * w[:, None]
    return jax.ops.segment_sum(msgs, dst, num_segments=n_out, indices_are_sorted=True)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def to_users(x_items, split: BipartiteSplit, _tag: str = "iu"):
    """out_users = Â_ui · x_items (one big SpMM, sorted destinations)."""
    return _seg_spmm(
        x_items, split.iu_src_item, split.iu_dst_user, split.iu_w, split.n_users
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def to_items(x_users, split: BipartiteSplit, _tag: str = "ui"):
    """out_items = Â_iu · x_users (one big SpMM, sorted destinations)."""
    return _seg_spmm(
        x_users, split.ui_src_user, split.ui_dst_item, split.ui_w, split.n_items
    )


# ---------------------------------------------------------------------------
# Measured-optimal SpMM pair (see ops/spmm_fast.py for the microbench story):
# to_items = arc-major gather + Pallas one-hot-MXU segment reduce;
# to_users = degree-binned ELL gather + fused static-axis sum.
# Exact restructurings (summation order differs); self-transpose VJPs.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FastOps:
    """Precomputed plans for both hot SpMM directions (static graph).

    Optional dense-heavy-user hybrid (``heavy_users > 0``): arbitrary-row
    gathers are descriptor-rate-limited (~9.5 ns/row measured, independent of
    row width), so each arc of a high-degree user re-pays the descriptor cost
    for the SAME table row. The top-K users by degree (power-law head — a
    large arc share) are pulled out of both sparse plans and their normalized
    weights densified into ONE [n_items, K] matrix ``w_hi`` that serves both
    directions on the MXU at HBM streaming rate:

        to_items += w_hi  @ x_users[hi_ids]      (K-row gather, tiny)
        to_users[hi_ids] += w_hiᵀ @ x_items      (K-row scatter, tiny)

    Exact restructure (w_hiᵀ is shared, so the pair stays self-transpose);
    ``heavy_dtype="bfloat16"`` rounds each stored weight once (training
    mode), ``"float32"`` keeps exactness for allclose parity.
    """

    items_plan: "object"   # SegReducePlan: gather users → reduce to items
    users_ell: "object"    # EllPlan: gather items → reduce to users
    hi_ids: jax.Array | None = None   # [K] int32 heavy user ids
    w_hi: jax.Array | None = None     # [n_items, K] dense normalized weights
    msgs_dtype: str = dataclasses.field(
        default="float32", metadata=dict(static=True)
    )


def _mm_precision(dtype):
    # XLA's default f32 dot on TPU is a single bf16 MXU pass (~5e-3 relative
    # error measured); exact mode needs HIGHEST.
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def split_heavy_users(
    split: BipartiteSplit, heavy_users: int, heavy_dtype: str,
    build_head: bool = True,
) -> tuple:
    """Extract the dense heavy-user head and return the sparse TAIL arcs.

    Shared by the single-chip (:func:`build_fast_ops`), sharded
    (``ops/spmm_sharded.build_sharded_fast_ops``) and fast-edge-partition
    (``parallel/edge_partition_fast.py``) plan builders. Returns
    ``(hi_ids, w_hi, ui_src, ui_dst, ui_w, iu_indptr, iu_src, iu_w,
    head_coo)`` where ``hi_ids``/``w_hi`` are None when no head is built,
    the arc arrays are the tail (heavy users' arcs removed from BOTH
    directions), and ``head_coo = (keys, w_sum)`` is the deduplicated host
    COO of the head — ``keys = item_id * len(hi_ids) + rank`` sorted
    ascending — for callers laying the head out differently (per-shard
    column blocks).

    ``build_head=False`` skips constructing the dense ``w_hi`` on device
    (still returns ``hi_ids``, ``head_coo`` and the same tail) — for callers
    rebuilding an alternate tail plan that will SHARE an existing head (the
    [n_items, K] head is ~1.8 GB bf16 at cosmetics scale; don't duplicate
    it), or laying the head out per shard.
    """
    ui_src = np.asarray(split.ui_src_user)
    ui_dst = np.asarray(split.ui_dst_item)
    ui_w = np.asarray(split.ui_w)
    iu_indptr = np.asarray(split.iu_indptr)
    iu_src = np.asarray(split.iu_src_item)
    iu_w = np.asarray(split.iu_w)
    n_users, n_items = split.n_users, split.n_items

    hi_ids = w_hi = head_coo = None
    if heavy_users > 0:
        deg = np.bincount(ui_src, minlength=n_users)
        k = min(int(heavy_users), n_users)
        hi = np.argpartition(-deg, k - 1)[:k] if k < n_users else np.arange(n_users)
        hi = np.sort(hi[deg[hi] > 0])
        if len(hi):
            rank = np.full(n_users, -1, np.int64)
            rank[hi] = np.arange(len(hi))
            m = rank[ui_src] >= 0
            # Sum duplicate (item, user) arcs before the fill (plain
            # assignment would keep only the LAST weight while the sparse
            # plans sum them — build_graph does not deduplicate edge rows).
            key = ui_dst[m].astype(np.int64) * len(hi) + rank[ui_src[m]]
            order = np.argsort(key, kind="stable")
            key_s, w_s = key[order], ui_w[m][order].astype(np.float32)
            uniq, start = np.unique(key_s, return_index=True)
            w_sum = np.add.reduceat(w_s, start) if len(start) else w_s
            head_coo = (uniq, w_sum)
            # Build W ON DEVICE from the deduplicated COO: uploading a dense
            # [n_items, K] head (1.8 GB bf16 at bench scale) costs 50-160 s
            # through the tunnel; the COO is ~27 MB and one unique-index
            # scatter fills it in milliseconds.
            if build_head:
                dt = jnp.bfloat16 if heavy_dtype == "bfloat16" else jnp.float32
                w_hi = (
                    jnp.zeros((n_items * len(hi),), dt)
                    .at[jnp.asarray(uniq.astype(np.int64))]
                    .set(jnp.asarray(w_sum).astype(dt), unique_indices=True)
                    .reshape(n_items, len(hi))
                )
            hi_ids = jnp.asarray(hi.astype(np.int32))
            # Tail arcs only (both directions drop the heavy users' arcs).
            keep = ~m
            ui_src, ui_dst, ui_w = ui_src[keep], ui_dst[keep], ui_w[keep]
            deg_iu = np.diff(iu_indptr)
            keep_iu = np.repeat(rank < 0, deg_iu)
            deg_tail = np.where(rank < 0, deg_iu, 0)
            iu_indptr = np.append(0, np.cumsum(deg_tail))
            iu_src, iu_w = iu_src[keep_iu], iu_w[keep_iu]
    return hi_ids, w_hi, ui_src, ui_dst, ui_w, iu_indptr, iu_src, iu_w, head_coo


def build_fast_ops(
    split: BipartiteSplit,
    msgs_dtype: str = "float32",
    heavy_users: int = 0,
    heavy_dtype: str = "float32",
    src_buckets: int = 0,
) -> FastOps:
    """``src_buckets > 0`` builds the to_items gather plan bucketed by src
    user range (``spmm_fast.BucketedSegReducePlan``): the arbitrary-row
    gather rate cliffs with table size on the target chip (~161M rows/s from
    ≤262K-row tables vs ~96M from the 1.64M-row user table, scripts/
    microbench_r3*_results.json), so each bucket gathers from a ≤262K-row
    static slice at the fast rate. Exact restructure (per-tile summation
    order becomes bucket-major)."""
    from .spmm_fast import (
        build_bucketed_segreduce_plan,
        build_ell_plan,
        build_segreduce_plan,
    )

    n_users, n_items = split.n_users, split.n_items
    hi_ids, w_hi, ui_src, ui_dst, ui_w, iu_indptr, iu_src, iu_w, _ = (
        split_heavy_users(split, heavy_users, heavy_dtype)
    )

    if src_buckets > 0:
        items_plan = build_bucketed_segreduce_plan(
            ui_src, ui_dst, ui_w, n_items, n_src=n_users, n_buckets=src_buckets
        )
    else:
        items_plan = build_segreduce_plan(ui_src, ui_dst, ui_w, n_items)
    users_ell = build_ell_plan(iu_indptr, iu_src, iu_w, n_users)
    return FastOps(
        items_plan=items_plan,
        users_ell=users_ell,
        hi_ids=hi_ids,
        w_hi=w_hi,
        msgs_dtype=msgs_dtype,
    )


@jax.custom_vjp
def fast_to_items(x_users, fops: FastOps):
    """out_items = Â_iu · x_users via gather + Pallas segment reduce
    (+ optional dense MXU matmul for the heavy-user head)."""
    from .spmm_fast import (
        BucketedSegReducePlan,
        gather_segreduce,
        gather_segreduce_bucketed,
    )

    reduce_fn = (
        gather_segreduce_bucketed
        if isinstance(fops.items_plan, BucketedSegReducePlan)
        else gather_segreduce
    )
    out = reduce_fn(
        x_users,
        fops.items_plan,
        msgs_dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            fops.msgs_dtype
        ],
    )
    if fops.w_hi is not None:
        xh = jnp.take(x_users, fops.hi_ids, axis=0).astype(fops.w_hi.dtype)
        out = out + jnp.dot(
            fops.w_hi,
            xh,
            preferred_element_type=jnp.float32,
            precision=_mm_precision(fops.w_hi.dtype),
        )
    return out


@jax.custom_vjp
def fast_to_users(x_items, fops: FastOps):
    """out_users = Â_ui · x_items via degree-binned ELL (+ optional dense
    MXU matmul for the heavy-user head)."""
    from .spmm_fast import ell_apply

    out = ell_apply(
        x_items,
        fops.users_ell,
        gather_dtype=jnp.bfloat16 if fops.msgs_dtype == "bfloat16" else None,
    )
    if fops.w_hi is not None:
        heavy = jnp.dot(
            fops.w_hi.T,
            x_items.astype(fops.w_hi.dtype),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(fops.w_hi.dtype),
        )
        out = out.at[fops.hi_ids].add(heavy)
    return out


def _fast_to_items_fwd(x_users, fops):
    return fast_to_items(x_users, fops), fops


def _fast_to_items_bwd(fops, g):
    # (Â_iu)^T = Â_ui: the cotangent flows through the users-direction op.
    return fast_to_users(g, fops), None


def _fast_to_users_fwd(x_items, fops):
    return fast_to_users(x_items, fops), fops


def _fast_to_users_bwd(fops, g):
    return fast_to_items(g, fops), None


fast_to_items.defvjp(_fast_to_items_fwd, _fast_to_items_bwd)
fast_to_users.defvjp(_fast_to_users_fwd, _fast_to_users_bwd)


def _to_users_fwd(x_items, split, _tag):
    return to_users(x_items, split, _tag), split


def _to_users_bwd(_tag, split, g):
    # (Â_ui)^T = Â_iu exactly (symmetric normalization, duplicated arcs).
    return to_items(g, split), None


def _to_items_fwd(x_users, split, _tag):
    return to_items(x_users, split, _tag), split


def _to_items_bwd(_tag, split, g):
    return to_users(g, split), None


to_users.defvjp(_to_users_fwd, _to_users_bwd)
to_items.defvjp(_to_items_fwd, _to_items_bwd)


# ---------------------------------------------------------------------------
# Item-item 2-hop operator
# ---------------------------------------------------------------------------


def build_item_operator(
    split: BipartiteSplit,
    dtype=jnp.float32,
    ell_width: int = 8,
    heavy_chunk: int = 512,
    scatter_chunk: int = 8_000_000,
    band_bytes: float = 2.5e9,
    verbose: bool = False,
) -> jax.Array:
    """Compute dense B_ii = Â_iu · Â_ui  [n_items, n_items] on device.

    B_ii[a, b] = Σ_u Âiu[a, u] · Âui[u, b] — a sum of per-user outer products
    of their (item, weight) incidence vectors. Two TPU constraints shape the
    algorithm:

    - a float32 [I, I] accumulator is ~12 GB at cosmetics scale, and TPU
      scatter indices of shape [N, 2] are tile-padded 64× (minor dim 2 → 128),
      so B is built in ROW BANDS: an f32 [R, I] band accumulator with FLAT
      1-D int32 indices ((a - band_start)·I + b, kept < 2^31 by the band
      split), each band cast to ``dtype`` before the next starts — peak HBM
      is one f32 band + the finished bf16 bands;
    - users are degree-binned (power-law tail): deg ≤ ell_width users'
      Σ deg² outer-product contributions are aggregated HOST-SIDE into a
      deduplicated (a, b, v) COO sorted by (a, b) (``native.pair_aggregate``,
      O(P + I) counting sorts in C++), so the device does ONE sorted
      exactly-once scatter per band instead of Σ deg² unsorted padded
      updates; heavier users are densified per ``heavy_chunk`` into M [I, C]
      and contribute via MXU matmuls  band += M[band] @ Mᵀ.

    Accumulation is float32 throughout; returns B in ``dtype``.
    """
    n_items = split.n_items

    def flat_positions(counts: np.ndarray) -> np.ndarray:
        # position-within-run for run-length-encoded rows, vectorized.
        starts = np.repeat(np.cumsum(np.append(0, counts[:-1])), counts)
        return np.arange(counts.sum(), dtype=np.int64) - starts

    import sys
    import time as _time

    _t0 = _time.perf_counter()
    _last = [_t0]

    def _phase(name):
        if verbose:
            now = _time.perf_counter()
            print(
                f"  b_ii phase {name}: +{now - _last[0]:.1f}s "
                f"(total {now - _t0:.1f}s)",
                file=sys.stderr, flush=True,
            )
            _last[0] = now

    # Host-side CSR over users of the ui direction (src user -> (item, w)).
    ui_user = np.asarray(split.ui_src_user)
    ui_item = np.asarray(split.ui_dst_item)
    ui_w = np.asarray(split.ui_w)
    order = np.argsort(ui_user, kind="stable")
    ui_user, ui_item, ui_w = ui_user[order], ui_item[order], ui_w[order]
    users, first = np.unique(ui_user, return_index=True)
    counts = np.diff(np.append(first, len(ui_user)))

    # Band split: f32 band ≤ band_bytes AND R·I < 2^31 (flat int32 indices).
    n_bands = max(1, int(np.ceil(n_items * n_items * 4 / band_bytes)))
    while -(-n_items // n_bands) * n_items >= 2**31:
        n_bands += 1
    R = -(-n_items // n_bands)

    # --- host-side degree binning (shared across bands) ---
    # Light users: host-native pair aggregation into a (a, b, v) COO sorted
    # by (a, b) — band slices are contiguous ranges found by searchsorted.
    from .. import native

    user_indptr = np.append(first, len(ui_user))
    _phase("host csr")
    coo_a, coo_b, coo_v = native.pair_aggregate(
        user_indptr, ui_item, ui_w.astype(np.float32), n_items, ell_width
    )
    _phase(f"pair_aggregate ({len(coo_a)} pairs)")
    heavy = counts > ell_width
    h_first, h_counts = first[heavy], counts[heavy]

    @partial(jax.jit, donate_argnums=(0,))
    def scatter_coo_band(Bb, flat_idx, vals):
        # Sorted exactly-once flat int32 scatter of aggregated pairs
        # (padding entries carry index R·I and mode="drop" discards them).
        out = Bb.reshape(-1).at[flat_idx].add(
            vals, mode="drop", indices_are_sorted=True, unique_indices=True
        )
        return out.reshape(Bb.shape)

    # Matmul input precision follows the requested output dtype: bf16 inputs
    # with f32 accumulation in benchmarked (bf16) mode, f32 end-to-end when
    # the caller wants exactness.
    mm_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    @partial(jax.jit, donate_argnums=(0,))
    def dense_accum_scan(Bb, rows_st, items_st, vals_st, a0):
        # Scan over a stack of same-capacity heavy chunks: densify each into
        # M (rows padded to R·n_bands so every band slice is full-height),
        # then band += M[a0:a0+R] @ Mᵀ[:I] on the MXU. One dispatch per
        # (band, bucket) group; a0 is traced so one compile serves all bands.
        def body(Bb, chunk):
            cols, items_idx, vals = chunk
            M = jnp.zeros((R * n_bands * heavy_chunk,), jnp.float32)
            M = M.at[items_idx * heavy_chunk + cols].add(vals, mode="drop")
            M = M.reshape(R * n_bands, heavy_chunk).astype(mm_dtype)
            band_rows = jax.lax.dynamic_slice_in_dim(M, a0, R, axis=0)
            return (
                Bb
                + jnp.dot(
                    band_rows, M[:n_items].T, preferred_element_type=jnp.float32
                ),
                None,
            )

        Bb, _ = jax.lax.scan(body, Bb, (rows_st, items_st, vals_st))
        return Bb

    # Fixed chunk capacities so every device call hits ONE compiled program
    # (variable tails would recompile per chunk through the TPU compiler).
    band_bounds = [
        (int(np.searchsorted(coo_a, b * R)), int(np.searchsorted(coo_a, (b + 1) * R)))
        for b in range(n_bands)
    ]
    max_band = max((hi - lo for lo, hi in band_bounds), default=0)
    s_cap = min(scatter_chunk, max(max_band, 1))
    # Heavy chunks pad their edge arrays to power-of-2 buckets: one compiled
    # program per bucket size (a handful) instead of padding every chunk to
    # the global max (with a power-law tail that wasted ~4x scatter work per
    # band on padding).
    def bucket(n: int) -> int:
        b = 4096
        while b < n:
            b *= 2
        return b

    heavy_chunks = [
        (s, int(h_counts[s : s + heavy_chunk].sum()))
        for s in range(0, len(h_first), heavy_chunk)
    ]
    # Upload heavy chunk arrays ONCE, grouped by bucket capacity; each group
    # is a stacked [n_chunks_in_group, cap] array scanned per band.
    heavy_groups = {}
    for s, nnz in heavy_chunks:
        f_c = h_first[s : s + heavy_chunk]
        c_c = h_counts[s : s + heavy_chunk]
        rows = np.repeat(np.arange(len(f_c)), c_c).astype(np.int32)
        take = np.repeat(f_c, c_c) + flat_positions(c_c)
        cap = bucket(nnz)
        heavy_groups.setdefault(cap, []).append(
            (rows, ui_item[take].astype(np.int32), ui_w[take].astype(np.float32))
        )

    def stack_padded(group, cap):
        n = len(group)
        rows_st = np.zeros((n, cap), np.int32)
        items_st = np.zeros((n, cap), np.int32)
        vals_st = np.zeros((n, cap), np.float32)
        for j, (r, it, v) in enumerate(group):
            rows_st[j, : len(r)] = r
            items_st[j, : len(it)] = it
            vals_st[j, : len(v)] = v
        return jnp.asarray(rows_st), jnp.asarray(items_st), jnp.asarray(vals_st)

    heavy_stacks = [
        stack_padded(group, cap) for cap, group in sorted(heavy_groups.items())
    ]
    if verbose:
        jax.block_until_ready([s[0] for s in heavy_stacks] or [jnp.zeros(())])
    _phase(
        f"heavy prep/upload ({len(h_first)} users, "
        f"{sum(s[0].size for s in heavy_stacks)} padded slots)"
    )

    # Preallocated output; bands commit in place (donated) so peak HBM is
    # one f32 band + its matmul temp + this buffer — never a concat spike.
    B = jnp.zeros((R * n_bands, n_items), dtype)

    @partial(jax.jit, donate_argnums=(0, 1))
    def commit_band(B, Bb, a0):
        return jax.lax.dynamic_update_slice(B, Bb.astype(dtype), (a0, 0))

    for b in range(n_bands):
        a0 = b * R
        Bb = jnp.zeros((R, n_items), jnp.float32)
        lo, hi = band_bounds[b]
        if hi > lo:
            band_flat = ((coo_a[lo:hi] - a0) * n_items + coo_b[lo:hi]).astype(np.int32)
            band_vals = coo_v[lo:hi].astype(np.float32)
            for s in range(0, len(band_flat), s_cap):
                chunk_f = band_flat[s : s + s_cap]
                chunk_v = band_vals[s : s + s_cap]
                if len(chunk_f) < s_cap:
                    # Distinct out-of-range pad indices keep the
                    # unique_indices/sorted promises honest; mode="drop".
                    pad_idx = R * n_items + np.arange(
                        s_cap - len(chunk_f), dtype=np.int64
                    )
                    pad_idx = np.minimum(pad_idx, np.iinfo(np.int32).max).astype(
                        np.int32
                    )
                    chunk_f = np.concatenate([chunk_f, pad_idx])
                    chunk_v = np.concatenate(
                        [chunk_v, np.zeros(s_cap - len(chunk_v), np.float32)]
                    )
                Bb = scatter_coo_band(Bb, jnp.asarray(chunk_f), jnp.asarray(chunk_v))
        if verbose:
            jax.block_until_ready(Bb)
        _phase(f"band {b} scatter")
        for rows_st, items_st, vals_st in heavy_stacks:
            Bb = dense_accum_scan(Bb, rows_st, items_st, vals_st, a0)
        if verbose:
            jax.block_until_ready(Bb)
        _phase(f"band {b} matmul")
        B = commit_band(B, Bb, a0)
        del Bb
    if R * n_bands != n_items:
        B = B[:n_items]
    return B


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FastBipartite:
    """Everything the fast forward needs: split arcs + dense 2-hop operator
    (+ optionally the measured-optimal SpMM plans: a :class:`FastOps` on one
    chip, or an ``ops.spmm_sharded.ShardedFastOps`` on a mesh)."""

    split: BipartiteSplit
    item_op: jax.Array  # [I, I] B_ii (f32 or bf16)
    fops: object | None = None

    @property
    def n_users(self) -> int:
        return self.split.n_users

    @property
    def n_items(self) -> int:
        return self.split.n_items

    def _to_items(self, x_users):
        if self.fops is not None:
            if isinstance(self.fops, FastOps):
                return fast_to_items(x_users, self.fops)
            from .spmm_sharded import sharded_to_items

            return sharded_to_items(x_users, self.fops)
        return to_items(x_users, self.split)

    def _to_users(self, x_items):
        if self.fops is not None:
            if isinstance(self.fops, FastOps):
                return fast_to_users(x_items, self.fops)
            from .spmm_sharded import sharded_to_users

            return sharded_to_users(x_items, self.fops)
        return to_users(x_items, self.split)


def build_fast_bipartite(
    graph: BipartiteGraph,
    dtype=jnp.float32,
    fast_ops: bool = False,
    msgs_dtype: str = "float32",
    heavy_users: int = 0,
    heavy_dtype: str = "float32",
    src_buckets: int = 0,
    band_bytes: float | None = None,
) -> FastBipartite:
    split = split_graph(graph)
    if band_bytes is None:
        # The heavy-user head (w_hi, ~1.8 GB bf16 at cosmetics scale) is
        # already resident while B_ii accumulates — shrink the f32 band.
        band_bytes = 1.5e9 if (fast_ops and heavy_users > 0) else 2.5e9
    fops_box: list = [None]
    thread = None
    if fast_ops:
        # Overlap the plan build (host CPU + small uploads) with the B_ii
        # build's device dispatches — measured to hide 30-60 s of the
        # one-time cost at cosmetics scale (same trick as bench.py).
        import threading

        err_box: list = [None]

        def _build():
            try:
                fops_box[0] = build_fast_ops(
                    split,
                    msgs_dtype=msgs_dtype,
                    heavy_users=heavy_users,
                    heavy_dtype=heavy_dtype,
                    src_buckets=src_buckets,
                )
            except BaseException as e:  # re-raised on the caller's thread
                err_box[0] = e

        thread = threading.Thread(target=_build, daemon=True)
        thread.start()
    item_op = build_item_operator(split, dtype=dtype, band_bytes=band_bytes)
    if thread is not None:
        thread.join()
        if err_box[0] is not None:
            raise err_box[0]
    return FastBipartite(split=split, item_op=item_op, fops=fops_box[0])


def item_chain_core(E_u, E_i, to_items_fn, B, num_layers: int, alpha):
    """The item-side layer chain, parameterized over the to_items SpMM and
    the (possibly row-padded / row-sharded) dense operator B.

    Shared by the single-chip fast paths (via :func:`_item_chain`) and the
    fast edge-partition strategy (``parallel/edge_partition_fast.py``, where
    ``E_u`` is user-row-sharded and ``to_items_fn`` is the shard_map op).
    Returns (out_i, S_i): the full [n_items, D] final item embedding and the
    alpha-weighted item source that to_users consumes (module docstring
    algebra).
    """
    # Item chain: i^0 = E_i, i^1 = Â_iu E_u, i^{l} = B_ii i^{l-2}. Levels are
    # computed two at a time — B @ [i^{l-2} | i^{l-1}] — so the (6 GB at
    # cosmetics scale, bandwidth-bound) B matrix streams from HBM once per
    # PAIR of layers instead of once per layer.
    i_seq = [E_i.astype(jnp.float32), to_items_fn(E_u)]
    n_items = E_i.shape[0]  # B may carry zero row-padding (mesh divisibility)
    D = E_i.shape[1]
    l = 2
    while l <= num_layers:
        if l + 1 <= num_layers:
            both = jnp.concatenate(
                [i_seq[l - 2].astype(B.dtype), i_seq[l - 1].astype(B.dtype)], axis=1
            )
            nxt = jnp.dot(B, both, preferred_element_type=jnp.float32)[:n_items]
            i_seq.append(nxt[:, :D])
            i_seq.append(nxt[:, D:])
            l += 2
        else:
            i_seq.append(
                jnp.dot(
                    B, i_seq[l - 2].astype(B.dtype), preferred_element_type=jnp.float32
                )[:n_items]
            )
            l += 1

    out_i = sum(alpha[l] * i_seq[l] for l in range(num_layers + 1))
    S_i = sum(alpha[l] * i_seq[l - 1] for l in range(1, num_layers + 1))
    return out_i, S_i


def _item_chain(params: dict, fb: FastBipartite, num_layers: int, alpha):
    """Single-chip/GSPMD wrapper of :func:`item_chain_core` over the unified
    embedding table. Returns (E_u, out_i, S_i)."""
    E = params["embedding"]
    n_users = fb.n_users
    E_u, E_i = E[:n_users], E[n_users:]
    out_i, S_i = item_chain_core(
        E_u, E_i, fb._to_items, fb.item_op, num_layers, alpha
    )
    return E_u, out_i, S_i


def fast_get_embedding(
    params: dict,
    fb: FastBipartite,
    num_layers: int,
    alpha=None,
    to_users_fn=None,
) -> jax.Array:
    """Alpha-weighted LightGCN embedding via the 2-SpMM factorization.

    Exact restructure of reference ``get_embedding`` (``src/lightgcn.py:
    91-99``); see module docstring for the algebra. Returns the unified
    [n_users + n_items, D] final embedding. ``to_users_fn`` (e.g. from
    a custom kernel) overrides the XLA segment-sum to_users.
    """
    if alpha is None:
        alpha = jnp.full((num_layers + 1,), 1.0 / (num_layers + 1), jnp.float32)
    E = params["embedding"]
    E_u, out_i, S_i = _item_chain(params, fb, num_layers, alpha)
    users_of = to_users_fn if to_users_fn is not None else fb._to_users
    out_u = alpha[0] * E_u.astype(jnp.float32) + users_of(S_i)
    return jnp.concatenate([out_u, out_i], axis=0).astype(E.dtype)


def fast_batch_embeddings(
    params: dict,
    fb: FastBipartite,
    num_layers: int,
    users: jax.Array,
    pos: jax.Array,
    neg: jax.Array,
    edge_cap: int,
    alpha=None,
):
    """Final embeddings for ONE BPR batch — the training-step fast path.

    The full forward runs two |E|-sized SpMMs; with descriptor-rate-limited
    gathers (~60M rows/s on this chip) those dominate the train step. But a
    BPR step only reads ``out_u`` at the [B] batch users (the reference
    indexes the full propagated table, ``src/lightgcn.py:118-125`` via
    ``train_lightgcn.py:137-141``), so the to_users side shrinks from all
    10.16M arcs to the batch users' own arcs (~6 per user): gather their CSR
    rows into a fixed ``edge_cap`` buffer and segment-sum by batch slot.
    Items still need the full chain (S_i feeds every user), so to_items
    stays global — per train step this removes the full to_users from the
    forward AND (by vjp symmetry) the full to_items from the backward,
    halving the sparse work.

    Returns (u_out, p_out, n_out, dropped): [B, D] f32 final embeddings for
    the batch users / positive items / negative items (node-space ids for
    pos/neg, as sampled), and the number of batch arcs dropped because the
    batch's total degree exceeded ``edge_cap`` (0 in any healthy config —
    size edge_cap >> B·mean_degree; it is reported as a train metric).
    """
    if alpha is None:
        alpha = jnp.full((num_layers + 1,), 1.0 / (num_layers + 1), jnp.float32)
    E_u, out_i, S_i = _item_chain(params, fb, num_layers, alpha)
    split = fb.split
    B = users.shape[0]

    # Batch users' arc slices from the per-user CSR over the iu direction.
    start = split.iu_indptr[users]
    deg = split.iu_indptr[users + 1] - start
    cum = jnp.cumsum(deg)
    total = cum[-1]
    k = jnp.arange(edge_cap, dtype=jnp.int32)
    slot = jnp.searchsorted(cum, k, side="right").astype(jnp.int32)
    slot_c = jnp.minimum(slot, B - 1)
    valid = k < total
    base = cum - deg
    e_idx = jnp.where(valid, start[slot_c] + (k - base[slot_c]), 0)
    item = split.iu_src_item[e_idx]
    w = jnp.where(valid, split.iu_w[e_idx], 0.0)
    msgs = S_i[item] * w[:, None]
    agg = jax.ops.segment_sum(msgs, slot_c, num_segments=B, indices_are_sorted=True)
    u_out = alpha[0] * E_u[users].astype(jnp.float32) + agg

    n_users = split.n_users
    p_out = out_i[pos - n_users]
    n_out = out_i[neg - n_users]
    dropped = jnp.maximum(total - edge_cap, 0)
    return u_out, p_out, n_out, dropped
