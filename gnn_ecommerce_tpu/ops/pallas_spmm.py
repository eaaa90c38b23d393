"""Pallas TPU kernels for bipartite SpMM (the LightGCN hot op).

Why a kernel at all: XLA lowers ``x[src] * w -> segment_sum`` as a gather
that materializes the [E, D] message array in HBM plus a scatter-style
reduction — at cosmetics scale that is ~3.3 GB of extra HBM traffic per
layer per direction, and the row gather from a 1.6M-row table is
descriptor-rate-limited rather than bandwidth-limited.

TPU-first observation (same one behind ``ops/bipartite.py``): the ITEM side
of the graph is small — 54.6K rows × 128 padded lanes in bf16 ≈ 14 MB — so
it fits in VMEM. That removes all random HBM access from the item→user
direction (``to_users = Â_ui @ x_items``, the direction that dominates: its
output side has 1.6M rows):

- grid over user-destination row blocks (arcs are dst-sorted, so each block
  owns a contiguous arc range; per-block offsets are scalar-prefetched);
- arc (src, dst_local, w) triples stream HBM→VMEM in fixed chunks with
  double-buffered async DMA overlapped with compute;
- source item rows are gathered from the VMEM-resident table (cheap random
  access), scaled by w;
- accumulation into the [ROWS, D] output tile is a ONE-HOT MXU MATMUL:
  ``out += onehot(dst_local)ᵀ @ msgs`` — scatter-as-matmul, exact in f32,
  E·ROWS·D total flops (≈333 GFLOP at full scale → ms on the MXU) instead
  of a serialized scatter.

HBM traffic per call ≈ arcs (12 B/arc) + output (n_users·D·4) — within ~2×
of the speed-of-light for this op, vs. the XLA path's gather descriptors +
message materialization.

The user→item direction (output side only 54.6K rows) keeps the XLA
sorted-segment path: its sources span the 1.6M-row user table (not VMEM-
resident), and the fast bipartite forward needs it only once per step.

STATUS (measured on v5e, jax 0.9): the kernel is exact in interpret mode
(tests) but does NOT compile on current Mosaic — arbitrary-row VMEM gather
(``table[idx_vector]`` / ``jnp.take``) is unsupported ("Cannot do int
indexing on TPU"; DynamicGatherOp only serves same-shape take_along_axis on
small tiles). Until Mosaic grows row gather, the production path is the XLA
sorted-segment SpMM, which runs at the chip's effective random-row rate
(~60M rows/s measured); the bipartite factorization (ops/bipartite.py)
already minimizes how often that wall is hit (2 SpMMs per forward,
depth-independent). bench.py probes this kernel each run and falls back
automatically, so the day the toolchain supports the gather it lights up.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _to_users_kernel(
    block_starts_ref,  # scalar-prefetch [n_blocks+1]: arc offset per block
    items_ref,         # [I_pad, D_pad] VMEM-resident item embeddings
    src_hbm,           # [E_pad] i32 arc source item ids (dst-sorted arcs)
    dstl_hbm,          # [E_pad] i32 dst - block_row0 (local row in block)
    w_hbm,             # [E_pad] f32 normalized weights (0 on padding)
    out_ref,           # [ROWS, D_pad] this block's output rows
    src_s,             # VMEM scratch [2, C] i32
    dstl_s,            # VMEM scratch [2, C] i32
    w_s,               # VMEM scratch [2, C] f32
    sems,              # DMA semaphores [2, 3]
    *,
    rows: int,
    e_chunk: int,
):
    b = pl.program_id(0)
    start = block_starts_ref[b]
    end = block_starts_ref[b + 1]
    out_ref[:] = jnp.zeros_like(out_ref)
    n_chunks = (end - start + e_chunk - 1) // e_chunk  # per-block dynamic

    def copies(slot, c):
        lo = start + c * e_chunk
        return (
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(lo, e_chunk)], src_s.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                dstl_hbm.at[pl.ds(lo, e_chunk)], dstl_s.at[slot], sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                w_hbm.at[pl.ds(lo, e_chunk)], w_s.at[slot], sems.at[slot, 2]
            ),
        )

    @pl.when(n_chunks > 0)
    def _():
        for dma in copies(0, 0):
            dma.start()

        def chunk_body(c, carry):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for dma in copies(1 - slot, c + 1):
                    dma.start()

            for dma in copies(slot, c):
                dma.wait()
            lo = start + c * e_chunk
            idx = src_s[slot]
            dstl = dstl_s[slot]
            w = w_s[slot]
            # Zero weights on tail arcs belonging to the next block.
            valid = (
                jax.lax.broadcasted_iota(jnp.int32, (e_chunk, 1), 0).squeeze(-1)
                + lo
                < end
            )
            w = jnp.where(valid, w, 0.0)
            rows_g = items_ref[idx]                     # VMEM gather [C, D]
            msgs = rows_g.astype(jnp.float32) * w[:, None]
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (e_chunk, rows), 1)
                == dstl[:, None]
            ).astype(jnp.float32)
            out_ref[:] += jax.lax.dot_general(
                onehot,
                msgs,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk_body, None)


@functools.partial(
    jax.jit, static_argnames=("rows", "e_chunk", "n_users", "dim", "interpret")
)
def _to_users_call(
    block_starts,
    items_pad,
    src,
    dst_local,
    w,
    *,
    rows,
    e_chunk,
    n_users,
    dim,
    interpret=False,
):
    n_blocks = block_starts.shape[0] - 1
    d_pad = items_pad.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # item table, resident
            pl.BlockSpec(memory_space=pl.ANY),   # src stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # dst_local stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # w stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (rows, d_pad), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, e_chunk), jnp.int32),
            pltpu.VMEM((2, e_chunk), jnp.int32),
            pltpu.VMEM((2, e_chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = functools.partial(_to_users_kernel, rows=rows, e_chunk=e_chunk)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * rows, d_pad), jnp.float32),
        interpret=interpret,
    )(block_starts, items_pad, src, dst_local, w)
    return out[:n_users, :dim]


class PallasToUsers:
    """Prepared item→user SpMM: ``out_users = Â_ui @ x_items``.

    Host-side prep (once per static graph): pad arcs so chunk windows never
    run off the arrays, localize dst ids to their row block, record
    per-block arc offsets for scalar prefetch.
    """

    def __init__(
        self,
        iu_src_item: np.ndarray,
        iu_dst_user: np.ndarray,
        iu_w: np.ndarray,
        n_users: int,
        n_items: int,
        rows: int = 256,
        e_chunk: int = 1024,
        interpret: bool = False,
    ):
        self.n_users = int(n_users)
        self.n_items = int(n_items)
        self.rows = rows
        self.e_chunk = e_chunk
        self.interpret = interpret
        dst = np.asarray(iu_dst_user, dtype=np.int64)
        assert (np.diff(dst) >= 0).all(), "arcs must be dst-sorted"
        n_blocks = _round_up(n_users, rows) // rows
        starts = np.searchsorted(dst, np.arange(n_blocks + 1) * rows)
        # Over-pad by one full chunk: a block whose arc range ends near E may
        # read a chunk window extending past it (weights are zeroed there).
        e_pad = _round_up(max(int(len(dst)), 1), e_chunk) + e_chunk
        pad = e_pad - len(dst)
        self.block_starts = jnp.asarray(starts.astype(np.int32))
        self.src = jnp.asarray(
            np.pad(np.asarray(iu_src_item, np.int64), (0, pad)).astype(np.int32)
        )
        dst_local = dst - (dst // rows) * rows
        self.dst_local = jnp.asarray(np.pad(dst_local, (0, pad)).astype(np.int32))
        self.w = jnp.asarray(np.pad(np.asarray(iu_w, np.float32), (0, pad)))

    def __call__(self, x_items: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
        dim = x_items.shape[1]
        d_pad = _round_up(dim, 128)
        i_pad = _round_up(self.n_items, 8)
        items_pad = jnp.zeros((i_pad, d_pad), dtype)
        items_pad = items_pad.at[: self.n_items, :dim].set(x_items.astype(dtype))
        return _to_users_call(
            self.block_starts,
            items_pad,
            self.src,
            self.dst_local,
            self.w,
            rows=self.rows,
            e_chunk=self.e_chunk,
            n_users=self.n_users,
            dim=dim,
            interpret=self.interpret,
        )


def from_split(split, **kwargs) -> "PallasToUsers":
    """Build from an ``ops.bipartite.BipartiteSplit``."""
    return PallasToUsers(
        np.asarray(split.iu_src_item),
        np.asarray(split.iu_dst_user),
        np.asarray(split.iu_w),
        split.n_users,
        split.n_items,
        **kwargs,
    )
