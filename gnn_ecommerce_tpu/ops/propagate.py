"""Graph propagation (SpMM) — the hottest op in the framework.

One LGConv layer of the reference (``src/lightgcn.py:96`` → PyG ``LGConv`` →
``gcn_norm`` + ``torch_scatter`` scatter-add) reduces, with normalization
precomputed at graph build, to a single sparse-dense matmul

    X' = Â X,   Â = D^-1/2 A D^-1/2   (2|E| nonzeros)

This module exposes a stable interface with swappable implementations:

- ``propagate_segment``: gather + ``jax.ops.segment_sum``. XLA lowers this to
  dynamic-gather / scatter-add; it is the correctness oracle (float32
  accumulation) and runs on CPU and TPU.
- the measured-optimal production pair lives in ``ops/spmm_fast.py``
  (degree-binned ELL + gather + Pallas one-hot-MXU segment reduce) and is
  swapped in behind the same interface for benchmarked configurations.
  (A VMEM-resident to_users Pallas SpMM was prototyped and DELETED in
  round 3: Mosaic cannot vector-gather from a VMEM table, and the only
  compilable reformulation — one-hot-matmul gather over all 54.6K items —
  costs |E|·I·D ≈ 44 TFLOP per pass, ~6x slower than the 69 ms ELL path
  even at the chip's peak; see docs/PERFORMANCE.md.)

The edge arrays are sorted by destination (see ``graph/build.py``) so
``indices_are_sorted=True`` lets XLA use a contiguous segment reduction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..graph.build import BipartiteGraph


def _spmm(src, dst, w_norm, num_nodes: int, x):
    msgs = x[src].astype(jnp.float32) * w_norm[:, None]
    out = jax.ops.segment_sum(
        msgs, dst, num_segments=num_nodes, indices_are_sorted=True
    )
    return out.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _spmm_symmetric(x, arcs, w_norm, num_nodes: int):
    src, dst = arcs
    return _spmm(src, dst, w_norm, num_nodes, x)


def _spmm_symmetric_fwd(x, arcs, w_norm, num_nodes):
    return _spmm_symmetric(x, arcs, w_norm, num_nodes), (arcs, w_norm)


def _spmm_symmetric_bwd(num_nodes, res, g):
    # Â is exactly symmetric (both arc directions carry w/sqrt(d_src d_dst)),
    # so grad_x = Âᵀ g = Â g — one more sorted-segment SpMM instead of XLA's
    # unsorted scatter-add transpose, with no saved message residuals.
    (src, dst), w_norm = res
    gx = _spmm(src, dst, w_norm, num_nodes, g)
    return gx, None, jnp.zeros_like(w_norm)


_spmm_symmetric.defvjp(_spmm_symmetric_fwd, _spmm_symmetric_bwd)


def propagate_segment(graph: BipartiteGraph, x: jax.Array) -> jax.Array:
    """One propagation layer: ``out[d] = sum_{e: dst_e = d} w_norm_e * x[src_e]``.

    Accumulates in float32 regardless of ``x.dtype`` (bf16 inputs are upcast
    per-message) to preserve allclose parity with the reference float32 path.
    The backward pass exploits Â's exact symmetry (see ``_spmm_symmetric_bwd``).
    """
    return _spmm_symmetric(x, (graph.src, graph.dst), graph.w_norm, graph.num_nodes)


def propagate_segment_chunked(
    graph: BipartiteGraph, x: jax.Array, num_chunks: int = 8
) -> jax.Array:
    """Memory-bounded variant: arcs processed in ``num_chunks`` sequential
    chunks (peak message temp = 2|E|/num_chunks × dim instead of 2|E| × dim).

    Arc count must not be assumed divisible: the tail chunk is padded to the
    chunk size with null arcs (src=dst=0, w=0), which contribute nothing.
    """
    n_arcs = graph.src.shape[0]
    chunk = -(-n_arcs // num_chunks)
    pad = chunk * num_chunks - n_arcs
    src = jnp.pad(graph.src, (0, pad))
    dst = jnp.pad(graph.dst, (0, pad))
    w = jnp.pad(graph.w_norm, (0, pad))
    src = src.reshape(num_chunks, chunk)
    dst = dst.reshape(num_chunks, chunk)
    w = w.reshape(num_chunks, chunk)

    def body(acc, inputs):
        s, d, wc = inputs
        msgs = x[s].astype(jnp.float32) * wc[:, None]
        acc = acc + jax.ops.segment_sum(msgs, d, num_segments=graph.num_nodes)
        return acc, None

    out0 = jnp.zeros((graph.num_nodes, x.shape[1]), jnp.float32)
    out, _ = jax.lax.scan(body, out0, (src, dst, w))
    return out.astype(x.dtype)


# Implementation registry: name -> fn(graph, x) -> x' (alternate kernels
# register here via register_impl).
_IMPLEMENTATIONS = {
    "segment": propagate_segment,
    "segment_chunked": propagate_segment_chunked,
}


def register_impl(name: str, fn) -> None:
    _IMPLEMENTATIONS[name] = fn


@partial(jax.jit, static_argnames=("impl",))
def propagate(graph: BipartiteGraph, x: jax.Array, impl: str = "segment") -> jax.Array:
    return _IMPLEMENTATIONS[impl](graph, x)
