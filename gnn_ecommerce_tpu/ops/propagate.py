"""Graph propagation (SpMM) — the hottest op in the framework.

One LGConv layer of the reference (``src/lightgcn.py:96`` → PyG ``LGConv`` →
``gcn_norm`` + ``torch_scatter`` scatter-add) reduces, with normalization
precomputed at graph build, to a single sparse-dense matmul

    X' = Â X,   Â = D^-1/2 A D^-1/2   (2|E| nonzeros)

This module exposes a stable interface with swappable implementations:

- ``propagate_segment``: gather + ``jax.ops.segment_sum``. XLA lowers this to
  dynamic-gather / scatter-add; it is the correctness oracle (float32
  accumulation) and runs on CPU and TPU.
- a Pallas ELL kernel (``gnn_ecommerce_tpu.ops.pallas_spmm``) is swapped in
  behind the same interface for benchmarked configurations.

The edge arrays are sorted by destination (see ``graph/build.py``) so
``indices_are_sorted=True`` lets XLA use a contiguous segment reduction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..graph.build import BipartiteGraph


def propagate_segment(graph: BipartiteGraph, x: jax.Array) -> jax.Array:
    """One propagation layer: ``out[d] = sum_{e: dst_e = d} w_norm_e * x[src_e]``.

    Accumulates in float32 regardless of ``x.dtype`` (bf16 inputs are upcast
    per-message) to preserve allclose parity with the reference float32 path.
    """
    msgs = x[graph.src].astype(jnp.float32) * graph.w_norm[:, None]
    out = jax.ops.segment_sum(
        msgs,
        graph.dst,
        num_segments=graph.num_nodes,
        indices_are_sorted=True,
    )
    return out.astype(x.dtype)


# Implementation registry: name -> fn(graph, x) -> x'. The Pallas kernel
# registers itself here on import (see ops/pallas_spmm.py).
_IMPLEMENTATIONS = {"segment": propagate_segment}


def register_impl(name: str, fn) -> None:
    _IMPLEMENTATIONS[name] = fn


@partial(jax.jit, static_argnames=("impl",))
def propagate(graph: BipartiteGraph, x: jax.Array, impl: str = "segment") -> jax.Array:
    return _IMPLEMENTATIONS[impl](graph, x)
