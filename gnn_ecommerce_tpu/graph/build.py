"""Bipartite graph container with precomputed symmetric normalization.

TPU-first design: the reference re-normalizes the adjacency on every LGConv
call (PyG ``gcn_norm`` inside ``LGConv``, invoked at reference
``src/lightgcn.py:96``). The graph and its edge weights are static through
training, so this framework normalizes ONCE at build time; each propagation
layer is then exactly one SpMM ``X' = Â X`` with ``Â = D^-1/2 A D^-1/2``
(weighted degrees, no self-loops).

Reference semantics reproduced (for allclose parity):
- bidirectional edge materialization: ``src/utils_v2.py:146-165``
  (``df_to_graph``: row0 = cat(u, i), row1 = cat(i, u), duplicated weights;
  item ids already offset by +n_users into a unified node space,
  ``src/utils_v2.py:128``).
- PyG ``gcn_norm`` with ``add_self_loops=False`` and explicit edge weights:
  deg_i = sum of incident edge weights at node i (aggregated over the
  destination column), ``norm_e = w_e / sqrt(deg_src * deg_dst)``;
  zero/negative degrees map to 0 (PyG masks inf to 0).
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteGraph:
    """Static weighted bipartite graph in unified node space.

    Node ids: users occupy ``[0, n_users)``; items occupy
    ``[n_users, n_users + n_items)`` (reference ``src/utils_v2.py:128``).

    Edges are stored bidirectionally (2·|E| directed arcs) and sorted by
    destination node, which doubles as a CSR layout over destinations via
    ``indptr``. ``w_norm`` carries the symmetric normalization precomputed at
    build time; raw weights are kept for eval/serving parity needs.

    Because edges are sorted by ``dst`` and the graph is bipartite, arcs with
    ``dst < n_users`` (item→user messages) form a contiguous prefix and arcs
    with ``dst >= n_users`` (user→item messages) a contiguous suffix — kernels
    exploit this split without extra bookkeeping.
    """

    src: jax.Array          # [2E] int32, message source node ids
    dst: jax.Array          # [2E] int32, message destination node ids (sorted)
    w_norm: jax.Array       # [2E] float32, D^-1/2 A D^-1/2 edge coefficients
    w_raw: jax.Array        # [2E] float32, unnormalized edge weights
    indptr: jax.Array       # [N+1] int32, CSR row pointers over dst
    deg: jax.Array          # [N] float32, weighted degree per node
    n_users: int = dataclasses.field(metadata=dict(static=True))
    n_items: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_nodes(self) -> int:
        return self.n_users + self.n_items

    @property
    def num_arcs(self) -> int:
        return int(self.src.shape[0])

    @property
    def num_edges(self) -> int:
        """Undirected edge count |E| (half the stored arcs)."""
        return self.num_arcs // 2


def symmetric_normalize(
    src: np.ndarray, dst: np.ndarray, weight: np.ndarray, num_nodes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compute ``w / sqrt(deg_src * deg_dst)`` with weighted degrees.

    Degrees aggregate edge weights at the destination node, matching PyG
    ``gcn_norm(edge_index, edge_weight, add_self_loops=False)`` as configured
    by the reference ``LGConv`` stack (``src/lightgcn.py:82,96``). For the
    symmetric bidirectional edge list both aggregation sides give identical
    degrees. Nodes with degree <= 0 get coefficient 0 (gcn_norm masks
    1/sqrt(0)=inf to 0).

    Returns (normalized weights float32, degrees float32).
    """
    deg = np.zeros(num_nodes, dtype=np.float64)
    np.add.at(deg, dst, weight.astype(np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        d_inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
    w_norm = weight.astype(np.float64) * d_inv_sqrt[src] * d_inv_sqrt[dst]
    return w_norm.astype(np.float32), deg.astype(np.float32)


def build_graph(
    user_idx: np.ndarray,
    item_idx: np.ndarray,
    weight: np.ndarray,
    n_users: int,
    n_items: int,
    *,
    items_offset: bool = False,
    to_device: bool = True,
) -> BipartiteGraph:
    """Build a normalized bidirectional bipartite graph from (user, item, w).

    Mirrors reference ``df_to_graph`` (``src/utils_v2.py:146-165``): both arc
    directions are materialized with duplicated weights, then — unlike the
    reference, which re-normalizes per layer call — symmetric normalization is
    precomputed here and arcs are sorted by destination into CSR form.

    Args:
        user_idx: [E] integer user ids in ``[0, n_users)``.
        item_idx: [E] integer item ids; in ``[0, n_items)`` unless
            ``items_offset`` marks them as already shifted by ``+n_users``
            (the reference shifts at ``src/utils_v2.py:128``).
        weight: [E] edge weights.
        items_offset: whether ``item_idx`` is already in unified node space.
        to_device: place arrays on the default JAX device (else keep numpy).
    """
    user_idx = np.asarray(user_idx, dtype=np.int64)
    item_idx = np.asarray(item_idx, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float64)
    if not items_offset:
        item_idx = item_idx + n_users
    num_nodes = n_users + n_items
    if user_idx.size:
        assert user_idx.min() >= 0 and user_idx.max() < n_users, "user id range"
        assert item_idx.min() >= n_users and item_idx.max() < num_nodes, "item id range"

    src = np.concatenate([user_idx, item_idx])
    dst = np.concatenate([item_idx, user_idx])
    w = np.concatenate([weight, weight])

    w_norm, deg = symmetric_normalize(src, dst, w, num_nodes)

    # CSR over destinations: stable sort keeps the reference arc order within
    # a row (users-first block then items-first block), which keeps segment
    # sums bit-deterministic across rebuilds. Native O(E+N) counting sort
    # when the C++ library is available, np.argsort otherwise.
    from ..native import coo_sort_by_dst

    order, indptr = coo_sort_by_dst(dst, num_nodes)
    src, dst = src[order], dst[order]
    w, w_norm = w[order], w_norm[order]

    arrays = dict(
        src=src.astype(np.int32),
        dst=dst.astype(np.int32),
        w_norm=w_norm.astype(np.float32),
        w_raw=w.astype(np.float32),
        indptr=indptr.astype(np.int32),
        deg=deg.astype(np.float32),
    )
    if to_device:
        arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    return BipartiteGraph(n_users=int(n_users), n_items=int(n_items), **arrays)
