"""Shortest-path explainability over the user-item graph.

The reference builds a networkx graph from one direction of the edge list
(``src/inference_lightgcn.py:50-57``), then for every evaluation user with at
least one hit runs ``nx.has_path`` / ``shortest_path_length`` /
``shortest_path`` user→item per top-K hit and flags paths longer than 3 hops
(``src/inference_lightgcn.py:85-119``) — a Python-loop-per-edge approach that
also serializes the whole graph through jsonpickle.

Here the (static, unweighted for path purposes) adjacency is a numpy CSR and
each user gets ONE frontier BFS with parent pointers, answering all of that
user's hits at once; no graph serialization step is needed. Path semantics
match networkx: hop count = number of edges; a (user, item) train edge gives
distance 1; distance > 3 sets the ``longer_than_3`` flag.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import pandas as pd


@dataclasses.dataclass(frozen=True)
class AdjacencyCSR:
    """Undirected adjacency over the unified node space [0, n_users+n_items)."""

    indptr: np.ndarray   # [N+1]
    indices: np.ndarray  # [2E] neighbor node ids
    n_users: int
    n_items: int

    @property
    def num_nodes(self) -> int:
        return self.n_users + self.n_items


def build_adjacency(
    edge_user: np.ndarray, edge_item_node: np.ndarray, n_users: int, n_items: int
) -> AdjacencyCSR:
    """CSR from one direction of (user, item-node) train edges (both
    directions materialized here, like the nx.Graph is undirected)."""
    src = np.concatenate([edge_user, edge_item_node]).astype(np.int64)
    dst = np.concatenate([edge_item_node, edge_user]).astype(np.int64)
    n = n_users + n_items
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    return AdjacencyCSR(np.cumsum(indptr), dst, n_users, n_items)


def bfs_paths(
    adj: AdjacencyCSR, source: int, targets: np.ndarray, cutoff: int = 8
) -> list[tuple[int, list[int] | None]]:
    """Single-source BFS with parent pointers; returns [(dist, path)] per
    target — ``(-1, None)`` when unreachable within ``cutoff`` hops."""
    n = adj.num_nodes
    dist = np.full(n, -1, dtype=np.int32)
    parent = np.full(n, -1, dtype=np.int64)
    dist[source] = 0
    frontier = np.array([source], dtype=np.int64)
    targets = np.asarray(targets, dtype=np.int64)
    remaining = set(targets.tolist()) - {source}
    d = 0
    while len(frontier) and remaining and d < cutoff:
        starts, ends = adj.indptr[frontier], adj.indptr[frontier + 1]
        counts = ends - starts
        take = np.repeat(starts, counts) + (
            np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(np.append(0, counts[:-1])), counts)
        )
        neigh = adj.indices[take]
        par = np.repeat(frontier, counts)
        new = dist[neigh] < 0
        neigh, par = neigh[new], par[new]
        # First writer wins within the level (any shortest parent is valid).
        neigh, first = np.unique(neigh, return_index=True)
        parent[neigh] = par[first]
        d += 1
        dist[neigh] = d
        frontier = neigh
        remaining -= set(neigh.tolist())

    out = []
    for t in targets:
        if dist[t] < 0:
            out.append((-1, None))
            continue
        path = [int(t)]
        while path[-1] != source:
            path.append(int(parent[path[-1]]))
        out.append((int(dist[t]), path[::-1]))
    return out


def hit_paths_frame(
    adj: AdjacencyCSR,
    user_ids: np.ndarray,
    topk_idx: np.ndarray,
    truth_sets: list[set],
    flag_hops: int = 3,
    cutoff: int = 8,
) -> pd.DataFrame:
    """Per-(user, hit item) path analysis — the reference's ``hit_df``
    (``src/inference_lightgcn.py:69-119``).

    Args:
        user_ids: [Nu] relabelled user ids of evaluated users.
        topk_idx: [Nu, K] recommended LOCAL item ids.
        truth_sets: per user, the set of LOCAL ground-truth item ids.
        flag_hops: paths strictly longer than this are flagged
            (reference flags > 3, ``src/inference_lightgcn.py:102-105``).

    Returns a frame with columns user_id_idx, item_id_idx (local),
    path_length, path (node-space ids), longer_than_{flag_hops}.

    Uses the multithreaded native BFS (``native.bfs_batch``) when the C++
    library is available, the pure-python frontier BFS otherwise.
    """
    per_source: list[tuple[int, list[int]]] = []
    for u, recs, truth in zip(user_ids, topk_idx, truth_sets):
        hits = sorted(set(int(r) for r in recs) & truth)
        if hits:
            per_source.append((int(u), hits))

    results = []  # (user, local item, dist, path)
    from .. import native

    if native.available() and per_source:
        sources = np.array([u for u, _ in per_source], dtype=np.int64)
        t_indptr = np.cumsum([0] + [len(h) for _, h in per_source]).astype(np.int64)
        targets = np.concatenate(
            [np.asarray(h, dtype=np.int64) + adj.n_users for _, h in per_source]
        )
        dist, paths = native.bfs_batch(
            adj.indptr, adj.indices, sources, t_indptr, targets, cutoff
        )
        for s_idx, (u, hits) in enumerate(per_source):
            for j, item in enumerate(hits):
                t = t_indptr[s_idx] + j
                d = int(dist[t])
                path = paths[t, : d + 1].tolist() if d >= 0 else None
                results.append((u, item, d, path))
    else:
        for u, hits in per_source:
            targets = np.asarray(hits, dtype=np.int64) + adj.n_users
            for item, (d, path) in zip(hits, bfs_paths(adj, u, targets, cutoff)):
                results.append((u, item, d, path))

    rows = [
        {
            "user_id_idx": u,
            "item_id_idx": item,
            "path_length": d,
            "path": path,
            f"longer_than_{flag_hops}": bool(d < 0 or d > flag_hops),
        }
        for u, item, d, path in results
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "user_id_idx", "item_id_idx", "path_length", "path",
            f"longer_than_{flag_hops}",
        ],
    )
