"""Path-subgraph plots (reference ``src/plot.py:37-93`` without DGL/GNNLens).

Draws the union of shortest paths user→hit-items as a spring-layout graph:
users orange, items blue, the target user and its hit items red — the same
visual grammar as the reference's matplotlib figure (``src/plot.py:78-92``).
matplotlib/networkx are imported lazily so headless library use never pays
for them.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def plot_user_paths(
    hit_df: pd.DataFrame,
    user_id: int,
    n_users: int,
    out_path: str | None = None,
    seed: int = 42,
):
    """Plot all stored paths for one user; returns the matplotlib Figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import networkx as nx

    rows = hit_df[hit_df["user_id_idx"] == user_id]
    if rows.empty:
        raise ValueError(f"user {user_id} has no hit paths in hit_df")

    g = nx.Graph()
    hits = set()
    for _, row in rows.iterrows():
        path = row["path"]
        hits.add(int(row["item_id_idx"]) + n_users)
        if not path:
            continue
        g.add_edges_from(zip(path[:-1], path[1:]))

    def color(node: int) -> str:
        if node == user_id or node in hits:
            return "tab:red"
        return "tab:orange" if node < n_users else "tab:blue"

    fig, ax = plt.subplots(figsize=(8, 6))
    pos = nx.spring_layout(g, seed=seed)
    nx.draw_networkx(
        g,
        pos=pos,
        ax=ax,
        node_color=[color(n) for n in g.nodes],
        with_labels=True,
        font_size=7,
        node_size=250,
    )
    ax.set_title(f"user {user_id}: paths to {len(hits)} hit item(s)")
    ax.axis("off")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=120)
    return fig
