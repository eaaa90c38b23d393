"""Round-3 full-scale corpus + prepared-splits builder — single source of
truth for the generation parameters, shared by ``train_full_r3.py`` (which
trains the checkpoint) and ``serve_scale_r3.py`` (which rebuilds the SAME
relabelled id space to serve that checkpoint). Any drift between the two
would silently mismatch embedding rows to users/items.

Corpus config from the round-3 headroom study
(``corpus_headroom2_r3.json``): the original corpus (48 clusters, affinity
.7) was popularity-dominated — its weighted 2-hop skyline (0.101) sat BELOW
the popularity baseline (0.128), so no collaborative model could beat
popularity on it. This config's skyline is 3.5x popularity, and a
1/10-scale mini-train reaches ~0.35 val R@20 vs ~0.067 popularity
(``corpus_minitrain_r3.json``).
"""
import sys

sys.path.insert(0, "/root/repo")

N_USERS = 1_639_358
N_ITEMS = 54_571
N_EVENTS = 20_692_840
N_PAIRS = 10_157_407
GEN_KWARGS = dict(seed=42, n_clusters=768, affinity=0.85, item_skew=0.9)


def build_prepared():
    """Returns (prepared, n_unique_edges). Deterministic."""
    from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1, events_to_edges
    from gnn_ecommerce_tpu.data.prepare import prepare_splits, split_edges
    from gnn_ecommerce_tpu.data.synthetic import synthetic_events

    events = synthetic_events(
        n_users=N_USERS, n_items=N_ITEMS, n_events=N_EVENTS,
        n_pairs=N_PAIRS, **GEN_KWARGS,
    )
    edges = events_to_edges(events, EVENT_TYPE_WEIGHTS_V1)
    del events
    tr, va, te = split_edges(edges, seed=42)
    n_edges = len(edges)
    del edges
    prepared = prepare_splits(tr, va, te)
    return prepared, n_edges
