"""Validate the headroom-study winner by actually training on it (CPU).

corpus_headroom2_r3.json picked n_clusters=768(full)/affinity=.85/
item_skew=.9: weighted 2-hop skyline 0.235 vs popularity 0.067 on the val
split. This trains LightGCN through the production driver at 1/10 scale
(reference budget formula, ~25 batches/epoch) and prints the val Recall@20
curve next to the popularity baseline — if the curve clears the baseline
here, the full-scale TRAIN_FULL rerun uses this corpus config.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1, events_to_edges
from gnn_ecommerce_tpu.data.prepare import prepare_splits, split_edges
from gnn_ecommerce_tpu.data.synthetic import synthetic_events
from gnn_ecommerce_tpu.train import TrainConfig, train

N_USERS, N_ITEMS = 163_936, 5_457
N_EVENTS, N_PAIRS = 2_069_284, 1_015_741


def main():
    t0 = time.time()
    events = synthetic_events(
        n_users=N_USERS, n_items=N_ITEMS, n_events=N_EVENTS, seed=42,
        n_pairs=N_PAIRS, n_clusters=77, affinity=0.85, item_skew=0.9,
    )
    edges = events_to_edges(events, EVENT_TYPE_WEIGHTS_V1)
    tr, va, te = split_edges(edges, seed=42)
    prep = prepare_splits(tr, va, te)
    print(f"ETL {time.time()-t0:.0f}s; val users {len(prep.val.user_ids)}",
          flush=True)

    # Popularity baseline on the same split (train-purchase counts,
    # train-mask removed) — the number the curve must clear.
    from gnn_ecommerce_tpu.eval.baselines import popularity_recall_at_k

    pop_recall = popularity_recall_at_k(prep, k=20)
    print(f"popularity val R@20 = {pop_recall:.5f}", flush=True)

    cfg = TrainConfig(
        latent_dim=80, n_layers=4, lr=0.005, decay=1e-4, batch_size=1024,
        epochs=12, k=20, seed=42, batches_per_epoch=None,
        checkpoint_dir="/tmp/minitrain_r3", checkpoint_every=0,
    )
    result = train(prep, cfg)
    out = {
        "corpus": "c768_a.85_sk.9 @ 1/10 scale",
        "popularity_val_recall_at_20": round(pop_recall, 5),
        "val_recall_curve": [round(h["val_recall"], 5) for h in result.history],
        "best_val_recall": round(result.best_val_recall, 5),
        "best_epoch": result.best_epoch,
        "beats_popularity": result.best_val_recall > pop_recall,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out, indent=2), flush=True)
    with open("/root/repo/scripts/corpus_minitrain_r3.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
