"""BASELINE config 3: cosmetics 10%-subsample training on one chip.

Previously marked "subsumed by the full-scale runs" in PARITY.md; this
closes the line with its own measurement: 1/10-scale corpus (both axes
scaled 10x, same headroom-validated cluster structure as TRAIN_FULL_r3),
reference budget formula, production driver, real eval. Writes
scripts/config3_subsample_r3.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/config3_subsample_r3.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1, events_to_edges
    from gnn_ecommerce_tpu.data.prepare import prepare_splits, split_edges
    from gnn_ecommerce_tpu.data.synthetic import synthetic_events
    from gnn_ecommerce_tpu.eval.baselines import popularity_recall_at_k
    from gnn_ecommerce_tpu.train import TrainConfig, train

    t_all = time.perf_counter()
    events = synthetic_events(
        n_users=163_936, n_items=5_457, n_events=2_069_284, seed=42,
        n_pairs=1_015_741, n_clusters=77, affinity=0.85, item_skew=0.9,
    )
    edges = events_to_edges(events, EVENT_TYPE_WEIGHTS_V1)
    tr, va, te = split_edges(edges, seed=42)
    prepared = prepare_splits(tr, va, te)
    pop = popularity_recall_at_k(prepared, k=20)
    print(f"ETL {time.perf_counter()-t_all:.0f}s; popularity R@20 {pop:.5f}",
          flush=True)

    cfg = TrainConfig(
        latent_dim=80, n_layers=4, lr=0.005, decay=1e-4, batch_size=1024,
        epochs=20, k=20, seed=42, batches_per_epoch=None,
        checkpoint_dir="/tmp/config3_r3", checkpoint_every=0,
    )
    t0 = time.perf_counter()
    result = train(prepared, cfg)
    train_s = time.perf_counter() - t0
    out = {
        "config": "BASELINE config 3: cosmetics 10% subsample, single chip",
        "graph": f"{prepared.n_users}x{prepared.n_items}, "
                 f"{len(prepared.edge_user)} train edges",
        "epochs": 20,
        "batches_per_epoch": len(prepared.edge_user) // (1024 * 40),
        "train_wall_s": round(train_s, 1),
        "total_wall_s": round(time.perf_counter() - t_all, 1),
        "best_epoch": result.best_epoch,
        "best_val_recall_at_20": round(result.best_val_recall, 5),
        "test_recall_at_20": round(result.test_recall, 5),
        "popularity_baseline_val_recall_at_20": round(pop, 5),
        "beats_popularity": bool(result.best_val_recall > pop),
    }
    print(json.dumps(out, indent=2), flush=True)
    with open("/root/repo/scripts/config3_subsample_r3.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
