"""Full-scale BPR-MF baseline: LightGCN with ZERO propagation layers.

Completes the full-scale quality triangle with the STRONG trained-MF
baseline (round-4 VERDICT item 4 follow-through). The rating-MSE SVD
(``scripts/svd_full_r5.py``) reproduces the reference notebook's protocol
but is near-zero under full ranking — an MSE fit to observed edge weights
scores every unobserved item ~mu + b_u + b_i, which is exactly why the
reference only evaluates it over each user's own held-out edges. The
ranking-native MF baseline is the SAME BPR objective, sampler, optimizer,
dim and epochs as the full LightGCN run but with n_layers=0 (final
embedding = the table itself) — so the gap to TRAIN_FULL_r4's 0.3244 val
R@20 isolates exactly what GRAPH PROPAGATION adds.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bprmf_full_r5.py
Writes BPRMF_FULL_r5.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    t_all = time.perf_counter()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    from full_corpus_r3 import build_prepared

    from gnn_ecommerce_tpu.train import TrainConfig, train

    t0 = time.perf_counter()
    prepared, n_edges = build_prepared()
    etl_s = time.perf_counter() - t0
    print(f"ETL: {n_edges} edges ({etl_s:.0f}s)", flush=True)

    cfg = TrainConfig(
        latent_dim=90,          # same capacity as the LightGCN run
        n_layers=0,             # NO propagation: pure BPR-MF
        lr=0.005,
        decay=1e-4,
        batch_size=1024,
        epochs=20,
        k=20,
        seed=42,
        batches_per_epoch=None,  # reference formula -> 235
        checkpoint_dir="/root/repo/model-checkpoints/bprmf_r5",
        fast_bipartite="off",    # nothing to factorize at L=0
        checkpoint_every=0,      # baseline: end-of-run artifact only
        async_saves=True,
    )
    t0 = time.perf_counter()
    result = train(prepared, cfg)
    train_s = time.perf_counter() - t0

    out = {
        "benchmark": "bprmf_full_r5",
        "model": (
            "BPR-MF = LightGCN n_layers=0 (models/lightgcn.py) — identical "
            "objective/sampler/optimizer/dim/epochs to TRAIN_FULL_r4, no "
            "graph propagation"
        ),
        "dataset": "synthetic cosmetics-scale (full_corpus_r3, no egress)",
        "quality": {
            "best_epoch": result.best_epoch,
            "best_val_recall@20": result.best_val_recall,
            "best_val_precision@20": result.best_val_precision,
            "test_recall@20": result.test_recall,
            "test_precision@20": result.test_precision,
            "val_recall_curve": [h["val_recall"] for h in result.history],
        },
        "comparators_same_corpus": {
            "lightgcn_val_recall@20": 0.3244,
            "lightgcn_test_recall@20": 0.3185,
            "popularity_val_recall@20": 0.0344,
            "svd_mse_full_ranking_val_recall@20": 0.00066,
            "weighted_2hop_skyline_val_recall@20": 0.178,
        },
        "timings_s": {
            "etl": etl_s,
            "train": train_s,
            "total": time.perf_counter() - t_all,
        },
    }
    with open("/root/repo/BPRMF_FULL_r5.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["quality"] | {"train_s": train_s}, indent=2)[:600])
    print("wrote BPRMF_FULL_r5.json", flush=True)


if __name__ == "__main__":
    main()
