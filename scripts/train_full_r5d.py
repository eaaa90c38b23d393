"""Round-5b headline: the full reference workload at the SHIPPED
hyperparameters, with the DUTY-CYCLED async checkpoint writer.

The r5 run's always-on writer saturated the ~19 MB/s link readback path for
the entire run (9 x 1.74 GB checkpoints; scripts/ckpt_readback_probe_r5.json
measures one uncontended readback at ~100 s vs ~57 s epochs), inflating
in-flight epochs to 65-72 s and leaving a long flush tail. This run is the
same corpus/config/protocol with async_save_duty=0.5 plus the new per-phase
instrumentation (setup, eval_s, save_s, writer occupancy, flush).

Round 5 rewired the driver's eval (sharded-eval indirection), checkpoint
view (multi-host replicate-then-write gating), and saver plumbing; the
one-epoch resume regression (RESUME_REGRESSION_r5.json) bounded the
refactor's effect, and this run re-stamps the end-to-end headline on the
final round-5 code: same corpus, same config, same protocol as
TRAIN_FULL_r4.json (dim 90 / 5 layers, 20 epochs x 235 steps, every-epoch
async saves).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_full_r5c.py
Writes TRAIN_FULL_r5d.json; progress in model-checkpoints/full_r5d/.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

REFERENCE_HOURS = 24.0  # reference README.md:59


def main():
    t_all = time.perf_counter()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from full_corpus_r3 import build_prepared  # single corpus source of truth

    from gnn_ecommerce_tpu.train import TrainConfig, train

    t0 = time.perf_counter()
    prepared, n_edges = build_prepared()
    etl_s = time.perf_counter() - t0
    print(
        f"ETL: {n_edges} edges -> {len(prepared.edge_user)} train, "
        f"{prepared.n_users}x{prepared.n_items}, "
        f"val users {len(prepared.val.user_ids)} ({etl_s:.0f}s)",
        flush=True,
    )

    t0 = time.perf_counter()
    from gnn_ecommerce_tpu.eval.baselines import popularity_recall_at_k

    pop_recall = popularity_recall_at_k(prepared, k=20)
    print(
        f"popularity baseline val R@20 = {pop_recall:.5f} "
        f"({time.perf_counter() - t0:.0f}s)",
        flush=True,
    )

    cfg = TrainConfig(
        # The reference's SHIPPED hyperparameters (train_lightgcn.py:47-53).
        latent_dim=90,
        n_layers=5,
        lr=0.005,
        decay=1e-4,
        batch_size=1024,
        epochs=20,
        k=20,
        seed=42,
        batches_per_epoch=None,  # reference formula -> 235
        checkpoint_dir="/root/repo/model-checkpoints/full_r5d",
        fast_bipartite="bf16",
        heavy_users=16384,
        # Round-4: every-epoch saves, async (pinned_host snapshot + write-
        # behind coalescing) — the round-3 run had to throttle to every 5.
        checkpoint_every=1,
        async_saves=True,
        resume=os.environ.get("RESUME", "") == "1",
    )
    t0 = time.perf_counter()
    result = train(prepared, cfg)
    train_s = time.perf_counter() - t0
    total_s = time.perf_counter() - t_all

    out = {
        "workload": {
            "graph": f"{prepared.n_users}x{prepared.n_items}",
            "unique_edges": n_edges,
            "train_edges": int(len(prepared.edge_user)),
            "epochs": cfg.epochs,
            "batches_per_epoch": int(
                len(prepared.edge_user) // (cfg.batch_size * 40)
            ),
            "batch_size": cfg.batch_size,
            "dim": cfg.latent_dim,
            "layers": cfg.n_layers,
            "config": (
                "SHIPPED reference hparams dim 90/5 layers; "
                "fast_bipartite=bf16, heavy_users=16384, "
                "async_saves every epoch (pinned_host + coalescing)"
            ),
            "dataset": "deterministic clustered synthetic (seed 42; 768 "
                       "co-clusters, affinity 0.85, item_skew 0.9 — "
                       "headroom-validated, scripts/corpus_headroom2_r3.json)"
                       ", 20.7M events -> 10,157,407 unique edges "
                       "(real Kaggle data unreachable: DVC/GDrive, no egress)",
        },
        "measured": {
            "etl_s": round(etl_s, 1),
            "train_wall_s": round(train_s, 1),
            "total_wall_s": round(total_s, 1),
            "train_wall_hours": round(train_s / 3600, 4),
            "reference_hours": REFERENCE_HOURS,
            "speedup_vs_reference": round(REFERENCE_HOURS * 3600 / train_s, 1),
        },
        "quality": {
            "best_epoch": result.best_epoch,
            "best_val_precision": result.best_val_precision,
            "best_val_recall": result.best_val_recall,
            "test_precision": result.test_precision,
            "test_recall": result.test_recall,
            "val_recall_curve": [h["val_recall"] for h in result.history],
            "bpr_loss_curve": [h["bpr_loss"] for h in result.history],
            "popularity_baseline_val_recall_at_20": pop_recall,
            "beats_popularity": bool(result.best_val_recall > pop_recall),
        },
        "per_epoch": [
            {k: h[k] for k in ("epoch", "bpr_loss", "val_recall", "train_s",
                               "epoch_s", "eval_s")}
            for h in result.history
        ],
    }
    with open("/root/repo/TRAIN_FULL_r5d.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["measured"], indent=2), flush=True)
    print(json.dumps(out["quality"], indent=2)[:2000], flush=True)


if __name__ == "__main__":
    main()
