"""Round-5 driver-refactor regression check at production scale.

Round 5 rewired the driver's eval (sharded-eval indirection), checkpoint
view (multi-host replicate-then-write), and saver gating. The single-chip
fast path is logically untouched — this proves it at full scale by resuming
the round-4 full-run checkpoint for ONE more epoch under the refactored
driver: exact restore (epoch counter, optimizer state, on-disk BEST as the
bar), one dim-90/5L bf16 training epoch at the measured ~56 s/epoch class,
bucketed eval, and an every-epoch async save.

The round-4 checkpoint directory is COPIED first so the measured r4
artifacts (used by INFER_r4/SERVE benches) keep their provenance.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/resume_regression_r5.py
Writes RESUME_REGRESSION_r5.json.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/repo/model-checkpoints/full_r4"
DST = "/root/repo/model-checkpoints/full_r5_resume"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    if os.path.exists(DST):
        shutil.rmtree(DST)
    shutil.copytree(SRC, DST)

    from full_corpus_r3 import build_prepared

    from gnn_ecommerce_tpu.train import TrainConfig, train

    t0 = time.perf_counter()
    prepared, _ = build_prepared()
    etl_s = time.perf_counter() - t0

    cfg = TrainConfig(
        latent_dim=90, n_layers=5, lr=0.005, decay=1e-4, batch_size=1024,
        epochs=21,  # r4 ran 0..19; exactly ONE new epoch
        k=20, seed=42, batches_per_epoch=None,
        checkpoint_dir=DST,
        fast_bipartite="bf16", heavy_users=16384,
        checkpoint_every=1, async_saves=True, resume=True,
    )
    t0 = time.perf_counter()
    result = train(prepared, cfg)
    train_s = time.perf_counter() - t0

    assert [h["epoch"] for h in result.history] == [20], result.history
    rec = result.history[0]
    out = {
        "benchmark": "resume_regression_r5",
        "what": (
            "round-4 full-scale checkpoint resumed for ONE epoch under the "
            "round-5 refactored driver (sharded-eval indirection + multi-"
            "host checkpoint view, single-chip path)"
        ),
        "epoch_20": {
            "val_recall@20": rec["val_recall"],
            "val_precision@20": rec["val_precision"],
            "bpr_loss": rec["bpr_loss"],
            "train_s": rec["train_s"],
            "epoch_s": rec["epoch_s"],
        },
        "r4_epoch19_val_recall@20": 0.31959912398105894,
        "r4_best_val_recall@20": 0.32442182846871753,
        "best_after_resume": {
            "best_epoch": result.best_epoch,
            "best_val_recall@20": result.best_val_recall,
            "test_recall@20": result.test_recall,
        },
        "timings_s": {"etl": etl_s, "resume_window": train_s},
        "checks": {
            "resumed_at_epoch_20": True,
            "epoch_time_in_r4_class": rec["train_s"] < 120.0,
            "val_recall_in_r4_band": abs(rec["val_recall"] - 0.3196) < 0.02,
        },
    }
    with open("/root/repo/RESUME_REGRESSION_r5.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    assert all(out["checks"].values()), out["checks"]
    print("wrote RESUME_REGRESSION_r5.json", flush=True)


if __name__ == "__main__":
    main()
