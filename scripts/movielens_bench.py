"""BASELINE config 2: ML-100K-scale Recall@20 — LightGCN vs SVD baseline.

The environment has no egress, so this runs on the clearly-labeled
deterministic ML-100K-shaped corpus (``data.movielens.synthetic_movielens``:
943 x 1682 x ~100K low-rank ratings; NOT the real MovieLens data — see its
docstring). Three measurements on IDENTICAL splits:

1. SVD 5-fold CV with surprise-parity threshold P/R@10 (the reference's SVD
   floor protocol, ``notebooks/2.eComBaseline-SVD.ipynb`` cell 10:
   P@10 0.1543 / R@10 0.1270 on the cosmetics edges);
2. SVD as a TOP-20 RANKER on the LightGCN split (fit on train ratings, rank
   all unseen items per eval user, same masked Recall@20 metric) — the
   apples-to-apples floor;
3. LightGCN through the full framework pipeline (loader -> split -> prepare
   -> train -> masked top-20 eval).

Writes MOVIELENS_r3.json at the repo root. CPU-runnable (~2 min); pass
--tpu to leave the default backend alone.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true", help="use the default (TPU) backend")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--out", default="/root/repo/MOVIELENS_r3.json")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from gnn_ecommerce_tpu.cli.svd import run_cv
    from gnn_ecommerce_tpu.data.movielens import load_movielens, synthetic_movielens
    from gnn_ecommerce_tpu.data.prepare import prepare_splits, split_edges
    from gnn_ecommerce_tpu.eval import build_eval_batch
    from gnn_ecommerce_tpu.eval.evaluate import evaluate
    from gnn_ecommerce_tpu.models.svd import SVDConfig, fit_svd, predict
    from gnn_ecommerce_tpu.train import TrainConfig, train

    t0 = time.perf_counter()
    ratings = synthetic_movielens(seed=42)
    path = "/root/repo/data/ml100k_synth_u.data"
    os.makedirs("/root/repo/data", exist_ok=True)
    ratings.to_csv(path, sep="\t", header=False, index=False)
    edges = load_movielens(path)  # exercise the real loader surface
    print(f"corpus: {len(edges)} edges, "
          f"{edges.user_id.nunique()} users x {edges.item_id.nunique()} items",
          flush=True)

    # --- 1. SVD 5-fold CV, surprise-parity protocol (reference floor) ---
    svd_cv = run_cv(edges, folds=5, k=10)
    print(f"SVD 5-fold CV: P@10 {svd_cv['precision_mean']:.4f} "
          f"R@10 {svd_cv['recall_mean']:.4f}", flush=True)

    # --- shared split for the ranker comparison ---
    tr, va, te = split_edges(edges, seed=42, test_size=0.2)
    prepared = prepare_splits(tr, va, te)

    # --- 2. SVD as a top-20 ranker on the same split ---
    u_all = np.searchsorted(prepared.user_classes, tr["user_id"].to_numpy())
    i_all = np.searchsorted(prepared.item_classes, tr["item_id"].to_numpy())
    svd_params = fit_svd(
        u_all, i_all, tr["weight"].to_numpy(np.float32),
        prepared.n_users, prepared.n_items, SVDConfig(seed=42),
    )
    import jax.numpy as jnp

    # Scores for every (eval user, item); evaluated with the SAME masked
    # top-K metric by packing SVD outputs as "final embeddings":
    # [p_u | b_u | 1] . [q_i | 1 | mu + b_i] reproduces predict() exactly.
    pu = np.asarray(svd_params["p"], np.float32)
    qi = np.asarray(svd_params["q"], np.float32)
    bu = np.asarray(svd_params["b_u"], np.float32)[:, None]
    bi = np.asarray(svd_params["b_i"], np.float32)[:, None]
    mu = float(svd_params["mu"])
    user_emb = np.concatenate([pu, bu * 0 + 1.0, bu], axis=1)
    item_emb = np.concatenate([qi, mu + bi, np.ones_like(bi)], axis=1)
    fake_emb = jnp.asarray(np.concatenate([user_emb, item_emb], axis=0))
    svd_scores = {}
    for name, split in (("val", prepared.val), ("test", prepared.test)):
        batch = build_eval_batch(split)
        p, r, _, _, _ = evaluate(fake_emb, batch, prepared.n_users, k=20)
        svd_scores[name] = {"precision": p, "recall": r}
        print(f"SVD ranker {name}: P@20 {p:.4f} R@20 {r:.4f}", flush=True)

    # --- 3. LightGCN through the framework ---
    cfg = TrainConfig(
        latent_dim=args.dim, n_layers=args.layers, epochs=args.epochs,
        batch_size=1024, batches_per_epoch=40, lr=0.01,
        checkpoint_dir="/root/repo/model-checkpoints/ml100k",
        checkpoint_every=0, seed=42,
    )
    result = train(prepared, cfg, verbose=False)
    print(f"LightGCN: best epoch {result.best_epoch} "
          f"val R@20 {result.best_val_recall:.4f} "
          f"test P@20 {result.test_precision:.4f} "
          f"R@20 {result.test_recall:.4f}", flush=True)

    out = {
        "dataset": "synthetic ML-100K-shaped corpus (deterministic, seed 42; "
                   "NOT real MovieLens — no egress in this environment)",
        "n_edges": int(len(edges)),
        "n_users": int(prepared.n_users),
        "n_items": int(prepared.n_items),
        "svd_cv_reference_protocol": {
            "k": 10,
            "precision_mean": svd_cv["precision_mean"],
            "recall_mean": svd_cv["recall_mean"],
            "reference_floor_real_cosmetics": {"P@10": 0.1543, "R@10": 0.1270},
        },
        "same_split_top20": {
            "svd_ranker": svd_scores,
            "lightgcn": {
                "best_epoch": result.best_epoch,
                "val": {"precision": result.best_val_precision,
                        "recall": result.best_val_recall},
                "test": {"precision": result.test_precision,
                         "recall": result.test_recall},
            },
        },
        "lightgcn_beats_svd_val": bool(
            result.best_val_recall > svd_scores["val"]["recall"]
        ),
        "lightgcn_beats_svd_test": bool(
            result.test_recall > svd_scores["test"]["recall"]
        ),
        "config": {"dim": args.dim, "layers": args.layers,
                   "epochs": args.epochs},
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
