"""SVD baseline CLI (reference ``notebooks/2.eComBaseline-SVD.ipynb``).

K-fold cross-validated biased-MF baseline over a weighted edge list, with
surprise-parity threshold Precision/Recall@K (the reference reports 5-fold
P@10 0.1543 / R@10 0.1270 on the cosmetics edges, notebook cell 10).

    python -m gnn_ecommerce_tpu.cli.svd --edges u_i_weight.csv
    python -m gnn_ecommerce_tpu.cli.svd --movielens u.data --folds 3 -k 10
"""
from __future__ import annotations

import argparse
import json

import numpy as np
import pandas as pd

from ..models.svd import SVDConfig, fit_svd, precision_recall_at_k


def run_cv(
    edges: pd.DataFrame,
    folds: int = 5,
    k: int = 10,
    cfg: SVDConfig | None = None,
    rel_threshold: float = 1.0,
    est_threshold: float = 0.5,
) -> dict:
    """K-fold CV over edge rows (the notebook's surprise ``cross_validate``
    analog); ids are densified first. Returns per-fold and mean P/R@K."""
    cfg = cfg or SVDConfig()
    users, u_idx = np.unique(edges["user_id"].to_numpy(), return_inverse=True)
    items, i_idx = np.unique(edges["item_id"].to_numpy(), return_inverse=True)
    w = edges["weight"].to_numpy(np.float32)
    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(len(w))
    bounds = np.linspace(0, len(w), folds + 1).astype(np.int64)
    precs, recs = [], []
    for f in range(folds):
        test = perm[bounds[f] : bounds[f + 1]]
        train = np.concatenate([perm[: bounds[f]], perm[bounds[f + 1] :]])
        params = fit_svd(
            u_idx[train], i_idx[train], w[train], len(users), len(items), cfg
        )
        p, r = precision_recall_at_k(
            params, u_idx[test], i_idx[test], w[test], k=k,
            rel_threshold=rel_threshold, est_threshold=est_threshold,
        )
        precs.append(p)
        recs.append(r)
    return {
        "k": k,
        "folds": folds,
        "precision_per_fold": precs,
        "recall_per_fold": recs,
        "precision_mean": float(np.mean(precs)),
        "recall_mean": float(np.mean(recs)),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--edges", help="weighted-edge CSV (user_id,item_id,weight)")
    src.add_argument("--movielens", help="MovieLens ratings file")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--factors", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--out", help="write results JSON here")
    args = ap.parse_args(argv)

    if args.movielens:
        from ..data.movielens import load_movielens

        edges = load_movielens(args.movielens)
    else:
        edges = pd.read_csv(args.edges)
    cfg = SVDConfig(n_factors=args.factors, n_epochs=args.epochs)
    result = run_cv(edges, folds=args.folds, k=args.k, cfg=cfg)
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
