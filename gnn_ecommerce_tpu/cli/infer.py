"""Offline inference CLI (reference ``python src/inference_lightgcn.py -g G
-c CKPT``, ``src/inference_lightgcn.py:121-155``).

    python -m gnn_ecommerce_tpu.cli.infer -d data/prepared -c model-checkpoints

Loads the prepared-data artifact + checkpoint, propagates once, evaluates
P/R@K over the val∪test purchase users, and persists into ``--out``:

    metrics_K{K}.csv   per-user MARK frame + means  (reference ``:134``)
    hit_df.csv         per-(user, hit) shortest-path analysis with the
                       longer-than-3 flag                  (reference ``:143``)

The reference additionally serializes the whole networkx graph to JSON via
jsonpickle (``:50-57``) purely as an input to path computation; our BFS runs
directly on the in-memory CSR, so no graph dump is produced (documented
deviation — same outputs, one fewer multi-GB intermediate).
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np
import pandas as pd

from ..data.artifacts import load_prepared
from ..data.prepare import EvalSplit, CsrList
from ..eval.evaluate import build_eval_batch, evaluate
from ..eval.metrics import mark_frame
from ..explain.paths import build_adjacency, hit_paths_frame
from ..graph.build import build_graph
from ..models.lightgcn import LightGCNConfig, get_embedding
from ..train.checkpoint import BEST_NAME, load_checkpoint


def combined_eval_split(prepared) -> EvalSplit:
    """val ∪ test users with merged truth/mask lists (the reference evaluates
    over ``val+test`` user lists at inference time,
    ``src/inference_lightgcn.py:27-30``)."""
    frames = []
    for split in (prepared.val, prepared.test):
        lens = split.truth.lengths()
        frames.append(
            pd.DataFrame(
                {
                    "user": np.repeat(split.user_ids, lens),
                    "item": split.truth.values,
                }
            )
        )
        mlens = split.train_mask.lengths()
        frames.append(
            pd.DataFrame(
                {
                    "user": np.repeat(split.user_ids, mlens),
                    "item": split.train_mask.values,
                    "is_mask": True,
                }
            )
        )
    df = pd.concat(frames)
    df["is_mask"] = (
        df.get("is_mask", pd.Series(False, index=df.index)).fillna(False).astype(bool)
    )
    truth = df[~df["is_mask"]].drop_duplicates(["user", "item"])
    mask = df[df["is_mask"]].drop_duplicates(["user", "item"])
    users = np.unique(truth["user"].to_numpy())

    def to_csr(frame):
        f = frame[frame["user"].isin(users)].sort_values(["user", "item"])
        slots = np.searchsorted(users, f["user"].to_numpy())
        indptr = np.zeros(len(users) + 1, np.int64)
        np.add.at(indptr, slots + 1, 1)
        return CsrList(np.cumsum(indptr), f["item"].to_numpy(np.int64))

    return EvalSplit(
        user_ids=users.astype(np.int64), truth=to_csr(truth), train_mask=to_csr(mask)
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-d", "--data-dir", required=True, help="prepared artifact dir")
    ap.add_argument("-c", "--checkpoint-dir", required=True)
    ap.add_argument("--checkpoint-name", default=BEST_NAME)
    ap.add_argument("-k", type=int, default=20)
    ap.add_argument("--out", default="model-recommendations")
    ap.add_argument(
        "--no-paths", action="store_true", help="skip shortest-path explainability"
    )
    ap.add_argument(
        "--max-path-users", type=int, default=0,
        help="cap the number of hit users BFS-explained (0 = all; at full "
        "cosmetics scale each user is one CSR BFS over ~20M arcs)",
    )
    args = ap.parse_args(argv)

    prepared = load_prepared(args.data_dir)
    leaves, meta = load_checkpoint(args.checkpoint_dir, args.checkpoint_name)
    hp = meta.get("hyperparams", {})
    cfg = LightGCNConfig(
        num_nodes=prepared.n_users + prepared.n_items,
        embedding_dim=int(hp.get("latent_dim", 64)),
        num_layers=int(hp.get("n_layers", 3)),
    )
    from ..train.checkpoint import find_leaf

    params = {"embedding": jax.numpy.asarray(find_leaf(leaves, meta, "embedding"))}
    graph = build_graph(
        prepared.edge_user,
        prepared.edge_item_node,
        prepared.edge_weight,
        prepared.n_users,
        prepared.n_items,
        items_offset=True,
    )
    print(f"propagating {cfg.num_layers} layers over {graph.num_edges} edges ...")
    # One jitted program (op-by-op dispatch would compile each propagation op
    # separately — minutes through a remote TPU compile service).
    final_emb = jax.jit(lambda p, g: get_embedding(p, g, cfg))(params, graph)

    split = combined_eval_split(prepared)
    batch = build_eval_batch(split)
    precision, recall, per_recall, per_precision, topk_idx = evaluate(
        final_emb, batch, prepared.n_users, k=args.k
    )
    print(f"{len(split.user_ids)} eval users: P@{args.k} {precision:.6f}, "
          f"R@{args.k} {recall:.6f}")

    os.makedirs(args.out, exist_ok=True)
    truth_lists = [split.truth.row(i) for i in range(len(split.user_ids))]
    frame = mark_frame(split.user_ids, truth_lists, topk_idx, per_recall, per_precision)
    metrics_path = os.path.join(args.out, f"metrics_K{args.k}.csv")
    frame.to_csv(metrics_path, index=False)
    print(f"per-user metrics -> {metrics_path}")

    if not args.no_paths:
        adj = build_adjacency(
            prepared.edge_user, prepared.edge_item_node, prepared.n_users, prepared.n_items
        )
        path_users = split.user_ids
        path_topk = topk_idx
        path_truth = truth_lists
        if args.max_path_users > 0:
            hit_rows = np.flatnonzero(np.asarray(per_recall) > 0)[
                : args.max_path_users
            ]
            path_users = split.user_ids[hit_rows]
            path_topk = np.asarray(topk_idx)[hit_rows]
            path_truth = [truth_lists[i] for i in hit_rows]
            print(f"explaining the first {len(hit_rows)} hit users")
        hit_df = hit_paths_frame(
            adj, path_users, path_topk, [set(map(int, t)) for t in path_truth]
        )
        hit_path = os.path.join(args.out, "hit_df.csv")
        hit_df.to_csv(hit_path, index=False)
        n_long = int(hit_df["longer_than_3"].sum()) if len(hit_df) else 0
        print(f"{len(hit_df)} hit paths ({n_long} longer than 3 hops) -> {hit_path}")


if __name__ == "__main__":
    main()
