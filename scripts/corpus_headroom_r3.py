"""Corpus headroom study: which synthetic-corpus config gives collaborative
models real headroom over global popularity?

TRAIN_FULL_r3 (first run: n_clusters=48, affinity=0.7) trained LightGCN to
val R@20 0.0854 vs a global-popularity baseline of 0.0870 — a tie, i.e. the
planted-cluster corpus at that setting is popularity-dominated and cannot
demonstrate that the framework learns collaborative structure. This script
measures, per candidate config at 1/10 scale (both axes scaled 10x so
degrees/user and degrees/item match full scale), three model-free skylines
on the SAME split protocol as training:

- pop:    global train-purchase-popularity top-20, train-mask removed
          (the baseline recorded in scripts/popularity_baseline_r3.json);
- cooc:   2-hop purchase co-occurrence scores S = R_val @ (R^T R), diag
          zeroed — exactly the signal LightGCN's bipartite propagation
          (B_ii = A_iu A_ui, ops/bipartite.py) can exploit;
- wcooc:  same with the full weighted train interaction matrix.

A config is a good full-run candidate iff cooc >> pop. Pure numpy/scipy,
no chip time. Results: scripts/corpus_headroom_r3.json.
"""
import json
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")

from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1, events_to_edges
from gnn_ecommerce_tpu.data.prepare import prepare_splits, split_edges
from gnn_ecommerce_tpu.data.synthetic import synthetic_events

N_USERS, N_ITEMS = 163_936, 5_457
N_EVENTS, N_PAIRS = 2_069_284, 1_015_741
K = 20


def topk_recall(scores: np.ndarray, truth_rows, mask_rows) -> float:
    """Mean recall@K; scores [Nu, I] dense, truth/mask lists of id arrays."""
    recs = []
    for r in range(scores.shape[0]):
        s = scores[r]
        m = mask_rows[r]
        if len(m):
            s = s.copy()
            s[m] = -np.inf
        top = np.argpartition(s, -K)[-K:]
        t = truth_rows[r]
        recs.append(len(np.intersect1d(top, t)) / max(1, len(t)))
    return float(np.mean(recs))


def eval_config(name: str, gen_kwargs: dict) -> dict:
    t0 = time.time()
    events = synthetic_events(
        n_users=N_USERS, n_items=N_ITEMS, n_events=N_EVENTS, seed=42,
        n_pairs=N_PAIRS, **gen_kwargs,
    )
    edges = events_to_edges(events, EVENT_TYPE_WEIGHTS_V1)
    tr, va, te = split_edges(edges, seed=42)
    prep = prepare_splits(tr, va, te)
    nu, ni = prep.n_users, prep.n_items

    # Train purchase matrix (binary) from the sampler pos lists.
    s = prep.sampler
    pu = np.repeat(s.users, np.diff(s.pos_indptr))
    pi = s.pos_flat - nu
    R = sp.csr_matrix((np.ones(len(pu), np.float32), (pu, pi)), shape=(nu, ni))
    # Weighted full interaction matrix from all train edges.
    Rw = sp.csr_matrix(
        (prep.edge_weight.astype(np.float32),
         (prep.edge_user, prep.edge_item_node - nu)),
        shape=(nu, ni),
    )

    val = prep.val
    vids = val.user_ids
    truth_rows = [val.truth.row(r) for r in range(len(vids))]
    mask_rows = [val.train_mask.row(r) for r in range(len(vids))]

    # Popularity baseline.
    pop = np.asarray(R.sum(axis=0)).ravel()
    pop_scores = np.broadcast_to(pop, (len(vids), ni)).copy()
    r_pop = topk_recall(pop_scores, truth_rows, mask_rows)

    # Purchase co-occurrence oracle.
    C = (R.T @ R).tocsr()
    C.setdiag(0)
    S = np.asarray((R[vids] @ C).todense(), dtype=np.float32)
    r_cooc = topk_recall(S, truth_rows, mask_rows)

    # Weighted 2-hop oracle.
    Cw = (Rw.T @ Rw).tocsr()
    Cw.setdiag(0)
    Sw = np.asarray((Rw[vids] @ Cw).todense(), dtype=np.float32)
    r_wcooc = topk_recall(Sw, truth_rows, mask_rows)

    out = dict(
        name=name, **gen_kwargs, n_val_users=len(vids),
        pop=round(r_pop, 5), cooc=round(r_cooc, 5), wcooc=round(r_wcooc, 5),
        cooc_over_pop=round(r_cooc / max(r_pop, 1e-9), 2),
        wall_s=round(time.time() - t0, 1),
    )
    print(json.dumps(out), flush=True)
    return out


def main():
    # n_clusters at 1/10 item scale chosen to preserve items-per-cluster of
    # the intended FULL-scale config (full value in the name).
    configs = [
        ("cur_c48_a.70", dict(n_clusters=5, affinity=0.7)),
        ("c128_a.85", dict(n_clusters=13, affinity=0.85)),
        ("c256_a.85", dict(n_clusters=26, affinity=0.85)),
        ("c256_a.90_sk.8", dict(n_clusters=26, affinity=0.9, item_skew=0.8)),
        ("c512_a.85_sk.9", dict(n_clusters=51, affinity=0.85, item_skew=0.9)),
        ("c128_a.95", dict(n_clusters=13, affinity=0.95)),
    ]
    results = [eval_config(n, kw) for n, kw in configs]
    with open("/root/repo/scripts/corpus_headroom_r3.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
