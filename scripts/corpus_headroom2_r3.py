"""Corpus headroom phase 2: refine around the phase-1 winner and add an
UNTRAINED-LightGCN proxy.

Phase 1 (corpus_headroom_r3.json): weighted 2-hop skyline (wcooc) beats the
popularity baseline 2.8x at n_clusters=512(full)/affinity=.85/item_skew=.9,
while the corpus used by the first TRAIN_FULL_r3 run is popularity-dominated
(wcooc 0.101 < pop 0.128 — no corpus a collaborative model could win on).

This phase re-measures the top configs and additionally runs the REAL model
at epoch 0: LightGCN forward (dim 80, 4 layers, Xavier init, the repo's
normalized propagation) on CPU, evaluated with the production bucketed eval.
The first full run's epoch-0 recall was already 80% of popularity, so the
epoch-0 proxy predicts where the trained model lands. Results:
scripts/corpus_headroom2_r3.json.
"""
import json
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1, events_to_edges
from gnn_ecommerce_tpu.data.prepare import prepare_splits, split_edges
from gnn_ecommerce_tpu.data.synthetic import synthetic_events
from gnn_ecommerce_tpu.eval import build_eval_batch, evaluate
from gnn_ecommerce_tpu.graph.build import build_graph
from gnn_ecommerce_tpu.models import LightGCNConfig, get_embedding, init_params
from gnn_ecommerce_tpu.ops.propagate import propagate_segment

N_USERS, N_ITEMS = 163_936, 5_457
N_EVENTS, N_PAIRS = 2_069_284, 1_015_741
K = 20


def topk_recall(scores, truth_rows, mask_rows) -> float:
    recs = []
    for r in range(scores.shape[0]):
        s = scores[r]
        m = mask_rows[r]
        if len(m):
            s = s.copy()
            s[m] = -np.inf
        top = np.argpartition(s, -K)[-K:]
        recs.append(len(np.intersect1d(top, truth_rows[r])) / max(1, len(truth_rows[r])))
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

    s = prep.sampler
    pu = np.repeat(s.users, np.diff(s.pos_indptr))
    pi = s.pos_flat - nu
    R = sp.csr_matrix((np.ones(len(pu), np.float32), (pu, pi)), shape=(nu, ni))
    Rw = sp.csr_matrix(
        (prep.edge_weight.astype(np.float32),
         (prep.edge_user, prep.edge_item_node - nu)),
        shape=(nu, ni),
    )
    val = prep.val
    vids = val.user_ids
    truth_rows = [val.truth.row(r) for r in range(len(vids))]
    mask_rows = [val.train_mask.row(r) for r in range(len(vids))]

    pop = np.asarray(R.sum(axis=0)).ravel()
    r_pop = topk_recall(
        np.broadcast_to(pop, (len(vids), ni)).copy(), truth_rows, mask_rows
    )
    Cw = (Rw.T @ Rw).tocsr()
    Cw.setdiag(0)
    Sw = np.asarray((Rw[vids] @ Cw).todense(), dtype=np.float32)
    r_wcooc = topk_recall(Sw, truth_rows, mask_rows)

    # Epoch-0 LightGCN: Xavier init, normalized 4-layer propagation,
    # production eval path (same config as the full run).
    graph = build_graph(
        prep.edge_user, prep.edge_item_node - nu, prep.edge_weight, nu, ni
    )
    cfg = LightGCNConfig(num_nodes=nu + ni, embedding_dim=80, num_layers=4)
    params = init_params(jax.random.key(42), cfg)
    emb = get_embedding(params, graph, cfg, propagate_segment)
    batch = build_eval_batch(val)
    _, r_ep0, _, _, _ = evaluate(emb, batch, nu, k=K)

    out = dict(
        name=name, **gen_kwargs, n_val_users=len(vids),
        pop=round(r_pop, 5), wcooc=round(r_wcooc, 5),
        lightgcn_epoch0=round(float(r_ep0), 5),
        ep0_over_pop=round(float(r_ep0) / max(r_pop, 1e-9), 2),
        wall_s=round(time.time() - t0, 1),
    )
    print(json.dumps(out), flush=True)
    return out


def main():
    configs = [
        ("cur_c48_a.70", dict(n_clusters=5, affinity=0.7)),
        ("c512_a.85_sk.9", dict(n_clusters=51, affinity=0.85, item_skew=0.9)),
        ("c768_a.85_sk.9", dict(n_clusters=77, affinity=0.85, item_skew=0.9)),
        ("c512_a.90_sk.8", dict(n_clusters=51, affinity=0.9, item_skew=0.8)),
    ]
    results = [eval_config(n, kw) for n, kw in configs]
    with open("/root/repo/scripts/corpus_headroom2_r3.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
