"""Host-side shakeout of the full-scale ETL path (no TPU needed).

Generates the cosmetics-scale clustered synthetic event log (20.7M events,
1.64M x 54.6K), runs events_to_edges + split_edges + prepare_splits — the
exact path `cli/train.py --synthetic` takes — and prints timing + the
structure stats that size the on-chip eval (val/test user counts, truth and
mask pad widths). Writes scripts/etl_scale_stats.json.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1, events_to_edges
from gnn_ecommerce_tpu.data.prepare import prepare_splits, split_edges
from gnn_ecommerce_tpu.data.synthetic import synthetic_events

N_USERS = 1_639_358
N_ITEMS = 54_571
N_EVENTS = 20_692_840


def main():
    t = {}
    t0 = time.perf_counter()
    events = synthetic_events(
        n_users=N_USERS, n_items=N_ITEMS, n_events=N_EVENTS, seed=42,
        n_clusters=48, affinity=0.7, n_pairs=10_157_407,
    )
    t["gen_s"] = time.perf_counter() - t0
    print(f"events: {len(events)} ({t['gen_s']:.1f}s)", flush=True)

    t0 = time.perf_counter()
    edges = events_to_edges(events, EVENT_TYPE_WEIGHTS_V1)
    t["edges_s"] = time.perf_counter() - t0
    print(f"edges: {len(edges)} ({t['edges_s']:.1f}s)", flush=True)
    del events

    t0 = time.perf_counter()
    tr, va, te = split_edges(edges, seed=42)
    t["split_s"] = time.perf_counter() - t0
    del edges
    t0 = time.perf_counter()
    prepared = prepare_splits(tr, va, te)
    t["prepare_s"] = time.perf_counter() - t0
    print(f"prepare: {t['prepare_s']:.1f}s", flush=True)

    stats = {
        "n_events": N_EVENTS,
        "n_edges_train": int(len(prepared.edge_user)),
        "n_users": prepared.n_users,
        "n_items": prepared.n_items,
        "sampler_users": int(len(prepared.sampler.users)),
        "pos_flat": int(len(prepared.sampler.pos_flat)),
        "purchase_share": float(
            (prepared.edge_weight == 1.0).mean()
        ),
        **t,
    }
    for name, split in (("val", prepared.val), ("test", prepared.test)):
        tl = split.truth.lengths()
        ml = split.train_mask.lengths()
        stats[name] = {
            "users": int(len(split.user_ids)),
            "truth_max": int(tl.max(initial=0)),
            "truth_mean": float(tl.mean()) if len(tl) else 0.0,
            "mask_max": int(ml.max(initial=0)),
            "mask_mean": float(ml.mean()) if len(ml) else 0.0,
            "mask_p99": int(np.percentile(ml, 99)) if len(ml) else 0,
            "padded_mask_MB": round(len(split.user_ids) * int(ml.max(initial=0)) * 4 / 1e6, 1),
        }
    print(json.dumps(stats, indent=2), flush=True)
    with open("/root/repo/scripts/etl_scale_stats.json", "w") as f:
        json.dump(stats, f, indent=2)


if __name__ == "__main__":
    main()
