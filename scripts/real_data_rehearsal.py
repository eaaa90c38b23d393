"""Day-0 real-data rehearsal: raw Kaggle-schema monthly CSVs -> serving.

The reference's quality claims live on the real Kaggle "eCommerce Events
History in Cosmetics Shop" dump, unreachable from this environment (DVC /
GDrive remote, zero egress). This script makes the day the data appears a
one-command event: it fabricates a BYTE-EXACT Kaggle-schema fixture —

    event_time,event_type,product_id,category_id,category_code,brand,price,
    user_id,user_session

(9 columns, RFC-4180 quoted commas in brand/category_code, UUID sessions,
monthly split files exactly like the real dump's 2019-Oct.csv..2020-Feb.csv
— reference eda notebook cell 7 globs and concats them) — then drives the
ENTIRE production pipeline from those raw files, asserting each stage:

    glob+concat -> eda (stats JSON + profiling report + user_item_event.csv)
    -> preprocess (weight map/clamp/cap -> u_i_weight CSV)
    -> train (driver, checkpoints)
    -> infer (metrics CSV + BFS explainability)
    -> serve (REST predict round-trip)

On the real dump, only `fabricate` is skipped: point --raw-dir at the
directory of monthly CSVs (see docs/MIGRATION.md "Day-0 real data").

    python scripts/real_data_rehearsal.py --rows 1000000   # full rehearsal
    python scripts/real_data_rehearsal.py --rows 60000 --quick
"""
import argparse
import glob
import json
import os
import shutil
import sys
import threading
import time
import urllib.request
import uuid

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

MONTHS = ["2019-Oct", "2019-Nov", "2019-Dec", "2020-Jan", "2020-Feb"]
KAGGLE_COLUMNS = [
    "event_time", "event_type", "product_id", "category_id",
    "category_code", "brand", "price", "user_id", "user_session",
]


def fabricate(raw_dir: str, rows: int, seed: int = 42) -> dict:
    """Write monthly CSVs with the exact Kaggle schema and CSV dialect."""
    rng = np.random.default_rng(seed)
    os.makedirs(raw_dir, exist_ok=True)
    n_users, n_items = max(rows // 12, 50), max(rows // 400, 20)
    # Realistic value pools, including fields that FORCE RFC-4180 quoting.
    brands = np.array(
        ["runail", "irisk", "masura", "grattol", "estel", "kapous",
         'jas,"pro"', "co, ltd", ""], dtype=object
    )
    cats = np.array(
        ["appliances.environment.vacuum", "furniture.bathroom.bath",
         "stationery.cartrige", 'accessories.bag,"hand"', ""], dtype=object
    )
    etypes = np.array(["view", "cart", "remove_from_cart", "purchase"])
    month_starts = pd.to_datetime(
        ["2019-10-01", "2019-11-01", "2019-12-01", "2020-01-01", "2020-02-01"],
        utc=True,
    )
    per_month = np.full(len(MONTHS), rows // len(MONTHS))
    per_month[-1] += rows - per_month.sum()
    # Zipf-ish users/items so the weight pipeline's clamp/cap rules trigger.
    user_pool = rng.zipf(1.3, rows * 2) % n_users
    item_pool = rng.zipf(1.2, rows * 2) % n_items
    sessions = np.array([str(uuid.uuid4()) for _ in range(rows // 6 + 1)])
    written, lo = {}, 0
    for m, start, cnt in zip(MONTHS, month_starts, per_month):
        cnt = int(cnt)
        t = start + pd.to_timedelta(rng.integers(0, 28 * 24 * 3600, cnt), unit="s")
        df = pd.DataFrame(
            {
                "event_time": t.strftime("%Y-%m-%d %H:%M:%S UTC"),
                "event_type": etypes[
                    rng.choice(4, cnt, p=[0.75, 0.12, 0.06, 0.07])
                ],
                "product_id": 5_000_000 + item_pool[lo : lo + cnt],
                "category_id": 1_487_580_000_000_000_000
                + (item_pool[lo : lo + cnt] % 97),
                "category_code": cats[rng.integers(0, len(cats), cnt)],
                "brand": brands[rng.integers(0, len(brands), cnt)],
                "price": np.round(rng.lognormal(1.2, 0.9, cnt), 2),
                "user_id": 300_000_000 + user_pool[lo : lo + cnt],
                "user_session": sessions[rng.integers(0, len(sessions), cnt)],
            }
        )
        path = os.path.join(raw_dir, f"{m}.csv")
        df[KAGGLE_COLUMNS].to_csv(path, index=False)
        written[m] = cnt
        lo += cnt
    # Byte-exactness spot checks: header + quoting dialect.
    with open(os.path.join(raw_dir, f"{MONTHS[0]}.csv")) as f:
        header = f.readline().strip()
    assert header == ",".join(KAGGLE_COLUMNS), header
    return written


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--workdir", default="/tmp/real_data_rehearsal")
    ap.add_argument(
        "--raw-dir", default=None,
        help="existing directory of Kaggle monthly CSVs (skips fabrication "
        "— the real-data path)",
    )
    ap.add_argument("--quick", action="store_true",
                    help="2 train epochs, dim 16 (CI-sized)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    t_all = time.perf_counter()
    work = args.workdir
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    report = {"rows_requested": args.rows}

    # --- stage 0: fixture (or the real dump) ---
    raw_dir = args.raw_dir or os.path.join(work, "raw")
    if args.raw_dir is None:
        t0 = time.perf_counter()
        written = fabricate(raw_dir, args.rows)
        report["fabricate"] = {"per_month": written,
                               "s": round(time.perf_counter() - t0, 1)}
        print(f"[0] fabricated {sum(written.values()):,} rows over "
              f"{len(written)} monthly files ({report['fabricate']['s']}s)")

    # --- stage 1: glob + concat (reference eda cell 7) ---
    t0 = time.perf_counter()
    files = sorted(glob.glob(os.path.join(raw_dir, "*.csv")))
    assert files, f"no monthly CSVs under {raw_dir}"
    events = pd.concat((pd.read_csv(f) for f in files), ignore_index=True)
    assert list(events.columns) == KAGGLE_COLUMNS, list(events.columns)
    if args.raw_dir is None:
        assert len(events) == args.rows, (len(events), args.rows)
        # the quoted-comma fields survived the round trip
        assert (events["brand"] == "co, ltd").any()
    concat_path = os.path.join(work, "events_all.csv")
    events.to_csv(concat_path, index=False)
    report["concat"] = {"rows": int(len(events)), "files": len(files),
                        "s": round(time.perf_counter() - t0, 1)}
    print(f"[1] concat: {len(events):,} rows from {len(files)} files "
          f"({report['concat']['s']}s)")
    del events

    # --- stage 2: eda (stats + profile + projection) ---
    t0 = time.perf_counter()
    from gnn_ecommerce_tpu.cli.eda import main as eda_main

    stats_path = os.path.join(work, "stats.json")
    report_path = os.path.join(work, "profile.html")
    uie_path = os.path.join(work, "user_item_event.csv")
    eda_main([
        "--events", concat_path, "--item-col", "product_id",
        "--stats", stats_path, "--report", report_path,
        "--out-events", uie_path,
    ])
    stats = json.load(open(stats_path))
    assert stats["n_events"] == report["concat"]["rows"]
    assert os.path.getsize(report_path) > 10_000
    html = open(report_path).read()
    for sec in ("id='variables'", "id='missing'", "id='correlations'"):
        assert sec in html, sec
    report["eda"] = {"n_users": stats["n_users"], "n_items": stats["n_items"],
                     "s": round(time.perf_counter() - t0, 1)}
    print(f"[2] eda: {stats['n_users']:,} users x {stats['n_items']:,} items, "
          f"profile {os.path.getsize(report_path) // 1024} KB "
          f"({report['eda']['s']}s)")

    # --- stage 3: preprocess (weight map / clamp / cap) ---
    t0 = time.perf_counter()
    from gnn_ecommerce_tpu.cli.preprocess import main as prep_main

    edges_path = os.path.join(work, "u_i_weight.csv")
    prep_main([
        "--events", uie_path, "-o", edges_path, "--scheme", "v1",
    ])
    edges = pd.read_csv(edges_path)
    assert {"user_id", "item_id", "weight"} <= set(edges.columns)
    assert (edges["weight"] <= 1.0).all() and (edges["weight"] > 0).all()
    report["preprocess"] = {"unique_edges": int(len(edges)),
                            "s": round(time.perf_counter() - t0, 1)}
    print(f"[3] preprocess: {len(edges):,} unique weighted edges "
          f"({report['preprocess']['s']}s)")

    # --- stage 4: train ---
    t0 = time.perf_counter()
    from gnn_ecommerce_tpu.cli.train import main as train_main

    cwd = os.getcwd()
    os.chdir(work)  # train CLI writes data/prepared + model-checkpoints here
    try:
        dim, layers, epochs = (16, 2, 2) if args.quick else (32, 3, 5)
        train_main([
            "--edges", edges_path, "-e", str(epochs), "--dim", str(dim),
            "--layers", str(layers),
        ])
    finally:
        os.chdir(cwd)
    ck = os.path.join(work, "model-checkpoints", "LightGCN_best")
    assert os.path.exists(os.path.join(ck, "checkpoint.npz")), ck
    meta = json.load(open(os.path.join(ck, "meta.json")))
    report["train"] = {"best_epoch": meta["epoch"],
                       "val_recall": meta["recall"],
                       "s": round(time.perf_counter() - t0, 1)}
    print(f"[4] train: best epoch {meta['epoch']} val R@20 "
          f"{meta['recall']:.4f} ({report['train']['s']}s)")

    # --- stage 5: offline inference + explainability ---
    t0 = time.perf_counter()
    from gnn_ecommerce_tpu.cli.infer import main as infer_main

    out_dir = os.path.join(work, "recs")
    infer_main([
        "-d", os.path.join(work, "data", "prepared"),
        "-c", os.path.join(work, "model-checkpoints"),
        "--out", out_dir, "--max-path-users", "50",
    ])
    assert os.path.exists(os.path.join(out_dir, "metrics_K20.csv"))
    assert os.path.exists(os.path.join(out_dir, "hit_df.csv"))
    report["infer"] = {"s": round(time.perf_counter() - t0, 1)}
    print(f"[5] infer: metrics + hit_df written ({report['infer']['s']}s)")

    # --- stage 6: serving round trip ---
    t0 = time.perf_counter()
    from gnn_ecommerce_tpu.serve import (
        BatchingRecommender, RecommenderService, make_server,
    )

    svc = BatchingRecommender(
        RecommenderService.from_artifacts(
            os.path.join(work, "data", "prepared"),
            os.path.join(work, "model-checkpoints"),
        )
    )
    server = make_server(svc, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    uid = int(np.asarray(svc.prepared.sampler.users[0]))
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/models/lightgcn_recommender:predict",
        data=json.dumps([uid]).encode(),
        headers={"Content-Type": "application/json"},
    )
    resp = json.loads(urllib.request.urlopen(req).read())
    assert len(resp["items"]) == 1 and len(resp["items"][0]) == 20, resp
    server.shutdown()
    report["serve"] = {"user": uid, "items": resp["items"][0][:5],
                       "s": round(time.perf_counter() - t0, 1)}
    print(f"[6] serve: user {uid} -> 20 items ({report['serve']['s']}s)")

    report["total_s"] = round(time.perf_counter() - t_all, 1)
    out_path = os.path.join(cwd, "scripts", "real_data_rehearsal.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"ALL STAGES GREEN in {report['total_s']}s -> {out_path}")


if __name__ == "__main__":
    main()
