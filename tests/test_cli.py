"""CLI end-to-end: preprocess -> train -> infer on a tiny synthetic dataset.

Runs the module entry points in-process (argv injection) on the CPU backend;
checks artifacts, checkpoints, metrics CSVs, and config loading.
"""
import json
import os

import numpy as np
import pandas as pd
import pytest

from gnn_ecommerce_tpu.cli import infer as infer_cli
from gnn_ecommerce_tpu.cli import preprocess as preprocess_cli
from gnn_ecommerce_tpu.cli import train as train_cli
from gnn_ecommerce_tpu.cli.config import FrameworkConfig
from gnn_ecommerce_tpu.data import synthetic_events


def test_preprocess_cli(tmp_path):
    events_path = tmp_path / "events.csv"
    synthetic_events(n_users=50, n_items=20, n_events=500, seed=1).to_csv(
        events_path, index=False
    )
    out = tmp_path / "edges.csv"
    preprocess_cli.main(["--events", str(events_path), "-o", str(out), "--scheme", "v2"])
    edges = pd.read_csv(out)
    assert set(edges.columns) == {"user_id", "item_id", "weight"}
    assert (edges["weight"] <= 1.0).all()
    assert (edges["weight"] >= min(0.15, 0.5)).all()  # v2 view weight floor


def test_train_infer_cli_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    train_cli.main(
        [
            "--synthetic",
            "--synthetic-users", "200",
            "--synthetic-items", "50",
            "--synthetic-events", "4000",
            "-e", "2",
            "--dim", "16",
            "--layers", "2",
        ]
    )
    assert os.path.exists("data/prepared/manifest.json")
    assert os.path.exists("model-checkpoints/LightGCN_best/checkpoint.npz")
    meta = json.load(open("model-checkpoints/LightGCN_best/meta.json"))
    assert meta["hyperparams"]["latent_dim"] == 16
    log_lines = [
        json.loads(l) for l in open("model-checkpoints/train_log.jsonl")
    ]
    epochs = [l for l in log_lines if "epoch" in l]
    assert len(epochs) == 2

    infer_cli.main(
        ["-d", "data/prepared", "-c", "model-checkpoints", "--out", "recs", "-k", "10"]
    )
    metrics = pd.read_csv("recs/metrics_K10.csv")
    assert {"user_id_idx", "top_rlvnt_itm", "recall", "precision"} <= set(metrics.columns)
    assert len(metrics) > 0
    hit_df = pd.read_csv("recs/hit_df.csv")
    assert {"user_id_idx", "path_length", "longer_than_3"} <= set(hit_df.columns)


def test_framework_config_yaml_roundtrip(tmp_path):
    cfg = FrameworkConfig(weight_scheme="v2")
    cfg.train.epochs = 7
    path = tmp_path / "fw.yaml"
    cfg.dump(str(path))
    loaded = FrameworkConfig.load(str(path))
    assert loaded.train.epochs == 7
    assert loaded.weights()["view"] == 0.15


def test_framework_config_rejects_unknown_keys(tmp_path):
    path = tmp_path / "bad.yaml"
    path.write_text("weight_scheme: v1\nnot_a_key: 3\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        FrameworkConfig.load(str(path))
    path.write_text("train:\n  not_a_field: 1\n")
    with pytest.raises(ValueError, match="unknown train config keys"):
        FrameworkConfig.load(str(path))


def test_eda_cli(tmp_path):
    from gnn_ecommerce_tpu.cli import eda as eda_cli

    events_path = tmp_path / "raw.csv"
    ev = synthetic_events(n_users=80, n_items=30, n_events=900, seed=3)
    ev = ev.rename(columns={"item_id": "product_id"})
    ev["price"] = 1.5
    ev.to_csv(events_path, index=False)
    stats_p = tmp_path / "stats.json"
    report_p = tmp_path / "report.html"
    out_ev = tmp_path / "user_item_event.csv"
    eda_cli.main(
        [
            "--events", str(events_path), "--item-col", "product_id",
            "--stats", str(stats_p), "--report", str(report_p),
            "--out-events", str(out_ev),
        ]
    )
    stats = json.load(open(stats_p))
    assert stats["n_events"] == len(ev)
    assert stats["n_users"] == ev["user_id"].nunique()
    assert 0.0 <= stats["purchase_share"] <= 1.0
    proj = pd.read_csv(out_ev)
    assert list(proj.columns) == ["user_id", "item_id", "event_type"]
    html = open(report_p).read()
    assert html.startswith("<!doctype html") and "Headline statistics" in html


def test_movielens_loader_and_training(tmp_path, monkeypatch):
    from gnn_ecommerce_tpu.data.movielens import load_movielens

    rng = np.random.default_rng(0)
    n = 3000
    rows = np.stack(
        [
            rng.integers(1, 200, n),
            rng.integers(1, 60, n),
            rng.integers(1, 6, n),
            np.full(n, 881250949),
        ],
        axis=1,
    )
    udata = tmp_path / "u.data"
    np.savetxt(udata, rows, fmt="%d", delimiter="\t")
    edges = load_movielens(str(udata))
    assert set(edges.columns) == {"user_id", "item_id", "weight"}
    src = pd.read_csv(udata, sep="\t", header=None)
    assert ((src[2] >= 4).to_numpy() == (edges["weight"].to_numpy() == 1.0)).all()
    assert (edges.loc[edges["weight"] < 1.0, "weight"] <= 0.5).all()

    monkeypatch.chdir(tmp_path)
    train_cli.main(
        ["--movielens", str(udata), "-e", "1", "--dim", "8", "--layers", "2"]
    )
    assert os.path.exists("model-checkpoints/LightGCN_best/checkpoint.npz")


def test_synthetic_movielens_shape_invariants():
    """ML-100K shape properties the benchmark scripts rely on: ~100K
    ratings, 1-based ids, and EVERY user >= 20 ratings (truncation must not
    eat into any user's first 20 — round-3 review finding)."""
    from gnn_ecommerce_tpu.data.movielens import synthetic_movielens

    df = synthetic_movielens(seed=42)
    assert 99_000 <= len(df) <= 100_000  # scale loop tolerance ±n_users
    assert df["user_id"].min() >= 1 and df["item_id"].min() >= 1
    assert int(df.groupby("user_id").size().min()) >= 20
    assert df["rating"].between(1, 5).all()
    # Force the over-target truncation branch: surplus rows must be dropped
    # only from users with > 20 ratings.
    small = synthetic_movielens(n_users=100, n_items=300, n_ratings=2100, seed=1)
    assert len(small) <= 2100 + 100
    assert int(small.groupby("user_id").size().min()) >= 20


def test_movielens_tsv_with_header(tmp_path):
    from gnn_ecommerce_tpu.data.movielens import load_movielens

    path = tmp_path / "ratings.tsv"
    path.write_text(
        "user_id\titem_id\trating\ttimestamp\n1\t10\t5\t99\n2\t11\t2\t99\n"
    )
    edges = load_movielens(str(path))
    assert len(edges) == 2
    assert edges.loc[0, "weight"] == 1.0
    assert edges.loc[1, "weight"] == pytest.approx(0.2)


@pytest.mark.parametrize(
    "argv,env",
    [
        (["--num-processes", "2", "--process-id", "0"], {}),
        (["--process-id", "1"], {}),
        ([], {"JAX_COORDINATOR_ADDRESS": "h0:9999"}),
    ],
)
def test_train_cli_bootstrap_gate_fires_on_any_signal(
    tmp_path, monkeypatch, argv, env
):
    """ANY multi-host bootstrap signal (--num-processes/--process-id/the
    JAX_COORDINATOR_ADDRESS env var) must reach init_distributed — flags
    without --distributed/--coordinator previously ran every host as an
    independent single-process job (round-5 session-2 review finding)."""
    calls = []

    from gnn_ecommerce_tpu.parallel import distributed as dist_mod

    monkeypatch.setattr(
        dist_mod, "init_distributed",
        lambda **kw: (calls.append(kw), {"mocked": True})[1],
    )
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"data_dir: {tmp_path}/prep\ncheckpoint_dir: {tmp_path}/ckpt\n"
    )
    train_cli.main(
        ["--config", str(cfg), "--synthetic", "-e", "1",
         "--synthetic-users", "200", "--synthetic-items", "40",
         "--synthetic-events", "4000", *argv]
    )
    assert len(calls) == 1  # the gate fired exactly once
