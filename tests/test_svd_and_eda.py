"""SVD baseline (vs planted structure + surprise-semantics metric) and EDA."""
import numpy as np
import pandas as pd
import pytest

from gnn_ecommerce_tpu.models.svd import (
    SVDConfig,
    fit_svd,
    precision_recall_at_k,
    predict,
)


@pytest.fixture(scope="module")
def planted():
    """Low-rank planted ratings: two user groups x two item groups."""
    rng = np.random.default_rng(5)
    n_users, n_items, n_obs = 120, 60, 3000
    u = rng.integers(0, n_users, n_obs)
    i = rng.integers(0, n_items, n_obs)
    affinity = ((u < 60) == (i < 30)).astype(np.float64)
    r = np.clip(0.2 + 0.8 * affinity + rng.normal(0, 0.05, n_obs), 0, 1.2)
    return n_users, n_items, u, i, r.astype(np.float32)


def test_svd_learns_planted_structure(planted):
    n_users, n_items, u, i, r = planted
    split = int(0.8 * len(u))
    cfg = SVDConfig(n_factors=8, n_epochs=30, batch_size=512)
    params = fit_svd(u[:split], i[:split], r[:split], n_users, n_items, cfg)
    import jax.numpy as jnp

    est = np.asarray(predict(params, jnp.asarray(u[split:]), jnp.asarray(i[split:])))
    truth = r[split:]
    rmse = float(np.sqrt(np.mean((est - truth) ** 2)))
    baseline = float(np.sqrt(np.mean((truth.mean() - truth) ** 2)))
    assert rmse < 0.6 * baseline, (rmse, baseline)


def test_svd_precision_recall_semantics():
    """Hand-checked surprise precision_recall_at_k example."""
    params = {"__est__": None}
    # Bypass fit: craft ests directly via a stub params/predict path.
    import gnn_ecommerce_tpu.models.svd as svd_mod

    users = np.array([0, 0, 0, 1, 1])
    items = np.array([0, 1, 2, 0, 1])
    ratings = np.array([1.0, 0.0, 1.0, 1.0, 1.0], np.float32)
    ests = np.array([0.9, 0.8, 0.1, 0.4, 0.6], np.float32)
    orig = svd_mod.predict
    try:
        svd_mod.predict = lambda p, u, i: ests
        precision, recall = precision_recall_at_k(
            params, users, items, ratings, k=2, rel_threshold=1.0, est_threshold=0.5
        )
    finally:
        svd_mod.predict = orig
    # user 0: top-2 by est = items 0,1 (est .9,.8 >= .5 -> both rec);
    #   relevant = {0, 2}; both sets intersect at {0}: P=1/2, R=1/2.
    # user 1: top-2 = items 1(.6),0(.4); rec = {1} (0.4 < thresh);
    #   relevant = {0,1}; intersection {1}: P=1/1, R=1/2.
    assert precision == pytest.approx((0.5 + 1.0) / 2)
    assert recall == pytest.approx(0.5)


def test_event_stats():
    from gnn_ecommerce_tpu.data.eda import event_stats

    events = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "item_id": [10, 11, 10, 10, 12, 11],
            "event_type": ["view", "cart", "purchase", "view", "view", "view"],
        }
    )
    s = event_stats(events)
    assert s["n_events"] == 6
    assert s["n_users"] == 3
    assert s["n_items"] == 3
    assert s["purchase_share"] == pytest.approx(1 / 6)
    assert s["events_per_user_max"] == 3
    # users 2 and 3 are single-event-type (both view-only).
    assert s["single_event_type_user_share"] == pytest.approx(2 / 3)
    assert s["single_type_view_only_share"] == pytest.approx(1.0)


def test_event_stats_synthetic_shape():
    from gnn_ecommerce_tpu.data.eda import event_stats
    from gnn_ecommerce_tpu.data.synthetic import synthetic_events

    s = event_stats(synthetic_events(n_users=500, n_items=100, n_events=10000))
    assert 0.03 < s["purchase_share"] < 0.12  # EVENT_PROBS purchase = 6.3%
    assert s["events_per_user_max"] > s["events_per_user_mean"]


def test_svd_cli_cv(tmp_path):
    """SVD baseline CLI: 2-fold CV on a planted-structure edge list produces
    sane, structure-reflecting P/R@K."""
    import json as _json

    from gnn_ecommerce_tpu.cli import svd as svd_cli

    rng = np.random.default_rng(7)
    n = 4000
    u = rng.integers(0, 150, n)
    i = rng.integers(0, 60, n)
    affinity = ((u < 75) == (i < 30)).astype(np.float64)
    w = np.where(affinity > 0, 1.0, 0.2).astype(np.float32)
    edges = pd.DataFrame({"user_id": u, "item_id": i, "weight": w})
    path = tmp_path / "edges.csv"
    edges.to_csv(path, index=False)
    out = tmp_path / "svd.json"
    svd_cli.main(
        ["--edges", str(path), "--folds", "2", "-k", "10",
         "--factors", "8", "--epochs", "15", "--out", str(out)]
    )
    res = _json.load(open(out))
    assert len(res["precision_per_fold"]) == 2
    assert res["recall_mean"] > 0.5  # planted structure is easy
    assert 0.0 <= res["precision_mean"] <= 1.0


def test_profile_report_sections(tmp_path):
    """The profiling report must reach ydata-profiling depth (reference
    your_report.html, eda notebook cells 13-15): per-column distributions
    with quantiles, a missing-value matrix, Pearson+Spearman correlations,
    and a documented sample — enumerated here section by section."""
    import numpy as np
    import pandas as pd

    from gnn_ecommerce_tpu.data.profile import profile_frame, profile_report

    rng = np.random.default_rng(0)
    n = 5000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 400, n),
            "price": np.round(rng.lognormal(1.5, 0.8, n), 2),
            "event_type": rng.choice(
                ["view", "cart", "remove_from_cart", "purchase"],
                n, p=[0.75, 0.12, 0.05, 0.08],
            ),
            "brand": rng.choice(["a", "b", "c", None], n, p=[0.4, 0.3, 0.1, 0.2]),
            "event_time": pd.to_datetime("2019-10-01")
            + pd.to_timedelta(rng.integers(0, 90 * 24, n), unit="h"),
        }
    )
    df["qty"] = (df["price"] * 0.5 + rng.normal(0, 1, n)).round()  # correlated

    prof = profile_frame(df, sample_rows=4000, seed=1)
    ov = prof["overview"]
    assert ov["rows"] == n and ov["sampled"] and ov["sample_rows"] == 4000
    # exact missing counts survive sampling
    assert prof["variables"]["brand"]["missing"] == int(df["brand"].isna().sum())
    # numeric variables carry quantiles + a histogram
    pv = prof["variables"]["price"]
    stat_keys = [k for k, _ in pv["stats"]]
    for q in ("q1", "q5", "q25", "q50", "q75", "q95", "q99"):
        assert q in stat_keys
    assert len(pv["hist"][0]) == 24
    # categorical variables carry a frequency chart
    assert prof["variables"]["event_type"]["kind"] == "categorical"
    assert sum(prof["variables"]["event_type"]["hist"][0]) == 4000
    # datetime column recognized and bucketed by month
    assert prof["variables"]["event_time"]["kind"] == "datetime"
    assert len(prof["variables"]["event_time"]["hist"][0]) >= 3
    # correlations: both methods, price~qty strongly positive
    cols = prof["correlations"]["columns"]
    i, j = cols.index("price"), cols.index("qty")
    assert prof["correlations"]["pearson"][i][j] > 0.5
    assert prof["correlations"]["spearman"][i][j] > 0.5

    html = profile_report(df, title="t", sample_rows=4000)
    for section in (
        "id='overview'", "id='variables'", "id='missing'",
        "id='correlations'", "id='sample'", "<svg", "Spearman", "Pearson",
        "uniform sample",
    ):
        assert section in html, section
    (tmp_path / "report.html").write_text(html)


def test_eda_cli_writes_profile_report(tmp_path):
    import runpy
    import sys

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(1)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 50, 800),
            "product_id": rng.integers(0, 20, 800),
            "event_type": rng.choice(["view", "purchase"], 800),
            "price": rng.uniform(1, 50, 800).round(2),
        }
    )
    events = tmp_path / "events.csv"
    df.to_csv(events, index=False)
    report = tmp_path / "report.html"
    from gnn_ecommerce_tpu.cli.eda import main

    main([
        "--events", str(events), "--item-col", "product_id",
        "--report", str(report),
    ])
    text = report.read_text()
    assert "id='correlations'" in text and "id='missing'" in text
    assert "Headline statistics" in text
