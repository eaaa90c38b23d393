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
