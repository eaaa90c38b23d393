"""Event-log → weighted-edge pipeline.

Reference: ``notebooks/1.data_preprocessing.ipynb`` cells 9 (``raw_edge_weight``)
and 14 (``proper_edge_weight``), driven by the event-type weight dicts in
``config.yaml:10-11`` (v1: view 0.01 / cart 0.1 / remove_from_cart -0.09 /
purchase 1.0; v2: 0.15 / 0.35 / -0.2 / 1.0).

Semantics reproduced exactly (vectorized instead of pandas ``apply``):
1. map each event to its type weight;
2. sum weights per (user, item); a sum below the ``view`` weight clamps to the
   ``view`` weight (the notebook's ``view if x.sum() < view else x.sum()``);
3. track whether the pair ever had a ``purchase`` event;
4. cap: sum > 1 and purchased → 1.0; sum > 1 and not purchased → 0.5.

Note the downstream quirk this preserves: "positive" items are rows with
weight == 1.0 exactly (``src/utils_v2.py:15,70``), so a purchased pair whose
weight sum lands below 1.0 (e.g. purchase + remove_from_cart) is NOT a
positive for sampling/eval, matching the reference.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

EVENT_TYPE_WEIGHTS_V1 = {"view": 0.01, "cart": 0.1, "remove_from_cart": -0.09, "purchase": 1.0}
EVENT_TYPE_WEIGHTS_V2 = {"view": 0.15, "cart": 0.35, "remove_from_cart": -0.2, "purchase": 1.0}


def raw_edge_weight(events: pd.DataFrame, type_weights: dict) -> pd.DataFrame:
    """Aggregate events into raw per-(user,item) edge weights.

    Args:
        events: columns ``user_id``, ``item_id``, ``event_type``.
        type_weights: event_type → weight mapping.

    Returns:
        columns ``user_id``, ``item_id``, ``weight``, ``purchased``.
    """
    view = type_weights["view"]
    weights = events["event_type"].map(type_weights)
    if weights.isna().any():
        unknown = sorted(set(events.loc[weights.isna(), "event_type"]))
        raise ValueError(f"unknown event types: {unknown}")
    purchased = events["event_type"].eq("purchase")

    # Factorize raw ids to dense codes, aggregate with the native counting-
    # sort groupby (numpy lexsort fallback inside), map codes back. Same
    # result as pandas groupby(sort=True) since factorize uniques are sorted.
    from ..native import groupby_edges

    u_codes, u_uniques = pd.factorize(events["user_id"], sort=True)
    i_codes, i_uniques = pd.factorize(events["item_id"], sort=True)
    gu, gi, gw, gp = groupby_edges(
        u_codes.astype(np.int64),
        i_codes.astype(np.int64),
        weights.to_numpy(np.float64),
        purchased.to_numpy(np.uint8),
        len(u_uniques),
        len(i_uniques),
    )
    agg = pd.DataFrame(
        {
            "user_id": np.asarray(u_uniques)[gu],
            "item_id": np.asarray(i_uniques)[gi],
            "weight": gw,
            "purchased": gp.astype(bool),
        }
    )
    agg.loc[agg["weight"] < view, "weight"] = view
    return agg


def proper_edge_weight(raw: pd.DataFrame) -> pd.DataFrame:
    """Cap over-1 weights (purchased → 1.0, else 0.5); drop the purchased flag."""
    out = raw.copy()
    over = out["weight"] > 1.0
    out.loc[over & out["purchased"], "weight"] = 1.0
    out.loc[over & ~out["purchased"], "weight"] = 0.5
    return out[["user_id", "item_id", "weight"]]


def events_to_edges(events: pd.DataFrame, type_weights: dict) -> pd.DataFrame:
    """Full pipeline: events → capped (user, item, weight) edges."""
    return proper_edge_weight(raw_edge_weight(events, type_weights))
