"""Dataset statistics (reference ``notebooks/0.eda.ipynb``).

Reproduces the EDA quantities the reference derives across cells 7-41 —
event/user/item counts, event-type shares, purchase share, events-per-user
distribution, single-event-type users — as one vectorized function instead of
a notebook + ydata_profiling report. Output keys mirror the notebook's
headline numbers (SURVEY.md §6: 20,692,840 events; 1,639,358 users; 54,571
items; 6.22% purchases; 77.3% single-event-type users, 97.6% of those
view-only; max 20,492 events per user).
"""
from __future__ import annotations

import pandas as pd


def event_stats(events: pd.DataFrame) -> dict:
    """Compute the reference EDA summary for an event log
    (columns ``user_id``, ``item_id``, ``event_type``)."""
    n_events = len(events)
    type_counts = events["event_type"].value_counts()
    per_user = events.groupby("user_id").size()
    types_per_user = events.groupby("user_id")["event_type"].nunique()
    single_type_users = types_per_user[types_per_user == 1].index
    single_view = 0
    if len(single_type_users):
        first_type = events.drop_duplicates("user_id").set_index("user_id")[
            "event_type"
        ]
        single_view = int((first_type.loc[single_type_users] == "view").sum())
    return {
        "n_events": int(n_events),
        "n_users": int(events["user_id"].nunique()),
        "n_items": int(events["item_id"].nunique()),
        "event_type_counts": type_counts.to_dict(),
        "purchase_share": float(type_counts.get("purchase", 0) / max(n_events, 1)),
        "events_per_user_mean": float(per_user.mean()),
        "events_per_user_median": float(per_user.median()),
        "events_per_user_max": int(per_user.max()),
        "single_event_type_user_share": float(
            len(single_type_users) / max(types_per_user.size, 1)
        ),
        "single_type_view_only_share": float(
            single_view / max(len(single_type_users), 1)
        ),
    }
