"""Synthetic e-commerce event generator.

Produces event logs with the schema and distributional shape of the Kaggle
cosmetics-shop dataset the reference trains on (BASELINE.md: 20.7M events,
1.64M users × 54.6K items, ~6.2% purchases, heavy power-law skew in user
activity and item popularity, max 20K events per user). Used for tests and
benchmarks since the raw dataset only exists behind the reference's DVC
remote (``data/raw/*.dvc``) and this environment has no egress.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

# Event mix approximating the reference EDA (0.eda.ipynb cell 21: 6.22%
# purchases; views dominate).
EVENT_PROBS = {"view": 0.80, "cart": 0.09, "remove_from_cart": 0.047, "purchase": 0.063}


def _zipf_choice(rng: np.random.Generator, n: int, size: int, a: float) -> np.ndarray:
    """Draw ids in [0, n) with a Zipf-like popularity profile."""
    # Inverse-CDF sampling over ranks with weight rank^-a.
    ranks = np.arange(1, n + 1, dtype=np.float64)
    probs = ranks ** (-a)
    probs /= probs.sum()
    return rng.choice(n, size=size, p=probs)


def synthetic_events(
    n_users: int = 2000,
    n_items: int = 300,
    n_events: int = 20000,
    seed: int = 0,
    user_skew: float = 0.8,
    item_skew: float = 1.0,
) -> pd.DataFrame:
    """Generate an event log DataFrame(user_id, item_id, event_type).

    User/item ids are drawn with power-law skew, then users are mapped through
    a random permutation of a sparse original-id space so that relabelling
    (LabelEncoder semantics) is actually exercised.
    """
    rng = np.random.default_rng(seed)
    users = _zipf_choice(rng, n_users, n_events, user_skew)
    items = _zipf_choice(rng, n_items, n_events, item_skew)
    types = rng.choice(
        list(EVENT_PROBS), size=n_events, p=np.array(list(EVENT_PROBS.values()))
    )
    # Sparse, shuffled original ids (like real user_id/product_id columns).
    user_vocab = rng.permutation(n_users * 7)[:n_users]
    item_vocab = rng.permutation(n_items * 5)[:n_items]
    return pd.DataFrame(
        {
            "user_id": user_vocab[users],
            "item_id": item_vocab[items],
            "event_type": types,
        }
    )
