"""MovieLens loader — BASELINE.json config 2 (ML-100K Recall@20 parity).

Maps the MovieLens rating log onto this framework's weighted-bipartite-edge
schema so the whole pipeline (prepare → graph → train → eval) runs unchanged:
ratings >= ``positive_threshold`` become weight 1.0 ("purchase" — the
positive class the sampler/eval key on, reference ``src/utils_v2.py:15,70``),
lower ratings keep a sub-positive weight ``rating/5 * 0.5`` (mirrors the
reference edge-weight pipeline's cap of non-purchase sums at 0.5,
``notebooks/1.data_preprocessing.ipynb`` cell 14).

ML-100K ``u.data`` is tab-separated ``user_id  item_id  rating  timestamp``;
the same parser handles ML-1M ``ratings.dat`` (``::``-separated) and generic
CSVs with the same first three columns.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def load_movielens(path: str, positive_threshold: int = 4) -> pd.DataFrame:
    """Return edges (user_id, item_id, weight) from a MovieLens ratings file."""
    with open(path, "rb") as f:
        head = f.readline().decode(errors="replace")
    sep = "::" if "::" in head else ("\t" if "\t" in head else ",")
    # Header if the first field isn't numeric (applies to every separator).
    header = 0 if any(c.isalpha() for c in head.split(sep)[0]) else None
    df = pd.read_csv(
        path, sep=sep, header=header,
        engine="python" if sep == "::" else "c",
    )
    df = df.iloc[:, :3]
    df.columns = ["user_id", "item_id", "rating"]
    rating = df["rating"].astype(np.float64)
    weight = np.where(rating >= positive_threshold, 1.0, rating / 5.0 * 0.5)
    return pd.DataFrame(
        {
            "user_id": df["user_id"].astype(np.int64),
            "item_id": df["item_id"].astype(np.int64),
            "weight": weight.astype(np.float32),
        }
    )


def synthetic_movielens(
    n_users: int = 943,
    n_items: int = 1682,
    n_ratings: int = 100_000,
    n_factors: int = 8,
    seed: int = 42,
) -> pd.DataFrame:
    """SYNTHETIC ML-100K-shaped ratings (NOT the real MovieLens data).

    This environment has no network egress, so BASELINE config 2 (ML-100K
    Recall@20) runs on a clearly-labeled deterministic stand-in with the real
    dataset's shape and headline statistics: 943 users x 1682 movies x 100K
    integer ratings 1-5, every user >= 20 ratings, long-tail item popularity,
    mean rating ~3.5 with ~55% of ratings >= 4 (the positive threshold).
    Ratings carry LOW-RANK latent structure (biased MF ground truth
    ``r = clip(round(mu + b_u + b_i + p_u.q_i + eps))``), so both the SVD
    baseline and LightGCN have real signal to learn and their relative
    ordering is meaningful. Columns: user_id, item_id, rating (1-based ids,
    like ``u.data``).
    """
    rng = np.random.default_rng(seed)
    # Latent ground truth.
    b_u = rng.normal(0.0, 0.35, n_users)
    b_i = rng.normal(0.0, 0.5, n_items)
    p = rng.normal(0.0, 1.0, (n_users, n_factors)) / np.sqrt(n_factors)
    q = rng.normal(0.0, 1.0, (n_items, n_factors)) / np.sqrt(n_factors)
    # User activity: lognormal, floored at the real dataset's >=20 property,
    # scaled to sum ~n_ratings.
    deg = np.maximum(20, rng.lognormal(3.4, 1.0, n_users)).astype(np.int64)
    deg = np.minimum(deg, n_items)
    for _ in range(30):  # scale toward the target total (floor/cap distort)
        if abs(int(deg.sum()) - n_ratings) <= n_users:
            break
        deg = np.clip(
            (deg * (n_ratings / deg.sum())).astype(np.int64), 20, n_items
        )
    # Item popularity: zipf-ish over a shuffled rank order.
    ranks = rng.permutation(n_items) + 1
    pop = ranks ** -0.8
    pop /= pop.sum()
    users_l, items_l = [], []
    for u in range(n_users):
        chosen = rng.choice(n_items, size=int(deg[u]), replace=False, p=pop)
        users_l.append(np.full(len(chosen), u, np.int64))
        items_l.append(chosen.astype(np.int64))
    users = np.concatenate(users_l)
    items = np.concatenate(items_l)
    if len(users) > n_ratings:
        # Drop the surplus only from users with >20 ratings so the
        # ``every user >= 20`` shape property survives truncation. The
        # droppable pool is len(users) - 20*n_users rows; a target below
        # 20*n_users is unsatisfiable under the >=20 floor, so fail loudly
        # instead of silently returning more rows than asked.
        if n_ratings < 20 * n_users:
            raise ValueError(
                f"n_ratings={n_ratings} < 20*n_users={20 * n_users}: the "
                ">=20-ratings-per-user floor makes this target unreachable"
            )
        first20 = np.zeros(len(users), bool)
        starts = np.append(0, np.cumsum(deg[:-1]))
        first20[(starts[:, None] + np.arange(20)).ravel()] = True
        droppable = np.flatnonzero(~first20)
        drop = rng.permutation(droppable)[: len(users) - n_ratings]
        keep = np.ones(len(users), bool)
        keep[drop] = False
        users, items = users[keep], items[keep]
    mu = 3.55  # lands the clipped/rounded mean near the real ~3.53
    raw = (
        mu + b_u[users] + b_i[items]
        + np.einsum("ij,ij->i", p[users], q[items])
        + rng.normal(0.0, 0.6, len(users))
    )
    rating = np.clip(np.rint(raw), 1, 5).astype(np.int64)
    return pd.DataFrame(
        {
            "user_id": users + 1,   # 1-based like u.data
            "item_id": items + 1,
            "rating": rating,
        }
    )
