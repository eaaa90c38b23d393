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
