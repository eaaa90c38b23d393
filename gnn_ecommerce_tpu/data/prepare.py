"""Dataset preparation: split / sync / relabel / positive & ignore lists.

Re-implements the semantics of reference ``src/utils_v2.py:9-143``
(``prepare_val_test`` and its helpers) with vectorized numpy instead of
pandas ``apply``/python loops, and emits static-shape CSR structures that the
jit-compatible sampler and evaluator consume directly.

Reference semantics preserved:
- random 95 / 2.5 / 2.5 edge split (``src/train_lightgcn.py:21-22``);
- ``sync_nodes`` (``src/utils_v2.py:20-37``): val/test rows keep only users
  AND items seen in train, then only users with at least one purchase row
  (weight == 1.0) in that split;
- ``relabelling`` (``src/utils_v2.py:40-61``): LabelEncoder ≡ rank in the
  sorted unique train values;
- item node ids offset by ``+n_users`` into the unified node space for the
  graph/sampler (``src/utils_v2.py:128``), while eval positives and
  interaction masks stay in local item space (``src/utils_v2.py:92-103,130``);
- per-user ignore list for negative sampling = train positives ∪ val ∪ test
  positives, node space (``src/utils_v2.py:76-89``);
- "positive" means weight == 1.0 exactly (``src/utils_v2.py:15,70``).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import pandas as pd


def split_edges(
    edges: pd.DataFrame, seed: int = 42, test_size: float = 0.05
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Random (1-test_size) / test_size/2 / test_size/2 split of edge rows.

    Mirrors the reference's two-stage ``train_test_split``
    (``src/train_lightgcn.py:21-22``) with an actually-consumed seed (the
    reference declares ``random_seed: 42`` in config.yaml but never uses it).
    Returns (train, val, test).
    """
    rng = np.random.default_rng(seed)
    n = len(edges)
    perm = rng.permutation(n)
    n_holdout = int(round(n * test_size))
    n_test = n_holdout // 2
    test_idx = perm[:n_test]
    val_idx = perm[n_test:n_holdout]
    train_idx = perm[n_holdout:]
    return (
        edges.iloc[train_idx].reset_index(drop=True),
        edges.iloc[val_idx].reset_index(drop=True),
        edges.iloc[test_idx].reset_index(drop=True),
    )


def _purchase_users(df: pd.DataFrame) -> pd.DataFrame:
    """Keep rows of users who have >= 1 purchase row (weight == 1.0) in df
    (reference ``purchase_users``, ``src/utils_v2.py:9-17``)."""
    buyers = df.loc[df["weight"] == 1.0, "user_id"].unique()
    return df[df["user_id"].isin(buyers)]


def _csr(keys: np.ndarray, vals: np.ndarray, n_rows: int) -> tuple[np.ndarray, np.ndarray]:
    """Build CSR (indptr, sorted-per-row values) from (row, value) pairs."""
    order = np.lexsort((vals, keys))
    keys, vals = keys[order], vals[order]
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.add.at(indptr, keys + 1, 1)
    return np.cumsum(indptr), vals


@dataclasses.dataclass(frozen=True)
class CsrList:
    """Per-row sorted id lists in CSR form."""

    indptr: np.ndarray  # [R+1]
    values: np.ndarray  # [nnz]

    def row(self, r: int) -> np.ndarray:
        return self.values[self.indptr[r] : self.indptr[r + 1]]

    def lengths(self) -> np.ndarray:
        return np.diff(self.indptr)


@dataclasses.dataclass(frozen=True)
class EvalSplit:
    """Evaluation structures for one split (val or test), local item space."""

    user_ids: np.ndarray   # [Nu] sorted relabelled user ids with >=1 positive
    truth: CsrList         # per eval user: positive local item ids
    train_mask: CsrList    # per eval user: train-purchased local item ids


@dataclasses.dataclass(frozen=True)
class SamplerArrays:
    """BPR sampler inputs, unified node space (items offset by +n_users)."""

    users: np.ndarray      # [U] train users with >= 1 purchase
    pos_indptr: np.ndarray
    pos_flat: np.ndarray   # train positive item node ids per user
    ign_indptr: np.ndarray
    ign_flat: np.ndarray   # sorted ignore item node ids per user


@dataclasses.dataclass(frozen=True)
class PreparedData:
    n_users: int
    n_items: int
    # Train edges for graph construction (ALL train rows, weighted).
    edge_user: np.ndarray       # [E] relabelled user ids
    edge_item_node: np.ndarray  # [E] item ids offset by +n_users
    edge_weight: np.ndarray     # [E] float32
    sampler: SamplerArrays
    val: EvalSplit
    test: EvalSplit
    # Original-id vocabularies (LabelEncoder classes_) for round-tripping.
    user_classes: np.ndarray
    item_classes: np.ndarray
    # Processed splits (relabelled; train item ids in node space like the
    # reference's persisted processed_train.csv, src/train_lightgcn.py:39-41).
    train_df: pd.DataFrame
    val_df: pd.DataFrame
    test_df: pd.DataFrame


def _build_eval_split(pos_df: pd.DataFrame, train_purchases: pd.DataFrame) -> EvalSplit:
    users = np.unique(pos_df["user_id_idx"].to_numpy())
    slot = np.searchsorted(users, pos_df["user_id_idx"].to_numpy())
    truth = CsrList(*_csr(slot, pos_df["item_id_idx"].to_numpy(np.int64), len(users)))
    tp = train_purchases[train_purchases["user_id_idx"].isin(users)]
    tslot = np.searchsorted(users, tp["user_id_idx"].to_numpy())
    mask = CsrList(*_csr(tslot, tp["item_id_idx"].to_numpy(np.int64), len(users)))
    return EvalSplit(user_ids=users.astype(np.int64), truth=truth, train_mask=mask)


def prepare_splits(
    train_df: pd.DataFrame, val_df: pd.DataFrame, test_df: pd.DataFrame
) -> PreparedData:
    """Full ``prepare_val_test`` pipeline (reference ``src/utils_v2.py:106-143``).

    Input frames carry ``user_id``, ``item_id``, ``weight`` columns (original
    id space). Output structures are documented on :class:`PreparedData`.
    """
    # --- sync_nodes (src/utils_v2.py:20-37) ---
    train_users = train_df["user_id"].unique()
    train_items = train_df["item_id"].unique()
    val_df = val_df[
        val_df["user_id"].isin(train_users) & val_df["item_id"].isin(train_items)
    ]
    test_df = test_df[
        test_df["user_id"].isin(train_users) & test_df["item_id"].isin(train_items)
    ]
    val_df = _purchase_users(val_df)
    test_df = _purchase_users(test_df)

    # --- relabelling (src/utils_v2.py:40-61): LabelEncoder == sorted-unique rank ---
    user_classes = np.sort(pd.unique(train_df["user_id"]))
    item_classes = np.sort(pd.unique(train_df["item_id"]))
    n_users, n_items = len(user_classes), len(item_classes)

    def relabel(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["user_id_idx"] = np.searchsorted(user_classes, df["user_id"].to_numpy())
        out["item_id_idx"] = np.searchsorted(item_classes, df["item_id"].to_numpy())
        return out

    train_df, val_df, test_df = relabel(train_df), relabel(val_df), relabel(test_df)

    # Train purchases in LOCAL item space (interaction matrix,
    # src/utils_v2.py:92-103) — captured before the +n_users offset below.
    train_purchases = train_df.loc[train_df["weight"] == 1.0, ["user_id_idx", "item_id_idx"]]

    # --- offset train items into unified node space (src/utils_v2.py:128) ---
    train_df = train_df.copy()
    train_df["item_id_idx"] = train_df["item_id_idx"] + n_users

    # --- sampler structures ---
    tpos = train_df.loc[train_df["weight"] == 1.0, ["user_id_idx", "item_id_idx"]]
    pos_users = np.unique(tpos["user_id_idx"].to_numpy())
    pslot = np.searchsorted(pos_users, tpos["user_id_idx"].to_numpy())
    pos_indptr, pos_flat = _csr(pslot, tpos["item_id_idx"].to_numpy(np.int64), len(pos_users))

    # Ignore lists: train ∪ val ∪ test positives (node space) per train-pos
    # user (src/utils_v2.py:76-89; val/test users without train purchases are
    # dropped by the reference's left-merge onto train_pos, matched here).
    ign_rows = [pslot]
    ign_vals = [tpos["item_id_idx"].to_numpy(np.int64)]
    for df in (val_df, test_df):
        pos = df.loc[df["weight"] == 1.0, ["user_id_idx", "item_id_idx"]]
        keep = pos["user_id_idx"].isin(pos_users)
        pos = pos[keep]
        ign_rows.append(np.searchsorted(pos_users, pos["user_id_idx"].to_numpy()))
        ign_vals.append(pos["item_id_idx"].to_numpy(np.int64) + n_users)
    rows = np.concatenate(ign_rows)
    vals = np.concatenate(ign_vals)
    pairs = np.unique(np.stack([rows, vals], axis=1), axis=0)
    ign_indptr, ign_flat = _csr(pairs[:, 0], pairs[:, 1], len(pos_users))

    sampler = SamplerArrays(
        users=pos_users.astype(np.int64),
        pos_indptr=pos_indptr,
        pos_flat=pos_flat,
        ign_indptr=ign_indptr,
        ign_flat=ign_flat,
    )

    # --- eval splits (local item space, src/utils_v2.py:130-138) ---
    val_pos = val_df.loc[val_df["weight"] == 1.0, ["user_id_idx", "item_id_idx"]]
    test_pos = test_df.loc[test_df["weight"] == 1.0, ["user_id_idx", "item_id_idx"]]
    val_split = _build_eval_split(val_pos, train_purchases)
    test_split = _build_eval_split(test_pos, train_purchases)

    return PreparedData(
        n_users=n_users,
        n_items=n_items,
        edge_user=train_df["user_id_idx"].to_numpy(np.int64),
        edge_item_node=train_df["item_id_idx"].to_numpy(np.int64),
        edge_weight=train_df["weight"].to_numpy(np.float32),
        sampler=sampler,
        val=val_split,
        test=test_split,
        user_classes=user_classes,
        item_classes=item_classes,
        train_df=train_df,
        val_df=val_df,
        test_df=test_df,
    )
