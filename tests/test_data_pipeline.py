"""Event→edge-weight pipeline and dataset-preparation semantics."""
import numpy as np
import pandas as pd

from gnn_ecommerce_tpu.data import (
    raw_edge_weight,
    proper_edge_weight,
    events_to_edges,
    split_edges,
    prepare_splits,
    synthetic_events,
)
from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1


def test_raw_edge_weight_semantics():
    # Hand-built cases covering sum, clamp-to-view, and the purchased flag
    # (preprocessing notebook cell 9).
    events = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3, 3, 3],
            "item_id": [10, 10, 10, 10, 10, 20, 20, 20],
            "event_type": [
                "view", "cart", "purchase",          # 0.01+0.1+1.0 = 1.11, purchased
                "view", "remove_from_cart",          # 0.01-0.09 = -0.08 -> clamp 0.01
                "cart", "cart", "cart",              # 0.3, not purchased
            ],
        }
    )
    out = raw_edge_weight(events, EVENT_TYPE_WEIGHTS_V1).set_index(["user_id", "item_id"])
    assert np.isclose(out.loc[(1, 10), "weight"], 1.11)
    assert bool(out.loc[(1, 10), "purchased"])
    assert np.isclose(out.loc[(2, 10), "weight"], 0.01)  # clamped to view
    assert not bool(out.loc[(2, 10), "purchased"])
    assert np.isclose(out.loc[(3, 20), "weight"], 0.3)


def test_proper_edge_weight_caps():
    raw = pd.DataFrame(
        {
            "user_id": [1, 2, 3],
            "item_id": [1, 1, 1],
            "weight": [1.11, 1.5, 0.8],
            "purchased": [True, False, True],
        }
    )
    out = proper_edge_weight(raw)
    # purchased & >1 -> 1.0 ; not purchased & >1 -> 0.5 ; <=1 untouched
    assert out["weight"].tolist() == [1.0, 0.5, 0.8]
    assert "purchased" not in out.columns


def test_prepare_splits_invariants(rng):
    events = synthetic_events(n_users=300, n_items=60, n_events=8000, seed=1)
    edges = events_to_edges(events, EVENT_TYPE_WEIGHTS_V1)
    train_df, val_df, test_df = split_edges(edges, seed=7)
    assert abs(len(val_df) + len(test_df) - round(0.05 * len(edges))) <= 1

    prep = prepare_splits(train_df, val_df, test_df)
    # Relabelled ids are dense.
    assert prep.n_users == len(prep.user_classes)
    assert prep.n_items == len(prep.item_classes)
    assert prep.edge_user.max() < prep.n_users
    assert prep.edge_item_node.min() >= prep.n_users
    assert prep.edge_item_node.max() < prep.n_users + prep.n_items

    # Sampler: every user has >= 1 positive; positives are purchases.
    s = prep.sampler
    assert (np.diff(s.pos_indptr) >= 1).all()
    # Every positive appears in the user's ignore list (train ⊂ ignore).
    for slot in range(min(20, len(s.users))):
        pos = set(s.pos_flat[s.pos_indptr[slot]:s.pos_indptr[slot + 1]].tolist())
        ign = set(s.ign_flat[s.ign_indptr[slot]:s.ign_indptr[slot + 1]].tolist())
        assert pos <= ign
        # ignore rows sorted (binary-search invariant)
        row = s.ign_flat[s.ign_indptr[slot]:s.ign_indptr[slot + 1]]
        assert (np.diff(row) > 0).all()

    # Eval users: subset of train users, each with >= 1 truth item; truth in
    # local item space.
    for split in (prep.val, prep.test):
        assert (np.diff(split.truth.indptr) >= 1).all()
        if len(split.truth.values):
            assert split.truth.values.max() < prep.n_items
        assert split.user_ids.max() < prep.n_users

    # Val/test positive (user,item) pairs never appear as train purchases
    # (they're disjoint edges by construction of the split on unique pairs).
    train_purch = set(
        zip(
            prep.train_df.loc[prep.train_df.weight == 1.0, "user_id_idx"],
            prep.train_df.loc[prep.train_df.weight == 1.0, "item_id_idx"],
        )
    )
    for split in (prep.val, prep.test):
        for i, u in enumerate(split.user_ids[: min(30, len(split.user_ids))]):
            for it in split.truth.row(i):
                assert (u, it + prep.n_users) not in train_purch


def test_sync_drops_unseen_and_nonpurchasers():
    train = pd.DataFrame(
        {"user_id": [1, 2, 3], "item_id": [10, 20, 30], "weight": [1.0, 1.0, 0.5]}
    )
    # user 9 unseen in train; user 3 has no purchase in val; user 1 ok.
    val = pd.DataFrame(
        {"user_id": [9, 3, 1, 1], "item_id": [10, 30, 20, 30], "weight": [1.0, 1.0, 1.0, 0.4]}
    )
    test = pd.DataFrame({"user_id": [2], "item_id": [10], "weight": [1.0]})
    prep = prepare_splits(train, val, test)
    # val keeps only user 1's rows with items seen in train... user 3 HAS a
    # purchase row in val (weight 1.0, item 30 seen in train) so it stays.
    assert set(prep.val.user_ids.tolist()) <= {0, 1, 2}
    # test user 2 (relabelled 1) with purchase at item 10 (relabelled 0).
    assert prep.test.user_ids.tolist() == [1]
    assert prep.test.truth.row(0).tolist() == [0]
