"""Native C++ graph kernels vs numpy/pandas/networkx oracles."""
import numpy as np
import pandas as pd
import pytest

from gnn_ecommerce_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_fallbacks_work_without_native(monkeypatch):
    # Force the fallback paths regardless of toolchain availability.
    monkeypatch.setattr(native, "_load", lambda: None)
    dst = np.array([3, 1, 1, 0, 3])
    order, indptr = native.coo_sort_by_dst(dst, 4)
    assert dst[order].tolist() == [0, 1, 1, 3, 3]
    assert indptr.tolist() == [0, 1, 3, 3, 5]
    gu, gi, gw, gp = native.groupby_edges(
        np.array([1, 0, 1, 1]), np.array([2, 0, 2, 1]),
        np.array([0.5, 1.0, 0.25, 2.0]), np.array([0, 1, 1, 0], np.uint8), 2, 3,
    )
    assert gu.tolist() == [0, 1, 1]
    assert gi.tolist() == [0, 1, 2]
    np.testing.assert_allclose(gw, [1.0, 2.0, 0.75])
    assert gp.tolist() == [1, 0, 1]


@requires_native
def test_native_sort_matches_argsort(rng):
    dst = rng.integers(0, 500, 20000)
    order, indptr = native.coo_sort_by_dst(dst, 500)
    expect = np.argsort(dst, kind="stable")
    np.testing.assert_array_equal(order, expect)
    counts = np.bincount(dst, minlength=500)
    np.testing.assert_array_equal(np.diff(indptr), counts)


@requires_native
def test_native_groupby_matches_pandas(rng):
    n = 5000
    u = rng.integers(0, 120, n)
    i = rng.integers(0, 80, n)
    w = rng.uniform(-1, 1, n)
    p = (rng.random(n) < 0.1).astype(np.uint8)
    gu, gi, gw, gp = native.groupby_edges(u, i, w, p, 120, 80)
    oracle = (
        pd.DataFrame({"u": u, "i": i, "w": w, "p": p.astype(bool)})
        .groupby(["u", "i"], sort=True)
        .agg(w=("w", "sum"), p=("p", "any"))
        .reset_index()
    )
    np.testing.assert_array_equal(gu, oracle["u"])
    np.testing.assert_array_equal(gi, oracle["i"])
    np.testing.assert_allclose(gw, oracle["w"], rtol=1e-12)
    np.testing.assert_array_equal(gp.astype(bool), oracle["p"])


@requires_native
def test_native_bfs_matches_python(rng):
    from gnn_ecommerce_tpu.explain.paths import build_adjacency, bfs_paths

    n_users, n_items = 150, 40
    e_u = rng.integers(0, n_users, 600)
    e_i = rng.integers(0, n_items, 600) + n_users
    adj = build_adjacency(e_u, e_i, n_users, n_items)
    sources = rng.choice(np.unique(e_u), 12, replace=False).astype(np.int64)
    t_lists = [
        rng.choice(np.unique(e_i), 5, replace=False).astype(np.int64)
        for _ in sources
    ]
    t_indptr = np.cumsum([0] + [len(t) for t in t_lists]).astype(np.int64)
    targets = np.concatenate(t_lists)
    dist, paths = native.bfs_batch(
        adj.indptr, adj.indices, sources, t_indptr, targets, cutoff=6
    )
    for s_idx, s in enumerate(sources):
        expect = bfs_paths(adj, int(s), t_lists[s_idx], cutoff=6)
        for j, (ed, ep) in enumerate(expect):
            t = t_indptr[s_idx] + j
            assert dist[t] == ed, (s, t_lists[s_idx][j])
            if ed >= 0:
                got = paths[t, : ed + 1].tolist()
                # Path endpoints + length must match; interior may differ
                # (any shortest path is valid) but must walk real edges.
                assert got[0] == s and got[-1] == t_lists[s_idx][j]
                assert len(got) == len(ep)
                for a, b in zip(got[:-1], got[1:]):
                    row = adj.indices[adj.indptr[a] : adj.indptr[a + 1]]
                    assert b in row


@requires_native
def test_events_pipeline_native_equals_pandas_oracle(rng):
    from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1, raw_edge_weight
    from gnn_ecommerce_tpu.data.synthetic import synthetic_events

    events = synthetic_events(n_users=100, n_items=40, n_events=3000, seed=9)
    got = raw_edge_weight(events, EVENT_TYPE_WEIGHTS_V1)
    view = EVENT_TYPE_WEIGHTS_V1["view"]
    df = events[["user_id", "item_id"]].copy()
    # astype(float): event_type is categorical, and .map on a categorical
    # yields a categorical that pandas refuses to groupby-sum.
    df["weight"] = events["event_type"].map(EVENT_TYPE_WEIGHTS_V1).astype(float)
    df["purchased"] = events["event_type"].eq("purchase")
    oracle = (
        df.groupby(["user_id", "item_id"], sort=True)
        .agg(weight=("weight", "sum"), purchased=("purchased", "any"))
        .reset_index()
    )
    oracle.loc[oracle["weight"] < view, "weight"] = view
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), oracle, check_dtype=False, atol=1e-12
    )


@requires_native
def test_pair_aggregate_matches_fallback(rng, monkeypatch):
    n_rows, n_items = 80, 30
    counts = rng.integers(0, 9, n_rows)
    indptr = np.append(0, np.cumsum(counts)).astype(np.int64)
    items = rng.integers(0, n_items, int(counts.sum())).astype(np.int64)
    w = rng.uniform(0.1, 1.0, int(counts.sum())).astype(np.float32)
    a1, b1, v1 = native.pair_aggregate(indptr, items, w, n_items, max_deg=6)
    monkeypatch.setattr(native, "_load", lambda: None)
    a2, b2, v2 = native.pair_aggregate(indptr, items, w, n_items, max_deg=6)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    # And against a dense oracle.
    dense = np.zeros((n_items, n_items))
    for r in range(n_rows):
        if counts[r] > 6:
            continue
        row_i = items[indptr[r]:indptr[r + 1]]
        row_w = w[indptr[r]:indptr[r + 1]].astype(np.float64)
        for x, wx in zip(row_i, row_w):
            for y, wy in zip(row_i, row_w):
                dense[x, y] += wx * wy
    sparse = np.zeros_like(dense)
    sparse[a1, b1] = v1
    np.testing.assert_allclose(sparse, dense, rtol=1e-5, atol=1e-7)


def test_read_events_csv_matches_pandas(rng, tmp_path):
    native = pytest.importorskip("gnn_ecommerce_tpu.native")
    if not native.available():
        pytest.skip("no C++ toolchain")
    import pandas as pd

    n = 5000
    types = np.array(["view", "cart", "remove_from_cart", "purchase"])
    df = pd.DataFrame(
        {
            "event_time": "2020-01-01 00:00:00 UTC",
            "event_type": types[rng.integers(0, 4, n)],
            "product_id": rng.integers(1, 10_000, n),
            "category_code": rng.choice(
                ["a.b.c", "", 'has,"quoted",commas'], n
            ),
            "brand": rng.choice(["acme", "", "co,ltd"], n),
            "price": rng.random(n).round(2),
            "user_id": rng.integers(1, 100_000, n),
        }
    )
    path = tmp_path / "events.csv"
    df.to_csv(path, index=False)

    u, i, t = native.read_events_csv(
        str(path), user_col="user_id", item_col="product_id"
    )
    np.testing.assert_array_equal(u, df["user_id"].to_numpy(np.int64))
    np.testing.assert_array_equal(i, df["product_id"].to_numpy(np.int64))
    assert list(t) == list(df["event_type"])

    # malformed rows are dropped
    with open(path, "a") as f:
        f.write("x,view,notanint,,,1.0,77\n")
        f.write("2020,cart,123,,,1.0,notanint\n")
    u2, i2, t2 = native.read_events_csv(
        str(path), user_col="user_id", item_col="product_id"
    )
    assert len(u2) == n


def test_read_events_csv_tiny_file_many_threads(tmp_path):
    """Thread-range splitter must not read out of bounds on bodies smaller
    than the thread count (data[pos-1] guard)."""
    native = pytest.importorskip("gnn_ecommerce_tpu.native")
    if not native.available():
        pytest.skip("no C++ toolchain")
    path = tmp_path / "tiny.csv"
    path.write_text("user_id,event_type,item_id\n1,view,2\n")
    u, i, t = native.read_events_csv(str(path), n_threads=8)
    assert list(u) == [1] and list(i) == [2] and list(t) == ["view"]


def test_load_events_string_ids_fall_back_to_pandas(tmp_path):
    """String/UUID ids must route to pandas, not silently drop every row."""
    import pandas as pd

    from gnn_ecommerce_tpu.cli.preprocess import load_events

    path = tmp_path / "events.csv"
    pd.DataFrame(
        {
            "user_id": ["u1", "u2", "u1"],
            "item_id": ["itemA", "itemB", "itemA"],
            "event_type": ["view", "purchase", "cart"],
        }
    ).to_csv(path, index=False)
    events = load_events(str(path))
    assert len(events) == 3
    assert set(events["user_id"]) == {"u1", "u2"}


@requires_native
def test_segreduce_plan_native_matches_numpy(rng, monkeypatch):
    import gnn_ecommerce_tpu.ops.spmm_fast as sf

    E, n_out, n_src = 20_000, 700, 5_000
    dst = np.sort(rng.integers(0, n_out, E).astype(np.int32))
    src = rng.integers(0, n_src, E).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    p_nat = sf.build_segreduce_plan(src, dst, w, n_out, ot=512, ch=2048)
    monkeypatch.setattr(native, "segreduce_plan", lambda *a, **k: None)
    p_np = sf.build_segreduce_plan(src, dst, w, n_out, ot=512, ch=2048)
    for f in ("gidx", "gw", "seg", "tile_map", "first"):
        a, b = np.asarray(getattr(p_nat, f)), np.asarray(getattr(p_np, f))
        assert a.shape == b.shape and (a == b).all(), f
    assert (p_nat.n_out, p_nat.ot, p_nat.ch) == (p_np.n_out, p_np.ot, p_np.ch)


@requires_native
def test_ell_plan_native_matches_numpy(rng, monkeypatch):
    import gnn_ecommerce_tpu.ops.spmm_fast as sf

    n_rows, n_src = 3_000, 5_000
    deg = rng.integers(0, 25, n_rows)
    deg[rng.integers(0, n_rows, 5)] = 0  # empty rows
    indptr = np.append(0, np.cumsum(deg)).astype(np.int64)
    E = int(indptr[-1])
    src = rng.integers(0, n_src, E).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    e_nat = sf.build_ell_plan(indptr, src, w, n_rows)
    monkeypatch.setattr(native, "ell_sort_by_degree", lambda *a, **k: None)
    monkeypatch.setattr(native, "ell_fill_bin", lambda *a, **k: None)
    e_np = sf.build_ell_plan(indptr, src, w, n_rows)
    assert e_nat.widths == e_np.widths
    assert (np.asarray(e_nat.inv_order) == np.asarray(e_np.inv_order)).all()
    for ia, ib, wa, wb in zip(e_nat.idx, e_np.idx, e_nat.w, e_np.w):
        assert (np.asarray(ia) == np.asarray(ib)).all()
        assert (np.asarray(wa) == np.asarray(wb)).all()
