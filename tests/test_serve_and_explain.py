"""Serving (artifact roundtrip, service, REST server) and explainability."""
import json
import threading
import urllib.request

import numpy as np
import pandas as pd
import pytest

from gnn_ecommerce_tpu.data import events_to_edges, prepare_splits, split_edges, synthetic_events
from gnn_ecommerce_tpu.data.artifacts import load_prepared, save_prepared
from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1
from gnn_ecommerce_tpu.explain.paths import build_adjacency, bfs_paths, hit_paths_frame


@pytest.fixture(scope="module")
def prepared():
    events = synthetic_events(n_users=300, n_items=60, n_events=6000, seed=3)
    edges = events_to_edges(events, EVENT_TYPE_WEIGHTS_V1)
    return prepare_splits(*split_edges(edges, seed=0))


def test_artifact_roundtrip(prepared, tmp_path):
    save_prepared(prepared, str(tmp_path))
    loaded = load_prepared(str(tmp_path))
    assert loaded.n_users == prepared.n_users
    assert loaded.n_items == prepared.n_items
    np.testing.assert_array_equal(loaded.edge_user, prepared.edge_user)
    np.testing.assert_array_equal(loaded.edge_weight, prepared.edge_weight)
    np.testing.assert_array_equal(loaded.sampler.pos_flat, prepared.sampler.pos_flat)
    np.testing.assert_array_equal(loaded.val.truth.values, prepared.val.truth.values)
    np.testing.assert_array_equal(
        loaded.test.train_mask.indptr, prepared.test.train_mask.indptr
    )


def test_artifact_digest_check(prepared, tmp_path):
    save_prepared(prepared, str(tmp_path))
    arrays = tmp_path / "prepared.npz"
    data = arrays.read_bytes()
    arrays.write_bytes(data[:-1] + bytes([data[-1] ^ 1]))
    with pytest.raises(ValueError, match="sha256 mismatch"):
        load_prepared(str(tmp_path))


@pytest.fixture(scope="module")
def service(prepared):
    import jax
    from gnn_ecommerce_tpu.models import LightGCNConfig, init_params
    from gnn_ecommerce_tpu.serve import RecommenderService

    cfg = LightGCNConfig(
        num_nodes=prepared.n_users + prepared.n_items, embedding_dim=16, num_layers=2
    )
    params = init_params(jax.random.key(0), cfg)
    return RecommenderService(prepared, params, cfg, k=10)


def test_service_recommend_shape_and_mask(service, prepared):
    users = np.asarray(prepared.sampler.users[:5])
    recs = service.recommend(users)
    assert recs.shape == (5, 10)
    # Train purchases must never be recommended (neginf masking).
    for row, u in zip(recs, users):
        slot = np.searchsorted(prepared.sampler.users, u)
        purchased = set(
            (prepared.sampler.pos_flat[
                prepared.sampler.pos_indptr[slot] : prepared.sampler.pos_indptr[slot + 1]
            ] - prepared.n_users).tolist()
        )
        assert not (set(row.tolist()) & purchased)


def test_service_rejects_bad_users(service, prepared):
    with pytest.raises(ValueError, match="out of range"):
        service.recommend([prepared.n_users + 5])


def test_rest_server_roundtrip(service):
    from gnn_ecommerce_tpu.serve import make_server

    server = make_server(service, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/ping") as r:
            assert json.load(r)["status"] == "Healthy"
        with urllib.request.urlopen(f"{base}/v1/models/lightgcn_recommender") as r:
            stats = json.load(r)
            assert stats["n_users"] == service.prepared.n_users
        req = urllib.request.Request(
            f"{base}/v1/models/lightgcn_recommender:predict",
            data=json.dumps([0, 1]).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            items = json.load(r)["items"]
            assert len(items) == 2 and len(items[0]) == 10
        # Metrics endpoint (TorchServe :8082 analog): Prometheus text with
        # the request just made counted.
        with urllib.request.urlopen(f"{base}/metrics") as r:
            text = r.read().decode()
            assert "lightgcn_requests_total" in text
            counts = {
                line.split()[0]: float(line.split()[1])
                for line in text.splitlines()
                if line and not line.startswith("#")
            }
            assert counts["lightgcn_requests_total"] >= 1
            assert counts["lightgcn_users_total"] >= 2
        # Malformed body -> 400, not a crash.
        bad = urllib.request.Request(
            f"{base}/v1/models/lightgcn_recommender:predict", data=b"{}"
        )
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


# --- explainability ---


def test_bfs_paths_simple():
    # users 0,1; items -> nodes 2,3. Edges: u0-i2, u1-i2, u1-i3.
    adj = build_adjacency(
        np.array([0, 1, 1]), np.array([2, 2, 3]), n_users=2, n_items=2
    )
    [(d1, p1), (d2, p2)] = bfs_paths(adj, 0, np.array([2, 3]))
    assert d1 == 1 and p1 == [0, 2]
    assert d2 == 3 and p2 == [0, 2, 1, 3]


def test_bfs_unreachable():
    # Disconnected: u0-i2, u1-i3.
    adj = build_adjacency(np.array([0, 1]), np.array([2, 3]), 2, 2)
    [(d, p)] = bfs_paths(adj, 0, np.array([3]))
    assert d == -1 and p is None


def test_hit_paths_frame_flags():
    adj = build_adjacency(np.array([0, 1, 1]), np.array([2, 2, 3]), 2, 2)
    # user 0 recommended local items [0, 1], truth = {0, 1}: item node 2 is
    # 1 hop, item node 3 is 3 hops (not longer than 3), both hits.
    df = hit_paths_frame(
        adj,
        user_ids=np.array([0]),
        topk_idx=np.array([[0, 1]]),
        truth_sets=[{0, 1}],
    )
    assert len(df) == 2
    assert df["path_length"].tolist() == [1, 3]
    assert df["longer_than_3"].tolist() == [False, False]


def test_hit_paths_matches_networkx(prepared):
    networkx = pytest.importorskip("networkx")
    adj = build_adjacency(
        prepared.edge_user, prepared.edge_item_node, prepared.n_users, prepared.n_items
    )
    g = networkx.Graph()
    g.add_edges_from(zip(prepared.edge_user.tolist(), prepared.edge_item_node.tolist()))
    rng = np.random.default_rng(0)
    sources = rng.choice(prepared.sampler.users, 5, replace=False)
    targets = rng.choice(
        np.unique(prepared.edge_item_node), 8, replace=False
    )
    for s in sources:
        ours = bfs_paths(adj, int(s), targets, cutoff=10)
        for t, (d, path) in zip(targets, ours):
            if networkx.has_path(g, int(s), int(t)):
                nx_d = networkx.shortest_path_length(g, int(s), int(t))
                if nx_d <= 10:
                    assert d == nx_d, (s, t)
                    assert path[0] == s and path[-1] == t
                    # Path must walk real edges.
                    for a, b in zip(path[:-1], path[1:]):
                        assert g.has_edge(a, b)
            else:
                assert d == -1


def test_plot_user_paths(tmp_path):
    import pandas as pd
    from gnn_ecommerce_tpu.explain import plot_user_paths

    hit_df = pd.DataFrame(
        {
            "user_id_idx": [0, 0],
            "item_id_idx": [0, 1],
            "path_length": [1, 3],
            "path": [[0, 2], [0, 2, 1, 3]],
            "longer_than_3": [False, False],
        }
    )
    out = tmp_path / "paths.png"
    fig = plot_user_paths(hit_df, user_id=0, n_users=2, out_path=str(out))
    assert out.exists() and out.stat().st_size > 0
    import matplotlib.pyplot as plt

    plt.close(fig)

    with pytest.raises(ValueError, match="no hit paths"):
        plot_user_paths(hit_df, user_id=7, n_users=2)


def test_refresh_endpoint_from_artifacts(prepared, tmp_path):
    import jax
    from gnn_ecommerce_tpu.models import LightGCNConfig, init_params
    from gnn_ecommerce_tpu.serve import RecommenderService, make_server
    from gnn_ecommerce_tpu.train.checkpoint import save_checkpoint

    cfg = LightGCNConfig(
        num_nodes=prepared.n_users + prepared.n_items, embedding_dim=8, num_layers=2
    )
    params = init_params(jax.random.key(1), cfg)
    save_prepared(prepared, str(tmp_path / "data"))
    import optax

    opt_state = optax.adam(1e-3).init(params)
    save_checkpoint(
        str(tmp_path / "ckpt"), params, opt_state, epoch=0, precision=0.1,
        recall=0.2, hyperparams={"latent_dim": 8, "n_layers": 2},
    )
    svc = RecommenderService.from_artifacts(
        str(tmp_path / "data"), str(tmp_path / "ckpt")
    )
    assert svc.checkpoint_meta["recall"] == 0.2

    server = make_server(svc, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/models/lightgcn_recommender:refresh",
            data=b"",
        )
        with urllib.request.urlopen(req) as r:
            assert json.load(r)["status"] == "refreshed"
    finally:
        server.shutdown()


def test_quantized_service_recommend(prepared):
    import jax
    from gnn_ecommerce_tpu.models import LightGCNConfig, init_params
    from gnn_ecommerce_tpu.serve import RecommenderService

    cfg = LightGCNConfig(
        num_nodes=prepared.n_users + prepared.n_items, embedding_dim=16, num_layers=2
    )
    params = init_params(jax.random.key(0), cfg)
    svc = RecommenderService(prepared, params, cfg, k=10, quantized=True)
    assert svc.stats()["quantized"] is True
    users = np.asarray(prepared.sampler.users[:4])
    recs = svc.recommend(users)
    assert recs.shape == (4, 10)
    # Purchased items still masked through the quantized path.
    for row, u in zip(recs, users):
        slot = np.searchsorted(prepared.sampler.users, u)
        purchased = set(
            (prepared.sampler.pos_flat[
                prepared.sampler.pos_indptr[slot] : prepared.sampler.pos_indptr[slot + 1]
            ] - prepared.n_users).tolist()
        )
        assert not (set(row.tolist()) & purchased)


def test_batching_recommender_coalesces(service, prepared):
    """Concurrent requests ride ONE device call (round-4 cross-request
    batching): results match the unbatched service per request, at least one
    multi-request batch forms, and a bad id fails only its own request."""
    import time

    from gnn_ecommerce_tpu.serve import BatchingRecommender

    batcher = BatchingRecommender(service, max_wait_s=0.05)
    users = np.asarray(prepared.sampler.users)
    reqs = [users[i : i + 3] for i in range(0, 24, 3)]
    expected = [service.recommend(r) for r in reqs]

    results = [None] * len(reqs)
    errors = [None] * len(reqs)

    def call(i):
        try:
            results[i] = batcher.recommend(reqs[i])
        except Exception as e:  # pragma: no cover
            errors[i] = e

    threads = [threading.Thread(target=call, args=(i,)) for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(e is None for e in errors), errors
    for got, want in zip(results, expected):
        np.testing.assert_array_equal(got, want)
    m = batcher.metrics()
    assert m["batched_requests_total"] == len(reqs)
    assert m["batches_total"] < len(reqs)  # at least one shared batch
    assert m["users_per_batch_avg"] > 3.0

    # Validation is per-request: a bad id raises for ITS caller only.
    with pytest.raises(ValueError, match="out of range"):
        batcher.recommend([prepared.n_users + 7])
    ok = batcher.recommend(users[:2])
    np.testing.assert_array_equal(ok, service.recommend(users[:2]))


def test_management_api_versions_and_workers(prepared, tmp_path):
    """TorchServe management-API parity (round-4 VERDICT item 7): register a
    second checkpoint version over HTTP, see predictions swap atomically,
    roll back via set-default, unregister, and scale the batcher's worker
    pool at runtime."""
    import urllib.error

    import jax
    import optax

    from gnn_ecommerce_tpu.models import LightGCNConfig, init_params
    from gnn_ecommerce_tpu.serve import (
        BatchingRecommender,
        RecommenderService,
        make_server,
    )
    from gnn_ecommerce_tpu.train.checkpoint import save_checkpoint

    cfg = LightGCNConfig(
        num_nodes=prepared.n_users + prepared.n_items, embedding_dim=8,
        num_layers=2,
    )
    hp = {"latent_dim": 8, "n_layers": 2}
    save_prepared(prepared, str(tmp_path / "data"))
    opt = optax.adam(1e-3)
    for i, name in enumerate(["vA", "vB"]):
        params = init_params(jax.random.key(i), cfg)
        save_checkpoint(
            str(tmp_path / "ckpt"), params, opt.init(params), epoch=i,
            precision=0.1, recall=0.2 + i, hyperparams=hp, name=name,
        )
    svc = RecommenderService.from_artifacts(
        str(tmp_path / "data"), str(tmp_path / "ckpt"), "vA", k=10
    )
    batched = BatchingRecommender(svc, parallelism=1)
    server = make_server(batched, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def call(method, path, body=None):
        req = urllib.request.Request(
            f"{base}{path}",
            data=None if body is None else json.dumps(body).encode(),
            method=method,
        )
        with urllib.request.urlopen(req) as r:
            return json.load(r)

    try:
        # One registered version initially.
        models = call("GET", "/v1/models")["models"][0]
        assert [v["version"] for v in models["versions"]] == ["1"]
        assert models["versions"][0]["active"]

        users = [int(u) for u in np.asarray(prepared.sampler.users[:4])]
        rec_a = call(
            "POST", "/v1/models/lightgcn_recommender:predict", users
        )["items"]

        # Register vB -> becomes default; predictions swap.
        out = call(
            "POST", "/v1/models/lightgcn_recommender:register",
            {"checkpoint_dir": str(tmp_path / "ckpt"), "checkpoint_name": "vB"},
        )
        assert out["status"] == "registered" and out["version"] == "2"
        rec_b = call(
            "POST", "/v1/models/lightgcn_recommender:predict", users
        )["items"]
        assert rec_b != rec_a  # different weights -> different top-K

        # Roll back to version 1: predictions restore EXACTLY.
        assert call(
            "PUT", "/v1/models/lightgcn_recommender/1/set-default"
        )["version"] == "1"
        assert call(
            "POST", "/v1/models/lightgcn_recommender:predict", users
        )["items"] == rec_a

        # Unregistering the ACTIVE version is refused (409); the idle one
        # drops cleanly.
        try:
            call("DELETE", "/v1/models/lightgcn_recommender/1")
            raise AssertionError("expected HTTP 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409
        assert call("DELETE", "/v1/models/lightgcn_recommender/2")[
            "status"
        ] == "unregistered"
        models = call("GET", "/v1/models")["models"][0]
        assert [v["version"] for v in models["versions"]] == ["1"]

        # Scale the batcher worker pool up and back down; the batched path
        # still serves afterwards (retired workers drain cleanly).
        assert call(
            "PUT", "/v1/models/lightgcn_recommender?workers=3"
        )["workers"] == 3
        assert call("GET", "/v1/models/lightgcn_recommender")[
            "batch_workers"
        ] == 3
        assert call(
            "PUT", "/v1/models/lightgcn_recommender?workers=1"
        )["workers"] == 1
        small = call(
            "POST", "/v1/models/lightgcn_recommender:predict", users[:2]
        )["items"]
        assert small == rec_a[:2]
    finally:
        server.shutdown()

    # Without a batcher there is no worker pool: scale-workers -> 501.
    server2 = make_server(svc, port=0)
    port2 = server2.server_address[1]
    threading.Thread(target=server2.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port2}/v1/models/lightgcn_recommender?workers=2",
            method="PUT",
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected HTTP 501")
        except urllib.error.HTTPError as e:
            assert e.code == 501
    finally:
        server2.shutdown()


def test_register_version_cap_and_cheap_rejects(prepared, tmp_path, monkeypatch):
    """Registry is bounded (each version pins a full device cache) and cheap
    rejections (duplicate id, registry full) fire BEFORE any checkpoint
    load or propagation (round-5 review findings)."""
    import jax
    import optax

    from gnn_ecommerce_tpu.models import LightGCNConfig, init_params
    from gnn_ecommerce_tpu.serve import RecommenderService
    from gnn_ecommerce_tpu.serve import service as service_mod
    from gnn_ecommerce_tpu.train.checkpoint import save_checkpoint

    cfg = LightGCNConfig(
        num_nodes=prepared.n_users + prepared.n_items, embedding_dim=8,
        num_layers=2,
    )
    params = init_params(jax.random.key(0), cfg)
    save_prepared(prepared, str(tmp_path / "data"))
    save_checkpoint(
        str(tmp_path / "ckpt"), params, optax.adam(1e-3).init(params),
        epoch=0, precision=0.1, recall=0.2,
        hyperparams={"latent_dim": 8, "n_layers": 2}, name="v",
    )
    svc = RecommenderService.from_artifacts(
        str(tmp_path / "data"), str(tmp_path / "ckpt"), "v", k=5
    )
    monkeypatch.setattr(RecommenderService, "MAX_VERSIONS", 3)

    # Duplicate explicit id: rejected before load_checkpoint runs.
    loads = []
    real_load = service_mod.load_checkpoint
    monkeypatch.setattr(
        service_mod, "load_checkpoint",
        lambda *a, **k: (loads.append(a), real_load(*a, **k))[1],
    )
    with pytest.raises(ValueError, match="already registered"):
        svc.register_version(str(tmp_path / "ckpt"), "v", version="1")
    assert loads == []  # no checkpoint IO for the rejected call

    svc.register_version(str(tmp_path / "ckpt"), "v")  # -> "2"
    svc.register_version(str(tmp_path / "ckpt"), "v")  # -> "3" (at cap)
    n_loads = len(loads)
    with pytest.raises(ValueError, match="registry full"):
        svc.register_version(str(tmp_path / "ckpt"), "v")
    assert len(loads) == n_loads  # full-registry reject is also pre-IO
    svc.unregister_version("2")
    assert svc.register_version(str(tmp_path / "ckpt"), "v") == "4"


def test_register_autoversion_skips_taken_ids(prepared, tmp_path, monkeypatch):
    """An auto-assigned version id must skip ids taken by EXPLICIT
    registrations instead of silently overwriting them (round-5 session-2
    review finding)."""
    import jax
    import optax

    from gnn_ecommerce_tpu.models import LightGCNConfig, init_params
    from gnn_ecommerce_tpu.serve import RecommenderService
    from gnn_ecommerce_tpu.train.checkpoint import save_checkpoint

    cfg = LightGCNConfig(
        num_nodes=prepared.n_users + prepared.n_items, embedding_dim=8,
        num_layers=2,
    )
    params = init_params(jax.random.key(0), cfg)
    save_prepared(prepared, str(tmp_path / "data"))
    save_checkpoint(
        str(tmp_path / "ckpt"), params, optax.adam(1e-3).init(params),
        epoch=0, precision=0.1, recall=0.2,
        hyperparams={"latent_dim": 8, "n_layers": 2}, name="v",
    )
    svc = RecommenderService.from_artifacts(
        str(tmp_path / "data"), str(tmp_path / "ckpt"), "v", k=5
    )
    monkeypatch.setattr(RecommenderService, "MAX_VERSIONS", 8)
    # Explicitly take the id the auto counter would assign next ("2").
    svc.register_version(str(tmp_path / "ckpt"), "v", version="2")
    marker = svc._versions["2"]
    got = svc.register_version(str(tmp_path / "ckpt"), "v")  # auto id
    assert got == "3"  # skipped the taken "2"
    assert svc._versions["2"] is marker  # explicit registration untouched
    assert set(svc._versions) == {"1", "2", "3"}


def test_refresh_pinned_version_and_unregister_race(prepared, tmp_path):
    """refresh() writes back to the version captured at call time, and a
    version unregistered mid-propagation is dropped rather than resurrected
    (round-5 session-2 review findings)."""
    import jax
    import optax

    from gnn_ecommerce_tpu.models import LightGCNConfig, init_params
    from gnn_ecommerce_tpu.serve import RecommenderService
    from gnn_ecommerce_tpu.train.checkpoint import save_checkpoint

    cfg = LightGCNConfig(
        num_nodes=prepared.n_users + prepared.n_items, embedding_dim=8,
        num_layers=2,
    )
    hp = {"latent_dim": 8, "n_layers": 2}
    save_prepared(prepared, str(tmp_path / "data"))
    opt = optax.adam(1e-3)
    for i, name in enumerate(["vA", "vB"]):
        p = init_params(jax.random.key(i), cfg)
        save_checkpoint(
            str(tmp_path / "ckpt"), p, opt.init(p), epoch=i,
            precision=0.1, recall=0.2, hyperparams=hp, name=name,
        )
    svc = RecommenderService.from_artifacts(
        str(tmp_path / "data"), str(tmp_path / "ckpt"), "vA", k=5
    )
    svc.register_version(str(tmp_path / "ckpt"), "vB")  # "2", now default

    # A concurrent set-default happened between refresh_from_checkpoint's
    # capture of version "1" and the write-back: the result must land on
    # "1", not clobber the now-active "2".
    emb2_before = svc._versions["2"]["emb"]
    params = {"embedding": init_params(jax.random.key(9), cfg)["embedding"]}
    svc.refresh(params, version="1")
    assert svc._versions["2"]["emb"] is emb2_before  # active untouched
    assert svc._active == "2"

    # Unregister-mid-refresh: the target disappears while the (unlocked)
    # propagation runs; the new cache must be dropped, not resurrected.
    orig_build = svc._build_cache

    def build_and_unregister(p, c):
        out = orig_build(p, c)
        svc.unregister_version("1")
        return out

    svc._build_cache = build_and_unregister
    svc.refresh(params, version="1")
    assert "1" not in svc._versions  # not resurrected past the unregister
    assert svc._active == "2"
