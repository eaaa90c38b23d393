"""Bipartite-factorized propagation: exactness vs the layered oracle path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_ecommerce_tpu.graph import build_graph
from gnn_ecommerce_tpu.models import LightGCNConfig, get_embedding
from gnn_ecommerce_tpu.ops.bipartite import (
    build_fast_bipartite,
    build_item_operator,
    fast_get_embedding,
    split_graph,
    to_items,
    to_users,
)

from test_graph_and_model import random_bipartite


@pytest.fixture
def setup(rng):
    n_users, n_items = 300, 90
    u, i, w = random_bipartite(rng, n_users, n_items, 2500)
    g = build_graph(u, i, w, n_users, n_items)
    emb = rng.standard_normal((n_users + n_items, 24)).astype(np.float32)
    return g, {"embedding": jnp.asarray(emb)}


def test_split_directions_match_unified(setup, rng):
    g, params = setup
    split = split_graph(g)
    x = params["embedding"]
    from gnn_ecommerce_tpu.ops import propagate_segment

    unified = np.asarray(propagate_segment(g, x))
    out_u = np.asarray(to_users(x[g.n_users :], split))
    out_i = np.asarray(to_items(x[: g.n_users], split))
    np.testing.assert_allclose(out_u, unified[: g.n_users], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_i, unified[g.n_users :], rtol=1e-5, atol=1e-6)


def test_item_operator_dense_equals_two_spmm(setup, rng):
    g, params = setup
    split = split_graph(g)
    B = np.asarray(build_item_operator(split, dtype=jnp.float32))
    assert B.shape == (g.n_items, g.n_items)
    # B must be symmetric and equal Âiu @ Âui computed densely.
    np.testing.assert_allclose(B, B.T, rtol=1e-5, atol=1e-6)
    A_iu = np.zeros((g.n_items, g.n_users), np.float64)
    np.add.at(
        A_iu,
        (np.asarray(split.ui_dst_item), np.asarray(split.ui_src_user)),
        np.asarray(split.ui_w),
    )
    np.testing.assert_allclose(B, A_iu @ A_iu.T, rtol=1e-4, atol=1e-5)


def test_item_operator_heavy_path(rng):
    # Force the heavy-user matmul path with tiny ell_width.
    n_users, n_items = 50, 30
    u, i, w = random_bipartite(rng, n_users, n_items, 600)
    g = build_graph(u, i, w, n_users, n_items)
    split = split_graph(g)
    B_all_light = np.asarray(build_item_operator(split, ell_width=64))
    B_mixed = np.asarray(build_item_operator(split, ell_width=4, heavy_chunk=8))
    np.testing.assert_allclose(B_mixed, B_all_light, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("num_layers", [1, 2, 3, 5])
def test_fast_embedding_matches_layered(setup, num_layers):
    g, params = setup
    cfg = LightGCNConfig(num_nodes=g.num_nodes, embedding_dim=24, num_layers=num_layers)
    layered = np.asarray(get_embedding(params, g, cfg))
    fb = build_fast_bipartite(g, dtype=jnp.float32)
    fast = np.asarray(fast_get_embedding(params, fb, num_layers))
    np.testing.assert_allclose(fast, layered, rtol=2e-4, atol=2e-5)


def test_fast_gradients_match_layered(setup):
    g, params = setup
    cfg = LightGCNConfig(num_nodes=g.num_nodes, embedding_dim=24, num_layers=3)
    fb = build_fast_bipartite(g, dtype=jnp.float32)
    ct = jnp.asarray(
        np.random.default_rng(1).standard_normal((g.num_nodes, 24)).astype(np.float32)
    )

    g_layered = jax.grad(lambda p: jnp.vdot(get_embedding(p, g, cfg), ct))(params)
    g_fast = jax.grad(lambda p: jnp.vdot(fast_get_embedding(p, fb, 3), ct))(params)
    np.testing.assert_allclose(
        np.asarray(g_fast["embedding"]),
        np.asarray(g_layered["embedding"]),
        rtol=2e-4,
        atol=2e-5,
    )


def test_fast_training_step_runs(setup):
    import optax
    from gnn_ecommerce_tpu.train import make_train_fns
    from gnn_ecommerce_tpu.sampling import make_sampler_data
    from gnn_ecommerce_tpu.data.prepare import SamplerArrays

    g, params = setup
    cfg = LightGCNConfig(num_nodes=g.num_nodes, embedding_dim=24, num_layers=3)
    fb = build_fast_bipartite(g, dtype=jnp.float32)
    src, dst = np.asarray(g.src), np.asarray(g.dst)
    m = dst < g.n_users
    users, first = np.unique(dst[m], return_index=True)
    pos = src[m][first]
    arrays = SamplerArrays(
        users=users.astype(np.int64),
        pos_indptr=np.arange(len(users) + 1),
        pos_flat=pos.astype(np.int64),
        ign_indptr=np.arange(len(users) + 1),
        ign_flat=pos.astype(np.int64),
    )
    sdata = make_sampler_data(arrays, g.n_users, g.n_items)
    optimizer = optax.adam(1e-2)
    step, _ = make_train_fns(
        cfg, optimizer, batch_size=32, decay=1e-4,
        embed_fn=lambda p, fb_: fast_get_embedding(p, fb_, cfg.num_layers),
    )
    p, o, metrics = step(params, optimizer.init(params), fb, sdata, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("num_layers", [1, 3, 4])
def test_batch_embeddings_match_full(setup, num_layers, rng):
    from gnn_ecommerce_tpu.ops.bipartite import fast_batch_embeddings

    g, params = setup
    fb = build_fast_bipartite(g, dtype=jnp.float32)
    full = np.asarray(fast_get_embedding(params, fb, num_layers))
    B = 16
    users = jnp.asarray(rng.integers(0, g.n_users, B), jnp.int32)
    pos = jnp.asarray(rng.integers(0, g.n_items, B) + g.n_users, jnp.int32)
    neg = jnp.asarray(rng.integers(0, g.n_items, B) + g.n_users, jnp.int32)
    u, p, n, dropped = fast_batch_embeddings(
        params, fb, num_layers, users, pos, neg, edge_cap=4096
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(u), full[np.asarray(users)], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p), full[np.asarray(pos)], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(n), full[np.asarray(neg)], rtol=1e-5, atol=1e-6)


def test_batch_embeddings_gradients_match_full(setup, rng):
    from gnn_ecommerce_tpu.ops.bipartite import fast_batch_embeddings

    g, params = setup
    fb = build_fast_bipartite(g, dtype=jnp.float32)
    B = 16
    users = jnp.asarray(rng.integers(0, g.n_users, B), jnp.int32)
    pos = jnp.asarray(rng.integers(0, g.n_items, B) + g.n_users, jnp.int32)
    neg = jnp.asarray(rng.integers(0, g.n_items, B) + g.n_users, jnp.int32)

    def loss_full(p_):
        out = fast_get_embedding(p_, fb, 3)
        u, p, n = out[users], out[pos], out[neg]
        return jnp.sum(jax.nn.log_sigmoid(jnp.sum(u * (p - n), -1)))

    def loss_batch(p_):
        u, p, n, _ = fast_batch_embeddings(p_, fb, 3, users, pos, neg, edge_cap=4096)
        return jnp.sum(jax.nn.log_sigmoid(jnp.sum(u * (p - n), -1)))

    g_full = jax.grad(loss_full)(params)["embedding"]
    g_batch = jax.grad(loss_batch)(params)["embedding"]
    np.testing.assert_allclose(
        np.asarray(g_batch), np.asarray(g_full), rtol=2e-4, atol=2e-6
    )


def test_batch_embeddings_edge_cap_drop_counted(setup, rng):
    from gnn_ecommerce_tpu.ops.bipartite import fast_batch_embeddings

    g, params = setup
    fb = build_fast_bipartite(g, dtype=jnp.float32)
    users = jnp.asarray(rng.integers(0, g.n_users, 32), jnp.int32)
    pos = jnp.asarray(rng.integers(0, g.n_items, 32) + g.n_users, jnp.int32)
    _, _, _, dropped = fast_batch_embeddings(
        params, fb, 2, users, pos, pos, edge_cap=8
    )
    assert int(dropped) > 0  # 32 users can't fit in 8 arc slots here


def test_batch_training_step_runs(setup):
    import optax
    from gnn_ecommerce_tpu.ops.bipartite import fast_batch_embeddings
    from gnn_ecommerce_tpu.train import make_train_fns
    from gnn_ecommerce_tpu.sampling import make_sampler_data
    from gnn_ecommerce_tpu.data.prepare import SamplerArrays

    g, params = setup
    cfg = LightGCNConfig(num_nodes=g.num_nodes, embedding_dim=24, num_layers=3)
    fb = build_fast_bipartite(g, dtype=jnp.float32)
    src, dst = np.asarray(g.src), np.asarray(g.dst)
    m = dst < g.n_users
    users, first = np.unique(dst[m], return_index=True)
    pos = src[m][first]
    arrays = SamplerArrays(
        users=users.astype(np.int64),
        pos_indptr=np.arange(len(users) + 1),
        pos_flat=pos.astype(np.int64),
        ign_indptr=np.arange(len(users) + 1),
        ign_flat=pos.astype(np.int64),
    )
    sdata = make_sampler_data(arrays, g.n_users, g.n_items)
    optimizer = optax.adam(1e-2)
    step, run_steps = make_train_fns(
        cfg, optimizer, batch_size=32, decay=1e-4,
        batch_embed_fn=lambda p, fb_, u, po, ne: fast_batch_embeddings(
            p, fb_, cfg.num_layers, u, po, ne, edge_cap=2048
        ),
    )
    p, o, metrics = step(params, optimizer.init(params), fb, sdata, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["dropped_arcs"]) == 0.0
    p, o, metrics = run_steps(p, o, fb, sdata, jax.random.key(1), 3)
    assert np.isfinite(float(metrics["loss"]))


def test_item_operator_banded(setup):
    """Multi-band accumulation (small band_bytes forces >= 3 bands) must be
    exact vs the single-band build, including the heavy/dense path."""
    g, params = setup
    split = split_graph(g)
    one = np.asarray(build_item_operator(split, dtype=jnp.float32))
    banded = np.asarray(
        build_item_operator(
            split, dtype=jnp.float32, band_bytes=g.n_items * g.n_items * 4 / 3.2,
            ell_width=3,  # push most users through the dense band path too
        )
    )
    np.testing.assert_allclose(banded, one, rtol=1e-5, atol=1e-6)
