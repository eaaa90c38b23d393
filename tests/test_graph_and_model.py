"""Parity of graph normalization + LightGCN propagation vs the torch oracle.

BASELINE config 1: synthetic bipartite graph, allclose vs reference
``src/lightgcn.py`` semantics for per-layer propagated embeddings.
"""
import numpy as np
import torch
import jax.numpy as jnp
import pytest

from gnn_ecommerce_tpu.graph import build_graph, symmetric_normalize
from gnn_ecommerce_tpu.models import LightGCNConfig, init_params, get_embedding, forward
from gnn_ecommerce_tpu.ops import propagate_segment

from torch_oracle import lightgcn_embedding, lgconv, bidirectional


def random_bipartite(rng, n_users=200, n_items=50, n_edges=1000):
    u = rng.integers(0, n_users, n_edges)
    i = rng.integers(0, n_items, n_edges)
    # Dedup (user,item) pairs like the reference's groupby edge pipeline.
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    w = rng.uniform(0.01, 1.0, len(u))
    return u, i, w


def test_normalization_matches_oracle(rng):
    u, i, w = random_bipartite(rng)
    n_users, n_items = 200, 50
    n = n_users + n_items
    g = build_graph(u, i, w, n_users, n_items, to_device=False)
    # Oracle normalization over the same arc set; compare as dense matrices
    # since arc orderings differ.
    from torch_oracle import gcn_norm

    src_t, dst_t, w_t = bidirectional(
        torch.tensor(u), torch.tensor(i + n_users), torch.tensor(w, dtype=torch.float32)
    )
    norm_t = gcn_norm(src_t, dst_t, w_t, n)
    dense_oracle = np.zeros((n, n), np.float64)
    np.add.at(dense_oracle, (dst_t.numpy(), src_t.numpy()), norm_t.numpy())
    dense_ours = np.zeros((n, n), np.float64)
    np.add.at(dense_ours, (np.asarray(g.dst), np.asarray(g.src)), np.asarray(g.w_norm))
    np.testing.assert_allclose(dense_ours, dense_oracle, rtol=1e-6, atol=1e-7)


def test_single_layer_propagation_matches_oracle(rng):
    n_users, n_items = 200, 50
    u, i, w = random_bipartite(rng)
    g = build_graph(u, i, w, n_users, n_items)
    n = n_users + n_items
    x = rng.standard_normal((n, 16)).astype(np.float32)

    out_jax = np.asarray(propagate_segment(g, jnp.asarray(x)))

    src_t, dst_t, w_t = bidirectional(
        torch.tensor(u), torch.tensor(i + n_users), torch.tensor(w, dtype=torch.float32)
    )
    out_torch = lgconv(torch.tensor(x), src_t, dst_t, w_t, n).numpy()
    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("num_layers", [1, 3, 5])
def test_lightgcn_embedding_matches_oracle(rng, num_layers):
    n_users, n_items = 300, 80
    u, i, w = random_bipartite(rng, n_users, n_items, 3000)
    g = build_graph(u, i, w, n_users, n_items)
    n = n_users + n_items
    cfg = LightGCNConfig(num_nodes=n, embedding_dim=32, num_layers=num_layers)
    emb = rng.standard_normal((n, 32)).astype(np.float32)
    params = {"embedding": jnp.asarray(emb)}

    out_jax = np.asarray(get_embedding(params, g, cfg))

    src_t, dst_t, w_t = bidirectional(
        torch.tensor(u), torch.tensor(i + n_users), torch.tensor(w, dtype=torch.float32)
    )
    out_torch = lightgcn_embedding(torch.tensor(emb), src_t, dst_t, w_t, num_layers).numpy()
    np.testing.assert_allclose(out_jax, out_torch, rtol=2e-5, atol=2e-5)


def test_pair_scoring_matches_oracle(rng):
    n_users, n_items = 100, 40
    u, i, w = random_bipartite(rng, n_users, n_items, 800)
    g = build_graph(u, i, w, n_users, n_items)
    n = n_users + n_items
    cfg = LightGCNConfig(num_nodes=n, embedding_dim=16, num_layers=2)
    emb = rng.standard_normal((n, 16)).astype(np.float32)
    params = {"embedding": jnp.asarray(emb)}

    pairs = np.stack([rng.integers(0, n_users, 64), rng.integers(n_users, n, 64)])
    scores = np.asarray(forward(params, g, jnp.asarray(pairs), cfg))

    src_t, dst_t, w_t = bidirectional(
        torch.tensor(u), torch.tensor(i + n_users), torch.tensor(w, dtype=torch.float32)
    )
    out_t = lightgcn_embedding(torch.tensor(emb), src_t, dst_t, w_t, 2)
    expected = (out_t[pairs[0]] * out_t[pairs[1]]).sum(-1).numpy()
    np.testing.assert_allclose(scores, expected, rtol=2e-5, atol=2e-5)


def test_zero_degree_nodes_are_safe(rng):
    # Nodes with no incident edges must produce zero propagation, not inf/nan
    # (gcn_norm masks 1/sqrt(0) to 0).
    n_users, n_items = 10, 5
    u = np.array([0, 1]); i = np.array([0, 1]); w = np.array([1.0, 0.5])
    g = build_graph(u, i, w, n_users, n_items)
    x = np.ones((15, 8), np.float32)
    out = np.asarray(propagate_segment(g, jnp.asarray(x)))
    assert np.isfinite(out).all()
    assert np.all(out[2:10] == 0)  # untouched users


def test_init_params_xavier_bound():
    import jax
    cfg = LightGCNConfig(num_nodes=1000, embedding_dim=64, num_layers=2)
    params = init_params(jax.random.key(0), cfg)
    bound = (6.0 / (1000 + 64)) ** 0.5
    e = np.asarray(params["embedding"])
    assert e.shape == (1000, 64)
    assert np.abs(e).max() <= bound
    # Roughly uniform: std of U(-b,b) is b/sqrt(3).
    assert abs(e.std() - bound / np.sqrt(3)) < 0.1 * bound


def test_custom_vjp_matches_autodiff(rng):
    """Symmetric-Â custom backward == XLA autodiff of the raw SpMM."""
    import jax
    import jax.numpy as jnp
    from gnn_ecommerce_tpu.ops.propagate import _spmm, propagate_segment

    n_users, n_items = 60, 20
    u, i, w = random_bipartite(rng, n_users, n_items, 300)
    g = build_graph(u, i, w, n_users, n_items)
    n = n_users + n_items
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    f_custom = lambda x: jnp.vdot(propagate_segment(g, x), ct)
    f_raw = lambda x: jnp.vdot(_spmm(g.src, g.dst, g.w_norm, n, x), ct)
    gx_custom = jax.grad(f_custom)(x)
    gx_raw = jax.grad(f_raw)(x)
    np.testing.assert_allclose(np.asarray(gx_custom), np.asarray(gx_raw), rtol=1e-4, atol=1e-5)


def test_chunked_propagate_matches(rng):
    from gnn_ecommerce_tpu.ops.propagate import propagate_segment_chunked

    n_users, n_items = 100, 30
    u, i, w = random_bipartite(rng, n_users, n_items, 700)
    g = build_graph(u, i, w, n_users, n_items)
    x = jnp.asarray(rng.standard_normal((130, 16)).astype(np.float32))
    a = np.asarray(propagate_segment(g, x))
    for chunks in (1, 3, 8):
        b = np.asarray(propagate_segment_chunked(g, x, chunks))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
