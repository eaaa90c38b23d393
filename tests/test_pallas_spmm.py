"""Pallas to_users SpMM kernel vs segment-sum oracle (interpret mode on CPU;
the real-TPU compile/run is exercised by bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_ecommerce_tpu.graph import build_graph
from gnn_ecommerce_tpu.ops.bipartite import split_graph, to_users
from gnn_ecommerce_tpu.ops.pallas_spmm import PallasToUsers, from_split

from test_graph_and_model import random_bipartite


@pytest.mark.parametrize("rows,e_chunk", [(8, 16), (16, 32)])
def test_pallas_to_users_matches_oracle(rng, rows, e_chunk):
    n_users, n_items = 50, 17
    u, i, w = random_bipartite(rng, n_users, n_items, 300)
    g = build_graph(u, i, w, n_users, n_items)
    split = split_graph(g)
    x = jnp.asarray(rng.standard_normal((n_items, 10)).astype(np.float32))

    oracle = np.asarray(to_users(x, split))
    op = from_split(split, rows=rows, e_chunk=e_chunk, interpret=True)
    got = np.asarray(op(x, dtype=jnp.float32))
    assert got.shape == oracle.shape
    np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-6)


def test_pallas_to_users_empty_rows(rng):
    # Users with no arcs must come out exactly zero (incl. trailing block).
    n_users, n_items = 40, 8
    u = np.array([0, 0, 5, 5, 5, 12])
    i = np.array([0, 3, 1, 2, 7, 4])
    w = np.array([0.5, 0.25, 1.0, 0.75, 0.3, 0.9], np.float32)
    g = build_graph(u, i, w, n_users, n_items)
    split = split_graph(g)
    x = jnp.asarray(rng.standard_normal((n_items, 6)).astype(np.float32))
    oracle = np.asarray(to_users(x, split))
    op = from_split(split, rows=8, e_chunk=4, interpret=True)
    got = np.asarray(op(x, dtype=jnp.float32))
    np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-6)
    empty = np.setdiff1d(np.arange(n_users), u)
    assert np.abs(got[empty]).max() == 0.0


def test_fast_embedding_with_pallas_to_users(rng):
    from gnn_ecommerce_tpu.models import LightGCNConfig
    from gnn_ecommerce_tpu.ops.bipartite import (
        build_fast_bipartite,
        fast_get_embedding,
        make_pallas_to_users,
    )

    n_users, n_items = 60, 20
    u, i, w = random_bipartite(rng, n_users, n_items, 350)
    g = build_graph(u, i, w, n_users, n_items)
    fb = build_fast_bipartite(g, dtype=jnp.float32)
    params = {
        "embedding": jnp.asarray(
            rng.standard_normal((n_users + n_items, 12)).astype(np.float32)
        )
    }
    base = np.asarray(fast_get_embedding(params, fb, 3))
    # f32 item table keeps this an exactness test (bf16 is the perf mode).
    wrapped = make_pallas_to_users(
        fb.split, table_dtype=jnp.float32, rows=8, e_chunk=16, interpret=True
    )
    got = np.asarray(fast_get_embedding(params, fb, 3, to_users_fn=wrapped))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-6)
    # Gradients must agree too (custom VJP routes bwd through to_items).
    ct = jnp.asarray(rng.standard_normal(base.shape).astype(np.float32))
    g1 = jax.grad(lambda p: jnp.vdot(fast_get_embedding(p, fb, 3), ct))(params)
    g2 = jax.grad(
        lambda p: jnp.vdot(fast_get_embedding(p, fb, 3, to_users_fn=wrapped), ct)
    )(params)
    np.testing.assert_allclose(
        np.asarray(g2["embedding"]), np.asarray(g1["embedding"]), rtol=1e-4, atol=1e-5
    )
