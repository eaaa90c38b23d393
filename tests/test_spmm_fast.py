"""The measured-optimal SpMM pair (ops/spmm_fast.py) vs the segment oracle.

Covers: binned-ELL to_users, gather+Pallas-segment-reduce to_items (interpret
mode off-TPU), the custom-VJP transpose pairing, and the full fast forward /
train gradients with FastOps enabled.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_ecommerce_tpu.graph import build_graph
from gnn_ecommerce_tpu.models import LightGCNConfig, init_params
from gnn_ecommerce_tpu.ops.bipartite import (
    FastBipartite,
    build_fast_ops,
    build_item_operator,
    fast_get_embedding,
    fast_to_items,
    fast_to_users,
    split_graph,
    to_items,
    to_users,
)


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(3)
    n_u, n_i, e = 400, 60, 3000
    u = rng.integers(0, n_u, e)
    i = rng.integers(0, n_i, e)
    key = np.unique(u * 64 + i)
    u, i = key // 64, key % 64
    i = np.minimum(i, n_i - 1)
    w = rng.random(len(u)).astype(np.float32) + 0.05
    graph = build_graph(u, i, w, n_u, n_i)
    split = split_graph(graph)
    fops = build_fast_ops(split)
    return graph, split, fops


def test_fast_to_items_matches_segment(small):
    _, split, fops = small
    x = jax.random.normal(jax.random.key(0), (split.n_users, 16), jnp.float32)
    ref = to_items(x, split)
    out = fast_to_items(x, fops)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fast_to_users_matches_segment(small):
    _, split, fops = small
    x = jax.random.normal(jax.random.key(1), (split.n_items, 16), jnp.float32)
    ref = to_users(x, split)
    out = fast_to_users(x, fops)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fast_pair_vjps_are_transposes(small):
    _, split, fops = small
    x = jax.random.normal(jax.random.key(2), (split.n_users, 8), jnp.float32)
    g = jax.random.normal(jax.random.key(3), (split.n_items, 8), jnp.float32)
    # d/dx <g, to_items(x)> == to_users(g)
    grad = jax.grad(lambda x_: jnp.vdot(fast_to_items(x_, fops), g))(x)
    ref = to_users(g, split)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref), rtol=2e-5, atol=2e-5)
    y = jax.random.normal(jax.random.key(4), (split.n_items, 8), jnp.float32)
    h = jax.random.normal(jax.random.key(5), (split.n_users, 8), jnp.float32)
    grad2 = jax.grad(lambda y_: jnp.vdot(fast_to_users(y_, fops), h))(y)
    ref2 = to_items(h, split)
    np.testing.assert_allclose(np.asarray(grad2), np.asarray(ref2), rtol=2e-5, atol=2e-5)


def test_fast_forward_and_grads_with_fops(small):
    graph, split, fops = small
    cfg = LightGCNConfig(num_nodes=graph.num_nodes, embedding_dim=12, num_layers=3)
    params = init_params(jax.random.key(0), cfg)
    fb_ref = FastBipartite(split=split, item_op=build_item_operator(split))
    fb_fast = FastBipartite(split=split, item_op=fb_ref.item_op, fops=fops)
    ref = fast_get_embedding(params, fb_ref, cfg.num_layers)
    out = fast_get_embedding(params, fb_fast, cfg.num_layers)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)

    def loss(p, fb):
        emb = fast_get_embedding(p, fb, cfg.num_layers)
        return jnp.sum(emb[: split.n_users][:7] * emb[split.n_users :][:7])

    g_ref = jax.grad(loss)(params, fb_ref)["embedding"]
    g_fast = jax.grad(loss)(params, fb_fast)["embedding"]
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), rtol=3e-5, atol=3e-5
    )


def test_hybrid_heavy_users_exact(small):
    """Dense-heavy-user hybrid (f32 head) is an exact restructure of both
    directions and keeps the self-transpose VJP pairing."""
    _, split, _ = small
    fops_h = build_fast_ops(split, heavy_users=50)
    assert fops_h.w_hi is not None and fops_h.w_hi.shape[0] == split.n_items
    x = jax.random.normal(jax.random.key(0), (split.n_users, 16), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fast_to_items(x, fops_h)),
        np.asarray(to_items(x, split)),
        rtol=2e-5, atol=2e-5,
    )
    y = jax.random.normal(jax.random.key(1), (split.n_items, 16), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fast_to_users(y, fops_h)),
        np.asarray(to_users(y, split)),
        rtol=2e-5, atol=2e-5,
    )
    g = jax.random.normal(jax.random.key(2), (split.n_items, 16), jnp.float32)
    grad = jax.grad(lambda x_: jnp.vdot(fast_to_items(x_, fops_h), g))(x)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(to_users(g, split)), rtol=2e-5, atol=2e-5
    )


def test_hybrid_all_users_heavy(small):
    """heavy_users >= n_users folds EVERY arc into the dense head."""
    _, split, _ = small
    fops_h = build_fast_ops(split, heavy_users=split.n_users + 10)
    assert int(fops_h.items_plan.gw.sum()) == 0  # no tail arcs left
    x = jax.random.normal(jax.random.key(3), (split.n_users, 8), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fast_to_items(x, fops_h)),
        np.asarray(to_items(x, split)),
        rtol=2e-5, atol=2e-5,
    )


def test_hybrid_bf16_head_close(small):
    _, split, _ = small
    fops_h = build_fast_ops(
        split, msgs_dtype="bfloat16", heavy_users=50, heavy_dtype="bfloat16"
    )
    assert fops_h.w_hi.dtype == jnp.bfloat16
    x = jax.random.normal(jax.random.key(4), (split.n_users, 16), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fast_to_items(x, fops_h)),
        np.asarray(to_items(x, split)),
        rtol=2e-2, atol=2e-2,
    )


def test_bf16_msgs_mode_close(small):
    _, split, _ = small
    fops_bf16 = build_fast_ops(split, msgs_dtype="bfloat16")
    x = jax.random.normal(jax.random.key(6), (split.n_users, 16), jnp.float32)
    ref = to_items(x, split)
    out = fast_to_items(x, fops_bf16)
    # one bf16 rounding per message: ~1e-2 relative
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_bf16_to_users_gather_close(small):
    _, split, _ = small
    fops_bf16 = build_fast_ops(split, msgs_dtype="bfloat16")
    x = jax.random.normal(jax.random.key(7), (split.n_items, 16), jnp.float32)
    ref = to_users(x, split)
    out = fast_to_users(x, fops_bf16)  # bf16 table gather, f32 accumulate
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_hybrid_sums_duplicate_arcs():
    """Duplicate (user, item) edge rows must SUM in the dense head exactly as
    they do in the sparse plans (plain assignment kept only the last)."""
    u = np.array([0, 0, 1, 2, 0])
    i = np.array([1, 1, 0, 2, 1])  # (0, 1) appears three times
    w = np.array([0.3, 0.5, 1.0, 0.7, 0.2], np.float32)
    graph = build_graph(u, i, w, 3, 3)
    split = split_graph(graph)
    fops_h = build_fast_ops(split, heavy_users=3)
    x = jax.random.normal(jax.random.key(0), (split.n_users, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fast_to_items(x, fops_h)),
        np.asarray(to_items(x, split)),
        rtol=2e-5, atol=2e-5,
    )


def test_bucketed_to_items_matches_segment(small):
    _, split, _ = small
    fops_b = build_fast_ops(split, src_buckets=4)
    x = jax.random.normal(jax.random.key(6), (split.n_users, 16), jnp.float32)
    ref = to_items(x, split)
    out = fast_to_items(x, fops_b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # VJP still routes through the ELL to_users (self-transpose pairing).
    g = jax.random.normal(jax.random.key(7), (split.n_items, 16), jnp.float32)
    grad = jax.grad(lambda x_: jnp.vdot(fast_to_items(x_, fops_b), g))(x)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(to_users(g, split)), rtol=2e-5, atol=2e-5
    )


def test_bucketed_hybrid_bf16_forward_close(small):
    graph, split, _ = small
    fops_b = build_fast_ops(
        split, msgs_dtype="bfloat16", heavy_users=32, heavy_dtype="bfloat16",
        src_buckets=4,
    )
    cfg = LightGCNConfig(num_nodes=graph.num_nodes, embedding_dim=12, num_layers=3)
    params = init_params(jax.random.key(1), cfg)
    fb_ref = FastBipartite(split=split, item_op=build_item_operator(split))
    fb_fast = FastBipartite(split=split, item_op=fb_ref.item_op, fops=fops_b)
    ref = np.asarray(fast_get_embedding(params, fb_ref, cfg.num_layers))
    out = np.asarray(fast_get_embedding(params, fb_fast, cfg.num_layers))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 3e-2


def test_host_plan_equals_device_plan(small):
    """build_segreduce_plan(device=False) must produce numpy leaves that are
    bit-identical to the device plan's (the sharded builder stacks host
    plans and device_puts them straight to their shards)."""
    from gnn_ecommerce_tpu.ops.spmm_fast import build_segreduce_plan

    _, split, _ = small
    args = (
        np.asarray(split.ui_src_user), np.asarray(split.ui_dst_item),
        np.asarray(split.ui_w), split.n_items,
    )
    dev = build_segreduce_plan(*args, ot=8, ch=16)
    host = build_segreduce_plan(*args, ot=8, ch=16, device=False)
    for leaf in ("gidx", "gw", "seg", "tile_map", "first"):
        h = getattr(host, leaf)
        assert isinstance(h, np.ndarray), leaf
        np.testing.assert_array_equal(h, np.asarray(getattr(dev, leaf)))
