"""Sharded training on the virtual 8-device CPU mesh (SURVEY.md §4 item 3)."""
import numpy as np
import jax
import optax
import pytest

from gnn_ecommerce_tpu.parallel import (
    make_mesh,
    mesh_factorization,
    make_sharded_train_step,
    shard_graph,
    shard_params,
)


def test_mesh_factorization():
    assert mesh_factorization(8) == (2, 4)
    assert mesh_factorization(16) == (4, 4)
    assert mesh_factorization(1) == (1, 1)
    assert mesh_factorization(6) == (3, 2)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    assert len(jax.devices()) == 8
    g.dryrun_multichip(8)


def test_sharded_step_matches_unsharded():
    """One sharded step produces the same params as the single-device step
    (same key => same batch => bitwise-comparable update modulo reduction
    order)."""
    import __graft_entry__ as g
    from gnn_ecommerce_tpu.sampling import make_sampler_data
    from gnn_ecommerce_tpu.data.prepare import SamplerArrays
    from gnn_ecommerce_tpu.train import make_train_fns

    graph, cfg, params, rng = g._tiny_setup(n_edges=3000, seed=7)
    src, dst = np.asarray(graph.src), np.asarray(graph.dst)
    m = dst < graph.n_users
    users, first = np.unique(dst[m], return_index=True)
    pos = src[m][first]
    arrays = SamplerArrays(
        users=users.astype(np.int64),
        pos_indptr=np.arange(len(users) + 1),
        pos_flat=pos.astype(np.int64),
        ign_indptr=np.arange(len(users) + 1),
        ign_flat=pos.astype(np.int64),
    )
    sdata = make_sampler_data(arrays, graph.n_users, graph.n_items)
    optimizer = optax.adam(1e-2)
    key = jax.random.key(3)

    # Single-device reference step (deep-copy: the step donates its buffers).
    copy = lambda tree: jax.tree.map(lambda x: x.copy(), tree)
    step1, _ = make_train_fns(cfg, optimizer, batch_size=64, decay=1e-4)
    p1, _, m1 = step1(copy(params), optimizer.init(params), graph, sdata, key)

    # Sharded step over 2x4 mesh.
    mesh = make_mesh(8)
    with mesh:
        sp = shard_params(copy(params), mesh)
        so = optimizer.init(sp)
        sg = shard_graph(graph, mesh)
        step8 = make_sharded_train_step(cfg, optimizer, mesh, batch_size=64, decay=1e-4)
        p8, _, m8 = step8(sp, so, sg, sdata, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["embedding"]), np.asarray(p8["embedding"]), rtol=1e-4, atol=1e-6
    )


def test_sharded_evaluate_matches_single_device(rng):
    import jax.numpy as jnp
    from gnn_ecommerce_tpu.data.prepare import CsrList, EvalSplit
    from gnn_ecommerce_tpu.eval import build_eval_batch, evaluate
    from gnn_ecommerce_tpu.parallel import make_mesh
    from gnn_ecommerce_tpu.parallel.sharded_eval import sharded_evaluate

    n_users, n_items, dim = 37, 12, 8  # deliberately not divisible by 8
    emb = jnp.asarray(rng.standard_normal((n_users + n_items, dim)).astype(np.float32))
    uids = np.sort(rng.choice(n_users, 13, replace=False)).astype(np.int64)
    truth_vals = rng.integers(0, n_items, len(uids))
    mask_lens = rng.integers(0, 3, len(uids))
    mask_vals = rng.integers(0, n_items, int(mask_lens.sum()))
    split = EvalSplit(
        user_ids=uids,
        truth=CsrList(np.arange(len(uids) + 1), truth_vals),
        train_mask=CsrList(np.append(0, np.cumsum(mask_lens)), mask_vals),
    )
    batch = build_eval_batch(split)
    p1, r1, pr1, rr1, idx1 = evaluate(emb, batch, n_users, k=5, item_tile=8)
    mesh = make_mesh(8, axis_sizes=(8,), axis_names=("data",))
    p2, r2, pr2, rr2, idx2 = sharded_evaluate(
        emb, batch, n_users, mesh, k=5, item_tile=8
    )
    assert p2 == pytest.approx(p1, rel=1e-6)
    assert r2 == pytest.approx(r1, rel=1e-6)
    np.testing.assert_array_equal(idx2, idx1)


def test_make_sharded_eval_fn_matches_bucketed(rng):
    """The driver's wired-in sharded bucketed eval (round-4 VERDICT weak #1)
    must reproduce evaluate_bucketed's user-weighted means exactly, on both
    mesh shapes the driver builds (2x4 data/model GSPMD mesh and the edge
    partition's 1-axis model mesh)."""
    import jax.numpy as jnp
    from gnn_ecommerce_tpu.data.prepare import CsrList, EvalSplit
    from gnn_ecommerce_tpu.eval import build_eval_buckets, evaluate_bucketed
    from gnn_ecommerce_tpu.parallel import make_mesh, make_sharded_eval_fn

    n_users, n_items, dim = 91, 23, 8
    emb = jnp.asarray(
        rng.standard_normal((n_users + n_items, dim)).astype(np.float32)
    )
    uids = np.sort(rng.choice(n_users, 41, replace=False)).astype(np.int64)
    truth_lens = rng.integers(1, 4, len(uids))
    truth_vals = rng.integers(0, n_items, int(truth_lens.sum()))
    mask_lens = rng.integers(0, 9, len(uids))  # spans >1 pow2 bucket
    mask_vals = rng.integers(0, n_items, int(mask_lens.sum()))
    split = EvalSplit(
        user_ids=uids,
        truth=CsrList(np.append(0, np.cumsum(truth_lens)), truth_vals),
        train_mask=CsrList(np.append(0, np.cumsum(mask_lens)), mask_vals),
    )
    buckets = build_eval_buckets(split, width_floor=4)
    assert len(buckets) > 1  # actually exercises bucket accumulation
    p1, r1 = evaluate_bucketed(emb, buckets, n_users, k=5, item_tile=8)
    for mesh in (
        make_mesh(8),  # (data 2, model 4)
        make_mesh(8, axis_sizes=(8,), axis_names=("model",)),
    ):
        fn = make_sharded_eval_fn(mesh, n_users, k=5, item_tile=8)
        with mesh:
            p2, r2 = fn(emb, buckets)
        assert p2 == pytest.approx(p1, rel=1e-6)
        assert r2 == pytest.approx(r1, rel=1e-6)


def test_sharded_fast_step_matches_unsharded():
    """The sharded fast-bipartite batched step must match the single-device
    batched fast step (same key => same batch) to float tolerance."""
    import jax.numpy as jnp
    import __graft_entry__ as g
    from gnn_ecommerce_tpu.sampling import make_sampler_data
    from gnn_ecommerce_tpu.data.prepare import SamplerArrays
    from gnn_ecommerce_tpu.train import make_train_fns
    from gnn_ecommerce_tpu.ops.bipartite import build_fast_bipartite, fast_batch_embeddings
    from gnn_ecommerce_tpu.parallel import (
        make_mesh, make_sharded_fast_train_step, shard_fast_bipartite, shard_params,
    )

    graph, cfg, params, rng = g._tiny_setup(n_edges=3000, seed=11)
    fb = build_fast_bipartite(graph, dtype=jnp.float32)
    src, dst = np.asarray(graph.src), np.asarray(graph.dst)
    m = dst < graph.n_users
    users, first = np.unique(dst[m], return_index=True)
    pos = src[m][first]
    arrays = SamplerArrays(
        users=users.astype(np.int64),
        pos_indptr=np.arange(len(users) + 1),
        pos_flat=pos.astype(np.int64),
        ign_indptr=np.arange(len(users) + 1),
        ign_flat=pos.astype(np.int64),
    )
    sdata = make_sampler_data(arrays, graph.n_users, graph.n_items)
    optimizer = optax.adam(1e-2)
    key = jax.random.key(5)
    copy = lambda tree: jax.tree.map(lambda x: x.copy(), tree)

    step1, _ = make_train_fns(
        cfg, optimizer, batch_size=64, decay=1e-4,
        batch_embed_fn=lambda p, fb_, u, po, ne: fast_batch_embeddings(
            p, fb_, cfg.num_layers, u, po, ne, edge_cap=4096
        ),
    )
    p1, _, m1 = step1(copy(params), optimizer.init(params), fb, sdata, key)

    mesh = make_mesh(8)
    with mesh:
        sp = shard_params(copy(params), mesh)
        so = optimizer.init(sp)
        sfb = shard_fast_bipartite(fb, mesh)
        step8 = make_sharded_fast_train_step(
            cfg, optimizer, mesh, batch_size=64, decay=1e-4, edge_cap=4096
        )
        p8, _, m8 = step8(sp, so, sfb, sdata, key)

    assert float(m8["dropped_arcs"]) == 0.0
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["embedding"]), np.asarray(p8["embedding"]), rtol=1e-4, atol=1e-6
    )


def test_sharded_fast_ops_match_segment_oracle():
    """ops/spmm_sharded: the mesh-partitioned plan pair must reproduce the
    plain segment-sum SpMMs (f32 exact mode) and transpose correctly."""
    import jax.numpy as jnp
    import __graft_entry__ as g
    from gnn_ecommerce_tpu.ops.bipartite import split_graph, to_items, to_users
    from gnn_ecommerce_tpu.ops.spmm_sharded import (
        build_sharded_fast_ops, sharded_to_items, sharded_to_users,
    )
    from gnn_ecommerce_tpu.parallel import make_mesh

    graph, cfg, params, rng = g._tiny_setup(n_edges=3000, seed=13)
    split = split_graph(graph)
    mesh = make_mesh(8)
    sfo = build_sharded_fast_ops(
        split, mesh, msgs_dtype="float32", heavy_users=16, ot=8, ch=16
    )
    x_u = jnp.asarray(
        rng.standard_normal((graph.n_users, 8)).astype(np.float32)
    )
    x_i = jnp.asarray(
        rng.standard_normal((graph.n_items, 8)).astype(np.float32)
    )
    with mesh:
        got_i = sharded_to_items(x_u, sfo)
        got_u = sharded_to_users(x_i, sfo)
    np.testing.assert_allclose(
        np.asarray(got_i), np.asarray(to_items(x_u, split)), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_u), np.asarray(to_users(x_i, split)), rtol=1e-4, atol=1e-5
    )
    # Transpose pair: vjp of to_items is to_users on the cotangent.
    with mesh:
        _, vjp = jax.vjp(lambda x: sharded_to_items(x, sfo), x_u)
        (gx,) = vjp(jnp.asarray(np.asarray(got_i)))
    oracle = to_users(jnp.asarray(np.asarray(got_i)), split)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(oracle), rtol=1e-4, atol=1e-5
    )


def test_sharded_fast_step_with_plans_matches_unsharded():
    """Mesh step with sharded SpMM plans + heavy head == single-device
    FastOps step (round-2 VERDICT item 3: the best-measured config must
    survive sharding)."""
    import jax.numpy as jnp
    import __graft_entry__ as g
    from gnn_ecommerce_tpu.sampling import make_sampler_data
    from gnn_ecommerce_tpu.data.prepare import SamplerArrays
    from gnn_ecommerce_tpu.train import make_train_fns
    from gnn_ecommerce_tpu.ops.bipartite import (
        build_fast_bipartite, fast_batch_embeddings,
    )
    from gnn_ecommerce_tpu.parallel import (
        make_mesh, make_sharded_fast_train_step, shard_fast_bipartite,
        shard_params,
    )

    graph, cfg, params, rng = g._tiny_setup(n_edges=3000, seed=17)
    fb = build_fast_bipartite(
        graph, dtype=jnp.float32, fast_ops=True, heavy_users=16
    )
    src, dst = np.asarray(graph.src), np.asarray(graph.dst)
    m = dst < graph.n_users
    users, first = np.unique(dst[m], return_index=True)
    pos = src[m][first]
    arrays = SamplerArrays(
        users=users.astype(np.int64),
        pos_indptr=np.arange(len(users) + 1),
        pos_flat=pos.astype(np.int64),
        ign_indptr=np.arange(len(users) + 1),
        ign_flat=pos.astype(np.int64),
    )
    sdata = make_sampler_data(arrays, graph.n_users, graph.n_items)
    optimizer = optax.adam(1e-2)
    key = jax.random.key(5)
    copy = lambda tree: jax.tree.map(lambda x: x.copy(), tree)

    step1, _ = make_train_fns(
        cfg, optimizer, batch_size=64, decay=1e-4,
        batch_embed_fn=lambda p, fb_, u, po, ne: fast_batch_embeddings(
            p, fb_, cfg.num_layers, u, po, ne, edge_cap=4096
        ),
    )
    p1, _, m1 = step1(copy(params), optimizer.init(params), fb, sdata, key)

    mesh = make_mesh(8)
    with mesh:
        sp = shard_params(copy(params), mesh)
        so = optimizer.init(sp)
        sfb = shard_fast_bipartite(
            fb, mesh, fast_ops=True, msgs_dtype="float32", heavy_users=16
        )
        assert sfb.fops is not None
        step8 = make_sharded_fast_train_step(
            cfg, optimizer, mesh, batch_size=64, decay=1e-4, edge_cap=4096
        )
        p8, _, m8 = step8(sp, so, sfb, sdata, key)

    assert float(m8["dropped_arcs"]) == 0.0
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p1["embedding"]), np.asarray(p8["embedding"]), rtol=1e-3, atol=1e-5
    )


def test_shard_graph_pads_to_data_axis():
    """shard_graph must pad arc arrays to a multiple of the DATA axis: arcs
    are always 2E (even), so data=2 masked this, but data=4 (the 16-device
    v5e-16 layout) fails on any E with 2E % 4 != 0 (round-3 dryrun catch).
    The padded graph must propagate identically to the unsharded one."""
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    from gnn_ecommerce_tpu.models import get_embedding
    from gnn_ecommerce_tpu.parallel import make_mesh, shard_graph

    graph, cfg, params, rng = g._tiny_setup(n_edges=1997, seed=21)  # arcs % 4 == 2
    if graph.num_arcs % 4 == 0:  # ensure the pad path actually engages
        pytest.skip("edge dedup landed on a multiple of 4")
    mesh = make_mesh(8, axis_sizes=(4, 2))  # data=4: 2E % 4 == 2
    sg = shard_graph(graph, mesh)
    assert sg.src.shape[0] % 4 == 0
    ref = get_embedding(params, graph, cfg)
    with mesh:
        out = get_embedding(params, sg, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
