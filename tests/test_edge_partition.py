"""Explicit edge-partitioned (shard_map all_to_all) path vs single-device oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from gnn_ecommerce_tpu.graph import build_graph
from gnn_ecommerce_tpu.models import LightGCNConfig, get_embedding, init_params
from gnn_ecommerce_tpu.parallel import make_mesh
from gnn_ecommerce_tpu.parallel.edge_partition import (
    EdgePartition,
    build_edge_partition,
    make_explicit_fns,
    pad_params,
)

from test_graph_and_model import random_bipartite


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    n_users, n_items = 301, 83  # deliberately not divisible by 8
    u, i, w = random_bipartite(rng, n_users, n_items, 2600)
    g = build_graph(u, i, w, n_users, n_items)
    cfg = LightGCNConfig(num_nodes=g.num_nodes, embedding_dim=16, num_layers=3)
    params = init_params(jax.random.key(0), cfg)
    return g, cfg, params


def test_partition_structure(setup):
    g, cfg, params = setup
    part = build_edge_partition(g, 8)
    assert part.n_shards == 8
    assert part.padded_nodes >= g.num_nodes
    # Every real arc appears exactly once across shards (weights preserved),
    # split between the local-source and remote-source lists.
    total_w = float(np.asarray(part.w_loc).sum() + np.asarray(part.w_rem).sum())
    np.testing.assert_allclose(total_w, float(np.asarray(g.w_norm).sum()), rtol=1e-5)
    # Destinations sorted per shard per kind (padding rows at R-1 keep it so).
    for dl in (np.asarray(part.dst_loc), np.asarray(part.dst_rem)):
        assert all((np.diff(dl[s]) >= 0).all() for s in range(8))


def test_explicit_embed_matches_oracle(setup):
    g, cfg, params = setup
    mesh = make_mesh(8, axis_sizes=(8,), axis_names=("model",))
    part = build_edge_partition(g, 8)
    with mesh:
        padded = pad_params(params, part, mesh)
        embed, _ = make_explicit_fns(
            cfg, optax.adam(1e-2), mesh, part, batch_size=32, decay=1e-4
        )
        out = np.asarray(embed(padded, part))[: g.num_nodes]
    oracle = np.asarray(get_embedding(params, g, cfg))
    np.testing.assert_allclose(out, oracle, rtol=2e-5, atol=2e-6)


def test_explicit_train_step_matches_single_device(setup):
    """One explicit sharded train step == one single-device train step
    (same sampler key -> same batch -> same loss and updated embeddings)."""
    from gnn_ecommerce_tpu.data.prepare import SamplerArrays
    from gnn_ecommerce_tpu.sampling import make_sampler_data
    from gnn_ecommerce_tpu.train import make_train_fns

    g, cfg, params = setup
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
    key = jax.random.key(42)

    mesh = make_mesh(8, axis_sizes=(8,), axis_names=("model",))
    part = build_edge_partition(g, 8)
    with mesh:
        padded = pad_params(params, part, mesh)

    # Single-device reference step (donates its params; copy first).
    params_copy = {"embedding": jnp.array(params["embedding"])}
    ref_step, _ = make_train_fns(cfg, optimizer, batch_size=64, decay=1e-4)
    ref_params, _, ref_metrics = ref_step(
        params_copy, optimizer.init(params_copy), g, sdata, key
    )

    with mesh:
        _, train_step = make_explicit_fns(
            cfg, optimizer, mesh, part, batch_size=64, decay=1e-4
        )
        new_params, _, metrics = train_step(
            padded, optimizer.init(padded), part, sdata, key
        )
        got = np.asarray(new_params["embedding"])[: g.num_nodes]

    np.testing.assert_allclose(
        float(metrics["bpr_loss"]), float(ref_metrics["bpr_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["reg_loss"]), float(ref_metrics["reg_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        got, np.asarray(ref_params["embedding"]), rtol=5e-4, atol=5e-5
    )


def test_overlap_schedule_local_spmm_independent_of_exchange():
    """The overlap DESIGN claim (module docstring: local partial segment-sum
    has no data dependency on the boundary all_to_all, so XLA's async
    collectives can hide the exchange) asserted structurally on the traced
    program: of the 2 segment-sums per layer, exactly the LOCAL one per
    layer must be transitively independent of every all_to_all output."""
    import jax
    import optax

    import __graft_entry__ as g
    from gnn_ecommerce_tpu.parallel import (
        build_edge_partition, make_explicit_fns, make_mesh, pad_params,
    )

    graph, cfg, params, rng = g._tiny_setup(n_edges=2000, seed=1)
    n_dev = 8
    mesh = make_mesh(n_dev, axis_sizes=(n_dev,), axis_names=("model",))
    part = build_edge_partition(graph, n_dev)
    with mesh:
        padded = pad_params(params, part, mesh)
        optimizer = optax.adam(1e-2)
        embed, _ = make_explicit_fns(
            cfg, optimizer, mesh, part, batch_size=64, decay=1e-4
        )
        jx = jax.make_jaxpr(lambda e: embed({"embedding": e}, part))(
            padded["embedding"]
        )
    (sm_eqn,) = [e for e in jx.jaxpr.eqns if e.primitive.name == "shard_map"]
    inner = sm_eqn.params["jaxpr"]
    inner = inner.jaxpr if hasattr(inner, "jaxpr") else inner

    a2a_idx = [
        i for i, e in enumerate(inner.eqns) if e.primitive.name == "all_to_all"
    ]
    scatters = [
        i for i, e in enumerate(inner.eqns) if e.primitive.name == "scatter-add"
    ]
    assert len(a2a_idx) == cfg.num_layers, (a2a_idx, cfg.num_layers)
    assert len(scatters) == 2 * cfg.num_layers, scatters

    def independent_scatters(a2a_eqn_idx: int) -> int:
        """# scatter-adds transitively independent of THIS all_to_all."""
        tainted = set(inner.eqns[a2a_eqn_idx].outvars)
        free = 0
        for i, eqn in enumerate(inner.eqns[a2a_eqn_idx + 1 :], a2a_eqn_idx + 1):
            deps = any(
                getattr(v, "count", None) is not None and v in tainted
                for v in eqn.invars
            )
            if deps:
                tainted.update(eqn.outvars)
            elif eqn.primitive.name == "scatter-add":
                free += 1
        # scatter-adds BEFORE the all_to_all are trivially independent.
        before = sum(1 for i in scatters if i < a2a_eqn_idx)
        return before + free

    # Layer l's exchange must leave 2l earlier scatter-adds PLUS layer l's
    # own LOCAL scatter-add independent — the local SpMM can run while the
    # exchange is in flight; only the remote partial sum waits.
    for layer, idx in enumerate(a2a_idx):
        assert independent_scatters(idx) == 2 * layer + 1, (
            layer, independent_scatters(idx)
        )
