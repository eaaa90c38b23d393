"""Fast edge-partitioned path (B_ii + per-shard fast plans + sharded heavy
head under explicit shard_map, parallel/edge_partition_fast.py) vs the
single-device oracle and reference train step."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from gnn_ecommerce_tpu.graph import build_graph
from gnn_ecommerce_tpu.models import LightGCNConfig, get_embedding, init_params
from gnn_ecommerce_tpu.ops.bipartite import build_item_operator, split_graph
from gnn_ecommerce_tpu.parallel import make_mesh
from gnn_ecommerce_tpu.parallel.edge_partition_fast import (
    build_fast_edge_partition,
    make_fast_edge_fns,
    merge_ep_view,
    split_ep_tree,
)

from test_graph_and_model import random_bipartite


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(17)
    n_users, n_items = 301, 83  # not divisible by 8: real row padding
    u, i, w = random_bipartite(rng, n_users, n_items, 2600)
    g = build_graph(u, i, w, n_users, n_items)
    cfg = LightGCNConfig(num_nodes=g.num_nodes, embedding_dim=16, num_layers=3)
    params = init_params(jax.random.key(0), cfg)
    mesh = make_mesh(8, axis_sizes=(8,), axis_names=("model",))
    split = split_graph(g)
    item_op = build_item_operator(split, dtype=jnp.float32)
    with mesh:
        fep = build_fast_edge_partition(split, mesh, item_op, heavy_users=16)
    return g, cfg, params, mesh, fep


def test_partition_invariants(setup):
    g, cfg, params, mesh, fep = setup
    assert fep.n_shards == 8
    assert fep.rows_per_shard % 512 == 0  # tiles cover each shard's rows
    # Every tail arc appears exactly once per direction across shards, and
    # the heavy head holds the rest: total weight is conserved per direction.
    half = float(np.asarray(g.w_norm).sum()) / 2  # arcs are mirrored
    tail_i = float(np.asarray(fep.items_stack.gw).sum())
    tail_u = float(np.asarray(fep.users_stack.gw).sum())
    head = float(np.asarray(fep.w_hi, dtype=np.float64).sum()) if fep.w_hi is not None else 0.0
    np.testing.assert_allclose(tail_i + head, half, rtol=1e-5)
    np.testing.assert_allclose(tail_u + head, half, rtol=1e-5)


def test_embed_matches_oracle(setup):
    g, cfg, params, mesh, fep = setup
    oracle = np.asarray(get_embedding(params, g, cfg))
    with mesh:
        sp = split_ep_tree(params, fep, mesh)
        embed, _ = make_fast_edge_fns(
            cfg, optax.adam(1e-2), mesh, fep, batch_size=32,
            decay=1e-4, edge_cap=2048,
        )
        out = np.asarray(jax.jit(embed)(sp, fep))
    np.testing.assert_allclose(out, oracle, rtol=2e-5, atol=2e-6)


def test_params_view_round_trip(setup):
    g, cfg, params, mesh, fep = setup
    with mesh:
        sp = split_ep_tree(params, fep, mesh)
        back = merge_ep_view(sp, fep)
    np.testing.assert_allclose(
        np.asarray(back["embedding"]), np.asarray(params["embedding"]), rtol=1e-6
    )
    # Optimizer states (nested {"embedding"} dicts + scalar count) round-trip.
    opt = optax.adam(1e-2).init(params)
    with mesh:
        opt_sp = split_ep_tree(opt, fep, mesh)
        opt_back = merge_ep_view(opt_sp, fep)
    for a, b in zip(jax.tree.leaves(opt), jax.tree.leaves(opt_back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_train_step_matches_single_device(setup):
    """One fast-edge-partition train step == one single-device train step
    (same sampler key -> same batch -> same losses and updated table)."""
    from gnn_ecommerce_tpu.data.prepare import SamplerArrays
    from gnn_ecommerce_tpu.sampling import make_sampler_data
    from gnn_ecommerce_tpu.train import make_train_fns

    g, cfg, params, mesh, fep = setup
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

    params_copy = {"embedding": jnp.array(params["embedding"])}
    ref_step, _ = make_train_fns(cfg, optimizer, batch_size=64, decay=1e-4)
    ref_params, _, ref_m = ref_step(
        params_copy, optimizer.init(params_copy), g, sdata, key
    )

    with mesh:
        sp = split_ep_tree(params, fep, mesh)
        _, train_step = make_fast_edge_fns(
            cfg, optimizer, mesh, fep, batch_size=64, decay=1e-4,
            edge_cap=4096,
        )
        new_params, _, met = train_step(sp, optimizer.init(sp), fep, sdata, key)
        got = np.asarray(merge_ep_view(new_params, fep)["embedding"])

    assert float(met["dropped_arcs"]) == 0.0
    np.testing.assert_allclose(
        float(met["bpr_loss"]), float(ref_m["bpr_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(met["reg_loss"]), float(ref_m["reg_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        got, np.asarray(ref_params["embedding"]), rtol=5e-4, atol=5e-5
    )


def test_driver_edge_fast_matches_slow_explicit(tmp_path):
    """e2e through the driver: --partition edge --fast f32 must reproduce the
    slow explicit edge path's numbers exactly (same sampler keys, exact
    restructure), and its checkpoint must load on the single-device path."""
    from test_train_e2e import make_prepared
    from gnn_ecommerce_tpu.train import TrainConfig, train
    from gnn_ecommerce_tpu.train.checkpoint import BEST_NAME, load_checkpoint

    prep = make_prepared(seed=13)
    base = dict(
        latent_dim=8, n_layers=2, epochs=2, batch_size=128,
        batches_per_epoch=4, lr=0.02, mesh_devices=8, partition="edge",
    )
    r_fast = train(
        prep,
        TrainConfig(
            checkpoint_dir=str(tmp_path / "fast"), fast_bipartite="f32",
            heavy_users=16, **base,
        ),
        verbose=False,
    )
    r_slow = train(
        prep, TrainConfig(checkpoint_dir=str(tmp_path / "slow"), **base),
        verbose=False,
    )
    assert r_fast.best_val_recall == pytest.approx(
        r_slow.best_val_recall, abs=1e-6
    )
    assert r_fast.test_recall == pytest.approx(r_slow.test_recall, abs=1e-6)

    # Strategy portability: unified unpadded checkpoint leaves.
    leaves, meta = load_checkpoint(str(tmp_path / "fast"), BEST_NAME)
    n_nodes = prep.n_users + prep.n_items
    assert leaves[0].shape[0] == n_nodes
    assert all("emb_users" not in p for p in meta["leaf_paths"])


def test_driver_edge_fast_resume_never_beats_best(tmp_path):
    """Code-review r4 finding: the final best-restore must use CHECKPOINT-
    layout templates — under the fast edge partition the run's params are
    the split {emb_users, emb_items} tree while checkpoints hold the unified
    {embedding} layout, so restoring into run-layout templates crashed on
    the leaf-count assert."""
    from test_train_e2e import make_prepared
    from gnn_ecommerce_tpu.train import TrainConfig, train

    prep = make_prepared(seed=21)
    base = dict(
        latent_dim=8, n_layers=2, batch_size=128, batches_per_epoch=3,
        checkpoint_dir=str(tmp_path), mesh_devices=8, partition="edge",
        fast_bipartite="f32", heavy_users=16,
    )
    r1 = train(prep, TrainConfig(epochs=2, lr=0.02, **base), verbose=False)
    r2 = train(
        prep, TrainConfig(epochs=3, resume=True, lr=0.0, **base), verbose=False
    )
    assert r2.best_epoch == r1.best_epoch
    assert r2.test_recall == pytest.approx(r1.test_recall, rel=1e-5)


def test_driver_edge_fast_bf16_mode(tmp_path):
    """The benchmarked bf16 mode (B_ii + messages + heavy head stored bf16)
    through the driver's edge+fast branch: runs, learns, and lands within
    bf16 rounding of the exact f32 path."""
    from test_train_e2e import make_prepared
    from gnn_ecommerce_tpu.train import TrainConfig, train

    prep = make_prepared(seed=23)
    base = dict(
        latent_dim=8, n_layers=2, epochs=2, batch_size=128,
        batches_per_epoch=4, lr=0.02, mesh_devices=8, partition="edge",
        heavy_users=16,
    )
    r16 = train(
        prep,
        TrainConfig(
            checkpoint_dir=str(tmp_path / "bf16"), fast_bipartite="bf16",
            **base,
        ),
        verbose=False,
    )
    r32 = train(
        prep,
        TrainConfig(
            checkpoint_dir=str(tmp_path / "f32"), fast_bipartite="f32", **base
        ),
        verbose=False,
    )
    assert np.isfinite(r16.history[-1]["loss"])
    # Same trajectory up to bf16 rounding (one rounding per message/term).
    assert r16.best_val_recall == pytest.approx(r32.best_val_recall, abs=0.05)
    assert abs(r16.history[-1]["loss"] - r32.history[-1]["loss"]) < 0.02
