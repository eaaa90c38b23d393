"""End-to-end training on a synthetic dataset: loss decreases, recall beats
random, checkpoints round-trip, resume continues (SURVEY.md §4 / BASELINE
config 2 analog, CPU-sized)."""
import dataclasses
import os

import pytest

import numpy as np

from gnn_ecommerce_tpu.data import synthetic_events, events_to_edges, split_edges, prepare_splits
from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1
from gnn_ecommerce_tpu.train import TrainConfig, train


def make_prepared(seed=3):
    events = synthetic_events(n_users=400, n_items=80, n_events=20000, seed=seed)
    edges = events_to_edges(events, EVENT_TYPE_WEIGHTS_V1)
    return prepare_splits(*split_edges(edges, seed=seed, test_size=0.2))


def test_training_improves(tmp_path):
    prep = make_prepared()
    cfg = TrainConfig(
        latent_dim=16,
        n_layers=2,
        epochs=6,
        batch_size=256,
        batches_per_epoch=20,
        checkpoint_dir=str(tmp_path),
        lr=0.05,
    )
    result = train(prep, cfg, verbose=False)
    losses = [h["bpr_loss"] for h in result.history]
    assert losses[-1] < losses[0] < 0.75  # starts near ln2, decreases
    # Better than random: random recall@20 ≈ 20/n_items = 0.25 is the bar for
    # 80 items; the model must do clearly better on val by the best epoch.
    assert result.best_val_recall > 0.3
    assert result.test_recall > 0.2
    # Artifacts exist.
    assert os.path.exists(tmp_path / "LightGCN_best" / "checkpoint.npz")
    assert os.path.exists(tmp_path / "train_log.jsonl")


def test_resume_continues(tmp_path):
    prep = make_prepared(seed=4)
    base = dict(
        latent_dim=8, n_layers=2, batch_size=128, batches_per_epoch=5,
        checkpoint_dir=str(tmp_path), lr=0.02,
    )
    r1 = train(prep, TrainConfig(epochs=2, **base), verbose=False)
    r2 = train(prep, TrainConfig(epochs=4, resume=True, **base), verbose=False)
    # Resume starts at epoch 2, not 0.
    assert [h["epoch"] for h in r2.history] == [2, 3]
    # A resumed run inherits the prior run's on-disk BEST as the bar: its
    # reported best can never be WORSE than what run 1 persisted.
    assert r2.best_val_recall >= r1.best_val_recall


def test_resume_continues_on_gspmd_mesh(tmp_path):
    """Mid-training resume through the GSPMD mesh branch: the restored
    (unsharded, unpadded) opt-state leaves must survive re-entry into the
    sharded step — the one resume path the multi-process tests don't
    cover (they resume the edge branch)."""
    prep = make_prepared(seed=9)
    base = dict(
        latent_dim=8, n_layers=2, batch_size=128, batches_per_epoch=4,
        checkpoint_dir=str(tmp_path), lr=0.02, mesh_devices=8,
        partition="gspmd",
    )
    r1 = train(prep, TrainConfig(epochs=2, **base), verbose=False)
    r2 = train(prep, TrainConfig(epochs=4, resume=True, **base), verbose=False)
    assert [h["epoch"] for h in r2.history] == [2, 3]
    assert r2.best_val_recall >= r1.best_val_recall
    # And the checkpoint restores on a DIFFERENT topology: single device.
    r3 = train(
        prep,
        TrainConfig(
            epochs=5, resume=True,
            **{**base, "mesh_devices": 1, "partition": "gspmd"},
        ),
        verbose=False,
    )
    assert [h["epoch"] for h in r3.history] == [4]


def test_throttled_best_checkpoint_persisted_mid_run(tmp_path, monkeypatch):
    """checkpoint_every > 1 must still persist BEST on the save cadence —
    a crash after epoch N loses at most checkpoint_every epochs of
    best-model progress, not the whole run's (round-3 review finding)."""
    import json

    from gnn_ecommerce_tpu.train import checkpoint as ckpt_mod
    from gnn_ecommerce_tpu.train import driver as driver_mod

    calls = []
    real_save = ckpt_mod.save_checkpoint

    def recording_save(*args, **kwargs):
        calls.append((kwargs.get("name"), kwargs.get("epoch")))
        return real_save(*args, **kwargs)

    monkeypatch.setattr(driver_mod, "save_checkpoint", recording_save)
    prep = make_prepared(seed=6)
    cfg = TrainConfig(
        latent_dim=8, n_layers=2, epochs=6, batch_size=128,
        batches_per_epoch=5, checkpoint_dir=str(tmp_path), lr=0.05,
        checkpoint_every=2, async_saves=True,  # exercise the async writer
    )
    result = train(prep, cfg, verbose=False)
    # BEST must hit disk BEFORE the final epoch's LAST save (the old code
    # deferred it to after the loop, so a crash lost the best model).
    best_saves = [i for i, (n, _) in enumerate(calls) if n == "LightGCN_best"]
    final_last = max(
        i for i, (n, e) in enumerate(calls)
        if n == "LightGCN_last" and e == cfg.epochs - 1
    )
    assert best_saves and best_saves[0] < final_last
    meta = json.loads((tmp_path / "LightGCN_best" / "meta.json").read_text())
    assert meta["epoch"] == result.best_epoch
    assert meta["recall"] == pytest.approx(result.best_val_recall)


def test_deterministic_same_seed(tmp_path):
    prep = make_prepared(seed=5)
    base = dict(latent_dim=8, n_layers=2, epochs=2, batch_size=128,
                batches_per_epoch=5, lr=0.02)
    r1 = train(prep, TrainConfig(checkpoint_dir=str(tmp_path / "a"), **base), verbose=False)
    r2 = train(prep, TrainConfig(checkpoint_dir=str(tmp_path / "b"), **base), verbose=False)
    np.testing.assert_allclose(
        np.asarray(r1.params["embedding"]), np.asarray(r2.params["embedding"])
    )
    assert r1.history[-1]["loss"] == r2.history[-1]["loss"]


def test_mesh_training_runs_and_learns(tmp_path):
    """Driver with mesh_devices=8 (GSPMD DP x TP) on the virtual CPU mesh."""
    prep = make_prepared(seed=6)
    cfg = TrainConfig(
        latent_dim=16, n_layers=2, epochs=3, batch_size=256,
        batches_per_epoch=10, checkpoint_dir=str(tmp_path), lr=0.05,
        mesh_devices=8,
    )
    result = train(prep, cfg, verbose=False)
    losses = [h["bpr_loss"] for h in result.history]
    assert losses[-1] < losses[0]
    assert result.best_val_recall > 0.2


def test_fast_bipartite_training_matches_layered(tmp_path):
    """fast_bipartite='f32' must give the SAME training trajectory as the
    layered path (the factorization is exact)."""
    prep = make_prepared(seed=7)
    base = dict(latent_dim=8, n_layers=2, epochs=2, batch_size=128,
                batches_per_epoch=5, lr=0.02)
    r1 = train(
        prep, TrainConfig(checkpoint_dir=str(tmp_path / "layered"), **base),
        verbose=False,
    )
    r2 = train(
        prep,
        TrainConfig(checkpoint_dir=str(tmp_path / "fast"), fast_bipartite="f32", **base),
        verbose=False,
    )
    np.testing.assert_allclose(
        [h["loss"] for h in r2.history], [h["loss"] for h in r1.history], rtol=1e-4
    )
    assert r2.test_recall == pytest.approx(r1.test_recall, abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(r2.params["embedding"]), np.asarray(r1.params["embedding"]),
        rtol=2e-3, atol=2e-5,
    )


def test_mesh_fast_bipartite_training(tmp_path):
    """Driver with mesh_devices=8 AND fast_bipartite='f32': the sharded
    batched fast step must run and match the single-device fast trajectory."""
    prep = make_prepared(seed=8)
    base = dict(latent_dim=8, n_layers=2, epochs=2, batch_size=128,
                batches_per_epoch=5, lr=0.02)
    r1 = train(
        prep,
        TrainConfig(checkpoint_dir=str(tmp_path / "one"), fast_bipartite="f32", **base),
        verbose=False,
    )
    r8 = train(
        prep,
        TrainConfig(
            checkpoint_dir=str(tmp_path / "mesh"), fast_bipartite="f32",
            mesh_devices=8, **base,
        ),
        verbose=False,
    )
    assert all(h["dropped_arcs"] == 0.0 for h in r8.history)
    np.testing.assert_allclose(
        [h["loss"] for h in r8.history], [h["loss"] for h in r1.history], rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r8.params["embedding"]), np.asarray(r1.params["embedding"]),
        rtol=2e-3, atol=2e-5,
    )


def test_edge_partition_train_to_checkpoint(tmp_path):
    """User-invocable edge-partitioned training (VERDICT r2 item 3): e2e
    train on the 8-virtual-device mesh -> unpadded checkpoint -> resume
    continues -> checkpoint loads on the single-device path (interop)."""
    import jax

    prep = make_prepared(seed=6)
    base = dict(
        latent_dim=8, n_layers=2, batch_size=128, batches_per_epoch=4,
        checkpoint_dir=str(tmp_path), lr=0.02, mesh_devices=8,
        partition="edge",
    )
    r1 = train(prep, TrainConfig(epochs=2, **base), verbose=False)
    assert np.isfinite(r1.history[-1]["loss"])

    # Checkpoints carry UNPADDED tables (strategy portability).
    import json

    import numpy as np_
    data = np_.load(tmp_path / "LightGCN_best" / "checkpoint.npz")
    n_nodes = prep.n_users + prep.n_items
    assert data["leaf_0"].shape[0] == n_nodes

    # Resume continues from epoch 2 under the same partitioning.
    r2 = train(prep, TrainConfig(epochs=4, resume=True, **base), verbose=False)
    assert [h["epoch"] for h in r2.history] == [2, 3]

    # Interop: the edge-partition checkpoint restores on the single-device
    # path and evaluates to the same recall as the mesh run reported.
    from gnn_ecommerce_tpu.eval import build_eval_batch, evaluate
    from gnn_ecommerce_tpu.graph import build_graph
    from gnn_ecommerce_tpu.models import LightGCNConfig, get_embedding, init_params
    from gnn_ecommerce_tpu.train.checkpoint import (
        BEST_NAME, load_checkpoint, restore_into,
    )
    import optax

    leaves, meta = load_checkpoint(str(tmp_path), BEST_NAME)
    cfg = LightGCNConfig(num_nodes=n_nodes, embedding_dim=8, num_layers=2)
    params = init_params(jax.random.key(0), cfg)
    optimizer = optax.adam(0.02)
    params, _ = restore_into(params, optimizer.init(params), leaves)
    graph = build_graph(
        prep.edge_user, prep.edge_item_node, prep.edge_weight,
        prep.n_users, prep.n_items, items_offset=True,
    )
    emb = get_embedding(params, graph, cfg)
    batch = build_eval_batch(prep.val)
    precision, recall, _, _, _ = evaluate(emb, batch, prep.n_users, 20)
    best = max(r1.history + r2.history, key=lambda h: h["val_recall"])
    assert recall == pytest.approx(best["val_recall"], rel=1e-3)


def test_edge_partition_resume_never_beats_best(tmp_path):
    """ADVICE r3 (medium): a resumed edge-partition run that never beats the
    inherited on-disk BEST restores UNPADDED checkpoint leaves for the final
    test eval — the driver must re-apply the run's row padding/sharding or
    the padded shard_map embed crashes on the shape mismatch."""
    prep = make_prepared(seed=8)
    n_nodes = prep.n_users + prep.n_items
    n_shards = 7  # a shard count that does NOT divide n_nodes
    assert n_nodes % n_shards != 0, "fixture must force real row padding"
    base = dict(
        latent_dim=8, n_layers=2, batch_size=128, batches_per_epoch=4,
        checkpoint_dir=str(tmp_path), mesh_devices=n_shards, partition="edge",
    )
    r1 = train(prep, TrainConfig(epochs=2, lr=0.02, **base), verbose=False)
    # lr=0: the resumed window cannot improve, forcing the restore branch.
    r2 = train(
        prep, TrainConfig(epochs=3, resume=True, lr=0.0, **base), verbose=False
    )
    assert r2.best_epoch == r1.best_epoch
    assert r2.test_recall == pytest.approx(r1.test_recall, rel=1e-5)


def test_checkpoint_hash_detects_torn_pair(tmp_path):
    """ADVICE r3: the npz/meta pair is written with two renames; meta records
    the npz sha256 so a torn pair (crash between the renames) fails loudly at
    load instead of resuming under stale metadata."""
    from gnn_ecommerce_tpu.train.checkpoint import BEST_NAME, load_checkpoint

    prep = make_prepared(seed=3)
    cfg = TrainConfig(
        latent_dim=8, n_layers=2, epochs=1, batch_size=128,
        batches_per_epoch=3, checkpoint_dir=str(tmp_path), lr=0.02,
    )
    train(prep, cfg, verbose=False)
    leaves, meta = load_checkpoint(str(tmp_path), BEST_NAME)  # intact: loads
    assert meta["npz_sha256"]
    npz = tmp_path / BEST_NAME / "checkpoint.npz"
    with open(npz, "r+b") as f:
        f.seek(100)
        f.write(b"XX")
    with pytest.raises(RuntimeError, match="sha256"):
        load_checkpoint(str(tmp_path), BEST_NAME)


def test_async_save_coalescing_slow_link(tmp_path, monkeypatch):
    """Write-behind coalescing: when one checkpoint write takes longer than
    an epoch (slow link), queued stale LAST saves are superseded by newer
    ones instead of stalling training — the FINAL epoch's LAST must still be
    on disk, and at least one stale save must have been coalesced away."""
    import time as _time

    from gnn_ecommerce_tpu.train import driver as driver_mod

    real_save = driver_mod.save_checkpoint
    written = []

    def slow_save(*args, **kwargs):
        _time.sleep(1.0)  # slower than an epoch of this tiny config
        written.append((kwargs.get("name"), kwargs.get("epoch")))
        return real_save(*args, **kwargs)

    monkeypatch.setattr(driver_mod, "save_checkpoint", slow_save)
    prep = make_prepared(seed=5)
    n_epochs = 8
    cfg = TrainConfig(
        latent_dim=8, n_layers=2, epochs=n_epochs, batch_size=128,
        batches_per_epoch=2, checkpoint_dir=str(tmp_path), lr=0.02,
        async_saves=True, checkpoint_every=1,
    )
    result = train(prep, cfg, verbose=False)
    # The newest LAST always lands on disk...
    import json

    with open(tmp_path / "LightGCN_last" / "meta.json") as f:
        assert json.load(f)["epoch"] == n_epochs - 1
    # ...but the slow link forced some stale intermediate LASTs to coalesce
    # away instead of serializing training behind 1 s/write x 8 epochs.
    last_epochs = [e for name, e in written if name == "LightGCN_last"]
    assert len(last_epochs) < n_epochs
    assert max(last_epochs) == n_epochs - 1
    assert result.best_epoch >= 0


def test_async_save_failure_surfaces(tmp_path, monkeypatch):
    """A failed background checkpoint write must abort training with a
    RuntimeError at the next save/flush, not pass silently."""
    from gnn_ecommerce_tpu.train import driver as driver_mod

    def failing_save(*args, **kwargs):
        raise OSError("disk full")

    monkeypatch.setattr(driver_mod, "save_checkpoint", failing_save)
    prep = make_prepared(seed=7)
    cfg = TrainConfig(
        latent_dim=8, n_layers=2, epochs=3, batch_size=128,
        batches_per_epoch=5, checkpoint_dir=str(tmp_path / "ck"), lr=0.02,
        async_saves=True,
    )
    with pytest.raises(RuntimeError, match="async checkpoint"):
        train(prep, cfg, verbose=False)


def test_profiler_trace_capture(tmp_path):
    """TrainConfig.profile_dir captures a jax.profiler trace of one epoch
    (SURVEY.md §5: the reference has no compute tracing at all)."""
    prep = make_prepared(seed=9)
    trace_dir = tmp_path / "trace"
    cfg = TrainConfig(
        latent_dim=8, n_layers=2, epochs=2, batch_size=128,
        batches_per_epoch=3, checkpoint_dir=str(tmp_path / "ck"), lr=0.02,
        profile_dir=str(trace_dir), profile_epoch=1,
    )
    train(prep, cfg, verbose=False)
    produced = list(trace_dir.rglob("*.xplane.pb")) + list(
        trace_dir.rglob("*.trace.json.gz")
    )
    assert produced, f"no trace files under {trace_dir}"


def test_async_save_banded_snapshot(tmp_path, monkeypatch):
    """Big leaves snapshot as row-band LISTS (the writer reads them back
    piece by piece so its bulk transfer cannot head-of-line-block the link);
    the reassembled checkpoint must be byte-identical to a sync save."""
    from gnn_ecommerce_tpu.train import driver as driver_mod

    # Shrink the band threshold so the tiny test table actually bands
    # (480 nodes x 8 dims f32 = 15 KB -> ~16 bands at 1 KB).
    monkeypatch.setattr(driver_mod, "SNAPSHOT_BAND_BYTES", 1024)
    prep = make_prepared(seed=3)
    base = dict(
        latent_dim=8, n_layers=2, epochs=1, batch_size=128,
        batches_per_epoch=3, lr=0.02,
    )
    r_async = train(
        prep,
        TrainConfig(checkpoint_dir=str(tmp_path / "a"), async_saves=True, **base),
        verbose=False,
    )
    r_sync = train(
        prep,
        TrainConfig(checkpoint_dir=str(tmp_path / "s"), async_saves=False, **base),
        verbose=False,
    )
    import numpy as np_

    a = np_.load(tmp_path / "a" / "LightGCN_best" / "checkpoint.npz")
    s = np_.load(tmp_path / "s" / "LightGCN_best" / "checkpoint.npz")
    assert set(a.files) == set(s.files)
    for k in a.files:
        np_.testing.assert_array_equal(a[k], s[k])
    assert r_async.best_val_recall == pytest.approx(r_sync.best_val_recall)


def test_async_save_duty_cycle(tmp_path, monkeypatch):
    """The duty-cycled writer (async_save_duty < 1) idles between writes but
    must NOT delay the end-of-run flush: a flush cuts the idle short, the
    newest LAST still lands on disk, and the writer's occupancy/bytes are
    logged for the run record."""
    import json as _json
    import time as _time

    from gnn_ecommerce_tpu.train import driver as driver_mod

    real_save = driver_mod.save_checkpoint
    written = []

    def slow_save(*args, **kwargs):
        _time.sleep(0.3)  # make each write's busy window measurable
        written.append((kwargs.get("name"), kwargs.get("epoch")))
        return real_save(*args, **kwargs)

    monkeypatch.setattr(driver_mod, "save_checkpoint", slow_save)
    prep = make_prepared(seed=7)
    n_epochs = 4
    cfg = TrainConfig(
        latent_dim=8, n_layers=2, epochs=n_epochs, batch_size=128,
        batches_per_epoch=2, checkpoint_dir=str(tmp_path), lr=0.02,
        async_saves=True, checkpoint_every=1,
        # Aggressive duty: each ~0.3 s write earns a ~5.7 s idle — far longer
        # than the remaining epochs, so without flush-cut-through the final
        # writes could never land before the driver returns.
        async_save_duty=0.05,
    )
    t0 = _time.perf_counter()
    train(prep, cfg, verbose=False)
    wall = _time.perf_counter() - t0
    with open(tmp_path / "LightGCN_last" / "meta.json") as f:
        assert _json.load(f)["epoch"] == n_epochs - 1
    last_epochs = [e for name, e in written if name == "LightGCN_last"]
    assert max(last_epochs) == n_epochs - 1
    # The flush record carries the writer's occupancy accounting.
    stats = None
    with open(tmp_path / "train_log.jsonl") as f:
        for line in f:
            rec = _json.loads(line)
            if "flush_s" in rec:
                stats = rec
    assert stats is not None
    assert stats["written"] >= 2  # BEST + LAST at minimum
    assert stats["writer_bytes"] > 0
    assert stats["writer_busy_s"] > 0
    # Epoch records carry save_s (snapshot+enqueue) IN THE JSONL — the log
    # is what survives a crash, so phase timings must land there, not only
    # in the in-memory history (round-5 session-2 review finding).
    with open(tmp_path / "train_log.jsonl") as f:
        epoch_recs = [r for r in map(_json.loads, f) if "epoch_s" in r]
    assert any("save_s" in r for r in epoch_recs)
    # 4 tiny epochs + a handful of 0.3 s writes; if the duty idles (~5.7 s
    # each) serialized into the run or the flush, the wall blows past this.
    assert wall < 30.0


def test_operator_build_transient_oom_retry(tmp_path, monkeypatch):
    """A one-time operator build that hits a transient chip-side
    RESOURCE_EXHAUSTED is retried once (the failure mode that cost a
    full-scale run attempt in round 5); a second failure propagates."""
    from gnn_ecommerce_tpu.ops import bipartite as bip_mod
    from gnn_ecommerce_tpu.train import driver as driver_mod

    monkeypatch.setattr(driver_mod.time, "sleep", lambda s: None)
    real_build = bip_mod.build_fast_bipartite
    calls = []

    def flaky_build(*args, **kwargs):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory (transient)")
        return real_build(*args, **kwargs)

    monkeypatch.setattr(bip_mod, "build_fast_bipartite", flaky_build)
    prep = make_prepared(seed=11)
    cfg = TrainConfig(
        latent_dim=8, n_layers=2, epochs=1, batch_size=128,
        batches_per_epoch=2, checkpoint_dir=str(tmp_path), lr=0.02,
        fast_bipartite="f32",
    )
    result = train(prep, cfg, verbose=False)
    assert len(calls) == 2  # failed once, retried, succeeded
    assert result.best_epoch == 0

    # A PERSISTENT failure must still propagate (no infinite retry).
    calls.clear()

    def always_oom(*args, **kwargs):
        calls.append(1)
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    monkeypatch.setattr(bip_mod, "build_fast_bipartite", always_oom)
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        train(prep, dataclasses.replace(cfg, checkpoint_dir=str(tmp_path / "b")),
              verbose=False)
    assert len(calls) == 2  # exactly one retry
