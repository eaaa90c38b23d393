"""Determinism + multi-host bootstrap helpers.

SURVEY.md §5: the framework's race-detection analog is JAX determinism plus
cross-host agreement asserts — same seed must give bit-identical training.
"""
import numpy as np
import jax

from gnn_ecommerce_tpu.data import events_to_edges, prepare_splits, split_edges, synthetic_events
from gnn_ecommerce_tpu.data.events import EVENT_TYPE_WEIGHTS_V1
from gnn_ecommerce_tpu.parallel.distributed import (
    assert_cross_host_agreement,
    init_distributed,
)
from gnn_ecommerce_tpu.train.driver import TrainConfig, train


def _run(tmp_path, tag):
    events = synthetic_events(n_users=150, n_items=40, n_events=2500, seed=2)
    edges = events_to_edges(events, EVENT_TYPE_WEIGHTS_V1)
    prepared = prepare_splits(*split_edges(edges, seed=0))
    cfg = TrainConfig(
        latent_dim=8,
        n_layers=2,
        epochs=2,
        batch_size=32,
        checkpoint_dir=str(tmp_path / tag),
    )
    return train(prepared, cfg, verbose=False)


def test_training_bit_deterministic(tmp_path):
    r1 = _run(tmp_path, "a")
    r2 = _run(tmp_path, "b")
    assert [h["loss"] for h in r1.history] == [h["loss"] for h in r2.history]
    assert r1.test_recall == r2.test_recall
    np.testing.assert_array_equal(
        np.asarray(r1.params["embedding"]), np.asarray(r2.params["embedding"])
    )


def test_init_distributed_single_host():
    info = init_distributed()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1
    # Agreement assert is a no-op on one host.
    assert_cross_host_agreement(1.234, "loss")
