"""BPR sampler: validity, exclusion, and distribution tests (SURVEY.md §4)."""
import numpy as np
import jax
import pytest

from gnn_ecommerce_tpu.data.prepare import SamplerArrays
from gnn_ecommerce_tpu.sampling import make_sampler_data, sample_batch


def toy_sampler_data():
    # 3 users; node space: users {0,1,2}, items {3,4,5,6,7} (n_items=5).
    # pos: u0 -> {3}, u1 -> {4,5}, u2 -> {6}
    # ignore: u0 -> {3,4}, u1 -> {4,5}, u2 -> {3,4,5,6}  (only 7 allowed for u2)
    arrays = SamplerArrays(
        users=np.array([0, 1, 2]),
        pos_indptr=np.array([0, 1, 3, 4]),
        pos_flat=np.array([3, 4, 5, 6]),
        ign_indptr=np.array([0, 2, 4, 8]),
        ign_flat=np.array([3, 4, 4, 5, 3, 4, 5, 6]),
    )
    return make_sampler_data(arrays, n_users=3, n_items=5)


def test_sample_validity():
    sd = toy_sampler_data()
    pos_sets = {0: {3}, 1: {4, 5}, 2: {6}}
    ign_sets = {0: {3, 4}, 1: {4, 5}, 2: {3, 4, 5, 6}}
    users, pos, neg = sample_batch(jax.random.key(0), sd, 512)
    users, pos, neg = np.asarray(users), np.asarray(pos), np.asarray(neg)
    assert set(users.tolist()) <= {0, 1, 2}
    for u, p, n in zip(users, pos, neg):
        assert p in pos_sets[u]
        assert n not in ign_sets[u]
        assert 3 <= n <= 7


def test_negative_distribution_uniform_over_allowed():
    sd = toy_sampler_data()
    counts = {}
    for s in range(40):
        users, pos, neg = sample_batch(jax.random.key(s), sd, 256)
        for u, n in zip(np.asarray(users), np.asarray(neg)):
            counts.setdefault(u, {}).setdefault(int(n), 0)
            counts[u][int(n)] += 1
    # u2 can only ever receive item 7.
    assert set(counts[2]) == {7}
    # u0 allowed {5,6,7}: roughly uniform (chi-square-ish tolerance).
    c0 = counts[0]
    total = sum(c0.values())
    for item in (5, 6, 7):
        assert abs(c0[item] / total - 1 / 3) < 0.06


def test_positive_distribution_uniform():
    sd = toy_sampler_data()
    c = {4: 0, 5: 0}
    for s in range(40):
        users, pos, _ = sample_batch(jax.random.key(100 + s), sd, 256)
        for u, p in zip(np.asarray(users), np.asarray(pos)):
            if u == 1:
                c[int(p)] += 1
    total = sum(c.values())
    assert abs(c[4] / total - 0.5) < 0.05


def test_without_replacement_mode():
    sd = toy_sampler_data()
    users, _, _ = sample_batch(jax.random.key(1), sd, 3, replace=False)
    assert sorted(np.asarray(users).tolist()) == [0, 1, 2]


def test_user_marginal_uniform():
    sd = toy_sampler_data()
    counts = np.zeros(3)
    for s in range(30):
        users, _, _ = sample_batch(jax.random.key(200 + s), sd, 256)
        np.add.at(counts, np.asarray(users), 1)
    frac = counts / counts.sum()
    assert np.abs(frac - 1 / 3).max() < 0.05
