"""SVD matrix-factorization baseline (reference ``notebooks/2.eComBaseline-
SVD.ipynb``).

The reference fits scikit-surprise's ``SVD`` — biased matrix factorization
``r̂_ui = μ + b_u + b_i + p_u·q_i`` trained by SGD on explicit "ratings"
(the edge weights), then reports threshold-based Precision/Recall@10
(cells 7-12; P 0.1543 / R 0.1270). Here the same model is a jitted
full-batch optax loop over the observed edge list (static shapes, MXU-sized
batches) — no scikit-surprise.

Metric parity (surprise ``precision_recall_at_k`` semantics): for each user,
only that user's TEST edges are ranked by estimate; relevant = true weight ≥
``rel_threshold``; recommended = estimate ≥ ``est_threshold`` among the
top-K by estimate; precision/recall over those sets, averaged over users.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class SVDConfig:
    n_factors: int = 100        # surprise default
    n_epochs: int = 20          # surprise default
    lr: float = 0.02            # Adam step size (see fit_svd docstring)
    reg: float = 0.02           # surprise default reg_all
    init_std: float = 0.1       # surprise default init_std_dev
    batch_size: int = 8192
    seed: int = 0


def init_svd(key, n_users: int, n_items: int, cfg: SVDConfig) -> dict:
    kp, kq = jax.random.split(key)
    return {
        "mu": jnp.zeros(()),
        "b_u": jnp.zeros(n_users),
        "b_i": jnp.zeros(n_items),
        "p": cfg.init_std * jax.random.normal(kp, (n_users, cfg.n_factors)),
        "q": cfg.init_std * jax.random.normal(kq, (n_items, cfg.n_factors)),
    }


def predict(params: dict, users, items):
    return (
        params["mu"]
        + params["b_u"][users]
        + params["b_i"][items]
        + jnp.sum(params["p"][users] * params["q"][items], axis=-1)
    )


def fit_svd(
    users: np.ndarray,
    items: np.ndarray,
    ratings: np.ndarray,
    n_users: int,
    n_items: int,
    cfg: SVDConfig = SVDConfig(),
) -> dict:
    """Fit biased MF by minibatched MSE + L2 (the same objective surprise's
    SGD minimizes), shuffled per epoch, mean global bias initialized to μ.

    Documented deviation: surprise runs per-SAMPLE SGD sweeps; a TPU-shaped
    minibatch mean gradient makes plain SGD orders of magnitude slower per
    epoch, so the optimizer is Adam — same objective, different (better)
    optimizer, evaluated with the same surprise-parity metric.

    The edge arrays upload ONCE; the per-epoch shuffle is a device-side
    ``jax.random.permutation`` + gather inside the jitted epoch (at cosmetics
    scale a host-side reshuffle would re-upload ~154 MB × epochs through the
    slow device link — CLAUDE.md: upload nothing big through the tunnel).
    """
    key = jax.random.key(cfg.seed)
    params = init_svd(key, n_users, n_items, cfg)
    params["mu"] = jnp.asarray(float(np.mean(ratings)))
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)

    n = len(users)
    bsz = min(cfg.batch_size, n)
    n_batches = -(-n // bsz)
    pad = n_batches * bsz - n

    def loss_fn(params, u, i, r, valid):
        err = (predict(params, u, i) - r) ** 2
        mse = jnp.sum(err * valid) / jnp.maximum(valid.sum(), 1)
        reg = cfg.reg * (
            jnp.mean(params["b_u"][u] ** 2)
            + jnp.mean(params["b_i"][i] ** 2)
            + jnp.mean(jnp.sum(params["p"][u] ** 2, -1))
            + jnp.mean(jnp.sum(params["q"][i] ** 2, -1))
        )
        return mse + reg

    # Passed as ARGS, not closed over: captured arrays would be baked into
    # the executable as constants.
    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch(params, opt_state, ekey, u0, i0, r0, v0):
        perm = jax.random.permutation(ekey, n + pad)
        u, i, r, valid = u0[perm], i0[perm], r0[perm], v0[perm]

        def body(carry, batch):
            params, opt_state = carry
            bu, bi, br, bv = batch
            grads = jax.grad(loss_fn)(params, bu, bi, br, bv)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), None

        batches = jax.tree.map(
            lambda x: x.reshape(n_batches, bsz, *x.shape[1:]), (u, i, r, valid)
        )
        (params, opt_state), _ = jax.lax.scan(body, (params, opt_state), batches)
        return params, opt_state

    u0 = jnp.asarray(np.pad(users, (0, pad)).astype(np.int32))
    i0 = jnp.asarray(np.pad(items, (0, pad)).astype(np.int32))
    r0 = jnp.asarray(np.pad(ratings, (0, pad)).astype(np.float32))
    v0 = jnp.asarray(np.pad(np.ones(n, np.float32), (0, pad)))
    for e in range(cfg.n_epochs):
        params, opt_state = epoch(
            params, opt_state, jax.random.fold_in(key, e), u0, i0, r0, v0
        )
    return params


def precision_recall_at_k(
    params: dict,
    test_users: np.ndarray,
    test_items: np.ndarray,
    test_ratings: np.ndarray,
    k: int = 10,
    rel_threshold: float = 1.0,
    est_threshold: float = 0.5,
) -> tuple[float, float]:
    """surprise ``precision_recall_at_k`` semantics over the test edge list
    (reference SVD notebook cell 9): per user, rank ONLY their test items."""
    est = np.asarray(
        predict(params, jnp.asarray(test_users), jnp.asarray(test_items))
    )
    order = np.lexsort((-est, test_users))
    u_s, est_s, rel_s = test_users[order], est[order], test_ratings[order]
    uniq, start = np.unique(u_s, return_index=True)
    precisions, recalls = [], []
    for s, e in zip(start, np.append(start[1:], len(u_s))):
        rel = rel_s[s:e] >= rel_threshold
        rec = est_s[s:e] >= est_threshold
        rec[k:] = False  # top-k by estimate (slice is est-descending)
        n_rel = int(rel.sum())
        n_rec = int(rec.sum())
        n_both = int((rel & rec).sum())
        precisions.append(n_both / n_rec if n_rec else 0.0)
        recalls.append(n_both / n_rel if n_rel else 0.0)
    return float(np.mean(precisions)), float(np.mean(recalls))
