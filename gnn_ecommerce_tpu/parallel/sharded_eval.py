"""Data-parallel evaluation: eval users sharded across devices.

The reference evaluates on one device with the full score matrix
(``src/lightgcn.py:169-182``). Single-device TPU eval here already streams
item tiles (``ops/topk_score.py``); this module adds the multi-chip axis:
eval users shard over the mesh's ``data`` axis under ``shard_map`` (item
embeddings replicated — 54.6K × dim is small), each device runs the blocked
top-K + MARK locally, and only per-user metric vectors return (no
collectives needed beyond the implicit output concat).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..eval.evaluate import EvalBatch
from ..eval.metrics import recall_precision_at_k
from ..ops.topk_score import topk_scores


def make_sharded_eval_fn(
    mesh: Mesh,
    n_users: int,
    k: int = 20,
    item_tile: int = 8192,
    mask_mode: str = "neginf",
):
    """Build a bucketed sharded-eval function for the training driver.

    Returns ``eval_buckets(final_emb, buckets) -> (precision, recall)`` with
    the same user-weighted means as ``eval.evaluate.evaluate_bucketed`` but
    with eval users sharded over EVERY mesh axis (a ``(data, model)`` GSPMD
    mesh and the edge partition's 1-axis ``model`` mesh both use all
    devices). Multi-process safe: per-bucket recall/precision reduce to
    replicated SCALAR sums on device (padded rows contribute exactly 0 —
    their truth rows are all -1), so no per-user vector ever needs to be
    addressable on one host. One jit per bucket SHAPE (buckets are pow2
    padded, so a handful of compiles serve every epoch).
    """
    axes = tuple(mesh.axis_names)
    S = int(mesh.size)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axes), P(axes, None), P(axes, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(emb, uids_l, truth_l, mask_l):
        item_emb = emb[n_users:]
        u_emb = emb[uids_l]
        _, idx = topk_scores(u_emb, item_emb, mask_l, k, item_tile, mask_mode)
        recall, precision = recall_precision_at_k(idx, truth_l, k)
        return (
            jax.lax.psum(jnp.sum(recall), axes),
            jax.lax.psum(jnp.sum(precision), axes),
        )

    run_jit = jax.jit(run)

    def eval_buckets(final_emb, buckets) -> tuple[float, float]:
        tot_r = tot_p = 0.0
        tot_n = 0
        for b in buckets:
            pad = (-b.user_ids.shape[0]) % S
            uids = jnp.pad(b.user_ids, (0, pad))
            truth = jnp.pad(b.truth, ((0, pad), (0, 0)), constant_values=-1)
            mask = jnp.pad(b.mask, ((0, pad), (0, 0)), constant_values=-1)
            r_sum, p_sum = run_jit(final_emb, uids, truth, mask)
            tot_r += float(r_sum)
            tot_p += float(p_sum)
            tot_n += b.num_users
        return tot_p / max(tot_n, 1), tot_r / max(tot_n, 1)

    return eval_buckets


def sharded_evaluate(
    final_emb: jax.Array,
    batch: EvalBatch,
    n_users: int,
    mesh: Mesh,
    k: int = 20,
    item_tile: int = 8192,
    mask_mode: str = "neginf",
    axis: str = "data",
):
    """Evaluate MARK with users sharded over ``axis``.

    Returns the same tuple as ``eval.evaluate.evaluate``. Users are padded to
    a multiple of the axis size with -1 truth rows (masked out of the means).
    """
    S = mesh.shape[axis]
    nu = batch.num_users
    pad = (-nu) % S
    uids = jnp.pad(batch.user_ids, (0, pad))
    truth = jnp.pad(batch.truth, ((0, pad), (0, 0)), constant_values=-1)
    mask = jnp.pad(batch.mask, ((0, pad), (0, 0)), constant_values=-1)

    # check_vma off: topk_scores' scan carry starts from replicated constants
    # which the varying-axes checker cannot unify with the varying outputs.
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis), P(axis)),
        check_vma=False,
    )
    def run(emb, uids_l, truth_l, mask_l):
        item_emb = emb[n_users:]
        u_emb = emb[uids_l]
        vals, idx = topk_scores(u_emb, item_emb, mask_l, k, item_tile, mask_mode)
        recall, precision = recall_precision_at_k(idx, truth_l, k)
        return idx, recall, precision

    idx, recall, precision = jax.jit(run)(final_emb, uids, truth, mask)
    idx, recall, precision = idx[:nu], recall[:nu], precision[:nu]
    return (
        float(jnp.mean(precision)),
        float(jnp.mean(recall)),
        np.asarray(recall),
        np.asarray(precision),
        np.asarray(idx),
    )
