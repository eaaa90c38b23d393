"""jit/scan training step: sample → propagate → BPR + reg → Adam update.

One step reproduces the net math of the reference mini-batch loop
(``src/train_lightgcn.py:129-147``): BPR loss ``-mean(logsigmoid(pos-neg))``
(the reference's ``recommendation_loss(.., 0) * B`` wiring), plus ego-embedding
L2 (``src/utils_v2.py:193-211``), optimized with Adam (``:58``).

TPU-first differences from the reference loop:
- sampling runs on device inside the same jit program (no host→device
  uploads per step — the reference crosses the boundary three times a step,
  SURVEY.md §3.1);
- ``run_steps`` wraps a whole epoch's batches in one ``lax.scan``, so an
  epoch is a single XLA program invocation;
- buffers are donated, so params/optimizer state update in place in HBM.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..graph.build import BipartiteGraph
from ..models.lightgcn import LightGCNConfig, get_embedding
from ..models.losses import bpr_loss, reg_loss
from ..ops.propagate import propagate_segment
from ..sampling.bpr import BprSamplerData, sample_batch


def make_train_fns(
    cfg: LightGCNConfig,
    optimizer: optax.GradientTransformation,
    batch_size: int,
    decay: float,
    propagate_fn: Callable = propagate_segment,
    sample_replace: bool = True,
    embed_fn: Callable | None = None,
    batch_embed_fn: Callable | None = None,
):
    """Build (train_step, run_steps) jitted functions.

    train_step(params, opt_state, graph, sampler_data, key)
        -> (params, opt_state, metrics)
    run_steps(params, opt_state, graph, sampler_data, key, num_steps)
        -> (params, opt_state, mean-metrics)   # one lax.scan epoch

    ``embed_fn(params, graph) -> final_embedding`` overrides the layered
    propagation (e.g. with ``ops.bipartite.fast_get_embedding`` where
    ``graph`` is then a ``FastBipartite``).

    ``batch_embed_fn(params, graph, users, pos, neg) -> (u, p, n, dropped)``
    overrides both: it produces the batch triplet's FINAL embeddings directly
    (e.g. ``ops.bipartite.fast_batch_embeddings``), skipping the full-table
    to_users SpMM that a whole-graph forward pays per step. ``dropped`` (arcs
    beyond the path's static edge capacity) is surfaced as a train metric.
    """
    if embed_fn is None:
        embed_fn = lambda params, graph: get_embedding(params, graph, cfg, propagate_fn)

    def loss_fn(params, graph, users, pos, neg):
        if batch_embed_fn is not None:
            u, p, n, dropped = batch_embed_fn(params, graph, users, pos, neg)
        else:
            out = embed_fn(params, graph)
            u, p, n = out[users], out[pos], out[neg]
            dropped = jnp.int32(0)
        pos_scores = jnp.sum(u * p, axis=-1)
        neg_scores = jnp.sum(u * n, axis=-1)
        bpr = bpr_loss(pos_scores, neg_scores)
        reg = reg_loss(params["embedding"], users, pos, neg, decay)
        return bpr + reg, (bpr, reg, dropped)

    def _step(params, opt_state, graph, sdata: BprSamplerData, key):
        users, pos, neg = sample_batch(key, sdata, batch_size, replace=sample_replace)
        (loss, (bpr, reg, dropped)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, graph, users, pos, neg
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "bpr_loss": bpr,
            "reg_loss": reg,
            "dropped_arcs": jnp.asarray(dropped, jnp.float32),
        }
        return params, opt_state, metrics

    train_step = jax.jit(_step, donate_argnums=(0, 1))

    @partial(jax.jit, static_argnames=("num_steps",), donate_argnums=(0, 1))
    def run_steps(params, opt_state, graph, sdata, key, num_steps: int):
        def body(carry, step_idx):
            params, opt_state = carry
            params, opt_state, metrics = _step(
                params, opt_state, graph, sdata, jax.random.fold_in(key, step_idx)
            )
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(num_steps)
        )
        return params, opt_state, jax.tree.map(jnp.mean, metrics)

    return train_step, run_steps
