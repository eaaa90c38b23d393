"""Sharded (DP × TP) training step under GSPMD.

Layout (round-1 design — annotate shardings, let GSPMD insert the
collectives over ICI; SURVEY.md §2.3):

- embedding table + Adam moments: row-sharded over the ``model`` axis
  (``P('model', None)``) — the memory-dominant state;
- graph arc arrays (src/dst/w_norm): sharded over the ``data`` axis. Arcs are
  sorted by destination, so each data shard owns a contiguous destination
  range and its partial segment-sums reduce with one reduce-scatter/psum
  inserted by GSPMD;
- BPR batch triplets: sharded over ``data`` (classic DP).

The planned round-2 explicit path (edge partitioning + ``shard_map``
all-to-all of boundary embeddings overlapped with local aggregation) slots in
behind the same call signature.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.build import BipartiteGraph
from ..models.lightgcn import LightGCNConfig, get_embedding
from ..models.losses import bpr_loss, reg_loss
from ..ops.propagate import propagate_segment
from ..sampling.bpr import BprSamplerData, sample_batch


def shard_params(params: dict, mesh: Mesh) -> dict:
    s = NamedSharding(mesh, P("model", None))
    return {"embedding": jax.device_put(params["embedding"], s)}


def shard_graph(graph: BipartiteGraph, mesh: Mesh) -> BipartiteGraph:
    """Place arc arrays sharded over the data axis; small per-node arrays
    replicated."""
    arc = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    return BipartiteGraph(
        src=jax.device_put(graph.src, arc),
        dst=jax.device_put(graph.dst, arc),
        w_norm=jax.device_put(graph.w_norm, arc),
        w_raw=jax.device_put(graph.w_raw, arc),
        indptr=jax.device_put(graph.indptr, rep),
        deg=jax.device_put(graph.deg, rep),
        n_users=graph.n_users,
        n_items=graph.n_items,
    )


def make_sharded_train_step(
    cfg: LightGCNConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    batch_size: int,
    decay: float,
    propagate_fn: Callable = propagate_segment,
):
    """Build a pjit train step with explicit input/output shardings.

    Signature: step(params, opt_state, graph, sampler_data, key)
        -> (params, opt_state, metrics)
    """
    emb_s = NamedSharding(mesh, P("model", None))
    batch_s = NamedSharding(mesh, P("data"))

    def loss_fn(params, graph, users, pos, neg):
        out = get_embedding(params, graph, cfg, propagate_fn)
        u, p, n = out[users], out[pos], out[neg]
        pos_scores = jnp.sum(u * p, axis=-1)
        neg_scores = jnp.sum(u * n, axis=-1)
        bpr = bpr_loss(pos_scores, neg_scores)
        reg = reg_loss(params["embedding"], users, pos, neg, decay)
        return bpr + reg, (bpr, reg)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, graph: BipartiteGraph, sdata: BprSamplerData, key):
        users, pos, neg = sample_batch(key, sdata, batch_size)
        users = jax.lax.with_sharding_constraint(users, batch_s)
        pos = jax.lax.with_sharding_constraint(pos, batch_s)
        neg = jax.lax.with_sharding_constraint(neg, batch_s)
        (loss, (bpr, reg)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, graph, users, pos, neg
        )
        grads = jax.tree.map(
            lambda g, p_: jax.lax.with_sharding_constraint(g, p_.sharding)
            if hasattr(p_, "sharding")
            else g,
            grads,
            params,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, emb_s), params
        )
        return params, opt_state, {"loss": loss, "bpr_loss": bpr, "reg_loss": reg}

    return step
