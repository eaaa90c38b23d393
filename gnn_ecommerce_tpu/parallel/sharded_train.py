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

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.build import BipartiteGraph
from ..models.lightgcn import LightGCNConfig, get_embedding
from ..models.losses import bpr_loss, reg_loss
from ..ops.bipartite import BipartiteSplit, FastBipartite, fast_batch_embeddings
from ..ops.propagate import propagate_segment
from ..sampling.bpr import BprSamplerData, sample_batch


def shard_params(params: dict, mesh: Mesh) -> dict:
    s = NamedSharding(mesh, P("model", None))
    return {"embedding": jax.device_put(params["embedding"], s)}


def shard_graph(graph: BipartiteGraph, mesh: Mesh) -> BipartiteGraph:
    """Place arc arrays sharded over the data axis; small per-node arrays
    replicated.

    Arc arrays are padded to a multiple of the data-axis size (a [E] array
    only shards over N devices when N | E) with no-op tail arcs: w = 0 and
    destination ids OUT OF RANGE (num_nodes), so the sorted-destination
    promise holds and segment_sum drops them. An 8-device (data 2 x model 4)
    mesh masked this — arc counts are usually even — but data 4 on a
    16-device mesh hit it immediately."""
    arc = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    pad = (-int(graph.src.shape[0])) % mesh.shape["data"]

    def padded(x, fill):
        if pad == 0:
            return jax.device_put(x, arc)
        return jax.device_put(
            jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]), arc
        )

    return BipartiteGraph(
        src=padded(graph.src, 0),
        dst=padded(graph.dst, graph.num_nodes),
        w_norm=padded(graph.w_norm, 0),
        w_raw=padded(graph.w_raw, 0),
        indptr=jax.device_put(graph.indptr, rep),
        deg=jax.device_put(graph.deg, rep),
        n_users=graph.n_users,
        n_items=graph.n_items,
    )


def shard_fast_bipartite(
    fb: FastBipartite,
    mesh: Mesh,
    fast_ops: bool = False,
    msgs_dtype: str = "float32",
    heavy_users: int = 0,
    heavy_dtype: str = "float32",
) -> FastBipartite:
    """Place the fast-bipartite structures on the mesh.

    - ``item_op`` (B_ii, the memory-dominant 6 GB-at-scale operator): ROW-
      sharded over ``model`` — the dense chain matmuls shard their output
      rows with zero communication (each chip multiplies its row band
      against the replicated [I, D] activations);
    - arc arrays: sharded over ``data`` (contiguous destination ranges, as
      in :func:`shard_graph`), partial segment-sums reduced by GSPMD;
    - per-user CSR offsets: replicated (4 bytes/user);
    - ``fast_ops``: attach the measured-optimal SpMM plans, partitioned over
      the whole mesh (``ops/spmm_sharded.build_sharded_fast_ops`` — per-
      device Pallas segment-reduce slabs under shard_map + GSPMD dense
      heavy-user head). This is what keeps the mesh step on the ~220 ms-
      class fast path instead of regressing to the segment path (round-2
      VERDICT item 3).
    """
    arc = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("model", None))
    s = fb.split
    n_data = mesh.shape["data"]
    e = int(s.iu_w.shape[0])
    pad = (-e) % n_data

    def padded(x, fill):
        # No-op tail arcs: w = 0 and destinations OUT OF RANGE, so the sorted-
        # destination promise holds and segment_sum drops them; sources are 0
        # (their gathered rows are zeroed by w). iu_indptr still covers only
        # the real arcs, so the batched CSR path never touches the tail.
        if pad == 0:
            return jax.device_put(x, arc)
        return jax.device_put(
            jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]), arc
        )

    split = BipartiteSplit(
        iu_src_item=padded(s.iu_src_item, 0),
        iu_dst_user=padded(s.iu_dst_user, s.n_users),
        iu_w=padded(s.iu_w, 0),
        iu_indptr=jax.device_put(s.iu_indptr, rep),
        ui_src_user=padded(s.ui_src_user, 0),
        ui_dst_item=padded(s.ui_dst_item, s.n_items),
        ui_w=padded(s.ui_w, 0),
        n_users=s.n_users,
        n_items=s.n_items,
    )
    item_op = fb.item_op
    n_model = mesh.shape["model"]
    rpad = (-int(item_op.shape[0])) % n_model
    if rpad:
        item_op = jnp.concatenate(
            [item_op, jnp.zeros((rpad, item_op.shape[1]), item_op.dtype)]
        )
    fops = None
    if fast_ops:
        from ..ops.spmm_sharded import build_sharded_fast_ops

        fops = build_sharded_fast_ops(
            fb.split,  # unpadded arc arrays — the plan builder repartitions
            mesh,
            msgs_dtype=msgs_dtype,
            heavy_users=heavy_users,
            heavy_dtype=heavy_dtype,
        )
        # Plan slabs + heavy head placed per their shard_map/GSPMD specs.
        dev_axis = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        fops = dataclasses.replace(
            fops,
            items_stack=jax.tree.map(
                lambda x: jax.device_put(x, dev_axis), fops.items_stack
            ),
            users_stack=jax.tree.map(
                lambda x: jax.device_put(x, dev_axis), fops.users_stack
            ),
            hi_ids=None
            if fops.hi_ids is None
            else jax.device_put(fops.hi_ids, rep),
            w_hi=None
            if fops.w_hi is None
            else jax.device_put(fops.w_hi, row),
        )
    return FastBipartite(
        split=split, item_op=jax.device_put(item_op, row), fops=fops
    )


def make_sharded_fast_train_step(
    cfg: LightGCNConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    batch_size: int,
    decay: float,
    edge_cap: int,
):
    """pjit train step over the bipartite-factorized fast path.

    Same signature contract as :func:`make_sharded_train_step` but ``graph``
    is a :func:`shard_fast_bipartite`-placed ``FastBipartite``; the forward
    is the batched training path (``ops.bipartite.fast_batch_embeddings``) —
    to_items sharded over data-axis arcs, the B_ii chain sharded over
    model-axis rows, batch aggregation on replicated [B]-sized structures.
    """
    emb_s = NamedSharding(mesh, P("model", None))
    batch_s = NamedSharding(mesh, P("data"))

    def loss_fn(params, fb, users, pos, neg):
        u, p, n, dropped = fast_batch_embeddings(
            params, fb, cfg.num_layers, users, pos, neg, edge_cap
        )
        pos_scores = jnp.sum(u * p, axis=-1)
        neg_scores = jnp.sum(u * n, axis=-1)
        bpr = bpr_loss(pos_scores, neg_scores)
        reg = reg_loss(params["embedding"], users, pos, neg, decay)
        return bpr + reg, (bpr, reg, dropped)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, fb: FastBipartite, sdata: BprSamplerData, key):
        users, pos, neg = sample_batch(key, sdata, batch_size)
        users = jax.lax.with_sharding_constraint(users, batch_s)
        pos = jax.lax.with_sharding_constraint(pos, batch_s)
        neg = jax.lax.with_sharding_constraint(neg, batch_s)
        (loss, (bpr, reg, dropped)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, fb, users, pos, neg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, emb_s), params
        )
        return params, opt_state, {
            "loss": loss,
            "bpr_loss": bpr,
            "reg_loss": reg,
            "dropped_arcs": jnp.asarray(dropped, jnp.float32),
        }

    return step


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
