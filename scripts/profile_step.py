"""On-chip breakdown of the fast-path forward and train step.

Times each constituent of the bipartite fast path at bench scale so
optimization targets are measured, not guessed. RESUMABLE: results accumulate
in scripts/profile_step_results.json and already-measured keys are skipped,
so watchdog retries through tunnel outages only re-run what's missing.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

RES_PATH = "/root/repo/scripts/profile_step_results.json"
RESULTS = {}
if os.path.exists(RES_PATH):
    with open(RES_PATH) as f:
        RESULTS = json.load(f)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def need(*names) -> bool:
    return any(n not in RESULTS for n in names)


def rec(name, val):
    RESULTS[name] = val
    log(f"{name}: {val}")
    with open(RES_PATH, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import bench

    graph, (u, i, w) = bench.build_synthetic_graph()
    from gnn_ecommerce_tpu.models import LightGCNConfig, init_params
    from gnn_ecommerce_tpu.ops.bipartite import (
        FastBipartite,
        build_fast_ops,
        build_item_operator,
        fast_get_embedding,
        fast_to_items,
        fast_to_users,
        split_graph,
        to_items,
        to_users,
    )

    cfg = LightGCNConfig(
        num_nodes=graph.num_nodes, embedding_dim=bench.DIM, num_layers=bench.LAYERS
    )
    params = init_params(jax.random.key(0), cfg)
    split = split_graph(graph)
    del graph
    jax.clear_caches()

    E = params["embedding"]
    E_u = jnp.asarray(E[: split.n_users])
    x_items = jnp.asarray(E[split.n_users :]).astype(jnp.float32)

    timeit = bench.timeit

    if need("gather_weighted_big_ms"):
        f_g = jax.jit(lambda t, ix, ww: (jnp.take(t, ix, axis=0) * ww[:, None]))
        rec(
            "gather_weighted_big_ms",
            round(timeit(f_g, E_u, split.ui_src_user, split.ui_w, reps=3) * 1e3, 2),
        )

    if need("seg_to_items_ms"):
        f_ti = jax.jit(lambda x, s: to_items(x, s))
        rec("seg_to_items_ms", round(timeit(f_ti, E_u, split, reps=3) * 1e3, 2))
    if need("seg_to_users_ms"):
        f_tu = jax.jit(lambda x, s: to_users(x, s))
        rec("seg_to_users_ms", round(timeit(f_tu, x_items, split, reps=3) * 1e3, 2))

    f_fti = jax.jit(lambda x, fo: fast_to_items(x, fo))
    f_ftu = jax.jit(lambda x, fo: fast_to_users(x, fo))

    # ONE B-dependent tag per process (fwd + train step): holding both plan
    # sets + the 1.8 GB heavy head + the 6 GB operator together exhausts HBM
    # (tries 3 and 7 died ResourceExhausted). The watchdog re-runs until all
    # tags are measured.
    run_tag = None
    for tag in ("hyb", "fops"):
        if need(f"fwd_{tag}_ms", f"train_step_{tag}_ms"):
            run_tag = tag
            break

    fops = None
    if (
        need(
            "fast_to_items_ms",
            "fast_to_users_ms",
            "gather_cast_bf16_ms",
            "pallas_kernel_only_ms",
            "pallas_kernel_128_weighted_ms",
        )
        or run_tag == "fops"
    ):
        t0 = time.perf_counter()
        fops = build_fast_ops(split, msgs_dtype="bfloat16")
        rec("build_fast_ops_s", round(time.perf_counter() - t0, 2))
    if need("fast_to_items_ms"):
        rec("fast_to_items_ms", round(timeit(f_fti, E_u, fops, reps=3) * 1e3, 2))
    if need("fast_to_users_ms"):
        rec("fast_to_users_ms", round(timeit(f_ftu, x_items, fops, reps=3) * 1e3, 2))

    # Isolate the to_items pipeline stages: fused gather+bf16-cast, and the
    # Pallas kernel alone on premade msgs (does the 47ms glue live in the
    # multiply/cast passes or in a Mosaic input relayout?).
    if (
        need(
            "gather_cast_bf16_ms",
            "pallas_kernel_only_ms",
            "pallas_kernel_128_weighted_ms",
        )
        and fops is not None
    ):
        from gnn_ecommerce_tpu.ops.spmm_fast import _seg_reduce_call

        plan = fops.items_plan
        if need("gather_cast_bf16_ms"):
            f_gc = jax.jit(
                lambda t, ix: jnp.take(t, ix, axis=0).astype(jnp.bfloat16)
            )
            rec(
                "gather_cast_bf16_ms",
                round(timeit(f_gc, E_u, plan.gidx, reps=3) * 1e3, 2),
            )
        if need("pallas_kernel_only_ms"):
            msgs = (
                jnp.take(E_u, plan.gidx, axis=0) * plan.gw[:, None]
            ).astype(jnp.bfloat16)
            jax.block_until_ready(msgs)
            n_tiles = -(-plan.n_out // plan.ot)
            f_k = lambda m: _seg_reduce_call(
                plan.tile_map, plan.first, plan.seg, None, m,
                ot=plan.ot, ch=plan.ch, d=80, n_tiles=n_tiles, interpret=False,
            )
            rec("pallas_kernel_only_ms", round(timeit(f_k, msgs, reps=3) * 1e3, 2))
            del msgs
        if need("pallas_stream_only_ms"):
            # DMA control: a kernel that only sums its msgs blocks — pins the
            # segreduce kernel's input-stream floor vs its compute cost.
            from functools import partial as _partial

            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            ch, ot = plan.ch, plan.ot
            n_chunks = int(plan.seg.shape[0])

            def _stream_kernel(msgs_ref, out_ref):
                out_ref[:] += jnp.sum(
                    msgs_ref[:, :].astype(jnp.float32), axis=0, keepdims=True
                )

            f_s = jax.jit(
                lambda m: pl.pallas_call(
                    _stream_kernel,
                    grid=(n_chunks,),
                    in_specs=[pl.BlockSpec((ch, 80), lambda c: (c, 0))],
                    out_specs=pl.BlockSpec((1, 80), lambda c: (0, 0)),
                    out_shape=jax.ShapeDtypeStruct((1, 80), jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",)
                    ),
                )(m)
            )
            msgs = (
                jnp.take(E_u, plan.gidx, axis=0) * plan.gw[:, None]
            ).astype(jnp.bfloat16)
            jax.block_until_ready(msgs)
            rec("pallas_stream_only_ms", round(timeit(f_s, msgs, reps=3) * 1e3, 2))
            del msgs

        if need("pallas_kernel_128_weighted_ms"):
            t16 = jnp.pad(E_u.astype(jnp.bfloat16), ((0, 0), (0, 48)))
            msgs = jnp.take(t16, plan.gidx, axis=0)
            jax.block_until_ready(msgs)
            n_tiles = -(-plan.n_out // plan.ot)
            wseg = plan.gw.reshape(-1, 8, plan.ch // 8)
            f_k = lambda m: _seg_reduce_call(
                plan.tile_map, plan.first, plan.seg, wseg, m,
                ot=plan.ot, ch=plan.ch, d=128, n_tiles=n_tiles, interpret=False,
                weighted=True,
            )
            rec(
                "pallas_kernel_128_weighted_ms",
                round(timeit(f_k, msgs, reps=3) * 1e3, 2),
            )
            f_g16 = jax.jit(lambda t, ix: jnp.take(t, ix, axis=0))
            rec(
                "gather_bf16_padded_ms",
                round(timeit(f_g16, t16, plan.gidx, reps=3) * 1e3, 2),
            )
            del msgs, t16

    # Wider-chunk segreduce: fewer grid steps (per-step overhead hypothesis
    # for the ~54ms kernel gap vs its bandwidth floor).
    if need("segreduce_ch8192_to_items_ms"):
        from gnn_ecommerce_tpu.ops.spmm_fast import (
            build_segreduce_plan,
            gather_segreduce,
        )

        plan8k = build_segreduce_plan(
            np.asarray(split.ui_src_user),
            np.asarray(split.ui_dst_item),
            np.asarray(split.ui_w),
            split.n_items,
            ot=512,
            ch=8192,
        )
        f_sr = jax.jit(
            lambda x, p: gather_segreduce(x, p, msgs_dtype=jnp.bfloat16)
        )
        rec(
            "segreduce_ch8192_to_items_ms",
            round(timeit(f_sr, E_u, plan8k, reps=3) * 1e3, 2),
        )
        del plan8k

    fops_h = None
    if need("hyb_to_items_ms", "hyb_to_users_ms") or run_tag == "hyb":
        t0 = time.perf_counter()
        fops_h = build_fast_ops(
            split, msgs_dtype="bfloat16", heavy_users=16384, heavy_dtype="bfloat16"
        )
        rec("build_fast_ops_hybrid_s", round(time.perf_counter() - t0, 2))
    if need("hyb_to_items_ms"):
        rec("hyb_to_items_ms", round(timeit(f_fti, E_u, fops_h, reps=3) * 1e3, 2))
    if need("hyb_to_users_ms"):
        rec("hyb_to_users_ms", round(timeit(f_ftu, x_items, fops_h, reps=3) * 1e3, 2))
    if fops_h is not None and need("w_hi_head_ms", "w_hi_T_head_ms"):
        # Isolate the dense heads: W @ x[hi] (to_items) and W.T @ x (to_users)
        # — does XLA transpose W physically for the contraction over dim 0?
        f_w = jax.jit(
            lambda w_, x, ids: jnp.dot(
                w_, jnp.take(x, ids, axis=0).astype(w_.dtype),
                preferred_element_type=jnp.float32,
            )
        )
        rec(
            "w_hi_head_ms",
            round(timeit(f_w, fops_h.w_hi, E_u, fops_h.hi_ids, reps=5) * 1e3, 2),
        )
        f_wt = jax.jit(
            lambda w_, x: jnp.dot(
                w_.T, x.astype(w_.dtype), preferred_element_type=jnp.float32
            )
        )
        rec(
            "w_hi_T_head_ms",
            round(timeit(f_wt, fops_h.w_hi, x_items, reps=5) * 1e3, 2),
        )

    if run_tag is None and not need("b_pair_matmul_ms"):
        log("all B-dependent metrics present; done")
        return

    # HBM hygiene before the 6 GB operator lands: drop the measurement-only
    # copies and the one-off ops' executables (try 3 died ResourceExhausted
    # holding everything at once).
    del E_u, x_items
    jax.clear_caches()

    log("building B_ii ...")
    t0 = time.perf_counter()
    B = build_item_operator(split, dtype=jnp.bfloat16, band_bytes=1.5e9)
    jax.block_until_ready(B)
    if need("b_ii_build_s"):
        rec("b_ii_build_s", round(time.perf_counter() - t0, 2))
    if need("b_pair_matmul_ms"):
        two = jnp.asarray(
            np.tile(np.asarray(E[split.n_users :], np.float32), (1, 2))
        ).astype(jnp.bfloat16)
        f_b = jax.jit(lambda b, m: jnp.dot(b, m, preferred_element_type=jnp.float32))
        rec("b_pair_matmul_ms", round(timeit(f_b, B, two, reps=3) * 1e3, 2))
        del two

    if run_tag is None:
        log("done (matmul only)")
        return
    fb_run = FastBipartite(
        split=split, item_op=B, fops=fops_h if run_tag == "hyb" else fops
    )
    f_fwd = jax.jit(lambda p, fb_: fast_get_embedding(p, fb_, bench.LAYERS))
    if need(f"fwd_{run_tag}_ms"):
        rec(
            f"fwd_{run_tag}_ms",
            round(timeit(f_fwd, params, fb_run, reps=5) * 1e3, 2),
        )

    # --- train steps ---
    import optax

    from gnn_ecommerce_tpu.data.prepare import SamplerArrays
    from gnn_ecommerce_tpu.ops.bipartite import fast_batch_embeddings
    from gnn_ecommerce_tpu.sampling import make_sampler_data
    from gnn_ecommerce_tpu.train import make_train_fns

    purch = w == 1.0
    pu, pi = u[purch], i[purch] + bench.N_USERS
    pos_users = np.unique(pu)
    slot = np.searchsorted(pos_users, pu)
    order = np.lexsort((pi, slot))
    slot_s, pi_s = slot[order], pi[order]
    indptr = np.zeros(len(pos_users) + 1, np.int64)
    np.add.at(indptr, slot_s + 1, 1)
    indptr = np.cumsum(indptr)
    arrays = SamplerArrays(
        users=pos_users, pos_indptr=indptr, pos_flat=pi_s,
        ign_indptr=indptr, ign_flat=pi_s,
    )
    sdata = make_sampler_data(arrays, bench.N_USERS, bench.N_ITEMS)
    optimizer = optax.adam(0.005)
    edge_cap = 64 * bench.BATCH
    _, run_steps = make_train_fns(
        cfg, optimizer, bench.BATCH, decay=1e-4,
        batch_embed_fn=lambda p, fb_, us, po, ne: fast_batch_embeddings(
            p, fb_, bench.LAYERS, us, po, ne, edge_cap=edge_cap
        ),
    )

    if need(f"train_step_{run_tag}_ms"):
        opt_state = optimizer.init(params)
        p2, opt_state, m = run_steps(
            params, opt_state, fb_run, sdata, jax.random.key(1), 5
        )
        jax.block_until_ready(p2)
        p2, opt_state, m = run_steps(p2, opt_state, fb_run, sdata, jax.random.key(3), 30)
        float(m["loss"])
        t0 = time.perf_counter()
        p2, opt_state, m = run_steps(p2, opt_state, fb_run, sdata, jax.random.key(2), 30)
        float(m["loss"])
        rec(
            f"train_step_{run_tag}_ms",
            round((time.perf_counter() - t0) / 30 * 1e3, 2),
        )
        del p2, opt_state

    log("done")


if __name__ == "__main__":
    main()
