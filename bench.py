"""Benchmark: LightGCN propagation + training throughput on one TPU chip.

Builds a cosmetics-shop-scale synthetic graph (BASELINE.md: 1.64M users,
54.6K items, ~10.16M unique weighted edges — the real dataset lives behind
the reference's DVC remote and is unreachable), then measures:

- effective propagation throughput of the bipartite-factorized fast path
  (``ops/bipartite.py``: 2 big SpMMs + dense MXU item-operator chain instead
  of 2L gather/scatter SpMMs), reported as LOGICAL edges/s/chip — arcs×layers
  the reference would process for the same result (BASELINE.json headline);
- full BPR train-step time (device-side sampling + fwd/bwd + Adam, batch
  1024) and one full validation eval (blocked top-K over all items, 25K
  users);
- the layered segment-sum oracle path timing for comparison (stderr).

vs_baseline: projected wall-clock speedup of the reference's full training
workload (20 epochs x 235 steps + 20 evals ≈ its "about 24 hours to train"
on a 24GB GPU, reference README.md:59) executed at the measured rates.

Prints exactly ONE JSON line to stdout; progress goes to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str):
    print(msg, file=sys.stderr, flush=True)


# Reference-scale shape (BASELINE.md) and hyperparams (BASELINE.json config 4).
N_USERS = 1_639_358
N_ITEMS = 54_571
N_EDGES = 10_157_407
DIM = 80
LAYERS = 4
BATCH = 1024
STEPS_PER_EPOCH = 235          # train_size/(1024*40), src/train_lightgcn.py:92
EPOCHS = 20                    # reference CLI default (train_lightgcn.py:165)
EVAL_USERS = 25_000
REFERENCE_HOURS = 24.0         # reference README.md:59

# Roofline constants for the target chip (TPU v5e single chip, public spec):
HBM_GBPS = 819.0               # HBM bandwidth
MXU_BF16_TFLOPS = 197.0        # peak bf16 matmul
# Measured descriptor rates on THIS chip (scripts/microbench_results*.json):
# arbitrary-row gather is descriptor-bound, ~independent of row width/dtype.
DESC_S_PER_ROW_BIG = 9.5e-9    # from the 1.64M-row user table
DESC_S_PER_ROW_SMALL = 6.2e-9  # from the 54.6K-row item table (147-172M rows/s)


def skewed_ids(rng, n, size, a):
    """Zipf-ish ids via inverse-CDF on rank weights (vectorized)."""
    ranks = np.arange(1, n + 1, dtype=np.float64)
    probs = ranks ** (-a)
    cdf = np.cumsum(probs)
    cdf /= cdf[-1]
    u = rng.random(size)
    return np.searchsorted(cdf, u).astype(np.int64).clip(0, n - 1)


def build_synthetic_graph():
    """Cosmetics-scale synthetic graph + a held-out eval split.

    Latent co-cluster structure (same planted model as
    ``data.synthetic.synthetic_events``) makes the eval recall MEANINGFUL:
    2.5% of purchase edges are held out of the graph/sampler as eval truth,
    so the bench's printed recall measures ranking of real unseen positives
    instead of noise (round-2 VERDICT weak 2)."""
    from gnn_ecommerce_tpu.graph import build_graph

    rng = np.random.default_rng(0)
    log(f"generating ~{N_EDGES} unique edges ...")
    over = int(N_EDGES * 1.35)
    u = skewed_ids(rng, N_USERS, over, 0.75)
    i = skewed_ids(rng, N_ITEMS, over, 1.0)
    # Planted co-clusters: 70% of draws keep the item inside the user's
    # cluster (within-cluster popularity stays zipf via the rank transform).
    n_clusters = 48
    user_cluster = rng.integers(0, n_clusters, N_USERS)
    item_cluster = rng.integers(0, n_clusters, N_ITEMS)
    order = np.argsort(item_cluster, kind="stable")
    cluster_start = np.searchsorted(item_cluster[order], np.arange(n_clusters + 1))
    in_cl = rng.random(over) < 0.7
    ev_cluster = user_cluster[u[in_cl]]
    size = cluster_start[ev_cluster + 1] - cluster_start[ev_cluster]
    ok = size > 0
    ranks = np.minimum((size[ok] * rng.random(int(ok.sum())) ** 2.0).astype(np.int64),
                       size[ok] - 1)
    i[np.flatnonzero(in_cl)[ok]] = order[cluster_start[ev_cluster[ok]] + ranks]
    key = u * (1 << 17) + i  # n_items < 2^17
    key = np.unique(key)
    rng.shuffle(key)
    key = key[:N_EDGES]
    u, i = key >> 17, key & ((1 << 17) - 1)
    # Edge-weight profile like the capped pipeline output: mass at 0.01-0.5,
    # ~20% purchases at exactly 1.0.
    w = np.where(
        rng.random(len(u)) < 0.2, 1.0, rng.uniform(0.01, 0.5, len(u))
    ).astype(np.float32)
    # Hold out 2.5% of purchase edges as eval truth (excluded from the graph
    # and the sampler — real unseen positives).
    purch_idx = np.flatnonzero(w == 1.0)
    held = rng.choice(purch_idx, int(0.025 * len(purch_idx)), replace=False)
    keep = np.ones(len(u), bool)
    keep[held] = False
    holdout = (u[held], i[held])
    u, i, w = u[keep], i[keep], w[keep]
    log(f"{len(u)} edges (+{len(held)} held-out eval positives); "
        "building normalized graph ...")
    return build_graph(u, i, w, N_USERS, N_ITEMS), (u, i, w), holdout


def timeit(f, *args, reps=5):
    """Per-rep scalar readback: through the axon tunnel, block_until_ready on
    a device handle is not a reliable completion barrier — pulling one scalar
    derived from the output is."""
    import jax
    import jax.numpy as jnp

    pull = jax.jit(lambda o: jnp.sum(jax.tree.leaves(o)[0][..., -1]))
    out = f(*args)
    float(pull(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        float(pull(out))
    return (time.perf_counter() - t0) / reps


def roofline_accounting(fb, params, t_fast, step_s):
    """Per-phase roofline for the fast forward + train step (VERDICT r3 #2).

    For each phase of the measured-optimal forward — to_items gather, Pallas
    segment reduce, dense heavy head, to_users ELL, B_ii chain — model the
    bytes moved and the binding floor (HBM stream at 819 GB/s, MXU at 197
    bf16 TFLOPs, or the MEASURED descriptor rate for arbitrary-row gathers:
    ~9.5 ns/row big-table / ~6.2 ns/row small-table — the gather engine's
    per-row cost, 8-13%% of the HBM byte rate, which no layout we measured
    moves; docs/PERFORMANCE.md "The hardware wall"), time the phase alone
    where separable, and report achieved GB/s + the fraction of its floor
    each phase reaches. Also derives the floor-implied step time and the gap
    the measured train step leaves to it.
    """
    import jax
    import jax.numpy as jnp

    from gnn_ecommerce_tpu.ops.bipartite import fast_to_items, fast_to_users
    from gnn_ecommerce_tpu.ops.spmm_fast import BucketedSegReducePlan

    fops = fb.fops
    D = DIM
    E = params["embedding"]
    x_users = jax.jit(lambda e: e[:N_USERS].astype(jnp.float32))(E)
    x_items = jax.jit(lambda e: e[N_USERS:].astype(jnp.float32))(E)

    # Per-call overhead (dispatch + tunnel scalar readback, ~15-25 ms here)
    # dominates small standalone phases; measure it with a no-op program and
    # subtract from every phase timing.
    t_call = timeit(jax.jit(lambda x: x + 1.0), x_items, reps=5)

    def net(t):
        if t is None:
            return None
        d = t - t_call
        # Below measurement resolution (call-overhead jitter): unusable.
        return d if d > 5e-4 else None

    # --- measured phase times (each jitted alone, overhead-netted) ---
    t_ti = net(timeit(jax.jit(fast_to_items), x_users, fops, reps=5))
    t_tu = net(timeit(jax.jit(fast_to_users), x_items, fops, reps=5))

    plan = fops.items_plan
    if isinstance(plan, BucketedSegReducePlan):
        rows_g = int(sum(b.gidx.size for b in plan.buckets))
        n_chunks = int(sum(b.tile_map.shape[0] for b in plan.buckets))
        ot = plan.ot
        t_gather = None  # composite sliced gathers; not separable
    else:
        rows_g = int(plan.gidx.size)
        n_chunks = int(plan.tile_map.shape[0])
        ot = plan.ot
        tbl16 = jax.jit(lambda e: e[:N_USERS].astype(jnp.bfloat16))(E)
        t_gather = net(timeit(
            jax.jit(lambda t, ix: jnp.take(t, ix, axis=0)), tbl16, plan.gidx,
            reps=5,
        ))

    t_head = None
    if fops.w_hi is not None:
        K = int(fops.w_hi.shape[1])
        xh = jax.jit(
            lambda x, ids: jnp.take(x, ids, axis=0).astype(fops.w_hi.dtype)
        )(x_users, fops.hi_ids)
        t_head = net(timeit(
            jax.jit(
                lambda W, x: jnp.dot(
                    W, x, preferred_element_type=jnp.float32
                )
            ),
            fops.w_hi, xh, reps=5,
        ))
    else:
        K = 0

    # B_ii chain alone (pair-streamed exactly like the forward).
    def chain_only(B, x):
        out = x
        l = 2
        while l <= LAYERS:
            if l + 1 <= LAYERS:
                both = jnp.concatenate(
                    [out.astype(B.dtype), out.astype(B.dtype)], axis=1
                )
                out = jnp.dot(B, both, preferred_element_type=jnp.float32)[
                    :N_ITEMS, :D
                ]
                l += 2
            else:
                out = jnp.dot(
                    B, out.astype(B.dtype), preferred_element_type=jnp.float32
                )[:N_ITEMS]
                l += 1
        return out

    t_chain = net(timeit(jax.jit(chain_only), fb.item_op, x_items, reps=5))

    ell_rows = int(sum(ix.size for ix in fops.users_ell.idx))
    bw = HBM_GBPS * 1e9
    n_streams_fwd = (LAYERS - 1 + 1) // 2  # pair streaming of B

    def phase(bytes_, desc_s=0.0, mxu_flops=0.0, measured=None):
        hbm_s = bytes_ / bw
        mxu_s = mxu_flops / (MXU_BF16_TFLOPS * 1e12)
        floor_s = max(hbm_s, desc_s, mxu_s)
        bound = (
            "descriptor" if floor_s == desc_s and desc_s > 0
            else ("mxu" if floor_s == mxu_s and mxu_flops > 0 else "hbm")
        )
        d = {
            "bytes_moved": int(bytes_),
            "floor_ms": round(floor_s * 1e3, 2),
            "bound_by": bound,
            "hbm_floor_ms": round(hbm_s * 1e3, 2),
        }
        if desc_s:
            d["descriptor_floor_ms"] = round(desc_s * 1e3, 2)
        if mxu_flops:
            d["mxu_floor_ms"] = round(mxu_s * 1e3, 3)
        if measured is not None:
            d["measured_ms"] = round(measured * 1e3, 2)
            d["achieved_GBps"] = round(bytes_ / measured / 1e9, 1)
            d["pct_of_floor"] = round(100 * floor_s / measured, 1)
            d["pct_of_hbm_sol"] = round(100 * (bytes_ / measured) / bw, 1)
        return d

    head_bytes = N_ITEMS * K * 2 + K * D * 2 + N_ITEMS * D * 4
    phases = {
        "to_items_gather": phase(
            rows_g * (D * 2 + 4),
            desc_s=rows_g * DESC_S_PER_ROW_BIG,
            measured=t_gather,
        ),
        "to_items_pallas_reduce": phase(
            rows_g * D * 2 + n_chunks * ot * D * 4 * 2,
            measured=(lambda d: d if d and d > 0 else None)(
                (t_ti - (t_gather or 0.0) - (t_head or 0.0))
                if t_gather is not None and t_ti is not None
                else None
            ),
        ),
        "heavy_head_per_direction": phase(
            head_bytes,
            mxu_flops=2.0 * N_ITEMS * K * D,
            measured=t_head,
        ),
        "to_users_ell": phase(
            ell_rows * (D * 2 + 8) + N_USERS * D * 4,
            desc_s=ell_rows * DESC_S_PER_ROW_SMALL,
            measured=(lambda d: d if d and d > 0 else None)(
                (t_tu - (t_head or 0.0)) if t_head is not None else t_tu
            ),
        ),
        "b_ii_chain": phase(
            n_streams_fwd * fb.item_op.size * 2
            + (LAYERS - 1) * N_ITEMS * D * 4 * 2,
            mxu_flops=(LAYERS - 1) * 2.0 * N_ITEMS * N_ITEMS * D,
            measured=t_chain,
        ),
    }

    t_fast_net = net(t_fast) or t_fast  # same basis as the netted phases
    fwd_floor_s = (
        phases["to_items_gather"]["floor_ms"]
        + phases["to_items_pallas_reduce"]["floor_ms"]
        + 2 * phases["heavy_head_per_direction"]["floor_ms"]
        + phases["to_users_ell"]["floor_ms"]
        + phases["b_ii_chain"]["floor_ms"]
    ) / 1e3

    # Train-step floor: batched fwd (to_items full + chain + head) + its
    # transpose in the bwd (to_users full + chain + head) + Adam streaming
    # params + 2 moments, read+write, f32.
    adam_bytes = 3 * (N_USERS + N_ITEMS) * D * 4 * 2
    step_floor_s = (
        phases["to_items_gather"]["floor_ms"]
        + phases["to_items_pallas_reduce"]["floor_ms"]
        + phases["to_users_ell"]["floor_ms"]
        + 2 * phases["heavy_head_per_direction"]["floor_ms"]
        + 2 * phases["b_ii_chain"]["floor_ms"]
    ) / 1e3 + adam_bytes / bw
    return {
        "assumptions": {
            "per_call_overhead_ms_netted": round(t_call * 1e3, 2),
            "hbm_GBps": HBM_GBPS,
            "mxu_bf16_tflops": MXU_BF16_TFLOPS,
            "descriptor_ns_per_row_big_table": DESC_S_PER_ROW_BIG * 1e9,
            "descriptor_ns_per_row_small_table": DESC_S_PER_ROW_SMALL * 1e9,
        },
        "phases": phases,
        "forward": {
            "measured_ms": round(t_fast * 1e3, 2),
            "measured_ms_net_of_call_overhead": round(t_fast_net * 1e3, 2),
            "floor_ms": round(fwd_floor_s * 1e3, 2),
            "pct_of_floor": round(100 * fwd_floor_s / t_fast_net, 1),
            "phase_sum_measured_ms": round(
                sum(x for x in (t_ti, t_tu, t_chain) if x) * 1e3, 2
            ),
        },
        "train_step": {
            "measured_ms": round(step_s * 1e3, 2),
            "floor_ms": round(step_floor_s * 1e3, 2),
            "pct_of_floor": round(100 * step_floor_s / step_s, 1),
            "adam_hbm_floor_ms": round(adam_bytes / bw * 1e3, 2),
        },
    }


def main():
    import jax

    # Persistent XLA compilation cache: the remote TPU compiler takes
    # 20s-4min per program through the tunnel; caching compiled executables
    # on disk removes that from every run after the first (a production
    # deployment ships warmed caches the same way). Measured quantities
    # (steady-state step/forward/eval times) are unaffected.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")

    import jax.numpy as jnp
    import optax

    from gnn_ecommerce_tpu.data.prepare import CsrList, EvalSplit, SamplerArrays
    from gnn_ecommerce_tpu.eval import build_eval_batch, evaluate
    from gnn_ecommerce_tpu.models import LightGCNConfig, init_params
    from gnn_ecommerce_tpu.ops.bipartite import build_fast_bipartite, fast_get_embedding
    from gnn_ecommerce_tpu.ops.propagate import propagate_segment_chunked
    from gnn_ecommerce_tpu.sampling import make_sampler_data
    from gnn_ecommerce_tpu.train import make_train_fns

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    graph, (u, i, w), holdout = build_synthetic_graph()
    cfg = LightGCNConfig(num_nodes=graph.num_nodes, embedding_dim=DIM, num_layers=LAYERS)
    params = init_params(jax.random.key(0), cfg)

    # --- layered oracle path timing FIRST (fast-path-independent) ---
    from gnn_ecommerce_tpu.models import get_embedding

    layered2 = jax.jit(
        lambda p, g: get_embedding(
            p, g, cfg, lambda g_, x: propagate_segment_chunked(g_, x, 8)
        )
    )
    layered = lambda p: layered2(p, graph)
    t_layered = timeit(layered, params, reps=2)
    log(f"layered segment path: {t_layered*1e3:.0f} ms / {LAYERS} layers")

    # --- one-time builds: the dense item-item 2-hop operator (device-bound)
    # and the SpMM plans (native-C++ host layout + array uploads), OVERLAPPED
    # on a thread — the plan build needs no device compute, so its host work
    # and uploads hide behind the B_ii build's device dispatches. The heavy-
    # user hybrid candidate is built first (it has won every measurement,
    # CLAUDE.md perf state); plain plans only as fallback if it fails.
    log("building B_ii item operator + SpMM plans (one-time per graph) ...")
    num_arcs = graph.num_arcs
    t0 = time.perf_counter()
    from gnn_ecommerce_tpu.ops.bipartite import (
        FastBipartite,
        build_fast_ops,
        build_item_operator,
        split_graph,
    )

    fbsplit = split_graph(graph)
    del graph, layered, layered2  # free the unified arc arrays' HBM
    jax.clear_caches()            # drop compiled executables + their buffers

    import threading

    plans: dict = {}

    def build_plans():
        for label, kwargs in (
            ("spmm plans + heavy-user head (K=16384)",
             dict(heavy_users=16384, heavy_dtype="bfloat16")),
            ("spmm plans (ELL + pallas segreduce)", {}),
        ):
            try:
                tb = time.perf_counter()
                fops = build_fast_ops(fbsplit, msgs_dtype="bfloat16", **kwargs)
                jax.block_until_ready(jax.tree.leaves(fops))
                # Single setitem = atomic publish: the main thread may have
                # given up (join timeout) and snapshotted `plans` — it must
                # never observe a partially-written entry.
                plans["result"] = (fops, label, time.perf_counter() - tb)
                return
            except Exception as e:
                log(f"{label} build failed: {type(e).__name__}: {e}")

    plan_thread = threading.Thread(target=build_plans, daemon=True)
    plan_thread.start()
    fb = FastBipartite(
        split=fbsplit,
        item_op=build_item_operator(fbsplit, dtype=jnp.bfloat16, band_bytes=1.5e9),
    )
    jax.block_until_ready(fb.item_op)
    t_bii = time.perf_counter() - t0
    # Bounded join: a tunnel outage can hang the plan build's uploads for
    # 10-40 min (documented); fall through to the segment-path bench rather
    # than deadlocking with no output.
    plan_thread.join(timeout=900)
    # Snapshot once: after a timed-out join the daemon thread keeps running
    # and may publish later — reading `plans` again further down would
    # silently reverse the "segment path only" decision logged here.
    plan_result = plans.get("result")
    if plan_thread.is_alive():
        log("plan build still running after 900s (tunnel stall?) — "
            "continuing with the segment path only")
        plan_result = None
    t_build = time.perf_counter() - t0  # B_ii ∥ plan builds, wall clock
    log(
        f"one-time build {t_build:.1f}s (B_ii {t_bii:.1f}s, "
        f"{fb.item_op.nbytes/1e9:.2f} GB bf16; plan "
        f"{plan_result[2] if plan_result else float('nan'):.1f}s overlapped)"
    )

    # --- fast bipartite path (fb passed as an ARG: closing over it would
    # bake the 6GB item operator into the executable as a captured constant) ---
    fast2 = jax.jit(lambda p, fb_: fast_get_embedding(p, fb_, LAYERS))
    fast = lambda p: fast2(p, fb)
    t_fast = timeit(fast, params, reps=10)
    logical_edges = num_arcs * LAYERS
    edges_per_s = logical_edges / t_fast
    log(
        f"fast bipartite path: {t_fast*1e3:.1f} ms / {LAYERS} layers -> "
        f"{edges_per_s:.3e} logical edges/s/chip ({t_layered/t_fast:.1f}x over layered)"
    )

    # --- fast path with the measured-optimal SpMM plans (ops/spmm_fast.py:
    # to_items = gather + Pallas one-hot-MXU segment reduce + dense heavy-
    # user head; to_users = degree-binned ELL + head). Timed against the
    # plain segment path and the best kept — a Mosaic failure must not kill
    # the bench.
    if plan_result is not None:
        fops_built, plan_label, _ = plan_result
        try:
            fast_fo2 = jax.jit(lambda p, fb_: fast_get_embedding(p, fb_, LAYERS))
            fb_fo = FastBipartite(split=fb.split, item_op=fb.item_op, fops=fops_built)
            fast_fo = lambda p: fast_fo2(p, fb_fo)
            t_fo = timeit(fast_fo, params, reps=10)
            log(f"fast + {plan_label}: {t_fo*1e3:.1f} ms ({t_fast/t_fo:.2f}x)")
            if t_fo < t_fast:
                fast = fast_fo
                t_fast = t_fo
                fb = fb_fo
                edges_per_s = logical_edges / t_fast
            else:
                # Losing to the plain segment path is a REGRESSION signal
                # (the hybrid has won every measurement to date) — log it
                # loudly and drop the FastOps so its HBM (incl. the ~1.8 GB
                # bf16 heavy head) does not crowd the train-step phase.
                log(
                    f"WARNING: {plan_label} LOST to the segment path "
                    f"({t_fo*1e3:.1f} vs {t_fast*1e3:.1f} ms) — possible "
                    "regression in the fast plans"
                )
                del fb_fo, fast_fo
                plan_result = fops_built = None
                plans.clear()
        except Exception as e:
            log(f"{plan_label} unavailable: {type(e).__name__}: {e}")
            plan_result = fops_built = None
            plans.clear()

    # --- bucketed to_items candidate (src-range-bucketed gather; the
    # microbench cliff predicts ~161 vs 96 Mrows/s for <=262K-row sub-table
    # gathers). Shares the heavy head + ELL plan with the hybrid — only
    # items_plan differs; winner kept, loser freed. First call compiles ONE
    # extra Mosaic program (all buckets share a padded shape). ---
    # Gate on the heavy head actually being present: the bucketed plan below
    # re-splits the top-16384 users out of the tail, which is only exact if
    # the active FastOps covers those users with its dense head — if the
    # plain-plans fallback won (w_hi=None), replacing items_plan with a
    # heavy-user-stripped one would silently drop ~22% of arcs.
    if getattr(fb, "fops", None) is not None and fb.fops.w_hi is not None:
        try:
            import dataclasses as _dc

            from gnn_ecommerce_tpu.ops.bipartite import split_heavy_users
            from gnn_ecommerce_tpu.ops.spmm_fast import (
                build_bucketed_segreduce_plan,
            )

            tb = time.perf_counter()
            _, _, bu, bd, bw, _, _, _, _ = split_heavy_users(
                fb.split, 16384, "bfloat16", build_head=False
            )
            bplan = build_bucketed_segreduce_plan(
                bu, bd, bw, N_ITEMS, n_src=N_USERS, n_buckets=8
            )
            jax.block_until_ready(jax.tree.leaves(bplan))
            fops_b = _dc.replace(fb.fops, items_plan=bplan)
            fb_b = FastBipartite(split=fb.split, item_op=fb.item_op, fops=fops_b)
            fast_b2 = jax.jit(lambda p, fb_: fast_get_embedding(p, fb_, LAYERS))
            fast_b = lambda p: fast_b2(p, fb_b)
            t_b = timeit(fast_b, params, reps=10)
            log(
                f"fast + bucketed to_items (8 src buckets; build "
                f"{time.perf_counter() - tb:.0f}s incl. compile): "
                f"{t_b*1e3:.1f} ms ({t_fast/t_b:.2f}x vs current best)"
            )
            if t_b < t_fast:
                fast, t_fast, fb = fast_b, t_b, fb_b
                edges_per_s = logical_edges / t_fast
                log("bucketed to_items KEPT")
            else:
                del fb_b, fast_b, fops_b, bplan
        except Exception as e:
            log(f"bucketed candidate unavailable: {type(e).__name__}: {e}")

    # --- train step (fast path) ---
    purch = w == 1.0
    pu, pi = u[purch], i[purch] + N_USERS
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
    sdata = make_sampler_data(arrays, N_USERS, N_ITEMS)
    optimizer = optax.adam(0.005)
    opt_state = optimizer.init(params)
    from gnn_ecommerce_tpu.ops.bipartite import fast_batch_embeddings

    edge_cap = 64 * BATCH  # ~10x expected batch degree sum; overflow counted
    _, run_steps = make_train_fns(
        cfg, optimizer, BATCH, decay=1e-4,
        batch_embed_fn=lambda p, fb_, us, po, ne: fast_batch_embeddings(
            p, fb_, LAYERS, us, po, ne, edge_cap=edge_cap
        ),
    )
    log("compiling train steps (batched fast path) ...")
    # Two un-timed windows: compile, then ~30 steps of post-compile transient
    # (measured ~540 ms/step for the first window vs 342 steady-state —
    # allocator/autotune settling); the timed window is steady state, which
    # is what a 4700-step training run actually pays.
    params, opt_state, m = run_steps(params, opt_state, fb, sdata, jax.random.key(1), 5)
    jax.block_until_ready(params)
    params, opt_state, m = run_steps(params, opt_state, fb, sdata, jax.random.key(3), 30)
    float(m["loss"])
    t0 = time.perf_counter()
    reps_steps = 30
    params, opt_state, m = run_steps(
        params, opt_state, fb, sdata, jax.random.key(2), reps_steps
    )
    float(m["loss"])  # scalar readback = reliable completion barrier
    step_s = (time.perf_counter() - t0) / reps_steps
    log(
        f"train step: {step_s*1e3:.1f} ms (bpr={float(m['bpr_loss']):.4f}, "
        f"dropped_arcs={float(m['dropped_arcs']):.1f})"
    )

    # --- eval: truth = the held-out purchase edges (real unseen positives,
    # not in the graph or the sampler) ---
    h_u, h_i = holdout
    h_order = np.argsort(h_u, kind="stable")
    h_u, h_i = h_u[h_order], h_i[h_order]
    ev_users_all, h_first = np.unique(h_u, return_index=True)
    n_ev = min(EVAL_USERS, len(ev_users_all))
    ev_users = ev_users_all[:n_ev].astype(np.int64)
    cut = int(h_first[n_ev]) if len(ev_users_all) > n_ev else len(h_u)
    t_lens = np.diff(np.append(h_first[:n_ev], cut))
    truth = CsrList(np.append(0, np.cumsum(t_lens)), h_i[:cut].astype(np.int64))
    # Mask = the eval users' remaining train purchases (may be empty for a
    # user whose every purchase was held out).
    ev_slots = np.clip(np.searchsorted(pos_users, ev_users), 0, len(pos_users) - 1)
    has = pos_users[ev_slots] == ev_users
    lens = np.where(has, indptr[ev_slots + 1] - indptr[ev_slots], 0).astype(np.int64)
    starts = np.where(has, indptr[ev_slots], 0)
    take = np.repeat(starts, lens) + (
        np.arange(int(lens.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(np.append(0, lens[:-1])), lens)
    )
    tr_vals = pi_s[take] - N_USERS
    tr_indptr = np.append(0, np.cumsum(lens))
    split = EvalSplit(
        user_ids=ev_users,
        truth=truth,
        train_mask=CsrList(tr_indptr, tr_vals),
    )
    batch = build_eval_batch(split)
    final_emb = fast(params)
    jax.block_until_ready(final_emb)
    log("compiling eval ...")
    evaluate(final_emb, batch, N_USERS, k=20)  # compile
    t0 = time.perf_counter()
    precision, recall, _, _, _ = evaluate(final_emb, batch, N_USERS, k=20)
    eval_s = time.perf_counter() - t0
    log(
        f"eval ({len(ev_users)} users x {N_ITEMS} items): {eval_s:.2f}s "
        f"(held-out R@20 {recall:.4f} after {5 + 30 + 30} train steps; "
        f"random-ranker floor ~{20 / N_ITEMS:.2e})"
    )

    # --- roofline accounting (VERDICT r3 item 2): per-phase bytes, floors,
    # achieved GB/s, and the floor-implied step time ---
    roofline = {}
    if getattr(fb, "fops", None) is not None:
        try:
            del final_emb
            roofline = roofline_accounting(fb, params, t_fast, step_s)
            log(
                "roofline: forward floor "
                f"{roofline['forward']['floor_ms']} ms "
                f"({roofline['forward']['pct_of_floor']}% of floor reached); "
                f"step floor {roofline['train_step']['floor_ms']} ms "
                f"({roofline['train_step']['pct_of_floor']}% reached)"
            )
            for name, ph in roofline["phases"].items():
                log(
                    f"  {name}: floor {ph['floor_ms']} ms ({ph['bound_by']}) "
                    + (
                        f"measured {ph['measured_ms']} ms, "
                        f"{ph.get('achieved_GBps', 0)} GB/s, "
                        f"{ph.get('pct_of_hbm_sol', 0)}% of HBM SoL"
                        if "measured_ms" in ph
                        else "(not separable)"
                    )
                )
        except Exception as e:
            log(f"roofline accounting failed: {type(e).__name__}: {e}")

    # --- projection vs reference (includes the one-time B_ii build) ---
    epoch_s = STEPS_PER_EPOCH * step_s + eval_s + t_fast
    projected_hours = (t_build + EPOCHS * epoch_s) / 3600.0
    vs_baseline = REFERENCE_HOURS / projected_hours
    log(
        f"projected full training: {projected_hours:.3f} h for {EPOCHS} epochs "
        f"(reference: {REFERENCE_HOURS} h) -> {vs_baseline:.1f}x"
    )

    print(
        json.dumps(
            {
                "metric": "lightgcn_effective_propagation_throughput",
                "value": round(edges_per_s, 1),
                "unit": "edges/s/chip",
                "vs_baseline": round(vs_baseline, 2),
                "detail": {
                    "b_ii_build_s": round(t_build, 2),
                    "fast_forward_ms": round(t_fast * 1e3, 2),
                    "layered_forward_ms": round(t_layered * 1e3, 2),
                    "train_step_ms": round(step_s * 1e3, 2),
                    "eval_s": round(eval_s, 2),
                    "heldout_recall_at_20": round(recall, 5),
                    "projected_train_hours": round(projected_hours, 3),
                    "graph": f"{N_USERS}x{N_ITEMS}, {N_EDGES} edges, dim {DIM}, {LAYERS} layers",
                    "roofline": roofline,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
