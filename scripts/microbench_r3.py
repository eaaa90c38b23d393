"""Round-3 microbenches on the real chip (resumable; writes JSON per key).

Questions this answers (feeding ops/spmm_fast.py and ops/bipartite.py):

1. gather_rate_vs_table_rows: the big-table gather (to_items) runs at
   ~105M rows/s from the 1.64M-row user table but 147-172M rows/s from the
   54.6K-row item table (scripts/microbench_results*.json). Where between
   those sizes does the rate fall off? If mid-size tables gather fast, the
   to_items gather can be split into per-src-range bucket gathers from
   sliced sub-tables (the segreduce kernel's tile_map already permits
   logically reordered chunks).
2. bucketed_gather: the actual candidate — 4/8/16 range-bucketed gathers
   + concat vs one flat gather, same 10.16M total rows.
3. b_matmul_orientation: B_ii bf16 [I, I] @ [I, 160] measured ~35 ms =
   171 GB/s (HBM is ~800). B is symmetric, so contracting dim 0 is
   mathematically identical — does dot_general((0,),(0,)) (or an rhs-side
   formulation) avoid a hidden transpose/copy and stream faster?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_r3.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "microbench_r3_results.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load():
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            return json.load(f)
    return {}


def save(res):
    tmp = RESULTS + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f, indent=1)
    os.replace(tmp, RESULTS)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    res = load()

    def timeit(f, *args, reps=5):
        pull = jax.jit(lambda o: jnp.sum(o[..., -1]))
        out = f(*args)
        float(pull(out))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
            float(pull(out))
        return (time.perf_counter() - t0) / reps

    def measure(key, fn):
        if key in res:
            log(f"{key}: cached {res[key]}")
            return
        try:
            res[key] = fn()
            log(f"{key}: {res[key]}")
        except Exception as e:
            res[key] = f"ERROR {type(e).__name__}: {e}"
            log(f"{key}: {res[key]}")
        save(res)

    rng = np.random.default_rng(0)
    N_IDX = 8_000_000
    D = 80

    # --- 1. gather rate vs table rows (bf16, unsorted uniform indices) ---
    take = jax.jit(lambda t, ix: jnp.take(t, ix, axis=0))
    for rows in (54_571, 131_072, 262_144, 524_288, 1_048_576, 1_639_358):
        def run(rows=rows):
            table = jnp.asarray(
                rng.standard_normal((rows, D), np.float32), jnp.bfloat16
            )
            idx = jnp.asarray(rng.integers(0, rows, N_IDX).astype(np.int32))
            t = timeit(take, table, idx, reps=3)
            return {"ms": round(t * 1e3, 2), "Mrows_s": round(N_IDX / t / 1e6, 1)}
        measure(f"gather_bf16_{rows}rows", run)

    # --- 2. bucketed gather from the 1.64M-row table ---
    ROWS = 1_639_358
    table_np = rng.standard_normal((ROWS, D), np.float32)
    idx_np = rng.integers(0, ROWS, N_IDX).astype(np.int32)

    def run_flat():
        table = jnp.asarray(table_np, jnp.bfloat16)
        idx = jnp.asarray(idx_np)
        t = timeit(take, table, idx, reps=3)
        return {"ms": round(t * 1e3, 2), "Mrows_s": round(N_IDX / t / 1e6, 1)}

    measure("bucketed_gather_flat_1.64M", run_flat)

    def make_bucketed(n_buckets):
        bounds = np.linspace(0, ROWS, n_buckets + 1).astype(np.int64)
        pieces_idx, pieces_local = [], []
        order = np.argsort(idx_np // -(-ROWS // n_buckets), kind="stable")
        idx_sorted = idx_np[order]
        cuts = np.searchsorted(idx_sorted, bounds)
        subs = []
        for b in range(n_buckets):
            lo, hi = int(bounds[b]), int(bounds[b + 1])
            subs.append(jnp.asarray(table_np[lo:hi], jnp.bfloat16))
            pieces_local.append(
                jnp.asarray(idx_sorted[cuts[b]:cuts[b + 1]] - lo)
            )

        def f(_dummy):
            outs = [jnp.take(s, ix, axis=0) for s, ix in zip(subs, pieces_local)]
            return jnp.concatenate(outs, axis=0)

        jf = jax.jit(f)
        t = timeit(jf, jnp.zeros(()), reps=3)
        return {"ms": round(t * 1e3, 2), "Mrows_s": round(N_IDX / t / 1e6, 1)}

    for nb in (4, 8, 16):
        measure(f"bucketed_gather_{nb}x_1.64M", lambda nb=nb: make_bucketed(nb))

    # Variant: single shared table, bucketed indices but take() from the FULL
    # table (isolates locality-of-indices from table-size effects).
    def run_sorted_idx():
        table = jnp.asarray(table_np, jnp.bfloat16)
        idx = jnp.asarray(np.sort(idx_np))
        t = timeit(take, table, idx, reps=3)
        return {"ms": round(t * 1e3, 2), "Mrows_s": round(N_IDX / t / 1e6, 1)}

    measure("bucketed_gather_fullsorted_1.64M", run_sorted_idx)

    del table_np, idx_np

    # --- 3. B matmul orientation (bf16 symmetric [I, I]) ---
    I = 54_571
    for width in (160,):
        key = jax.random.key(0)
        B = jax.random.normal(key, (I, I), jnp.bfloat16)
        X = jax.random.normal(jax.random.key(1), (I, width), jnp.bfloat16)
        gb = B.nbytes / 1e9

        def orient(form):
            if form == "dim1":
                f = jax.jit(lambda b, x: jnp.dot(
                    b, x, preferred_element_type=jnp.float32))
            elif form == "dim0":
                f = jax.jit(lambda b, x: jax.lax.dot_general(
                    b, x, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            elif form == "rhs":
                # (Xᵀ B)ᵀ with B contracted on dim 0 — rhs-major streaming.
                f = jax.jit(lambda b, x: jax.lax.dot_general(
                    x, b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).T)
            t = timeit(f, B, X, reps=5)
            return {"ms": round(t * 1e3, 2), "GB_s": round(gb / t, 1)}

        for form in ("dim1", "dim0", "rhs"):
            measure(f"b_matmul_{form}_w{width}", lambda form=form: orient(form))
        del B, X

    save(res)
    log("done")


if __name__ == "__main__":
    main()
