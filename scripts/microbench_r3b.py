"""Round-3b: bucketed-gather candidates, arrays passed as ARGS (closing over
them bakes 262MB of constants into the executable and trips the remote
compiler's request-size limit — microbench_r3 results).

Decision experiment for splitting the to_items big-table gather into
per-src-range bucket gathers: r3 showed sub-tables <=262K rows gather at
~161M rows/s vs ~96M for the 1.64M-row table.

Variants (all 8M total rows, bf16 [*, 80] table):
  flat:        one take from the full table (baseline)
  slice8:      8 takes from STATIC SLICES of the one table arg + concat
               (the shape the train step needs: the table is a param slice)
  split8:      8 takes from 8 pre-split table args + concat (upper bound)
  slice4:      4 buckets of 410K rows (is the cliff hard at 262K?)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "microbench_r3b_results.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    res = {}
    if os.path.exists(RESULTS):
        res = json.load(open(RESULTS))

    def save():
        tmp = RESULTS + ".tmp"
        json.dump(res, open(tmp, "w"), indent=1)
        os.replace(tmp, RESULTS)

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
        save()

    rng = np.random.default_rng(0)
    ROWS, D, N_IDX = 1_639_358, 80, 8_000_000
    table_np = rng.standard_normal((ROWS, D), np.float32).astype(np.float32)
    idx_np = rng.integers(0, ROWS, N_IDX).astype(np.int32)
    table = jnp.asarray(table_np, jnp.bfloat16)

    def run_flat():
        f = jax.jit(lambda t, ix: jnp.take(t, ix, axis=0))
        idx = jnp.asarray(idx_np)
        t = timeit(f, table, idx, reps=3)
        return {"ms": round(t * 1e3, 2), "Mrows_s": round(N_IDX / t / 1e6, 1)}

    measure("flat", run_flat)

    def run_buckets(nb, mode):
        bounds = np.linspace(0, ROWS, nb + 1).astype(np.int64)
        bucket_of = np.searchsorted(bounds, idx_np, side="right") - 1
        order = np.argsort(bucket_of, kind="stable")
        idx_sorted = idx_np[order]
        cuts = np.searchsorted(bucket_of[order], np.arange(nb + 1))
        locals_ = tuple(
            jnp.asarray(idx_sorted[cuts[b]:cuts[b + 1]] - bounds[b])
            for b in range(nb)
        )
        spans = [(int(bounds[b]), int(bounds[b + 1])) for b in range(nb)]

        if mode == "slice":
            def f(t, ixs):
                outs = [
                    jnp.take(jax.lax.slice_in_dim(t, lo, hi), ix, axis=0)
                    for (lo, hi), ix in zip(spans, ixs)
                ]
                return jnp.concatenate(outs, axis=0)

            jf = jax.jit(f)
            t = timeit(jf, table, locals_, reps=3)
        else:  # pre-split args
            subs = tuple(
                jnp.asarray(table_np[lo:hi], jnp.bfloat16) for lo, hi in spans
            )

            def f(ts, ixs):
                outs = [jnp.take(s, ix, axis=0) for s, ix in zip(ts, ixs)]
                return jnp.concatenate(outs, axis=0)

            jf = jax.jit(f)
            t = timeit(jf, subs, locals_, reps=3)
        return {"ms": round(t * 1e3, 2), "Mrows_s": round(N_IDX / t / 1e6, 1)}

    measure("slice8", lambda: run_buckets(8, "slice"))
    measure("split8", lambda: run_buckets(8, "split"))
    measure("slice4", lambda: run_buckets(4, "slice"))
    save()
    log("done")


if __name__ == "__main__":
    main()
