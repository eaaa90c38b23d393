"""Microbench part 3: ELL/lane-major candidates for the hot SpMM pair."""
from __future__ import annotations

import gc
import json
import sys
import time

import numpy as np

E = 10_157_407
NU = 1_639_358
NI = 54_571
RESULTS = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(f, *args, reps=4):
    import jax
    import jax.numpy as jnp

    pull = jax.jit(lambda o: jnp.sum(o[..., -1][:8]).astype(jnp.float32))
    out = f(*args)
    float(pull(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        float(pull(out))
    dt = (time.perf_counter() - t0) / reps
    del out
    return dt


def record(name, seconds, rows=E):
    RESULTS[name] = {"ms": round(seconds * 1e3, 2), "Mrows_s": round(rows / seconds / 1e6, 1)}
    log(f"{name}: {seconds*1e3:.1f} ms -> {rows/seconds/1e6:.0f} M rows/s")
    with open("scripts/microbench_results3.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()} {jax.devices()}")
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    def test(name, fn):
        try:
            t0 = time.perf_counter()
            fn()
            log(f"  [{name} incl compile: {time.perf_counter()-t0:.0f}s]")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            RESULTS[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        gc.collect()
        jax.clear_caches()
        gc.collect()

    # --- lane-major gather from BIG table (users), bf16 + f32 ---
    src_rand_np = rng.integers(0, NU, E).astype(np.int32)

    def t_lane_big(dt, tag):
        def f():
            Tt = jax.random.normal(key, (80, NU), dt)
            idx = jnp.asarray(src_rand_np)
            jf = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
            record(f"lane_gather_big_{tag}", timeit(jf, Tt, idx))
        return f
    test("lane_gather_big_bf16", t_lane_big(jnp.bfloat16, "bf16"))
    test("lane_gather_big_f32", t_lane_big(jnp.float32, "f32"))

    # --- lane-major gather small table f32 ---
    item_rand_np = rng.integers(0, NI, E).astype(np.int32)

    def t_lane_small_f32():
        Tt = jax.random.normal(key, (80, NI), jnp.float32)
        idx = jnp.asarray(item_rand_np)
        jf = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
        record("lane_gather_small_f32", timeit(jf, Tt, idx))
    test("lane_gather_small_f32", t_lane_small_f32)

    # --- realistic binned-ELL to_items: zipf item degrees, pow2-width bins ---
    # item degrees ~ zipf over NI summing to E
    ranks = np.arange(1, NI + 1, dtype=np.float64)
    p = ranks ** -1.0
    deg = np.maximum(1, (p / p.sum() * E).astype(np.int64))
    log(f"zipf degrees: max {deg.max()}, mean {deg.mean():.0f}, total {deg.sum()/1e6:.1f}M")

    def build_bins(deg):
        order = np.argsort(deg)
        bins = []
        lo = 0
        dsort = deg[order]
        for wexp in range(0, 32):
            W = 1 << wexp
            hi = int(np.searchsorted(dsort, W, side="right"))
            if hi > lo:
                bins.append((order[lo:hi], W))
                lo = hi
            if lo >= len(dsort):
                break
        return bins

    bins = build_bins(deg)
    padded = sum(len(rows) * W for rows, W in bins)
    log(f"bins: {[(len(r), W) for r, W in bins]}, padded {padded/1e6:.1f}M ({padded/deg.sum():.2f}x)")

    def t_ell_binned(dt, tag, table_n=NU):
        def f():
            T = jax.random.normal(key, (table_n, 80), dt)
            idx_bins = [
                jnp.asarray(rng.integers(0, table_n, (len(rows), W)).astype(np.int32))
                for rows, W in bins
            ]
            w_bins = [
                jnp.asarray(rng.random((len(rows), W)).astype(np.float32))
                for rows, W in bins
            ]

            def run(T_, *flat):
                n = len(flat) // 2
                outs = []
                for i in range(n):
                    ib, wb = flat[i], flat[n + i]
                    g = jnp.take(T_, ib.reshape(-1), axis=0).reshape(*ib.shape, 80)
                    outs.append(
                        (g.astype(jnp.float32) * wb[..., None]).sum(axis=1)
                    )
                return jnp.concatenate(outs, axis=0)

            jf = jax.jit(run)
            record(
                f"ell_binned_{tag}",
                timeit(jf, T, *idx_bins, *w_bins),
                rows=padded,
            )
        return f
    test("ell_binned_rowmajor_f32_bigtable", t_ell_binned(jnp.float32, "rowmajor_f32_bigtable"))
    test("ell_binned_rowmajor_bf16_bigtable", t_ell_binned(jnp.bfloat16, "rowmajor_bf16_bigtable"))

    # --- user-side binned ELL (to_users bwd): small table, user degrees zipf a=0.75 ---
    ranksu = np.arange(1, NU + 1, dtype=np.float64)
    pu = ranksu ** -0.75
    degu = np.maximum(1, (pu / pu.sum() * E).astype(np.int64))
    binsu = build_bins(degu)
    paddedu = sum(len(rows) * W for rows, W in binsu)
    log(f"user bins: {[(len(r), W) for r, W in binsu]}, padded {paddedu/1e6:.1f}M ({paddedu/degu.sum():.2f}x)")

    def t_ell_users(dt, tag):
        def f():
            T = jax.random.normal(key, (NI, 80), dt)
            idx_bins = [
                jnp.asarray(rng.integers(0, NI, (len(rows), W)).astype(np.int32))
                for rows, W in binsu
            ]
            w_bins = [
                jnp.asarray(rng.random((len(rows), W)).astype(np.float32))
                for rows, W in binsu
            ]

            def run(T_, *flat):
                n = len(flat) // 2
                outs = []
                for i in range(n):
                    ib, wb = flat[i], flat[n + i]
                    g = jnp.take(T_, ib.reshape(-1), axis=0).reshape(*ib.shape, 80)
                    outs.append((g.astype(jnp.float32) * wb[..., None]).sum(axis=1))
                return jnp.concatenate(outs, axis=0)

            jf = jax.jit(run)
            record(f"ell_users_{tag}", timeit(jf, T, *idx_bins, *w_bins), rows=paddedu)
        return f
    test("ell_users_f32_smalltable", t_ell_users(jnp.float32, "f32_smalltable"))

    log("DONE")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
