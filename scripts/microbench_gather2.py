"""Microbench part 2: reduce-side + pallas probes (part 1 OOM'd after d256).

Aggressive cleanup between tests: delete arrays, clear jit caches.
"""
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
    with open("scripts/microbench_results2.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)


def cleanup():
    import jax

    gc.collect()
    jax.clear_caches()
    gc.collect()


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()} {jax.devices()}")
    rng = np.random.default_rng(0)
    src_rand_np = rng.integers(0, NU, E).astype(np.int32)
    item_rand_np = rng.integers(0, NI, E).astype(np.int32)
    item_sorted_np = np.sort(item_rand_np)
    w_np = rng.random(E).astype(np.float32)

    key = jax.random.key(0)

    def test(name, fn):
        try:
            t0 = time.perf_counter()
            fn()
            log(f"  [{name} incl compile: {time.perf_counter()-t0:.0f}s]")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            RESULTS[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        cleanup()

    # --- to_items exactly as shipped ---
    def t_to_items():
        U80 = jax.random.normal(key, (NU, 80), jnp.float32)
        src = jnp.asarray(src_rand_np)
        dst = jnp.asarray(item_sorted_np)
        w = jnp.asarray(w_np)
        f = jax.jit(
            lambda t, s, d, w_: jax.ops.segment_sum(
                jnp.take(t, s, axis=0) * w_[:, None], d,
                num_segments=NI, indices_are_sorted=True,
            )
        )
        record("to_items_like", timeit(f, U80, src, dst, w))
    test("to_items_like", t_to_items)

    # --- segment_sum alone, sorted item segments ---
    def t_segsum():
        M = jax.random.normal(key, (E, 80), jnp.float32)
        dst = jnp.asarray(item_sorted_np)
        f = jax.jit(
            lambda m, d: jax.ops.segment_sum(
                m, d, num_segments=NI, indices_are_sorted=True
            )
        )
        record("segsum_sorted_items", timeit(f, M, dst))
    test("segsum_sorted_items", t_segsum)

    # --- segment_sum sorted into USERS (1.64M segments) ---
    def t_segsum_u():
        M = jax.random.normal(key, (E, 80), jnp.float32)
        dst = jnp.asarray(np.sort(src_rand_np))
        f = jax.jit(
            lambda m, d: jax.ops.segment_sum(
                m, d, num_segments=NU, indices_are_sorted=True
            )
        )
        record("segsum_sorted_users", timeit(f, M, dst))
    test("segsum_sorted_users", t_segsum_u)

    # --- random scatter-add into small table ---
    def t_scat_small():
        M = jax.random.normal(key, (E, 80), jnp.float32)
        dst = jnp.asarray(item_rand_np)
        f = jax.jit(lambda m, d: jnp.zeros((NI, 80), jnp.float32).at[d].add(m))
        record("scatter_rand_small", timeit(f, M, dst))
    test("scatter_rand_small", t_scat_small)

    # --- XLA lane-major take: table [80, NI] bf16, gather along axis=1 ---
    def t_lane_xla():
        Tt = jax.random.normal(key, (80, NI), jnp.bfloat16)
        idx = jnp.asarray(item_rand_np)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
        record("lane_gather_xla_small_bf16", timeit(f, Tt, idx))
    test("lane_gather_xla_small_bf16", t_lane_xla)

    # --- pallas lane-dim dynamic gather ---
    def t_pallas_lane():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TILE = 4096
        n_tiles = E // TILE

        def kernel(idx_ref, tab_ref, out_ref):
            idx = idx_ref[:]                       # [8, TILE//8] int32 layout
            tab = tab_ref[:]                       # [80, NI] bf16
            ib = jnp.broadcast_to(idx.reshape(1, TILE), (80, TILE))
            out_ref[:] = jnp.take_along_axis(tab, ib, axis=1)

        f = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((8, TILE // 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((80, NI), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((80, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((80, n_tiles * TILE), jnp.bfloat16),
        )
        jf = jax.jit(f)
        idx2d = jnp.asarray(item_rand_np[: n_tiles * TILE].reshape(n_tiles * 8, TILE // 8))
        tab = jax.random.normal(key, (80, NI), jnp.bfloat16)
        record("pallas_lane_gather_small", timeit(jf, idx2d, tab), rows=n_tiles * TILE)
    test("pallas_lane_gather_small", t_pallas_lane)

    # --- one-hot MXU expand rate (chunk width 128) ---
    def t_onehot():
        C, T = 128, 512
        n_tiles = E // T
        loc = jnp.asarray(rng.integers(0, C, (n_tiles, T)).astype(np.int32))
        chunks = jax.random.normal(key, (n_tiles, C, 80), jnp.bfloat16)

        def f(loc_, chunks_):
            oh = (loc_[:, :, None] == jnp.arange(C)[None, None, :]).astype(jnp.bfloat16)
            return jnp.einsum(
                "tec,tcd->ted", oh, chunks_, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)

        jf = jax.jit(f)
        record("onehot_expand_c128", timeit(jf, loc, chunks), rows=n_tiles * T)
    test("onehot_expand_c128", t_onehot)

    # --- gather big table with output cast to bf16 (half the write traffic) ---
    def t_gather_out_bf16():
        U80 = jax.random.normal(key, (NU, 80), jnp.float32)
        src = jnp.asarray(src_rand_np)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).astype(jnp.bfloat16))
        record("gather_rand_big_f32_out_bf16", timeit(f, U80, src))
    test("gather_rand_big_f32_out_bf16", t_gather_out_bf16)

    # --- 2D ELL-style gather: index matrix [NI_pad, 192] over big table ---
    def t_ell():
        width = 192  # mean item degree ~186 at cosmetics scale
        idx = jnp.asarray(rng.integers(0, NU, (NI, width)).astype(np.int32))
        U80 = jax.random.normal(key, (NU, 80), jnp.float32)
        f = jax.jit(lambda t, i: jnp.take(t, i.reshape(-1), axis=0).reshape(NI, width, 80).sum(axis=1))
        record("ell_gather_sum_w192", timeit(f, U80, idx), rows=NI * width)
    test("ell_gather_sum_w192", t_ell)

    log("DONE")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
