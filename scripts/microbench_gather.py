"""Microbenchmark: gather/scatter/SpMM primitive rates on the real TPU chip.

Measures the primitives the LightGCN hot path is built from, to direct kernel
work (CLAUDE.md: random-row gather ~60M rows/s was the round-1 wall). Each
config is guarded; results stream to stderr and a JSON file.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_gather.py
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

E = 10_157_407       # arcs at cosmetics scale
NU = 1_639_358       # users
NI = 54_571          # items
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
    return (time.perf_counter() - t0) / reps


def record(name, seconds, rows=E):
    RESULTS[name] = {"ms": round(seconds * 1e3, 2), "Mrows_s": round(rows / seconds / 1e6, 1)}
    log(f"{name}: {seconds*1e3:.1f} ms -> {rows/seconds/1e6:.0f} M rows/s")
    with open("scripts/microbench_results.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)


def guarded(name):
    def deco(fn):
        def run(*a):
            try:
                t0 = time.perf_counter()
                fn(*a)
                log(f"  [{name} total incl compile: {time.perf_counter()-t0:.0f}s]")
            except Exception as e:
                log(f"{name}: FAILED {type(e).__name__}: {e}")
                RESULTS[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        return run
    return deco


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()} {jax.devices()}")
    rng = np.random.default_rng(0)
    src_rand = jnp.asarray(rng.integers(0, NU, E).astype(np.int32))
    src_sorted = jnp.asarray(np.sort(np.asarray(src_rand)))
    item_rand = jnp.asarray(rng.integers(0, NI, E).astype(np.int32))
    item_sorted = jnp.asarray(np.sort(np.asarray(item_rand)))
    w = jnp.asarray(rng.random(E, dtype=np.float32))

    key = jax.random.key(0)
    U80 = jax.random.normal(key, (NU, 80), jnp.float32)
    U80b = U80.astype(jnp.bfloat16)
    I80 = jax.random.normal(key, (NI, 80), jnp.float32)
    I80b = I80.astype(jnp.bfloat16)

    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))

    @guarded("gather_rand_big_f32d80")
    def t1():
        record("gather_rand_big_f32d80", timeit(take, U80, src_rand))
    t1()

    @guarded("gather_rand_big_bf16d80")
    def t2():
        record("gather_rand_big_bf16d80", timeit(take, U80b, src_rand))
    t2()

    @guarded("gather_sorted_big_f32d80")
    def t3():
        record("gather_sorted_big_f32d80", timeit(take, U80, src_sorted))
    t3()

    @guarded("gather_sorted_flagged_big_f32d80")
    def t4():
        g = jax.jit(
            lambda t, i: jax.lax.gather(
                t,
                i[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,),
                ),
                slice_sizes=(1, 80),
                indices_are_sorted=True,
                mode="clip",
            )
        )
        record("gather_sorted_flagged_big_f32d80", timeit(g, U80, src_sorted))
    t4()

    @guarded("gather_rand_small_f32d80")
    def t5():
        record("gather_rand_small_f32d80", timeit(take, I80, item_rand))
    t5()

    @guarded("gather_rand_small_bf16d80")
    def t6():
        record("gather_rand_small_bf16d80", timeit(take, I80b, item_rand))
    t6()

    # dim sweep on the big random gather
    for d in (8, 128, 256):
        @guarded(f"gather_rand_big_f32d{d}")
        def td(d=d):
            T = jax.random.normal(key, (NU, d), jnp.float32)
            record(f"gather_rand_big_f32d{d}", timeit(take, T, src_rand))
        td()

    # to_items as-shipped: gather big random + mul + sorted segsum
    @guarded("to_items_like")
    def t7():
        f = jax.jit(
            lambda t, s, d, w_: jax.ops.segment_sum(
                jnp.take(t, s, axis=0) * w_[:, None], d,
                num_segments=NI, indices_are_sorted=True,
            )
        )
        # arcs sorted by item: gather src random
        record("to_items_like", timeit(f, U80, src_rand, item_sorted, w))
    t7()

    # to_items alternative: messages bf16 gather, f32 segsum
    @guarded("to_items_bf16gather")
    def t8():
        f = jax.jit(
            lambda t, s, d, w_: jax.ops.segment_sum(
                jnp.take(t, s, axis=0).astype(jnp.float32) * w_[:, None], d,
                num_segments=NI, indices_are_sorted=True,
            )
        )
        record("to_items_bf16gather", timeit(f, U80b, src_rand, item_sorted, w))
    t8()

    # sorted-segment segsum alone (sequential reduce side)
    @guarded("segsum_sorted_items")
    def t9():
        M = jax.random.normal(key, (E, 80), jnp.float32)
        f = jax.jit(
            lambda m, d: jax.ops.segment_sum(
                m, d, num_segments=NI, indices_are_sorted=True
            )
        )
        record("segsum_sorted_items", timeit(f, M, item_sorted))
    t9()

    # random scatter-add rows into small table
    @guarded("scatter_rand_small")
    def t10():
        M = jax.random.normal(key, (E, 80), jnp.float32)
        f = jax.jit(
            lambda m, d: jnp.zeros((NI, 80), jnp.float32).at[d].add(m)
        )
        record("scatter_rand_small", timeit(f, M, item_rand))
    t10()

    # random scatter-add rows into big table
    @guarded("scatter_rand_big")
    def t11():
        M = jax.random.normal(key, (E, 80), jnp.float32)
        f = jax.jit(
            lambda m, d: jnp.zeros((NU, 80), jnp.float32).at[d].add(m)
        )
        record("scatter_rand_big", timeit(f, M, src_rand))
    t11()

    # XLA take_along_axis lane gather: table [80, NI] bf16, idx tiled
    @guarded("lane_gather_xla_small")
    def t12():
        Tt = I80b.T  # [80, NI]
        idx = item_rand.reshape(-1)  # [E]
        f = jax.jit(
            lambda t, i: jnp.take_along_axis(
                t[:, None, :], i[None, :, None].astype(jnp.int32) * jnp.ones((80, 1, 1), jnp.int32), axis=2
            )
        )
        # simpler: broadcast take along axis 1 of [80, NI] with idx [E]
        f2 = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
        record("lane_gather_xla_small", timeit(f2, Tt, idx))
    t12()

    # Pallas: lane-dim dynamic gather probe (take_along_axis inside kernel)
    @guarded("pallas_lane_gather_small")
    def t13():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TILE = 4096
        n_tiles = E // TILE  # drop remainder for the probe

        def kernel(idx_ref, tab_ref, out_ref):
            idx = idx_ref[:]                       # [1, TILE] int32
            tab = tab_ref[:]                       # [80, NI] bf16
            ib = jnp.broadcast_to(idx, (80, TILE))
            out_ref[:] = jnp.take_along_axis(tab, ib, axis=1)

        f = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((80, NI), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((80, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((80, n_tiles * TILE), jnp.bfloat16),
        )
        jf = jax.jit(lambda i, t: f(i, t))
        idx2d = item_rand[: n_tiles * TILE].reshape(1, -1)
        record(
            "pallas_lane_gather_small",
            timeit(jf, idx2d, I80b.T),
            rows=n_tiles * TILE,
        )
    t13()

    # One-hot MXU expand rate: user-sorted arcs, chunk width 128
    @guarded("onehot_expand_c128")
    def t14():
        C = 128
        # local indices within chunk for sorted srcs
        src_np = np.asarray(src_sorted)
        chunk_of = src_np // C
        # count arcs per chunk; pad each chunk's arcs to multiple of 512 is
        # complex — probe steady-state rate with a uniform synthetic layout:
        T = 512
        n_tiles = E // T
        loc = jnp.asarray(rng.integers(0, C, (n_tiles, T)).astype(np.int32))
        chunks = jax.random.normal(key, (n_tiles, C, 80), jnp.bfloat16)

        def f(loc_, chunks_):
            oh = (loc_[:, :, None] == jnp.arange(C)[None, None, :]).astype(jnp.bfloat16)
            return jnp.einsum(
                "tec,tcd->ted", oh, chunks_, preferred_element_type=jnp.float32
            )

        jf = jax.jit(f)
        record("onehot_expand_c128", timeit(jf, loc, chunks), rows=n_tiles * T)
    t14()

    log("DONE")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
