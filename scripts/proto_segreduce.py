"""Prototype: Pallas segment-reduce kernel (one-hot MXU) + lane-gather probe.

Validates on the real chip:
1. correctness of the chunked one-hot segment-reduce vs segment_sum,
2. full-scale to_items/to_users timing (XLA gather + pallas reduce) vs the
   shipped take+segment_sum pair,
3. whether Mosaic can lower an in-kernel VMEM lane gather (take_along_axis).
"""
from __future__ import annotations

import functools
import gc
import json
import sys
import time

import numpy as np

E = 10_157_407
NU = 1_639_358
NI = 54_571
D = 80
RESULTS = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def rec(name, val):
    RESULTS[name] = val
    log(f"{name}: {val}")
    with open("scripts/proto_segreduce_results.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)


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


# --------------------------------------------------------------------------
# Planner: pad each output tile's (dst-sorted) arc range to CH multiples.
# --------------------------------------------------------------------------


def build_plan(src, dst_sorted, w, n_out, OT, CH):
    n_tiles = -(-n_out // OT)
    lo = np.searchsorted(dst_sorted, np.arange(n_tiles) * OT)
    hi = np.searchsorted(dst_sorted, (np.arange(n_tiles) + 1) * OT)
    cnt = hi - lo
    chunks = np.maximum(1, -(-cnt // CH))
    padded = chunks * CH
    starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
    E_pad = int(padded.sum())
    gidx = np.zeros(E_pad, np.int32)
    gw = np.zeros(E_pad, np.float32)
    seg = np.zeros(E_pad, np.int32)
    # vectorized fill: positions of real arcs inside the padded layout
    take_pos = np.repeat(starts, cnt) + (
        np.arange(int(cnt.sum())) - np.repeat(np.cumsum(np.append(0, cnt[:-1])), cnt)
    )
    order_src = np.concatenate(
        [np.arange(lo[t], hi[t]) for t in range(n_tiles)]
    ) if False else np.arange(len(dst_sorted))  # dst_sorted is globally sorted => concat == identity
    gidx[take_pos] = src
    gw[take_pos] = w
    seg[take_pos] = dst_sorted - np.repeat(np.arange(n_tiles) * OT, cnt)
    tile_map = np.repeat(np.arange(n_tiles, dtype=np.int32), chunks)
    first = np.zeros(len(tile_map), np.int32)
    first[np.concatenate([[0], np.cumsum(chunks)[:-1]])] = 1
    return dict(
        gidx=gidx, gw=gw, seg=seg, tile_map=tile_map, first=first,
        n_tiles=int(n_tiles), E_pad=E_pad, n_chunks=len(tile_map),
        pad_ratio=E_pad / max(len(src), 1),
    )


def make_seg_reduce(OT, CH, D, n_tiles, n_chunks, msgs_dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C8 = CH // 8  # seg ids live as [n_chunks, 8, C8] to satisfy tile rules

    def kernel(tile_map_ref, first_ref, seg_ref, msgs_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(first_ref[c] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rows = jax.lax.broadcasted_iota(jnp.int32, (OT, C8), 0)
        acc = jnp.zeros((OT, D), jnp.float32)
        for r in range(8):
            seg_r = seg_ref[0, r, :]
            oh = (rows == seg_r[None, :]).astype(msgs_dtype)
            acc += jnp.dot(
                oh, msgs_ref[r * C8 : (r + 1) * C8, :],
                preferred_element_type=jnp.float32,
            )
        out_ref[:] += acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, C8), lambda c, tm, fr: (c, 0, 0)),
            pl.BlockSpec((CH, D), lambda c, tm, fr: (c, 0)),
        ],
        out_specs=pl.BlockSpec((OT, D), lambda c, tm, fr: (tm[c], 0)),
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * OT, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return f


def main():
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()} {jax.devices()}")
    rng = np.random.default_rng(0)

    def test(name, fn):
        try:
            t0 = time.perf_counter()
            fn()
            log(f"  [{name} incl compile: {time.perf_counter()-t0:.0f}s]")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}")
            RESULTS[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        gc.collect()
        jax.clear_caches()
        gc.collect()

    # ---------- 1. small correctness ----------
    def t_correct():
        n_out, n_in, e = 1000, 500, 20000
        OT, CH = 128, 256
        dst = np.sort(rng.integers(0, n_out, e).astype(np.int32))
        src = rng.integers(0, n_in, e).astype(np.int32)
        w = rng.random(e).astype(np.float32)
        plan = build_plan(src, dst, w, n_out, OT, CH)
        T = rng.standard_normal((n_in, D)).astype(np.float32)
        ref = np.zeros((n_out, D), np.float32)
        np.add.at(ref, dst, T[src] * w[:, None])

        Tj = jnp.asarray(T)
        f = make_seg_reduce(OT, CH, D, plan["n_tiles"], plan["n_chunks"], jnp.float32)

        @jax.jit
        def run(Tj, gidx, gw, seg, tm, fr):
            msgs = jnp.take(Tj, gidx, axis=0) * gw[:, None]
            return f(tm, fr, seg.reshape(-1, 8, CH // 8), msgs)[:n_out]

        out = np.asarray(
            run(
                Tj,
                jnp.asarray(plan["gidx"]),
                jnp.asarray(plan["gw"]),
                jnp.asarray(plan["seg"]),
                jnp.asarray(plan["tile_map"]),
                jnp.asarray(plan["first"]),
            )
        )
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        rec("correct_small_relerr_f32", float(err))
        assert err < 1e-5, err
    test("correct_small", t_correct)

    # ---------- 2. full-scale to_items: gather + pallas reduce ----------
    item_deg_src = np.sort(rng.integers(0, NI, E).astype(np.int32))  # zipf-free uniform; close enough for timing
    src_rand = rng.integers(0, NU, E).astype(np.int32)
    w = rng.random(E).astype(np.float32)

    def t_to_items(msgs_dtype, tag, OT=512, CH=2048):
        def f():
            plan = build_plan(src_rand, item_deg_src, w, NI, OT, CH)
            rec(f"to_items_{tag}_pad_ratio", round(plan["pad_ratio"], 3))
            T = jax.random.normal(jax.random.key(0), (NU, D), jnp.float32)
            kr = make_seg_reduce(OT, CH, D, plan["n_tiles"], plan["n_chunks"], msgs_dtype)
            gidx = jnp.asarray(plan["gidx"])
            gw = jnp.asarray(plan["gw"])
            seg = jnp.asarray(plan["seg"].reshape(-1, 8, CH // 8))
            tm = jnp.asarray(plan["tile_map"])
            fr = jnp.asarray(plan["first"])

            @jax.jit
            def run(T_, gidx_, gw_, seg_, tm_, fr_):
                msgs = (jnp.take(T_, gidx_, axis=0) * gw_[:, None]).astype(msgs_dtype)
                return kr(tm_, fr_, seg_, msgs)[:NI]

            dt = timeit(run, T, gidx, gw, seg, tm, fr)
            rec(f"to_items_{tag}_ms", round(dt * 1e3, 2))
        return f
    test("to_items_pallas_bf16", t_to_items(jnp.bfloat16, "pl_bf16"))
    test("to_items_pallas_f32", t_to_items(jnp.float32, "pl_f32"))

    # ---------- 3. full-scale to_users: gather small + pallas reduce ----------
    user_dst = np.sort(src_rand)  # users as sorted destinations
    item_src = rng.integers(0, NI, E).astype(np.int32)

    def t_to_users(msgs_dtype, tag, OT=512, CH=2048):
        def f():
            plan = build_plan(item_src, user_dst, w, NU, OT, CH)
            rec(f"to_users_{tag}_pad_ratio", round(plan["pad_ratio"], 3))
            T = jax.random.normal(jax.random.key(0), (NI, D), jnp.float32)
            kr = make_seg_reduce(OT, CH, D, plan["n_tiles"], plan["n_chunks"], msgs_dtype)
            gidx = jnp.asarray(plan["gidx"])
            gw = jnp.asarray(plan["gw"])
            seg = jnp.asarray(plan["seg"].reshape(-1, 8, CH // 8))
            tm = jnp.asarray(plan["tile_map"])
            fr = jnp.asarray(plan["first"])

            @jax.jit
            def run(T_, gidx_, gw_, seg_, tm_, fr_):
                msgs = (jnp.take(T_, gidx_, axis=0) * gw_[:, None]).astype(msgs_dtype)
                return kr(tm_, fr_, seg_, msgs)[:NU]

            dt = timeit(run, T, gidx, gw, seg, tm, fr)
            rec(f"to_users_{tag}_ms", round(dt * 1e3, 2))
        return f
    test("to_users_pallas_bf16", t_to_users(jnp.bfloat16, "pl_bf16"))
    test("to_users_pallas_bf16_ch1024", t_to_users(jnp.bfloat16, "pl_bf16_ch1024", CH=1024))

    log("DONE")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
