"""One measured attack on the 9.5 ns/row gather descriptor floor (r4 #3).

Every single-chip forward variant is bounded by XLA's arbitrary-row gather
rate from the big user table: ~9.5 ns/row (~105M rows/s) regardless of
dtype, sortedness, or row width (scripts/microbench_results*.json) — ~8-13%
of the chip's HBM byte rate at dim 80-128. Round 3 rejected every
REFORMULATION (one-hot MXU gather: 44 TFLOP/pass; src-bucketed sub-table
gathers: lost end-to-end). The one unexplored mechanism is bypassing XLA's
gather lowering entirely: a Pallas kernel that issues an explicit per-row
async DMA (HBM -> VMEM output block) per gathered row, with the row indices
pipeline-staged into SMEM and K copies in flight — if the descriptor floor
is a LATENCY artifact, deep DMA pipelining moves it; if it is an issue-
throughput limit of the memory system, this measures the wall one level
deeper than XLA.

Measures, on a [1.64M, 128] bf16 table with 10.16M arbitrary indices
(cosmetics-scale to_items shape; 128 lanes = one native tile row):
  1. XLA take()                      (the 9.5 ns/row baseline)
  2. Pallas per-row DMA, K in flight (K = 4, 8, 16)
  3. same, 2 rows per DMA pair-packed when indices allow? -- no: arbitrary
     indices cannot be merged; variant 3 instead doubles the chunk size to
     check SMEM index staging is not the limiter.

Run (real chip; first compile of each K is a remote Mosaic build, cached):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_gather_probe.py
Writes scripts/pallas_gather_probe.json.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 1_639_358
N_GATHER = 10_157_407
D = 128


@functools.partial(
    jax.jit, static_argnames=("k_inflight", "chunk", "interpret")
)
def pallas_row_dma_gather(table, idx, *, k_inflight=8, chunk=1024,
                          interpret=False):
    """out[j] = table[idx[j]] via explicit per-row async DMAs.

    HARD HARDWARE FACT discovered on the first compile attempt: Mosaic
    cannot DMA-slice less than one sublane tile from an HBM ref — a 1-row
    slice of a [N, 128] array fails with "Slice shape along dimension 0
    must be aligned to tiling (8)". The minimum addressable unit per
    arbitrary row is therefore one (8, 128) f32 tile = 4 KB, so the table
    here is [N, 8, 128] (each row = exactly one tile) and every DMA moves
    4 KB regardless of the logical row width. The kernel keeps
    ``k_inflight`` row DMAs outstanding into distinct rows of the VMEM
    output block (distinct semaphores) so per-DMA issue latency overlaps.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = idx.shape[0]
    n_chunks = n // chunk
    assert n_chunks * chunk == n

    def kernel(idx_ref, table_ref, out_ref, sems):
        def dma(j, slot):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[j]], out_ref.at[j], sems.at[slot]
            )

        # Warm the pipeline with the first K copies.
        for j in range(k_inflight):
            dma(j, j).start()

        def body(j, _):
            @pl.when(j + k_inflight < chunk)
            def _():
                dma(j + k_inflight, jax.lax.rem(j + k_inflight, k_inflight)
                    ).start()

            dma(j, jax.lax.rem(j, k_inflight)).wait()
            return _

        jax.lax.fori_loop(0, chunk, body, None)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((chunk, 8, 128), lambda c: (c, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((k_inflight,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), table.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(idx, table)


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[-1].astype(jnp.float32)))  # tunnel-reliable barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        float(jnp.sum(out[-1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", flush=True)
    if on_tpu:
        n_rows, n_gather = N_ROWS, N_GATHER - (N_GATHER % 2048)
        n_rows_t, n_gather_t = 512 * 1024, 1024 * 1024  # tile-row phase (out 4.1 GB; 2x transient in timeit + 2.1 GB table must fit 16 GB)
    else:  # CPU correctness mode
        n_rows, n_gather = 4096, 8192
        n_rows_t, n_gather_t = 1024, 4096
    # Generate ON DEVICE: uploading a 420 MB host table through the ~12 MB/s
    # tunnel would take ~35 min before the first measurement.
    table = jax.jit(
        lambda k: jax.random.normal(k, (n_rows, D), jnp.bfloat16)
    )(jax.random.key(0))
    idx = jax.jit(
        lambda k: jax.random.randint(k, (n_gather,), 0, n_rows, jnp.int32)
    )(jax.random.key(1))
    jax.block_until_ready((table, idx))

    results = {"n_rows": n_rows, "n_gather": n_gather, "dim": D}

    # --- phase A: production-shaped baseline ([N, 128] bf16 rows) ---
    take = jax.jit(lambda t, ix: jnp.take(t, ix, axis=0))
    t_take = timeit(take, table, idx)
    results["xla_take_bf16_128"] = {
        "s": t_take, "ns_per_row": 1e9 * t_take / n_gather,
        "GBps": n_gather * D * 2 / t_take / 1e9,
    }
    print(f"XLA take [N,128]bf16: {t_take*1e3:.1f} ms = "
          f"{results['xla_take_bf16_128']['ns_per_row']:.2f} ns/row",
          flush=True)
    del table, idx

    # --- phase B: tile-row table ([N, 8, 128] f32 — one (8,128) tile per
    # row, the minimum HBM unit an explicit DMA can address) ---
    table_t = jax.jit(
        lambda k: jax.random.normal(k, (n_rows_t, 8, 128), jnp.float32)
    )(jax.random.key(2))
    idx_t = jax.jit(
        lambda k: jax.random.randint(k, (n_gather_t,), 0, n_rows_t, jnp.int32)
    )(jax.random.key(3))
    jax.block_until_ready((table_t, idx_t))

    take3 = jax.jit(lambda t, ix: jnp.take(t, ix, axis=0))
    t_take3 = timeit(take3, table_t, idx_t)
    results["xla_take_tile_rows"] = {
        "s": t_take3, "ns_per_row": 1e9 * t_take3 / n_gather_t,
        "GBps": n_gather_t * 4096 / t_take3 / 1e9,
    }
    print(
        f"XLA take [N,8,128]f32 (4KB rows): {t_take3*1e3:.1f} ms = "
        f"{results['xla_take_tile_rows']['ns_per_row']:.2f} ns/row "
        f"({results['xla_take_tile_rows']['GBps']:.0f} GB/s)",
        flush=True,
    )

    # Correctness first (small slice, interpret off-TPU).
    small_idx = idx_t[:1024]
    want = np.asarray(take3(table_t, small_idx))
    got = np.asarray(
        pallas_row_dma_gather(
            table_t, small_idx, k_inflight=4, chunk=1024, interpret=not on_tpu
        )
    )
    np.testing.assert_array_equal(got, want)
    print("per-row DMA kernel: correctness OK", flush=True)

    for k in (4, 8, 16):
        for chunk in ((1024, 2048) if k == 8 else (1024,)):
            try:
                t0 = time.perf_counter()
                t = timeit(
                    lambda tb, ix: pallas_row_dma_gather(
                        tb, ix, k_inflight=k, chunk=chunk,
                        interpret=not on_tpu,
                    ),
                    table_t, idx_t,
                )
                label = f"pallas_dma_k{k}_c{chunk}"
                results[label] = {
                    "s": t, "ns_per_row": 1e9 * t / n_gather_t,
                    "GBps": n_gather_t * 4096 / t / 1e9,
                    "first_call_s": round(time.perf_counter() - t0, 1),
                }
                print(
                    f"{label}: {t*1e3:.1f} ms = "
                    f"{results[label]['ns_per_row']:.2f} ns/row "
                    f"({t_take3 / t:.2f}x vs take on the same table)",
                    flush=True,
                )
            except Exception as e:
                results[f"pallas_dma_k{k}_c{chunk}"] = {
                    "error": f"{type(e).__name__}: {e}"
                }
                print(f"k={k} c={chunk} FAILED: {type(e).__name__}: {e}",
                      flush=True)

    results["analysis"] = (
        "Mosaic's minimum HBM-addressable unit per arbitrary row is one "
        "(8,128) f32 tile = 4 KB ('Slice shape along dimension 0 must be "
        "aligned to tiling (8)'), so a per-row-DMA gather of dim-80/90 "
        "rows (320-360 B) would move ~11-12x the bytes AND need an 8x "
        "tile-padded table (6.7 GB for the user table — does not fit next "
        "to the 6 GB B_ii). Beating the descriptor floor therefore "
        "requires BOTH a per-tile DMA issue rate above ~105 M/s and a "
        "byte budget 11x the XLA gather's; the numbers above measure the "
        "issue-rate leg directly."
    )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pallas_gather_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"-> {out}", flush=True)


if __name__ == "__main__":
    main()
