"""Why the to_items tail gather runs ~12.5 ns/row vs the ~9.5-9.9 measured
in rounds 2-3 (round-4 roofline: 98.9 ms vs a 75 ms descriptor floor).

Hypothesis: the gather engine's per-row rate is LOCALITY-dependent — hot
(frequently repeated) rows hit on-chip caching. The dense heavy-user head
removes exactly the top-16K most-repeated rows from the sparse plan, so the
remaining tail is colder per row than the full arc stream the 9.5-9.9
ns/row figures were measured on. Test: gather the SAME row count from the
same [1.64M, 80] bf16 table with (a) uniform-random indices, (b) zipf-0.75
indices (the full arc distribution — hot head present), (c) the same zipf
stream with the top-16K hottest rows REMOVED (the tail the plans actually
gather), (d) tail sorted.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/gather_locality_probe.py
Writes scripts/gather_locality_probe.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 1_639_358
N_IDX = 8_000_000
D = 80


def timeit(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[-1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        float(jnp.sum(out[-1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)
    # Zipf-ish over ranks (bench.skewed_ids shape, a=0.75 like the corpus).
    ranks = np.arange(1, N_ROWS + 1, dtype=np.float64)
    probs = ranks ** -0.75
    cdf = np.cumsum(probs)
    cdf /= cdf[-1]
    zipf = np.searchsorted(cdf, rng.random(int(N_IDX * 1.6))).astype(np.int64)
    zipf = np.clip(zipf, 0, N_ROWS - 1)
    # Tail = zipf stream with the 16384 hottest rows removed (what the
    # sparse plans gather once the heavy head takes the head rows).
    counts = np.bincount(zipf, minlength=N_ROWS)
    hot = np.argpartition(-counts, 16384)[:16384]
    hot_mask = np.zeros(N_ROWS, bool)
    hot_mask[hot] = True
    tail = zipf[~hot_mask[zipf]][:N_IDX]
    zipf = zipf[:N_IDX]
    uniform = rng.integers(0, N_ROWS, N_IDX)
    idx_sets = {
        "uniform": uniform,
        "zipf_full(hot head present)": zipf,
        "zipf_tail(top16K removed)": tail,
        "zipf_tail_sorted": np.sort(tail),
    }
    head_share = float(counts[hot].sum() / counts.sum())
    print(f"hot-16K share of the zipf stream: {head_share:.3f}", flush=True)

    table = jax.jit(
        lambda k: jax.random.normal(k, (N_ROWS, D), jnp.bfloat16)
    )(jax.random.key(0))
    jax.block_until_ready(table)

    take = jax.jit(lambda t, ix: jnp.take(t, ix, axis=0))
    results = {"n_rows": N_ROWS, "n_idx": N_IDX, "dim": D,
               "hot16k_share_of_zipf_stream": round(head_share, 4)}
    for name, ids in idx_sets.items():
        # The tail survivor pool shrinks with steeper zipf exponents; always
        # divide by the ACTUAL gathered count.
        assert len(ids) >= N_IDX // 2, (name, len(ids))
        dev = jnp.asarray(ids, jnp.int32)  # ~32 MB upload each
        jax.block_until_ready(dev)
        t = timeit(take, table, dev)
        results[name] = {"s": t, "n": int(len(ids)),
                         "ns_per_row": round(1e9 * t / len(ids), 2)}
        print(f"{name}: {t*1e3:.1f} ms = {results[name]['ns_per_row']} ns/row",
              flush=True)
        del dev

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "gather_locality_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"-> {out}", flush=True)


if __name__ == "__main__":
    main()
