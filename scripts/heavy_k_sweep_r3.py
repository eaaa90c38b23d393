"""Dense heavy-user head size sweep (memory/speed trade-off, on-chip).

K=16384 was adopted round 2 from a single comparison vs K=0. This measures
both SpMM directions at K in {0, 8192, 16384, 32768} on the bench-scale
graph WITHOUT the B_ii operator resident (plans only), so even the 3.5 GB
K=32768 head fits. Informs serving/HBM-constrained deployments: the head is
the only knob trading HBM for step time. Results:
scripts/heavy_k_sweep_r3.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/heavy_k_sweep_r3.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench  # reuse the bench corpus + timeit

    from gnn_ecommerce_tpu.ops.bipartite import (
        build_fast_ops, fast_to_items, fast_to_users, split_graph,
    )

    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)
    graph, _, _ = bench.build_synthetic_graph()
    split = split_graph(graph)
    del graph
    x_u = jnp.asarray(
        np.random.default_rng(0).standard_normal((split.n_users, 80)), jnp.float32
    )
    x_i = jnp.asarray(
        np.random.default_rng(1).standard_normal((split.n_items, 80)), jnp.float32
    )

    ti = jax.jit(lambda x, f: fast_to_items(x, f))
    tu = jax.jit(lambda x, f: fast_to_users(x, f))
    results = []
    for k in (0, 8192, 16384, 32768):
        t0 = time.perf_counter()
        fops = build_fast_ops(
            split, msgs_dtype="bfloat16",
            heavy_users=k, heavy_dtype="bfloat16" if k else "float32",
        )
        jax.block_until_ready(jax.tree.leaves(fops))
        build_s = time.perf_counter() - t0
        head_gb = 0.0 if fops.w_hi is None else fops.w_hi.nbytes / 1e9
        t_items = bench.timeit(lambda: ti(x_u, fops), reps=10)
        t_users = bench.timeit(lambda: tu(x_i, fops), reps=10)
        rec = {
            "K": k,
            "head_gb_bf16": round(head_gb, 2),
            "to_items_ms": round(t_items * 1e3, 1),
            "to_users_ms": round(t_users * 1e3, 1),
            "pair_ms": round((t_items + t_users) * 1e3, 1),
            "plan_build_s": round(build_s, 1),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
        del fops
    with open("/root/repo/scripts/heavy_k_sweep_r3.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
