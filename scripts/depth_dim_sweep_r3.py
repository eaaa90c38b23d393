"""Depth/dim sensitivity of the bipartite-factorized forward (on-chip).

The fast path's sparse work is DEPTH-INDEPENDENT (2 SpMMs total; extra
layers add one ~10 ms B_ii MXU stream each), while the reference-shaped
layered path scales linearly in L. This measures the fast forward at the
tunable corners the reference ships (layers {4,5}, dim {80,90} —
src/train_lightgcn.py:47-53 uses dim 90, 5 layers as-shipped) plus the
layered path at both depths for contrast. Results:
scripts/depth_dim_sweep_r3.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/depth_dim_sweep_r3.py
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

    import bench  # bench corpus + timeit

    from gnn_ecommerce_tpu.models import LightGCNConfig, get_embedding, init_params
    from gnn_ecommerce_tpu.ops.bipartite import (
        FastBipartite, build_fast_ops, build_item_operator, fast_get_embedding,
        split_graph,
    )
    from gnn_ecommerce_tpu.ops.propagate import propagate_segment_chunked

    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)
    graph, _, _ = bench.build_synthetic_graph()
    num_nodes = graph.num_nodes

    results = {"layered": [], "fast": []}
    # Layered contrast at dim 80 for both depths.
    for layers in (4, 5):
        cfg = LightGCNConfig(num_nodes=num_nodes, embedding_dim=80, num_layers=layers)
        params = init_params(jax.random.key(0), cfg)
        f2 = jax.jit(
            lambda p, g, c=cfg: get_embedding(
                p, g, c, lambda g_, x: propagate_segment_chunked(g_, x, 8)
            )
        )
        t = bench.timeit(lambda: f2(params, graph), reps=2)
        rec = {"layers": layers, "dim": 80, "ms": round(t * 1e3, 1)}
        print("layered", json.dumps(rec), flush=True)
        results["layered"].append(rec)
        del params, f2

    split = split_graph(graph)
    del graph
    jax.clear_caches()
    fops = build_fast_ops(
        split, msgs_dtype="bfloat16", heavy_users=16384, heavy_dtype="bfloat16"
    )
    fb = FastBipartite(
        split=split,
        item_op=build_item_operator(split, dtype=jnp.bfloat16, band_bytes=1.5e9),
        fops=fops,
    )
    jax.block_until_ready(fb.item_op)
    for dim in (80, 90):
        cfg = LightGCNConfig(num_nodes=num_nodes, embedding_dim=dim, num_layers=4)
        params = init_params(jax.random.key(0), cfg)
        for layers in (4, 5):
            f2 = jax.jit(lambda p, fb_, L=layers: fast_get_embedding(p, fb_, L))
            t = bench.timeit(lambda: f2(params, fb), reps=10)
            rec = {"layers": layers, "dim": dim, "ms": round(t * 1e3, 1)}
            print("fast", json.dumps(rec), flush=True)
            results["fast"].append(rec)
        del params
    with open("/root/repo/scripts/depth_dim_sweep_r3.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
