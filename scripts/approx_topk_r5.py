"""Measure `topk_impl="approx"` (jax.lax.approx_max_k — the TPU-native
partial-reduction top-k) against the exact blocked scorer at full scale.

The approx option has existed in ``ops/topk_score.py`` since round 2 but
was never measured on-chip (flagged as the last unmeasured knob in the
round-5 working notes). Protocol: the full_r5 best checkpoint's propagated
embeddings, the full val split (25,850 users, bucketed exactly as the
driver evaluates), each impl warmed then timed over 3 repetitions; quality
reported as the SAME Recall@20 the driver reports, so the speed/recall
trade is read off directly.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/approx_topk_r5.py
Writes scripts/approx_topk_r5.json (+ a PERFORMANCE.md paragraph manually).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CKPT = "/root/repo/model-checkpoints/full_r5"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    import jax.numpy as jnp
    import numpy as np

    from serve_scale_r3 import ensure_prepared

    from gnn_ecommerce_tpu.data.artifacts import load_prepared
    from gnn_ecommerce_tpu.eval import build_eval_buckets, evaluate_bucketed
    from gnn_ecommerce_tpu.graph.build import build_graph
    from gnn_ecommerce_tpu.models.lightgcn import LightGCNConfig, get_embedding
    from gnn_ecommerce_tpu.train.checkpoint import find_leaf, load_checkpoint

    prepared = load_prepared(ensure_prepared())
    leaves, meta = load_checkpoint(CKPT)
    hp = meta["hyperparams"]
    cfg = LightGCNConfig(
        num_nodes=prepared.n_users + prepared.n_items,
        embedding_dim=int(hp["latent_dim"]),
        num_layers=int(hp["n_layers"]),
    )
    params = {"embedding": jnp.asarray(find_leaf(leaves, meta, "embedding"))}
    graph = build_graph(
        prepared.edge_user, prepared.edge_item_node, prepared.edge_weight,
        prepared.n_users, prepared.n_items, items_offset=True,
    )
    t0 = time.perf_counter()
    emb = jax.jit(lambda p, g: get_embedding(p, g, cfg))(params, graph)
    emb.block_until_ready()
    print(f"propagated in {time.perf_counter()-t0:.1f}s", flush=True)

    buckets = build_eval_buckets(prepared.val, width_floor=256)
    results = {}
    for impl in ("exact", "approx", "tiled"):
        p, r = evaluate_bucketed(  # warm/compile
            emb, buckets, prepared.n_users, k=20, topk_impl=impl
        )
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            p, r = evaluate_bucketed(
                emb, buckets, prepared.n_users, k=20, topk_impl=impl
            )
            times.append(time.perf_counter() - t0)
        results[impl] = {
            "val_precision@20": round(p, 6),
            "val_recall@20": round(r, 6),
            "eval_s_best": round(min(times), 3),
            "eval_s_all": [round(t, 3) for t in times],
        }
        print(f"{impl}: R@20 {r:.6f} in {min(times):.3f}s", flush=True)

    ex, ap = results["exact"], results["approx"]
    out = {
        "benchmark": "approx_topk_r5",
        "setup": (
            f"full_r5 best checkpoint (dim {cfg.embedding_dim}, "
            f"{cfg.num_layers}L), full val split "
            f"({len(prepared.val.user_ids)} users, driver bucketing), "
            "single v5e chip; times are best-of-3 after a warm call "
            "(include ~15-25 ms/call tunnel readback)"
        ),
        "results": results,
        "recall_delta_approx_vs_exact": round(
            ap["val_recall@20"] - ex["val_recall@20"], 6
        ),
        "speedup_approx_vs_exact": round(
            ex["eval_s_best"] / ap["eval_s_best"], 2
        ),
    }
    with open("/root/repo/scripts/approx_topk_r5.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
