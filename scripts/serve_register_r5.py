"""Drive the serving management API at FULL scale on the real chip:
register a second checkpoint version (propagate + warm-before-swap),
atomic default flip, rollback, unregister — measuring each phase and
verifying predictions swap and restore exactly.

This exercises the round-5 warm-before-swap and bounded-registry code at
production scale (the unit tests run it at toy scale on CPU).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_register_r5.py
Writes scripts/serve_register_r5.json.
"""
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serve_scale_r3 import ensure_prepared  # noqa: E402

CKPT = "/root/repo/model-checkpoints/full_r5"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    from gnn_ecommerce_tpu.serve import (
        BatchingRecommender,
        RecommenderService,
        make_server,
    )

    data_dir = ensure_prepared()
    t0 = time.perf_counter()
    svc = RecommenderService.from_artifacts(data_dir, CKPT)  # BEST
    load_s = time.perf_counter() - t0
    n_users = svc.prepared.n_users
    server = make_server(BatchingRecommender(svc), port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def call(method, path, body=None):
        req = urllib.request.Request(
            f"{base}{path}",
            data=None if body is None else json.dumps(body).encode(),
            method=method,
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.load(r)

    rng = np.random.default_rng(3)
    users = [int(u) for u in rng.integers(0, n_users, 64)]
    rec_best = call("POST", "/v1/models/lightgcn_recommender:predict", users)[
        "items"
    ]

    # Register LAST (epoch 19 weights — different from BEST epoch 14).
    t0 = time.perf_counter()
    out = call(
        "POST", "/v1/models/lightgcn_recommender:register",
        {"checkpoint_dir": CKPT, "checkpoint_name": "LightGCN_last"},
    )
    register_s = time.perf_counter() - t0
    vid = out["version"]

    # Predictions swapped (different weights), request path stays warm:
    t0 = time.perf_counter()
    rec_last = call("POST", "/v1/models/lightgcn_recommender:predict", users)[
        "items"
    ]
    first_req_after_swap_s = time.perf_counter() - t0
    assert rec_last != rec_best, "LAST and BEST gave identical top-20s?"

    # Rollback restores EXACTLY.
    call("PUT", "/v1/models/lightgcn_recommender/1/set-default")
    t0 = time.perf_counter()
    rec_back = call("POST", "/v1/models/lightgcn_recommender:predict", users)[
        "items"
    ]
    first_req_after_rollback_s = time.perf_counter() - t0
    assert rec_back == rec_best, "rollback did not restore BEST's outputs"
    call("DELETE", f"/v1/models/lightgcn_recommender/{vid}")
    models = call("GET", "/v1/models")["models"][0]["versions"]
    assert [v["version"] for v in models] == ["1"], models
    server.shutdown()

    overlap = np.mean(
        [len(set(a) & set(b)) / len(a) for a, b in zip(rec_best, rec_last)]
    )
    out = {
        "benchmark": "serve_register_r5",
        "scale": f"{n_users}x{svc.prepared.n_items}, dim {svc.cfg.embedding_dim}",
        "initial_load_s": round(load_s, 1),
        "register_s": round(register_s, 1),
        "register_includes": "checkpoint load + full propagation + per-bucket warm BEFORE the default flip",
        "first_request_after_swap_ms": round(first_req_after_swap_s * 1e3, 1),
        "first_request_after_rollback_ms": round(
            first_req_after_rollback_s * 1e3, 1
        ),
        "best_vs_last_top20_overlap": round(float(overlap), 4),
        "rollback_exact": True,
    }
    with open("/root/repo/scripts/serve_register_r5.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
