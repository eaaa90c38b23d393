"""Serving at FULL cosmetics scale, measured on the chip (SERVE_r3.json).

The reference serves through TorchServe and re-runs full-graph propagation
per request (``torchserve/lightgcn_handler.py:91``; SURVEY.md §3.4 flags
it). This measures our embedding-cache service (`serve/service.py`) hosting
the round-3 full-training checkpoint (`model-checkpoints/full_r3`,
TRAIN_FULL_r3.json) at the full 1.55M-user x 54.6K-item scale:

- artifact load + one-time propagation refresh + warmup compile;
- request latency per batch bucket (1 / 8 / 64 / 512 users) through the
  service API and through the real HTTP endpoint (ephemeral port, same
  TorchServe-parity envelope as `scripts/recommend.sh`);
- the int8-quantized scorer variant;
- masking sanity: no recommended item is among the user's train purchases.

Run AFTER the chip is free (bench/train hold the HBM):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_scale_r3.py
"""
import json
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, "/root/repo")

PREPARED_DIR = "/root/repo/data/prepared_full_r3"
CKPT_DIR = "/root/repo/model-checkpoints/full_r3"


def ensure_prepared() -> str:
    import os

    if os.path.exists(f"{PREPARED_DIR}/manifest.json"):
        return PREPARED_DIR
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from full_corpus_r3 import build_prepared  # SAME id space as the ckpt

    from gnn_ecommerce_tpu.data.artifacts import save_prepared

    t0 = time.perf_counter()
    prepared, _ = build_prepared()
    save_prepared(prepared, PREPARED_DIR)
    print(f"prepared artifact rebuilt in {time.perf_counter()-t0:.0f}s",
          flush=True)
    return PREPARED_DIR


def bucket_latencies(recommend, rng, n_users, reps=20):
    out = {}
    for batch in (1, 8, 64, 512):
        ids = rng.integers(0, n_users, batch)
        recommend(ids)  # warm this bucket (compile)
        t0 = time.perf_counter()
        for _ in range(reps):
            recommend(rng.integers(0, n_users, batch))
        dt = (time.perf_counter() - t0) / reps
        out[str(batch)] = {
            "ms": round(dt * 1e3, 2),
            "users_per_s": round(batch / dt, 1),
        }
        print(f"  batch {batch}: {dt*1e3:.1f} ms", flush=True)
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    from gnn_ecommerce_tpu.serve.server import make_server
    from gnn_ecommerce_tpu.serve.service import RecommenderService

    data_dir = ensure_prepared()
    rng = np.random.default_rng(7)

    t0 = time.perf_counter()
    svc = RecommenderService.from_artifacts(data_dir, CKPT_DIR)
    load_s = time.perf_counter() - t0
    n_users = svc.prepared.n_users
    print(
        f"service up in {load_s:.1f}s (propagation refresh "
        f"{svc.last_refresh_s:.2f}s, warmup {svc.warmup_s:.1f}s); "
        f"{n_users} users x {svc.prepared.n_items} items",
        flush=True,
    )

    print("service-API latency:", flush=True)
    api = bucket_latencies(svc.recommend, rng, n_users)

    # Masking sanity on users WITH train purchases.
    have = svc._mask_users[np.diff(svc._mask_indptr) > 0]
    sample = rng.choice(have, 64, replace=False)
    recs = svc.recommend(sample)
    bad = 0
    for r, u in enumerate(sample):
        s = np.searchsorted(svc._mask_users, u)
        owned = set(
            svc._mask_items[svc._mask_indptr[s]:svc._mask_indptr[s + 1]].tolist()
        )
        bad += len(owned & set(np.asarray(recs[r]).tolist()))
    assert bad == 0, f"{bad} purchased items leaked into recommendations"
    print("masking sanity ok (0 purchased items recommended)", flush=True)

    # HTTP endpoint (TorchServe-parity envelope), ephemeral port.
    httpd = make_server(svc, port=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()

    def http_recommend(ids):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/models/lightgcn_recommender:predict",
            data=json.dumps([int(i) for i in ids]).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())["items"]

    print("HTTP endpoint latency:", flush=True)
    http = bucket_latencies(http_recommend, rng, n_users)
    httpd.shutdown()

    # int8-quantized scorer variant.
    quant = None
    try:
        t0 = time.perf_counter()
        qsvc = RecommenderService.from_artifacts(data_dir, CKPT_DIR, quantized=True)
        qload_s = time.perf_counter() - t0
        print("quantized service-API latency:", flush=True)
        quant = {
            "load_s": round(qload_s, 1),
            "latency": bucket_latencies(qsvc.recommend, rng, n_users),
        }
    except Exception as e:
        print(f"quantized variant unavailable: {type(e).__name__}: {e}",
              flush=True)

    out = {
        "scale": f"{n_users}x{svc.prepared.n_items}, "
                 f"{len(svc.prepared.edge_user)} train edges, "
                 f"dim {svc.cfg.embedding_dim}, {svc.cfg.num_layers} layers",
        "checkpoint": "model-checkpoints/full_r3 (TRAIN_FULL_r3.json best, "
                      "val R@20 0.316)",
        "load_s": round(load_s, 1),
        "propagation_refresh_s": round(svc.last_refresh_s, 2),
        "latency_ms_by_batch": {"service_api": api, "http": http},
        "quantized": quant,
        "reference_contrast": "the reference re-propagates the FULL graph "
            "per request inside TorchServe (lightgcn_handler.py:91); here "
            "propagation runs once per checkpoint refresh "
            "and requests are a [B,D]x[D,I] matmul + mask + top-K",
    }
    with open("/root/repo/SERVE_r3.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
