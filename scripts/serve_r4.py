"""Sustained serving load WITH cross-request batching (SERVE_r4.json).

Round-3 measured the queueing problem (SERVE_r3.json sustained_http_load:
8 clients x batch 64 -> p50 163 / p99 291 ms at 3.1K users/s while one
batch-64 device call takes 84 ms). Round 4 adds the TorchServe-style
cross-request batcher (`serve/batching.py`); this script re-runs the SAME
sustained load against the batched server at full cosmetics scale and
records the before/after. Target (VERDICT r3 item 8): p99 < 150 ms at
>= 3.1K users/s.

Run AFTER the chip is free:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_r4.py
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

from serve_scale_r3 import ensure_prepared  # noqa: E402  (same corpus)

WINDOW_S = 20.0
CLIENTS = 8
BATCH = 64          # the round-3 protocol: already-big requests
SMALL_CLIENTS = 16  # the TorchServe-batching regime: many tiny requests
SMALL_BATCH = 4
CKPT_R4 = "/root/repo/model-checkpoints/full_r4"
CKPT_R3 = "/root/repo/model-checkpoints/full_r3"


def run_load(port: int, n_users: int, label: str, clients: int = CLIENTS,
             batch: int = BATCH) -> dict:
    url = f"http://127.0.0.1:{port}/v1/models/lightgcn_recommender:predict"

    def call(ids):
        req = urllib.request.Request(
            url, data=json.dumps([int(i) for i in ids]).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())

    rng0 = np.random.default_rng(0)
    for _ in range(3):  # warm this workload's path end-to-end
        call(rng0.integers(0, n_users, batch))

    lat_lock = threading.Lock()
    latencies: list = []
    stop = time.perf_counter() + WINDOW_S

    errors = [0]

    def client(seed):
        rng = np.random.default_rng(seed)
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                call(rng.integers(0, n_users, batch))
            except Exception:
                with lat_lock:
                    errors[0] += 1
                continue  # a failed request must not kill the client thread
            dt = time.perf_counter() - t0
            with lat_lock:
                latencies.append(dt)

    threads = [threading.Thread(target=client, args=(s,)) for s in range(clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    lat = np.sort(np.array(latencies))
    if len(lat) == 0:  # e.g. a tunnel outage wedged the whole window
        out = {"label": label, "clients": clients, "batch": batch,
               "window_s": round(wall, 1), "requests": 0, "errors": errors[0],
               "requests_per_s": 0.0, "users_per_s": 0.0,
               "latency_ms": {"p50": None, "p90": None, "p99": None}}
        print(json.dumps(out), flush=True)
        return out
    out = {
        "label": label,
        "clients": clients,
        "batch": batch,
        "window_s": round(wall, 1),
        "requests": len(lat),
        "errors": errors[0],
        "requests_per_s": round(len(lat) / wall, 1),
        "users_per_s": round(len(lat) * batch / wall, 1),
        "latency_ms": {
            "p50": round(float(lat[len(lat) // 2]) * 1e3, 1),
            "p90": round(float(lat[int(len(lat) * 0.9)]) * 1e3, 1),
            "p99": round(
                float(lat[min(len(lat) - 1, int(len(lat) * 0.99))]) * 1e3, 1
            ),
        },
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    from gnn_ecommerce_tpu.serve import (
        BatchingRecommender, RecommenderService, make_server,
    )

    ckpt = CKPT_R4 if os.path.exists(f"{CKPT_R4}/LightGCN_best/meta.json") else CKPT_R3
    data_dir = ensure_prepared()
    t0 = time.perf_counter()
    svc = RecommenderService.from_artifacts(data_dir, ckpt)
    load_s = time.perf_counter() - t0
    n_users = svc.prepared.n_users
    print(f"service up from {ckpt} in {load_s:.0f}s "
          f"(dim {svc.cfg.embedding_dim})", flush=True)

    results = {
        "scale": f"{n_users}x{svc.prepared.n_items}, "
                 f"dim {svc.cfg.embedding_dim}, {svc.cfg.num_layers} layers",
        "checkpoint": ckpt,
        "load_s": round(load_s, 1),
    }

    # All batch buckets are compiled by the service's own warmup now
    # (RecommenderService warm=True, added after the first-touch compile of
    # the 512 bucket inside a window measured p99 = 10.8 s).
    results["bucket_warmup_s"] = round(getattr(svc, "warmup_s", 0.0), 1)

    # Interleaved A/B/A/B windows: tunnel conditions drift minute to minute
    # (absolute latencies varied 2x between earlier runs), so unbatched and
    # batched alternate and each aggregates two windows.
    httpd = make_server(svc, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    batcher = BatchingRecommender(svc, max_wait_s=0.004)
    httpd2 = make_server(batcher, port=0)
    port2 = httpd2.server_address[1]
    threading.Thread(target=httpd2.serve_forever, daemon=True).start()

    runs = []
    # Two workloads, interleaved A/B/A/B within each (tunnel drift control):
    # big requests (batch 64: the batcher BYPASSES by design — expect
    # parity) and small requests (16 clients x batch 4: the TorchServe
    # maxBatchDelay regime batching exists for).
    for phase in ("big-unbatched", "big-batched", "big-unbatched",
                  "big-batched"):
        p = port if "unbatched" in phase else port2
        runs.append(run_load(p, n_users, phase))
    for phase in ("small-unbatched", "small-batched", "small-unbatched",
                  "small-batched"):
        p = port if "unbatched" in phase else port2
        runs.append(
            run_load(p, n_users, phase, clients=SMALL_CLIENTS,
                     batch=SMALL_BATCH)
        )
    httpd.shutdown()
    httpd2.shutdown()
    m = batcher.metrics()
    results["windows"] = runs
    results["batcher"] = {
        k: m[k]
        for k in ("batches_total", "batched_requests_total",
                  "users_per_batch_avg")
    }

    def agg(label, batch):
        sel = [r for r in runs if r["label"] == label]
        wall = sum(r["window_s"] for r in sel)
        return {
            "users_per_s": round(sum(r["requests"] * batch for r in sel) / wall, 1),
            "p50_ms": round(float(np.mean([r["latency_ms"]["p50"] for r in sel])), 1),
            "p90_ms": round(float(np.mean([r["latency_ms"]["p90"] for r in sel])), 1),
            "p99_ms": round(float(np.mean([r["latency_ms"]["p99"] for r in sel])), 1),
            "requests": sum(r["requests"] for r in sel),
        }

    summary = {}
    for wl, batch in (("big", BATCH), ("small", SMALL_BATCH)):
        u = agg(f"{wl}-unbatched", batch)
        b = agg(f"{wl}-batched", batch)
        results[f"{wl}_unbatched"], results[f"{wl}_batched"] = u, b
        summary[wl] = {
            "p99_ms_unbatched": u["p99_ms"],
            "p99_ms_batched": b["p99_ms"],
            "users_per_s_unbatched": u["users_per_s"],
            "users_per_s_batched": b["users_per_s"],
            "p99_improvement": round(u["p99_ms"] / max(b["p99_ms"], 1e-9), 2),
            "throughput_improvement": round(
                b["users_per_s"] / max(u["users_per_s"], 1e-9), 2
            ),
        }
    results["summary"] = summary
    print(json.dumps(results["summary"], indent=2), flush=True)
    with open("/root/repo/SERVE_r4.json", "w") as f:
        json.dump(results, f, indent=2)
    print("-> /root/repo/SERVE_r4.json", flush=True)


if __name__ == "__main__":
    main()
