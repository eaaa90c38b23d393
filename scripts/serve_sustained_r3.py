"""Sustained concurrent serving load at full scale (extends SERVE_r3.json).

SERVE_r3's per-request latencies are single-client; production serving is
concurrent. This drives the full-scale service (same checkpoint/artifacts
as scripts/serve_scale_r3.py) with N parallel HTTP clients for a fixed
wall-clock window and records requests/s + users/s + latency percentiles.
The device work serializes on one chip (one jit executable at a time); the
measurement shows what one chip sustains with request batching and how the
stdlib threaded server holds up — not multi-replica scaling.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_sustained_r3.py
"""
import json
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, "/root/repo")

from serve_scale_r3 import CKPT_DIR, ensure_prepared  # noqa: E402

WINDOW_S = 20.0
CLIENTS = 8
BATCH = 64


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)

    from gnn_ecommerce_tpu.serve.server import make_server
    from gnn_ecommerce_tpu.serve.service import RecommenderService

    data_dir = ensure_prepared()
    svc = RecommenderService.from_artifacts(data_dir, CKPT_DIR)
    n_users = svc.prepared.n_users
    httpd = make_server(svc, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/v1/models/lightgcn_recommender:predict"

    def call(ids):
        req = urllib.request.Request(
            url, data=json.dumps([int(i) for i in ids]).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())

    # Warm the batch bucket.
    rng0 = np.random.default_rng(0)
    call(rng0.integers(0, n_users, BATCH))

    lat_lock = threading.Lock()
    latencies: list = []
    stop = time.perf_counter() + WINDOW_S

    def client(seed):
        rng = np.random.default_rng(seed)
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            call(rng.integers(0, n_users, BATCH))
            dt = time.perf_counter() - t0
            with lat_lock:
                latencies.append(dt)

    threads = [threading.Thread(target=client, args=(s,)) for s in range(CLIENTS)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    httpd.shutdown()

    lat = np.sort(np.array(latencies))
    out = {
        "clients": CLIENTS,
        "batch": BATCH,
        "window_s": round(wall, 1),
        "requests": len(lat),
        "requests_per_s": round(len(lat) / wall, 1),
        "users_per_s": round(len(lat) * BATCH / wall, 1),
        "latency_ms": {
            "p50": round(float(lat[len(lat) // 2]) * 1e3, 1),
            "p90": round(float(lat[int(len(lat) * 0.9)]) * 1e3, 1),
            "p99": round(float(lat[min(len(lat) - 1, int(len(lat) * 0.99))]) * 1e3, 1),
        },
    }
    print(json.dumps(out, indent=2), flush=True)
    d = json.load(open("/root/repo/SERVE_r3.json"))
    d["sustained_http_load"] = out
    with open("/root/repo/SERVE_r3.json", "w") as f:
        json.dump(d, f, indent=2)


if __name__ == "__main__":
    main()
