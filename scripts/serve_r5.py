"""Round-5 serving measurements (round-4 VERDICT items 5 + 6).

Two questions, both at full cosmetics scale on the full_r4 checkpoint:

1. (item 6) Do the round-4 batching conclusions survive a drift-controlled
   protocol? SERVE_r4's 20-second windows disagreed up to 4.6x between
   same-config repeats — the tunnel drifts minute to minute, so this script
   uses SHORT (5 s) slices, strictly interleaved A/B/A/B..., 6 slices per
   config (3x the round-4 total), and reports the per-config mean WITH the
   across-slice spread. A conclusion stands only if the effect exceeds the
   same-config spread.
   - small requests (16 clients x 4 users): batched vs unbatched
     (the TorchServe maxBatchDelay regime; round-4 claim: ~1.9x win).
   - big requests (8 clients x 64 users): solo_min bypass vs FORCED
     coalescing (round-4 claim: coalescing big requests LOSES ~1.5x).

2. (item 5) Int8 serving on-chip: the quantized cache
   (``serve/quantized.py``) had only ever been asserted on synthetic CPU
   data. Measured here through the real server: top-20 overlap vs f32 on
   4096 users, plus interleaved int8-vs-f32 throughput/latency for both
   request shapes.

Run AFTER the chip is free:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_r5.py
Writes SERVE_r5.json.
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

SLICE_S = 5.0
REPS = 6           # interleaved slices per config (3x round-4 totals)
BIG_CLIENTS, BIG_BATCH = 8, 64
SMALL_CLIENTS, SMALL_BATCH = 16, 4
CKPT = "/root/repo/model-checkpoints/full_r4"


def make_caller(port: int):
    url = f"http://127.0.0.1:{port}/v1/models/lightgcn_recommender:predict"

    def call(ids):
        req = urllib.request.Request(
            url, data=json.dumps([int(i) for i in ids]).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())

    return call


def run_slice(port: int, n_users: int, clients: int, batch: int, seed: int):
    """One fixed-duration load slice; returns (users_per_s, latencies)."""
    call = make_caller(port)
    lat_lock = threading.Lock()
    latencies: list = []
    errors = [0]
    stop = time.perf_counter() + SLICE_S

    def client(s):
        rng = np.random.default_rng(s)
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                call(rng.integers(0, n_users, batch))
            except Exception:
                with lat_lock:
                    errors[0] += 1
                continue
            dt = time.perf_counter() - t0
            with lat_lock:
                latencies.append(dt)

    threads = [
        threading.Thread(target=client, args=(seed * 1000 + i,))
        for i in range(clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return len(latencies) * batch / wall, latencies, errors[0]


def interleaved_ab(name_a, port_a, name_b, port_b, n_users, clients, batch):
    """REPS interleaved A/B slice pairs -> per-config mean/spread + pooled
    percentiles. The first (warm) pair is run and DISCARDED."""
    per = {name_a: [], name_b: []}
    lats = {name_a: [], name_b: []}
    errs = {name_a: 0, name_b: 0}
    for rep in range(REPS + 1):
        for name, port in ((name_a, port_a), (name_b, port_b)):
            ups, lat, e = run_slice(port, n_users, clients, batch, seed=rep)
            if rep == 0:
                continue  # warm slice: first-touch path effects, discarded
            per[name].append(round(ups, 1))
            lats[name].extend(lat)
            errs[name] += e
        print(f"  rep {rep}: " + ", ".join(
            f"{n}={per[n][-1] if per[n] else 'warm'}" for n in (name_a, name_b)
        ), flush=True)
    out = {}
    for name in (name_a, name_b):
        v = np.array(per[name])
        lat = np.sort(np.array(lats[name]))
        out[name] = {
            "slices_users_per_s": per[name],
            "mean_users_per_s": round(float(v.mean()), 1),
            "spread_users_per_s": round(float(v.max() - v.min()), 1),
            "stdev_users_per_s": round(float(v.std()), 1),
            "errors": errs[name],
            "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 1),
            "p99_ms": round(
                float(lat[min(len(lat) - 1, int(len(lat) * 0.99))]) * 1e3, 1
            ),
        }
    a, b = out[name_a], out[name_b]
    effect = a["mean_users_per_s"] / max(b["mean_users_per_s"], 1e-9)
    spread = max(a["stdev_users_per_s"], b["stdev_users_per_s"])
    sep = abs(a["mean_users_per_s"] - b["mean_users_per_s"])
    out["effect_a_over_b"] = round(effect, 2)
    out["effect_exceeds_spread"] = bool(sep > 2 * spread)
    return out


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
    svc = RecommenderService.from_artifacts(data_dir, CKPT)
    svc_q = RecommenderService.from_artifacts(data_dir, CKPT, quantized=True)
    load_s = time.perf_counter() - t0
    n_users = svc.prepared.n_users
    print(
        f"f32 + int8 services up in {load_s:.0f}s (dim {svc.cfg.embedding_dim})",
        flush=True,
    )

    results = {
        "benchmark": "serve_r5",
        "scale": f"{n_users}x{svc.prepared.n_items}, dim {svc.cfg.embedding_dim}",
        "checkpoint": CKPT,
        "protocol": (
            f"interleaved A/B slices, {SLICE_S:.0f}s each, {REPS} measured "
            "per config (first pair discarded as warmup); conclusions "
            "require effect > 2x the across-slice stdev"
        ),
    }

    # ---- int8 accuracy vs f32 at full scale (through the service path,
    # identical masks) ----
    rng = np.random.default_rng(7)
    users = rng.integers(0, n_users, 4096)
    t0 = time.perf_counter()
    top_f32 = svc.recommend(users)
    top_i8 = svc_q.recommend(users)
    overlap = np.array(
        [len(set(a) & set(b)) / len(a) for a, b in zip(top_f32, top_i8)]
    )
    results["int8_accuracy"] = {
        "users": int(len(users)),
        "top20_overlap_mean": round(float(overlap.mean()), 4),
        "top20_overlap_p10": round(float(np.percentile(overlap, 10)), 4),
        "top20_overlap_min": round(float(overlap.min()), 4),
        "seconds": round(time.perf_counter() - t0, 1),
    }
    print(f"int8 accuracy: {results['int8_accuracy']}", flush=True)

    # ---- servers: f32 plain / f32 batched / f32 forced-coalesce /
    #      int8 plain / int8 batched ----
    servers = {}

    def up(name, handler):
        s = make_server(handler, port=0)
        threading.Thread(target=s.serve_forever, daemon=True).start()
        servers[name] = s
        return s.server_address[1]

    p_f32 = up("f32", svc)
    p_f32_b = up("f32_batched", BatchingRecommender(svc, max_wait_s=0.004))
    coalescer = BatchingRecommender(
        svc, max_wait_s=0.004, solo_min=BIG_BATCH * 2, max_users=512
    )
    p_f32_co = up("f32_coalesce", coalescer)
    p_i8 = up("int8", svc_q)
    p_i8_b = up("int8_batched", BatchingRecommender(svc_q, max_wait_s=0.004))

    # (item 6) small requests: batched vs unbatched, interleaved.
    print("A/B small: f32 batched vs unbatched", flush=True)
    results["small_batched_vs_unbatched"] = interleaved_ab(
        "batched", p_f32_b, "unbatched", p_f32, n_users,
        SMALL_CLIENTS, SMALL_BATCH,
    )
    # (item 6) big requests: bypass vs forced coalescing, interleaved.
    print("A/B big: solo bypass vs forced coalescing", flush=True)
    results["big_bypass_vs_coalesce"] = interleaved_ab(
        "bypass", p_f32_b, "coalesce", p_f32_co, n_users,
        BIG_CLIENTS, BIG_BATCH,
    )
    # (item 5) int8 vs f32, big requests (plain servers).
    print("A/B big: int8 vs f32", flush=True)
    results["big_int8_vs_f32"] = interleaved_ab(
        "int8", p_i8, "f32", p_f32, n_users, BIG_CLIENTS, BIG_BATCH
    )
    # (item 5) int8 vs f32, small batched requests.
    print("A/B small batched: int8 vs f32", flush=True)
    results["small_batched_int8_vs_f32"] = interleaved_ab(
        "int8", p_i8_b, "f32", p_f32_b, n_users, SMALL_CLIENTS, SMALL_BATCH
    )

    for s in servers.values():
        s.shutdown()

    with open("/root/repo/SERVE_r5.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(
        {k: v for k, v in results.items() if k.endswith(("_vs_unbatched",
         "_vs_coalesce", "_vs_f32", "accuracy"))}, indent=2))
    print("wrote SERVE_r5.json", flush=True)


if __name__ == "__main__":
    main()
