"""Measure the checkpoint readback path UNCONTENDED on the real chip.

The full-scale round-5 run wrote only 9 of 34 requested checkpoints
(TRAIN_FULL_r5.json / scripts/train_full_r5.log): the async writer's banded
pinned_host->client readback lags epochs badly, which means it saturates the
tunnel link for the whole run — contending with train-step dispatch — and
leaves a multi-minute flush tail after the last epoch. This probe measures,
with NOTHING else running:

 1. D2H DMA rate: HBM -> pinned_host snapshot (banded, as the driver does);
 2. link readback rate: pinned_host bands -> client numpy (np.asarray);
 3. npz write rate: client numpy -> local disk (as train/checkpoint.py).

at the exact cosmetics-scale checkpoint shape (params + Adam mu/nu =
3 x [1.61M, 90] f32 ~ 1.74 GB).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ckpt_readback_probe_r5.py
Writes scripts/ckpt_readback_probe_r5.json.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N_NODES = 1_552_888 + 54_571
DIM = 90
BAND_BYTES = 32 << 20  # driver SNAPSHOT_BAND_BYTES


def banded_snapshot(x):
    nbytes = x.size * x.dtype.itemsize
    nb = -(-nbytes // BAND_BYTES)
    rows = -(-x.shape[0] // nb)
    return [
        jax.device_put(
            x[i * rows : (i + 1) * rows],
            x.sharding.with_memory_kind("pinned_host"),
        )
        for i in range(nb)
    ]


def main():
    dev = jax.devices()[0]
    print(f"backend: {jax.default_backend()} {dev}", flush=True)
    key = jax.random.key(0)
    # Three table-shaped leaves = params + Adam mu + nu.
    leaves = [
        jax.random.normal(jax.random.fold_in(key, i), (N_NODES, DIM), jnp.float32)
        for i in range(3)
    ]
    jax.block_until_ready(leaves)
    total_bytes = sum(x.size * x.dtype.itemsize for x in leaves)
    print(f"checkpoint payload: {total_bytes / 1e9:.2f} GB", flush=True)

    # 1. D2H snapshot (banded).
    t0 = time.perf_counter()
    snaps = [banded_snapshot(x) for x in leaves]
    for s in snaps:
        jax.block_until_ready(s)
    d2h_s = time.perf_counter() - t0
    n_bands = sum(len(s) for s in snaps)
    print(
        f"D2H pinned_host snapshot: {d2h_s:.2f} s "
        f"({total_bytes / d2h_s / 1e9:.2f} GB/s, {n_bands} bands)",
        flush=True,
    )

    # 2. Link readback, band by band (as the writer thread does).
    t0 = time.perf_counter()
    host = []
    per_band = []
    for s in snaps:
        parts = []
        for b in s:
            tb = time.perf_counter()
            parts.append(np.asarray(b))
            per_band.append(time.perf_counter() - tb)
            time.sleep(0.01)
        host.append(np.concatenate(parts, axis=0))
    readback_s = time.perf_counter() - t0
    print(
        f"link readback: {readback_s:.1f} s "
        f"({total_bytes / readback_s / 1e6:.1f} MB/s; per-band median "
        f"{np.median(per_band):.2f} s, p90 {np.percentile(per_band, 90):.2f} s)",
        flush=True,
    )

    # 3. npz write to local disk.
    t0 = time.perf_counter()
    np.savez("/tmp/ckpt_probe.npz", **{f"leaf{i}": h for i, h in enumerate(host)})
    write_s = time.perf_counter() - t0
    print(
        f"npz write: {write_s:.1f} s ({total_bytes / write_s / 1e6:.0f} MB/s)",
        flush=True,
    )

    out = {
        "payload_gb": total_bytes / 1e9,
        "bands": n_bands,
        "band_bytes": BAND_BYTES,
        "d2h_snapshot_s": round(d2h_s, 2),
        "d2h_gbps": round(total_bytes / d2h_s / 1e9, 2),
        "link_readback_s": round(readback_s, 1),
        "link_mbps": round(total_bytes / readback_s / 1e6, 1),
        "per_band_median_s": round(float(np.median(per_band)), 3),
        "per_band_p90_s": round(float(np.percentile(per_band, 90)), 3),
        "npz_write_s": round(write_s, 1),
        "note": (
            "uncontended; during training the same readback shares the link "
            "with step dispatch — see TRAIN_FULL_r5.json per-epoch inflation"
        ),
    }
    with open("/root/repo/scripts/ckpt_readback_probe_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
