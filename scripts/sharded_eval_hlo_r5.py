"""HLO-validate the sharded eval's communication (round-5 companion to
MULTICHIP_model_r4.json).

Claim (parallel/sharded_eval.py): evaluation communicates O(N·D) per
bucket AT MOST — one all-gather of the final embeddings when they arrive
sharded (the GSPMD branch's row-sharded layout), or NOTHING but two scalar
psums when they arrive replicated (the edge branch's concatenated output)
— and never anything proportional to eval-user count × mask width (each
device's user slice, truth and mask rows arrive pre-sharded; per-user
score/metric tensors stay device-local and reduce to scalars).

This compiles the actual `make_sharded_eval_fn` program at 8/16/32 virtual
devices for both input layouts and buckets the collective bytes from the
optimized HLO.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=32 \
     python scripts/sharded_eval_hlo_r5.py
Writes SHARDED_EVAL_hlo_r5.json at the repo root.
"""
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=32")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multichip_comm_model_r4 import collective_bytes  # same HLO walker

from gnn_ecommerce_tpu.parallel import make_mesh
from gnn_ecommerce_tpu.parallel.sharded_eval import make_sharded_eval_fn

N_USERS, N_ITEMS, DIM = 512, 96, 32
ROWS, T_W, M_W = 256, 4, 8  # one bucket: pow2 rows, truth/mask widths


def run_at(n_dev: int, emb_layout: str) -> dict:
    mesh = make_mesh(n_dev, axis_sizes=(n_dev,), axis_names=("model",))
    rng = np.random.default_rng(0)
    emb = jnp.asarray(
        rng.standard_normal((N_USERS + N_ITEMS, DIM)).astype(np.float32)
    )
    if emb_layout == "row_sharded":
        # The GSPMD branch's layout: table rows sharded over the mesh.
        emb = jax.device_put(emb, NamedSharding(mesh, P("model", None)))
    else:
        emb = jax.device_put(emb, NamedSharding(mesh, P()))
    uids = jnp.asarray(rng.integers(0, N_USERS, ROWS), jnp.int32)
    truth = jnp.asarray(rng.integers(0, N_ITEMS, (ROWS, T_W)), jnp.int32)
    mask = jnp.full((ROWS, M_W), -1, jnp.int32)

    # Execute the REAL public path once (one bucket), then lower an
    # identical program below for its optimized-HLO text.
    fn = make_sharded_eval_fn(mesh, N_USERS, k=10, item_tile=N_ITEMS)
    from gnn_ecommerce_tpu.eval.evaluate import EvalBatch

    b = EvalBatch(user_ids=uids, truth=truth, mask=mask, num_users=ROWS)
    with mesh:
        fn(emb, [b])  # executes once (compiles)
    # Lower the same program for HLO text.
    from gnn_ecommerce_tpu.eval.metrics import recall_precision_at_k
    from gnn_ecommerce_tpu.ops.topk_score import topk_scores

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from functools import partial

    axes = tuple(mesh.axis_names)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axes), P(axes, None), P(axes, None)),
        out_specs=(P(), P()), check_vma=False,
    )
    def run(e, u, t, m):
        item_emb = e[N_USERS:]
        u_emb = e[u]
        _, idx = topk_scores(u_emb, item_emb, m, 10, N_ITEMS, "neginf")
        recall, precision = recall_precision_at_k(idx, t, 10)
        return (
            jax.lax.psum(jnp.sum(recall), axes),
            jax.lax.psum(jnp.sum(precision), axes),
        )

    hlo = jax.jit(run).lower(emb, uids, truth, mask).compile().as_text()
    meas = collective_bytes(hlo)
    total = sum(v for k, v in meas.items() if not k.endswith("_ops"))
    return {
        "n_devices": n_dev,
        "emb_layout": emb_layout,
        "measured": meas,
        "total_bytes": total,
        "emb_bytes_for_reference": (N_USERS + N_ITEMS) * DIM * 4,
        "per_user_tensor_bytes_for_reference": ROWS * (T_W + M_W + 10) * 4,
    }


def main():
    runs = [
        run_at(n, layout)
        for n in (8, 16, 32)
        for layout in ("replicated", "row_sharded")
    ]
    emb_bytes = (N_USERS + N_ITEMS) * DIM * 4
    ok_rep = all(
        r["total_bytes"] <= 64 for r in runs if r["emb_layout"] == "replicated"
    )
    ok_sh = all(
        r["total_bytes"] <= emb_bytes + 64 and r["total_bytes"] > 0
        for r in runs
        if r["emb_layout"] == "row_sharded"
    )
    out = {
        "benchmark": "sharded_eval_hlo_r5",
        "claim": (
            "sharded eval communicates at most one [N, D] embedding "
            "all-gather per bucket (sharded input) or scalar psums only "
            "(replicated input); nothing scales with eval users, truth or "
            "mask width, or shard count"
        ),
        "shape": {
            "n_users": N_USERS, "n_items": N_ITEMS, "dim": DIM,
            "bucket_rows": ROWS, "truth_w": T_W, "mask_w": M_W,
        },
        "runs": runs,
        "replicated_input_scalar_only": ok_rep,
        "sharded_input_bounded_by_one_embedding_gather": ok_sh,
    }
    assert ok_rep and ok_sh, json.dumps(runs, indent=2)
    with open("/root/repo/SHARDED_EVAL_hlo_r5.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
