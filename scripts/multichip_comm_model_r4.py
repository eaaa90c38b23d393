"""Validate the fast-edge-partition scaling cost model's communication
accounting against the COMPILED program (round-4 VERDICT item 9).

The model (docs/PERFORMANCE.md "Scaling model") claims per-train-step
communication for `--partition edge --fast` is O(I·D), independent of the
edge cut and of n_users:

- ep_to_items combines per-shard partial item sums with ONE [I, D] f32
  psum; the backward of ep_to_users is ep_to_items again -> 2 psums/step.
- the B_ii chain all-gathers each level's row-sharded output: levels
  2..L computed in pairs -> Sigma over dense levels of I·D f32, fwd + bwd.
- batch aggregation psums: 2x [B, D] f32 + scalars.
- NO collective touches an n_users-sized array (the GSPMD fallback
  all-gathers the full [n_users, D] table; the round-1..3 explicit path
  all_to_all'd edge-cut-bound boundary rows per layer).

This script compiles the actual train step on an N-virtual-device CPU mesh,
walks the optimized HLO for collective ops, buckets their output bytes, and
compares against the closed-form prediction. Run:

    XLA_FLAGS=--xla_force_host_platform_device_count=32 \
    python scripts/multichip_comm_model_r4.py

Writes MULTICHIP_model_r4.json at the repo root.
"""
import json
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=32")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge
from gnn_ecommerce_tpu.data.prepare import SamplerArrays
from gnn_ecommerce_tpu.models import LightGCNConfig
from gnn_ecommerce_tpu.ops.bipartite import build_item_operator, split_graph
from gnn_ecommerce_tpu.parallel import (
    build_fast_edge_partition,
    make_fast_edge_fns,
    make_mesh,
    split_ep_tree,
)
from gnn_ecommerce_tpu.sampling import make_sampler_data

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
               "pred": 1, "s8": 1, "u8": 1, "f16": 2}

# One HLO instruction line: `%name = <output-shapes> op-name(...)`. The
# output may be a TUPLE of shapes (XLA's all-reduce combiner merges psums),
# so sum every `type[dims]` group between '=' and the op token.
_OP = re.compile(
    r"=\s*(.*?)\s"
    r"(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-start|-done)?\("
)
_SHAPE = re.compile(r"((?:f|s|u|pred|bf)[0-9]*)\[([0-9,]*)\]")


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes per collective kind from optimized HLO text."""
    out: dict = {}
    for line in hlo_text.splitlines():
        m = _OP.search(line)
        if not m:
            continue
        kind = m.group(2)
        b = 0
        for dt, dims in _SHAPE.findall(m.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            b += n * DTYPE_BYTES.get(dt, 4)
        out[kind] = out.get(kind, 0) + b
        out.setdefault(f"{kind}_ops", 0)
        out[f"{kind}_ops"] += 1
    return out


def _sampler_for(graph):
    n_users, n_items = graph.n_users, graph.n_items
    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    user_mask = dst < n_users
    users, first_idx = np.unique(dst[user_mask], return_index=True)
    pos_items = src[user_mask][first_idx]
    arrays = SamplerArrays(
        users=users.astype(np.int64),
        pos_indptr=np.arange(len(users) + 1),
        pos_flat=pos_items.astype(np.int64),
        ign_indptr=np.arange(len(users) + 1),
        ign_flat=pos_items.astype(np.int64),
    )
    return make_sampler_data(arrays, n_users, n_items)


def run_at(
    n_dev: int, dim: int = 32, layers: int = 4, batch: int = 64,
    n_users: int = 256, n_edges: int = 4096,
):
    graph, _, _, _ = ge._tiny_setup(
        n_users=n_users, n_edges=n_edges, dim=dim, layers=layers
    )
    cfg = LightGCNConfig(
        num_nodes=graph.num_nodes, embedding_dim=dim, num_layers=layers
    )
    n_users, n_items = graph.n_users, graph.n_items
    sdata = _sampler_for(graph)

    mesh = make_mesh(n_dev, axis_sizes=(n_dev,), axis_names=("model",))
    split = split_graph(graph)
    item_op = build_item_operator(split, dtype=jnp.float32)
    optimizer = optax.adam(1e-2)
    with mesh:
        fep = build_fast_edge_partition(split, mesh, item_op, heavy_users=16)
        params = split_ep_tree(
            {"embedding": jax.random.normal(jax.random.key(1), (graph.num_nodes, dim)) * 0.1},
            fep, mesh,
        )
        embed, step = make_fast_edge_fns(
            cfg, optimizer, mesh, fep, batch_size=batch,
            decay=1e-4, edge_cap=4096,
        )
        opt_state = optimizer.init(params)
        lowered = jax.jit(step, donate_argnums=(0, 1)).lower(
            params, opt_state, fep, sdata, jax.random.key(2)
        )
        compiled = lowered.compile()
        hlo = compiled.as_text()
    meas = collective_bytes(hlo)

    I_pad = int(fep.item_op.shape[0])  # B_ii rows padded to the shard count
    # ---- closed-form prediction (docs/PERFORMANCE.md scaling model) ----
    # Every collective is O((I + B)·D); the structure XLA actually emits
    # (verified by op_name metadata at S=8):
    #   fwd:  1 psum [I, D] (ep_to_items), 2 all-gathers [I, D] (the chain's
    #         two replicated consumers S_i and out_i — XLA keeps chain levels
    #         sharded through the alpha-sums), 2 psums [B, D] (batch e0+agg),
    #         scalars;
    #   bwd:  chain sharded-contraction psums Sigma[I, 2D]+[I, D] (pair
    #         streaming => (L-1)·I·D), 2 cotangent all-gathers [I, D],
    #         1 psum [I, D] (ep pair bwd), batch transpose psums ~2·[B, D].
    pred_total = (
        (6 + max(layers - 1, 0)) * I_pad * dim * 4 + 4 * batch * dim * 4
    )
    meas_total = sum(v for k, v in meas.items() if not k.endswith("_ops"))
    return {
        "n_devices": n_dev,
        "n_users": n_users,
        "n_items": n_items,
        "dim": dim,
        "layers": layers,
        "batch": batch,
        "measured": meas,
        "measured_total_bytes": meas_total,
        "predicted_total_bytes": pred_total,
        "ratio_measured_over_predicted": (
            meas_total / pred_total if pred_total else None
        ),
        "user_table_bytes_for_reference": n_users * dim * 4,
    }


def run_gspmd_baseline(n_dev: int, dim: int = 32, layers: int = 4,
                       batch: int = 64, n_users: int = 256):
    """Collective bytes of the GSPMD fast-plans step at the same size — its
    to_items gathers from the REPLICATED user table, so an n_users-sized
    all-gather appears (the term the edge partition eliminates)."""
    from gnn_ecommerce_tpu.ops.bipartite import build_fast_bipartite
    from gnn_ecommerce_tpu.parallel import (
        make_sharded_fast_train_step,
        shard_fast_bipartite,
        shard_params,
    )

    graph, _, _, _ = ge._tiny_setup(
        n_users=n_users, n_edges=4096, dim=dim, layers=layers
    )
    cfg = LightGCNConfig(
        num_nodes=graph.num_nodes, embedding_dim=dim, num_layers=layers
    )
    sdata = _sampler_for(graph)
    mesh = make_mesh(n_dev)
    fb = build_fast_bipartite(graph, dtype=jnp.float32)
    optimizer = optax.adam(1e-2)
    with mesh:
        sfb = shard_fast_bipartite(fb, mesh, fast_ops=True, heavy_users=16)
        params = shard_params(
            {"embedding": jax.random.normal(jax.random.key(1), (graph.num_nodes, dim)) * 0.1},
            mesh,
        )
        step = make_sharded_fast_train_step(
            cfg, optimizer, mesh, batch_size=batch, decay=1e-4, edge_cap=4096
        )
        opt_state = optimizer.init(params)
        hlo = jax.jit(step, donate_argnums=(0, 1)).lower(
            params, opt_state, sfb, sdata, jax.random.key(2)
        ).compile().as_text()
    meas = collective_bytes(hlo)
    return {
        "n_devices": n_dev,
        "n_users": n_users,
        "measured": meas,
        "measured_total_bytes": sum(
            v for k, v in meas.items() if not k.endswith("_ops")
        ),
        "user_table_bytes": n_users * dim * 4,
    }


def main():
    results = [run_at(n) for n in (8, 16, 32)]
    for r in results:
        print(
            f"S={r['n_devices']}: measured {r['measured_total_bytes']} B, "
            f"predicted {r['predicted_total_bytes']} B, ratio "
            f"{r['ratio_measured_over_predicted']:.3f} | {r['measured']}"
        )
    # Scale-independence claims: bytes invariant in S ...
    assert len({r["measured_total_bytes"] for r in results}) == 1, results
    # ... and invariant in n_users (10x the users, same wire traffic) —
    # the claim that kills the GSPMD table-all-gather term by construction.
    big = run_at(8, n_users=2560, n_edges=8192)
    base = results[0]
    print(
        f"n_users 256 -> 2560: bytes {base['measured_total_bytes']} -> "
        f"{big['measured_total_bytes']}"
    )
    assert (
        big["measured_total_bytes"] == base["measured_total_bytes"]
    ), (base, big)

    # GSPMD fast-plans baseline at both sizes: its collective bytes GROW
    # with n_users (the [n_users, D] table all-gather the EP design removes).
    gsp_small = run_gspmd_baseline(8, n_users=256)
    gsp_big = run_gspmd_baseline(8, n_users=2560)
    print(
        f"gspmd baseline bytes: n_users 256 -> 2560: "
        f"{gsp_small['measured_total_bytes']} -> "
        f"{gsp_big['measured_total_bytes']}"
    )

    out = {
        "what": (
            "fast-edge-partition train step: collective bytes from compiled "
            "HLO vs the closed-form cost model (docs/PERFORMANCE.md)"
        ),
        "results": results,
        "n_users_invariance": {"base": base, "x10_users": big},
        "gspmd_baseline": {"n_users_256": gsp_small, "n_users_2560": gsp_big},
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MULTICHIP_model_r4.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
