"""Worker for the 2-process ``jax.distributed.initialize`` test.

Launched by ``tests/test_multiprocess.py`` as
``python tests/mp_worker.py <coordinator> <n_procs> <proc_id>``. Each process
hosts 2 virtual CPU devices (4 global), initializes the multi-process JAX
runtime over a localhost coordinator (SURVEY.md §4 item 3 — the real
multi-host bootstrap path, exercised without TPU hardware), runs ONE GSPMD
sharded training step over the global mesh, and asserts the loss agrees
bitwise across processes (``assert_cross_host_agreement``).
"""
import os
import sys


def main(coordinator: str, n_procs: int, proc_id: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Gloo-backed CPU collectives make multi-process CPU meshes real
    # (cross-process psum/all-gather over TCP — the DCN stand-in).
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from gnn_ecommerce_tpu.parallel.distributed import (
        assert_cross_host_agreement,
        init_distributed,
    )

    info = init_distributed(
        coordinator_address=coordinator,
        num_processes=n_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == n_procs, info
    assert len(jax.devices()) == 2 * n_procs, info

    import numpy as np
    import optax

    import __graft_entry__ as g
    from gnn_ecommerce_tpu.data.prepare import SamplerArrays
    from gnn_ecommerce_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        shard_graph,
        shard_params,
    )
    from gnn_ecommerce_tpu.sampling import make_sampler_data

    # Identical host-side data on every process (same seed): the multi-host
    # contract for replicated inputs.
    graph, cfg, params, rng = g._tiny_setup(n_edges=2000, seed=21)
    src, dst = np.asarray(graph.src), np.asarray(graph.dst)
    m = dst < graph.n_users
    users, first = np.unique(dst[m], return_index=True)
    pos = src[m][first]
    arrays = SamplerArrays(
        users=users.astype(np.int64),
        pos_indptr=np.arange(len(users) + 1),
        pos_flat=pos.astype(np.int64),
        ign_indptr=np.arange(len(users) + 1),
        ign_flat=pos.astype(np.int64),
    )
    sdata = make_sampler_data(arrays, graph.n_users, graph.n_items)

    mesh = make_mesh(2 * n_procs)
    optimizer = optax.adam(1e-2)
    with mesh:
        sp = shard_params(params, mesh)
        so = optimizer.init(sp)
        sg = shard_graph(graph, mesh)
        step = make_sharded_train_step(
            cfg, optimizer, mesh, batch_size=64, decay=1e-4
        )
        sp, so, metrics = step(sp, so, sg, sdata, jax.random.key(7))
        jax.block_until_ready(sp)

    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    assert_cross_host_agreement(loss, "loss")
    print(f"proc {proc_id}: OK loss={loss:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
