"""Multi-host bootstrap (jax.distributed) + parallelism notes.

The reference is a single process on a single GPU (``src/train_lightgcn.py:
13``); everything here is new design. A multi-host TPU slice runs ONE
python process per host; ``jax.distributed.initialize`` wires them into one
JAX runtime where ``jax.devices()`` spans the slice and GSPMD/shard_map
collectives ride ICI within the slice and DCN across slices.

Strategy map for this workload (SURVEY.md §2.3):

- DP (``data`` axis): BPR (user, pos, neg) batches shard across chips;
  gradient reduction is GSPMD-inserted psum.
- TP (``model`` axis): the embedding TABLE is row-sharded — at cosmetics
  scale (1.7M nodes) the table + Adam moments dominate memory.
- EP-analog (edge partitioning): each shard owns the arcs whose destination
  it owns; see ``parallel/edge_partition.py`` for the explicit shard_map
  path with all_to_all boundary-row exchange.
- SP/CP-analog: the edge dimension is chunked per shard
  (``ops/propagate.propagate_segment_chunked``) to bound the message temp —
  the graph analog of blockwise/ring attention over a long sequence.
- PP: deliberately NOT implemented. LightGCN has one shared embedding
  table and 3-5 parameter-free propagation layers; there are no per-layer
  weights to place on different stages, and the activation working set
  (one [N, D] tensor) is the same at every layer — pipelining would add
  bubbles and boundary transfers without sharding any parameter state the
  ``model`` axis doesn't already shard better.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    force: bool = False,
) -> dict:
    """Initialize the multi-host JAX runtime (idempotent, safe single-host).

    ``force=True`` calls ``jax.distributed.initialize`` even with no
    explicit arguments — the no-arg call is what performs TPU-metadata
    coordinator auto-detection on GCE/GKE TPU VMs (``cli.train
    --distributed`` passes this; without it a bare flag would silently run
    every host as an independent single-process job). Explicit args mirror
    ``jax.distributed.initialize``. Returns a summary dict for logging.
    """
    already = getattr(jax.distributed, "is_initialized", lambda: False)()
    multi = (
        force
        or coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or (num_processes or 0) > 1
    )
    if multi and not already:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


_replicate_fns: dict = {}
# Bound the cache: each entry keeps a Mesh (device handles) and a compiled
# executable alive. One train() run uses 1-2 keys; a long-lived process that
# builds a fresh Mesh per run (the test suite, a retraining service) would
# otherwise grow it without limit.
_REPLICATE_FNS_MAX = 8


def replicate_tree(tree, mesh):
    """All-gather every leaf to a fully-replicated layout over ``mesh``.

    Multi-host checkpoint prerequisite: a leaf sharded across PROCESSES is
    not addressable from any one host (``np.asarray`` raises), so the
    checkpoint writer first replicates the tree — one compiled all-gather
    over ICI/DCN (the table fits one host comfortably: ~600 MB at cosmetics
    scale) — after which every process holds full copies and process 0 can
    write them. Single-process it is a cheap layout change.

    The jitted identity-with-out-shardings is CACHED per (mesh, leaf
    count): a fresh lambda per call would defeat jit's executable cache and
    recompile the gather on every checkpoint save (remote TPU compiles cost
    20 s–4 min here).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    key = (mesh, len(leaves))
    fn = _replicate_fns.get(key)
    if fn is None:
        rep = NamedSharding(mesh, P())
        fn = jax.jit(
            lambda *ls: ls, out_shardings=tuple(rep for _ in leaves)
        )
        while len(_replicate_fns) >= _REPLICATE_FNS_MAX:
            _replicate_fns.pop(next(iter(_replicate_fns)))  # evict oldest
        _replicate_fns[key] = fn
    out = fn(*leaves)
    return jax.tree_util.tree_unflatten(treedef, list(out))


def barrier(name: str = "barrier") -> None:
    """Cross-process synchronization point (no-op single-process).

    Used around checkpoint reads in the multi-host train loop: process 0
    writes the files, every process reads them back — a reader must not
    race ahead of the writer on a shared filesystem.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def assert_cross_host_agreement(value, name: str = "metric", atol: float = 0.0):
    """Determinism guard (SURVEY.md §5: the race-detection analog): assert a
    scalar metric is identical across hosts. On a single host this is free;
    on many hosts it catches divergent data shards / non-determinism early.
    """
    import jax.numpy as jnp
    import numpy as np

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(jnp.asarray(value))
    lo, hi = np.min(gathered), np.max(gathered)
    if hi - lo > atol:
        raise AssertionError(
            f"cross-host disagreement on {name}: min {lo} max {hi} (atol {atol})"
        )
