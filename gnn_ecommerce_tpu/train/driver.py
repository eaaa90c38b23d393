"""Training driver: epoch loop with per-epoch validation, best-model
checkpointing, structured logging, and resume.

Reference: ``TrainLightGCN`` (``src/train_lightgcn.py:8-162``). Differences by
design (SURVEY.md §7.4 documented deviations):
- the FINAL test evaluation uses the restored best checkpoint — the reference
  builds ``test_model`` from the best checkpoint but then evaluates the
  last-epoch ``model`` (``src/train_lightgcn.py:64-73``), a bug we fix;
- every epoch's losses/metrics are persisted as JSONL (the reference only
  prints and returns python lists);
- the RNG seed is actually consumed (the reference declares
  ``random_seed: 42`` in config.yaml but never uses it);
- mid-training resume restores optimizer state and epoch counter.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import jax
import numpy as np
import optax

from ..data.prepare import PreparedData
from ..eval.evaluate import build_eval_buckets, evaluate_bucketed
from ..graph.build import build_graph
from ..models.lightgcn import LightGCNConfig, get_embedding, init_params
from ..ops.propagate import propagate_segment
from ..sampling.bpr import make_sampler_data
from .checkpoint import BEST_NAME, LAST_NAME, load_checkpoint, restore_into, save_checkpoint
from .step import make_train_fns


@dataclasses.dataclass
class TrainConfig:
    """Hyperparameters (reference ``tune_config``,
    ``src/train_lightgcn.py:47-53``, defaults per README tunable ranges)."""

    latent_dim: int = 64
    n_layers: int = 3
    lr: float = 0.005
    decay: float = 1e-4
    batch_size: int = 1024
    epochs: int = 20
    k: int = 20
    seed: int = 42
    # Reference epoch definition: train_size // (batch_size * 40)
    # (src/train_lightgcn.py:92); None -> that formula, min 1.
    batches_per_epoch: Optional[int] = None
    checkpoint_dir: str = "model-checkpoints"
    mask_mode: str = "neginf"
    resume: bool = False
    sample_replace: bool = True
    log_path: Optional[str] = None  # default: <checkpoint_dir>/train_log.jsonl
    # When set, capture a jax.profiler trace (viewable in XProf/TensorBoard)
    # of epoch `profile_epoch` into this directory (SURVEY.md §5: the
    # reference has no compute tracing at all).
    profile_dir: Optional[str] = None
    profile_epoch: int = 1  # skip epoch 0 (compile noise)
    # Devices to train over: 1 = single device (scan-fused epoch), 0 = all
    # visible devices, N > 1 = a (data x model) mesh with the GSPMD sharded
    # step (embedding table row-sharded, batches data-sharded).
    mesh_devices: int = 1
    # Multi-device strategy when mesh_devices > 1: "gspmd" (annotated
    # shardings, GSPMD-inserted collectives) or "edge" (explicit edge
    # partitioning: shard_map + all_to_all boundary-row exchange overlapped
    # with the local SpMM, parallel/edge_partition.py). Checkpoints are
    # saved with UNPADDED tables either way, so infer/serve/resume interop
    # across strategies.
    partition: str = "gspmd"
    # Bipartite-factorized propagation (ops/bipartite.py): one-time dense
    # item-item operator build, then 2 SpMMs per forward instead of 2L —
    # ~5.6x faster forward at cosmetics scale on one v5e chip. "off",
    # "f32" (exact), or "bf16" (benchmarked mode, B_ii stored bf16). Works
    # single-device (scan-fused batched step) and with mesh_devices > 1
    # (B_ii row-sharded over the model axis, arcs over data).
    fast_bipartite: str = "off"
    # Static capacity (arcs) of the batched train forward's user-edge buffer
    # (ops/bipartite.fast_batch_embeddings). 0 -> auto: max(64*batch, 8192),
    # ~10x the expected batch degree sum; overflow is counted per step and
    # logged as dropped_arcs. Only used when fast_bipartite != "off".
    batch_edge_cap: int = 0
    # Dense-heavy-user hybrid head size K (ops/bipartite.FastOps): the top-K
    # users by degree leave the descriptor-bound gather plans for one shared
    # [n_items, K] MXU matmul per SpMM direction. 0 = off. Used when
    # fast_bipartite != "off", both single-device and on the GSPMD mesh
    # branch (sharded plans, ops/spmm_sharded.py).
    heavy_users: int = 0
    # Write checkpoints asynchronously: snapshot the leaves into the TPU
    # host's pinned_host memory space (one device->host DMA, measured
    # 7.7 GB/s on the target v5e — ~0.25 s at cosmetics scale) and let one
    # background thread do the slow link readback + npz write overlapped
    # with the next epoch's compute. Zero extra HBM is pinned (round 3's
    # device-side snapshot held ~2.6 GB next to the 6 GB B_ii and OOMed the
    # 16 GB chip at cosmetics scale, which is why this was opt-in then);
    # platforms without a pinned_host space fall back to a device-side copy.
    async_saves: bool = True
    # Save the LAST checkpoint every N epochs (always after the final epoch).
    # 0 = only at the end. At cosmetics scale a checkpoint is ~1.6 GB of
    # device->host readback; per-epoch saves through a slow link can dominate
    # wall-clock. The BEST params are tracked in an HBM copy regardless, so
    # best-model selection is exact even with throttled disk saves (the best
    # checkpoint's optimizer state is then the one from the epoch it is
    # written, which matches the reference's never-restored best opt state,
    # src/utils_v2.py:222-230).
    checkpoint_every: int = 1
    # Fraction of link time the async writer may occupy. After a readback +
    # write that took T seconds the writer idles T*(1-d)/d before taking the
    # next snapshot from the mailbox (flush/stop skip the idle). Self-tuning:
    # on a fast local link (real TPU-VM NVMe) writes are quick and the idle
    # is negligible; through a slow link (the measured ~12 MB/s tunnel here,
    # scripts/ckpt_readback_probe_r5.json) a saturating writer contends with
    # every train-step dispatch for the WHOLE run — TRAIN_FULL_r5.json's
    # epochs ran 57 s uncontended vs 65-72 s while a readback was in flight.
    # 1.0 = saturate (round-4 behavior); the on-disk LAST simply lags by up
    # to one extra readback interval, which is the same latest-wins
    # durability contract the mailbox already gives.
    async_save_duty: float = 0.5

    def hyperparams(self) -> dict:
        # Reference key-name parity for checkpoint metadata
        # (src/train_lightgcn.py:47-53).
        return {
            "latent_dim": self.latent_dim,
            "n_layers": self.n_layers,
            "LR": self.lr,
            "DECAY": self.decay,
            "BATCH_SIZE": self.batch_size,
        }


# Row-band size for async checkpoint snapshots (see _snapshot in
# _train_impl); module-level so tests can shrink it to exercise banding.
SNAPSHOT_BAND_BYTES = 32 << 20


@dataclasses.dataclass
class TrainResult:
    params: dict
    history: list
    best_epoch: int
    best_val_precision: float
    best_val_recall: float
    test_precision: float
    test_recall: float


def train(prepared: PreparedData, config: TrainConfig, verbose: bool = True) -> TrainResult:
    # Thin wrapper so the log file closes on ANY exit path (e.g. a device
    # error mid-epoch). The async checkpoint worker is a daemon thread, so a
    # worker stuck on a dead device link never blocks process exit.
    state: dict = {}
    try:
        return _train_impl(prepared, config, verbose, state)
    finally:
        stop_saver = state.get("stop_saver")
        if stop_saver is not None:
            stop_saver()  # unblock the daemon writer so it exits promptly
        log_f = state.get("log_f")
        if log_f is not None:
            log_f.close()


def _train_impl(
    prepared: PreparedData, config: TrainConfig, verbose: bool, _state: dict
) -> TrainResult:
    # Multi-host train loop: one driver per process (the reference is one
    # process on one GPU, src/train_lightgcn.py:13). Every process runs the
    # SAME control flow over identical replicated host inputs (the multi-host
    # contract: same prepared data, same seed); collectives keep device state
    # in lockstep. Only process 0 writes artifacts (logs here, checkpoint
    # files via the guard in train/checkpoint.py).
    t_setup0 = time.perf_counter()
    is_main = jax.process_index() == 0
    os.makedirs(config.checkpoint_dir, exist_ok=True)
    log_path = config.log_path or os.path.join(config.checkpoint_dir, "train_log.jsonl")
    log_f = open(log_path if is_main else os.devnull, "a")
    _state["log_f"] = log_f
    verbose = verbose and is_main

    def log(record: dict):
        record = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
                  for k, v in record.items()}
        log_f.write(json.dumps(record) + "\n")
        log_f.flush()
        if verbose:
            print(record.get("msg") or json.dumps(record))

    graph = build_graph(
        prepared.edge_user,
        prepared.edge_item_node,
        prepared.edge_weight,
        prepared.n_users,
        prepared.n_items,
        items_offset=True,
    )
    num_edges, num_arcs = graph.num_edges, graph.num_arcs
    sdata = make_sampler_data(prepared.sampler, prepared.n_users, prepared.n_items)
    # Mask-width-bucketed eval batches: a single globally-padded batch costs
    # O(users x max_degree) HBM (GBs at cosmetics scale); buckets bound the
    # padding and compile one shape per pow2 width. width_floor=256 keeps the
    # bucket count (= remote compiles, minutes each) to ~3-4: the measured
    # p99 mask width at cosmetics scale is ~150, so one floor bucket holds
    # 99%+ of users at ~25 MB padding.
    val_buckets = build_eval_buckets(prepared.val, width_floor=256)
    test_buckets = build_eval_buckets(prepared.test, width_floor=256)
    t_graph_s = time.perf_counter() - t_setup0

    cfg = LightGCNConfig(
        num_nodes=graph.num_nodes,
        embedding_dim=config.latent_dim,
        num_layers=config.n_layers,
    )
    key = jax.random.key(config.seed)
    params = init_params(jax.random.fold_in(key, 0), cfg)
    optimizer = optax.adam(config.lr)
    opt_state = optimizer.init(params)

    start_epoch = 0
    if config.resume and os.path.exists(
        os.path.join(config.checkpoint_dir, LAST_NAME, "meta.json")
    ):
        leaves, meta = load_checkpoint(config.checkpoint_dir, LAST_NAME)
        params, opt_state = restore_into(params, opt_state, leaves)
        start_epoch = meta["epoch"] + 1
        log({"msg": f"resumed from epoch {meta['epoch']} (next: {start_epoch})"})

    train_size = len(prepared.edge_user)
    n_batch = config.batches_per_epoch or max(1, train_size // (config.batch_size * 40))

    def _build_with_retry(build, what: str):
        """One-time operator builds retried ONCE on a transient chip-side
        RESOURCE_EXHAUSTED: the full-scale round-5 run hit one during the
        B_ii build with nothing else on the chip, and a plain retry
        succeeded (CLAUDE.md). A genuine OOM fails again immediately."""
        try:
            return build()
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            log(
                {
                    "msg": (
                        f"{what}: transient RESOURCE_EXHAUSTED "
                        f"({type(e).__name__}); retrying once in 10 s"
                    )
                }
            )
            time.sleep(10.0)
            return build()

    # Identity by default; the edge-partition branch swaps in a view that
    # strips row padding so checkpoints stay strategy-portable.
    ckpt_view = lambda tree: tree
    # Inverse of ckpt_view for params: checkpoints are saved UNPADDED, so a
    # final best-model restore must re-apply the run's row padding/sharding
    # before compute_embedding touches the restored table.
    post_restore = lambda p: p

    def _mesh_run_steps(step_fn, mesh_, step_arg=None):
        """Shared epoch loop for the mesh branches: call ``step_fn`` n times
        under the mesh context, averaging metrics. ``step_arg=None`` passes
        the per-call graph argument through (the GSPMD branches); a fixed
        value pins the partition structure (the edge branches)."""

        def run_steps(params, opt_state, graph_, sdata_, key_, n_steps):
            arg = graph_ if step_arg is None else step_arg
            with mesh_:
                acc = None
                for b in range(n_steps):
                    params, opt_state, m = step_fn(
                        params, opt_state, arg, sdata_,
                        jax.random.fold_in(key_, b),
                    )
                    acc = m if acc is None else {k: acc[k] + m[k] for k in m}
                metrics = {k: v / n_steps for k, v in acc.items()}
            return params, opt_state, metrics

        return run_steps

    mesh = None
    n_mesh = config.mesh_devices if config.mesh_devices != 0 else len(jax.devices())
    if n_mesh > 1 and config.partition == "edge":
        import jax.numpy as jnp

        from ..parallel import (
            build_edge_partition,
            make_explicit_fns,
            make_mesh,
            pad_params,
        )

        mesh = make_mesh(n_mesh, axis_sizes=(n_mesh,), axis_names=("model",))
        if config.fast_bipartite != "off":
            # Fast edge partition (parallel/edge_partition_fast.py): B_ii
            # factorization + per-shard fast SpMM plans + sharded heavy
            # head under explicit shard_map — per-layer comm is one [I, D]
            # psum instead of the layered path's boundary all_to_all.
            from ..ops.bipartite import build_item_operator, split_graph
            from ..parallel.edge_partition_fast import (
                build_fast_edge_partition,
                make_fast_edge_fns,
                merge_ep_view,
                split_ep_tree,
            )

            mode = "bfloat16" if config.fast_bipartite == "bf16" else "float32"
            t0 = time.perf_counter()
            split = split_graph(graph)
            item_op = _build_with_retry(
                lambda: build_item_operator(
                    split,
                    dtype=jnp.bfloat16
                    if config.fast_bipartite == "bf16"
                    else jnp.float32,
                ),
                "item-operator build",
            )
            with mesh:
                fep = build_fast_edge_partition(
                    split, mesh, item_op, msgs_dtype=mode,
                    heavy_users=config.heavy_users, heavy_dtype=mode,
                )
                del item_op  # lives on in fep, sharded
                params = split_ep_tree(params, fep, mesh)
                opt_state = (
                    optimizer.init(params)
                    if start_epoch == 0
                    else split_ep_tree(opt_state, fep, mesh)
                )
                edge_cap = config.batch_edge_cap or max(
                    64 * config.batch_size, 8192
                )
                embed_ep, estep_f = make_fast_edge_fns(
                    cfg, optimizer, mesh, fep, config.batch_size,
                    config.decay, edge_cap,
                )
            log(
                {
                    "msg": (
                        f"fast edge partition built in "
                        f"{time.perf_counter() - t0:.1f}s: {n_mesh} shards x "
                        f"{fep.rows_per_shard} user rows, B_ii "
                        f"{fep.item_op.nbytes / 1e9:.2f} GB row-sharded, "
                        f"heavy_users={config.heavy_users}"
                    )
                }
            )

            run_steps = _mesh_run_steps(estep_f, mesh, step_arg=fep)

            _embed_jit = jax.jit(embed_ep)  # fep passed per call, not baked

            def compute_embedding(p):
                with mesh:
                    return _embed_jit(p, fep)

            def ckpt_view(tree):
                return merge_ep_view(tree, fep)

            def post_restore(p):
                with mesh:
                    return split_ep_tree(p, fep, mesh)

            # The unified arc arrays are superseded by the partition slabs.
            graph = None
        else:
            part = build_edge_partition(graph, n_mesh)
            with mesh:
                params = pad_params(params, part, mesh)
                if start_epoch == 0:
                    opt_state = optimizer.init(params)
                else:
                    # Resumed opt-state leaves are unpadded (checkpoints
                    # strip the row padding); re-pad node-row leaves to S·R.
                    pad = part.padded_nodes - graph.num_nodes

                    def _pad_leaf(x):
                        if (
                            getattr(x, "ndim", 0) >= 1
                            and x.shape[0] == graph.num_nodes
                        ):
                            return jnp.pad(
                                x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)
                            )
                        return x

                    opt_state = jax.tree.map(_pad_leaf, opt_state)
                embed_part, estep = make_explicit_fns(
                    cfg, optimizer, mesh, part, config.batch_size, config.decay
                )
            log(
                {
                    "msg": (
                        f"edge partition: {n_mesh} shards x "
                        f"{part.rows_per_shard} rows, max boundary send "
                        f"{part.max_send} rows/peer"
                    )
                }
            )
            num_nodes_ = graph.num_nodes
            run_steps = _mesh_run_steps(estep, mesh, step_arg=part)

            def compute_embedding(p):
                with mesh:
                    return embed_part(p, part)[:num_nodes_]

            def ckpt_view(tree):
                return jax.tree.map(
                    lambda x: x[:num_nodes_]
                    if getattr(x, "ndim", 0) >= 1
                    and x.shape[0] == part.padded_nodes
                    else x,
                    tree,
                )

            def post_restore(p):
                with mesh:
                    return pad_params(p, part, mesh)

    elif n_mesh > 1:
        from ..parallel import (
            make_mesh,
            make_sharded_fast_train_step,
            make_sharded_train_step,
            shard_fast_bipartite,
            shard_graph,
            shard_params,
        )

        mesh = make_mesh(n_mesh)

        def post_restore(p):
            with mesh:
                return shard_params(p, mesh)

        with mesh:
            params = shard_params(params, mesh)
            if start_epoch == 0:  # a resumed opt_state must survive sharding
                opt_state = optimizer.init(params)
            if config.fast_bipartite != "off":
                import jax.numpy as jnp

                from ..ops.bipartite import build_fast_bipartite, fast_get_embedding

                t0 = time.perf_counter()
                fb = _build_with_retry(
                    lambda: build_fast_bipartite(
                        graph,
                        dtype=jnp.bfloat16
                        if config.fast_bipartite == "bf16"
                        else jnp.float32,
                    ),
                    "fast-bipartite build",
                )
                mode = (
                    "bfloat16" if config.fast_bipartite == "bf16" else "float32"
                )
                graph = shard_fast_bipartite(
                    fb,
                    mesh,
                    fast_ops=True,
                    msgs_dtype=mode,
                    heavy_users=config.heavy_users,
                    heavy_dtype=mode,
                )
                log(
                    {
                        "msg": (
                            f"fast bipartite operator built+sharded in "
                            f"{time.perf_counter() - t0:.1f}s "
                            f"({graph.item_op.nbytes / 1e9:.2f} GB over "
                            f"{mesh.shape['model']} model shards; sharded "
                            f"SpMM plans over {mesh.size} devices, "
                            f"heavy_users={config.heavy_users})"
                        )
                    }
                )
                edge_cap = config.batch_edge_cap or max(64 * config.batch_size, 8192)
                sharded_step = make_sharded_fast_train_step(
                    cfg, optimizer, mesh, config.batch_size, config.decay, edge_cap
                )
                _fast_jit = jax.jit(
                    lambda p, fb_: fast_get_embedding(p, fb_, cfg.num_layers)
                )
                compute_embedding = lambda p: _fast_jit(p, graph)
            else:
                graph = shard_graph(graph, mesh)
                sharded_step = make_sharded_train_step(
                    cfg, optimizer, mesh, config.batch_size, config.decay
                )

        run_steps = _mesh_run_steps(sharded_step, mesh)

        log({"msg": f"mesh training: {dict(zip(mesh.axis_names, mesh.devices.shape))}"})
    elif config.fast_bipartite != "off":
        import jax.numpy as jnp

        from ..ops.bipartite import build_fast_bipartite, fast_get_embedding

        t0 = time.perf_counter()
        # Measured-optimal SpMM plans ride along (ops/spmm_fast.py): message
        # precision follows the B_ii mode (bf16 = benchmarked, f32 = exact).
        fb = _build_with_retry(
            lambda: build_fast_bipartite(
                graph,
                dtype=jnp.bfloat16 if config.fast_bipartite == "bf16" else jnp.float32,
                fast_ops=True,
                msgs_dtype="bfloat16" if config.fast_bipartite == "bf16" else "float32",
                heavy_users=config.heavy_users,
                heavy_dtype="bfloat16" if config.fast_bipartite == "bf16" else "float32",
            ),
            "fast-bipartite build",
        )
        jax.block_until_ready(fb.item_op)
        log(
            {
                "msg": (
                    f"fast bipartite operator built in "
                    f"{time.perf_counter() - t0:.1f}s "
                    f"({fb.item_op.nbytes / 1e9:.2f} GB {config.fast_bipartite})"
                )
            }
        )
        # The unified arc arrays are fully superseded by fb.split on this
        # path; drop them (~0.3 GB HBM at cosmetics scale — the step's peak
        # residency already flirts with the 16 GB chip).
        graph = None
        from ..ops.bipartite import fast_batch_embeddings

        fast_embed_fn = lambda p, fb_: fast_get_embedding(p, fb_, cfg.num_layers)
        edge_cap = config.batch_edge_cap or max(64 * config.batch_size, 8192)
        _, run_steps_fast = make_train_fns(
            cfg,
            optimizer,
            config.batch_size,
            config.decay,
            sample_replace=config.sample_replace,
            embed_fn=fast_embed_fn,
            batch_embed_fn=lambda p, fb_, u, po, ne: fast_batch_embeddings(
                p, fb_, cfg.num_layers, u, po, ne, edge_cap=edge_cap
            ),
        )
        run_steps = lambda p, o, _g, s, k, n: run_steps_fast(p, o, fb, s, k, n)
        _fast_jit = jax.jit(fast_embed_fn)
        compute_embedding = lambda p: _fast_jit(p, fb)
    else:
        _, run_steps = make_train_fns(
            cfg,
            optimizer,
            config.batch_size,
            config.decay,
            sample_replace=config.sample_replace,
        )
    if config.fast_bipartite == "off" and not (
        n_mesh > 1 and config.partition == "edge"
    ):
        compute_embedding = lambda p: get_embedding(p, graph, cfg)

    if mesh is not None:
        # Sharded eval on every mesh branch (round-4 VERDICT weak #1: the
        # built-and-tested parallel/sharded_eval was never wired in, so
        # multi-device runs evaluated on ONE device — a ~20% serial tail at
        # the projected v5e-16 epoch time). Eval users shard over every mesh
        # axis; per-bucket sums reduce to replicated scalars, so the path is
        # also multi-PROCESS safe (no per-user vector needs one-host
        # addressability).
        from ..parallel.sharded_eval import make_sharded_eval_fn

        eval_fn = make_sharded_eval_fn(
            mesh, prepared.n_users, config.k, mask_mode=config.mask_mode
        )
        _eval_mesh = mesh

        def eval_buckets_fn(final_emb, buckets):
            with _eval_mesh:
                return eval_fn(final_emb, buckets)
    else:
        def eval_buckets_fn(final_emb, buckets):
            return evaluate_bucketed(
                final_emb, buckets, prepared.n_users, config.k,
                mask_mode=config.mask_mode,
            )

    if mesh is not None and jax.process_count() > 1:
        # Checkpoint leaves sharded across PROCESSES are not addressable from
        # any single host: replicate them (one compiled all-gather — the
        # table fits one host) as part of the checkpoint view, then only
        # process 0 writes (train/checkpoint.py guard).
        from ..parallel.distributed import replicate_tree

        _layout_view = ckpt_view

        def ckpt_view(tree):
            return replicate_tree(_layout_view(tree), mesh)

    log(
        {
            "msg": (
                f"training: {prepared.n_users} users x {prepared.n_items} items, "
                f"{num_edges} edges, {n_batch} batches/epoch, "
                f"dim {config.latent_dim}, {config.n_layers} layers"
            )
        }
    )

    # Async checkpoint writer: at cosmetics scale a checkpoint is ~1.6 GB of
    # device->host readback through a slow link (measured 30-60 s/save).
    # do_save snapshots the leaves into the TPU host's pinned_host memory
    # space first — one D2H DMA at PCIe rate (measured 7.7 GB/s on the
    # target chip), donation-safe (the train step donates params/opt
    # buffers; the DMA is awaited before do_save returns) and pinning ZERO
    # extra HBM — then a single DAEMON worker thread reads each snapshot
    # back through the slow link ONCE and writes every target checkpoint
    # dir from it, overlapped with the next epoch's device compute.
    # Platforms without a pinned_host space (CPU tests) fall back to a
    # device-side copy. The writer is WRITE-BEHIND WITH COALESCING (a
    # latest-wins mailbox, one slot per checkpoint name): a stale LAST (or
    # BEST) superseded while the link was busy is replaced in place and its
    # snapshot freed WITHOUT the slow readback. That makes every-epoch
    # saves safe even when one readback takes longer than an epoch
    # (measured: the tunnel can run at ~10 MB/s, ~3 epochs per 1.8 GB
    # checkpoint at cosmetics scale): training NEVER blocks on saves, the
    # on-disk checkpoint simply lags by at most one readback — the correct
    # degradation for a LAST/BEST policy. Outstanding snapshots are bounded
    # by construction: one per distinct checkpoint name in the box, plus
    # the one being read back. The daemon flag matters for failure
    # behavior: if the device link dies mid-readback, process exit is not
    # blocked on the stuck worker.
    import threading as _threading

    import jax.numpy as _jnp

    # Latest-wins MAILBOX, one slot per checkpoint name: do_save replaces a
    # still-queued save of the same name (freeing the superseded snapshot
    # immediately) and NEVER blocks — the full-scale run measured the old
    # bounded-queue design stalling an epoch for ~190 s whenever its slots
    # filled (writer readback ~150 s > epoch ~56 s through the slow link).
    # Outstanding snapshots are bounded by construction: one per distinct
    # name in the box (BEST, LAST) plus the one being read back.
    save_cv = _threading.Condition()
    save_box: dict = {}   # name -> (snapshot_id, snap_p, snap_o, meta_kw)
    save_busy = [False]
    save_stop = [False]
    save_flush = [False]  # flush in progress: the writer skips its duty idle
    save_seq = [0]
    save_errors: list = []
    save_stats = {
        "requested": 0, "written": 0, "coalesced": 0,
        "writer_busy_s": 0.0, "writer_bytes": 0,
    }

    def _has_pinned_host() -> bool:
        try:
            x = _jnp.zeros((8,), _jnp.float32)
            jax.device_put(
                x, x.sharding.with_memory_kind("pinned_host")
            ).block_until_ready()
            return True
        except Exception:
            return False

    # Multi-process: the single-device pinned_host probe passes, but a
    # device_put of a CROSS-PROCESS replicated array to pinned_host trips an
    # XLA SPMD RET_CHECK (side-effecting annotate_device_placement cannot
    # carry a replicated sharding) — measured in the 2-process gloo test.
    # The checkpoint view has already all-gathered into FRESH buffers there
    # (parallel.distributed.replicate_tree), so the jnp.copy fallback is a
    # plain device copy, not a donation hazard.
    pinned_host_ok = (
        config.async_saves and jax.process_count() == 1 and _has_pinned_host()
    )
    async_on = config.async_saves
    if async_on and not pinned_host_ok and jax.default_backend() == "tpu":
        # Without a pinned_host space the snapshot fallback is a DEVICE
        # copy, which pins ~params+opt in HBM — measured to OOM a 16 GB
        # chip at cosmetics scale next to the 6 GB B_ii (round 3). On TPU
        # that trade is never worth it: fall back to synchronous saves and
        # say so. (CPU keeps the copy fallback — host RAM is plentiful and
        # the tests exercise the async writer there.)
        async_on = False
        log(
            {
                "msg": (
                    "async_saves: no pinned_host memory space on this TPU "
                    "backend — falling back to SYNCHRONOUS saves (a device-"
                    "side snapshot would risk OOM at scale)"
                )
            }
        )
    elif async_on:
        log(
            {
                "msg": (
                    "async saves: "
                    + (
                        "pinned_host snapshots (zero extra HBM)"
                        if pinned_host_ok
                        else "device/host-copy snapshots (no pinned_host)"
                    )
                )
            }
        )
    # Big leaves are snapshotted as a LIST of row bands: the writer then
    # reads them back piece by piece, so its bulk transfer cannot head-of-
    # line-block other link traffic (measured: an unbanded 1.8 GB readback
    # through the ~12 MB/s tunnel inflated the per-epoch EVAL from ~1 s to
    # ~70 s while it was in flight) — the link interleaves at band
    # granularity (~3 s) instead of checkpoint granularity (~minutes).
    _BAND_BYTES = SNAPSHOT_BAND_BYTES

    def _snap_one(x):
        if pinned_host_ok:
            return jax.device_put(x, x.sharding.with_memory_kind("pinned_host"))
        return _jnp.copy(x)

    def _snapshot_leaf(x):
        nbytes = x.size * x.dtype.itemsize
        if getattr(x, "ndim", 0) >= 1 and nbytes > 2 * _BAND_BYTES:
            nb = -(-nbytes // _BAND_BYTES)
            rows = -(-x.shape[0] // nb)
            return [_snap_one(x[i * rows : (i + 1) * rows]) for i in range(nb)]
        return _snap_one(x)

    def _snapshot(tree):
        return jax.tree.map(_snapshot_leaf, tree)

    def _read_back(tree):
        """Banded-aware device->host readback (runs on the writer thread);
        yields the link between bands."""
        def one(x):
            if isinstance(x, list):
                parts = []
                for b in x:
                    parts.append(np.asarray(b))
                    time.sleep(0.01)  # let queued small RPCs interleave
                return np.concatenate(parts, axis=0)
            return np.asarray(x)

        return jax.tree.map(one, tree, is_leaf=lambda x: isinstance(x, list))

    duty = min(max(float(config.async_save_duty), 0.05), 1.0)

    def _tree_bytes(tree):
        tot = [0]

        def one(x):
            xs = x if isinstance(x, list) else [x]
            for b in xs:
                tot[0] += b.size * b.dtype.itemsize

        jax.tree.map(one, tree, is_leaf=lambda x: isinstance(x, list))
        return tot[0]

    def _writer():
        while True:
            with save_cv:
                while not save_box and not save_stop[0]:
                    save_cv.wait()
                if not save_box and save_stop[0]:
                    return
                items = dict(save_box)
                save_box.clear()
                save_busy[0] = True
            t_busy = time.perf_counter()
            try:
                # Names saved from the same do_save share one snapshot —
                # group so BEST+LAST of an improving epoch read back ONCE.
                groups: dict = {}
                for name, (sid, sp, so, kw) in items.items():
                    groups.setdefault(sid, (sp, so, []))[2].append((name, kw))
                for sid, (sp, so, names) in groups.items():
                    save_stats["writer_bytes"] += _tree_bytes(sp) + _tree_bytes(so)
                    host_p = _read_back(sp)  # one (banded) readback
                    host_o = _read_back(so)
                    for name, kw in names:
                        save_checkpoint(
                            config.checkpoint_dir, host_p, host_o,
                            hyperparams=config.hyperparams(), name=name, **kw,
                        )
                        save_stats["written"] += 1
                    del host_p, host_o
            except Exception as e:  # surfaced by the next do_save/flush
                save_errors.append(e)
            finally:
                busy_s = time.perf_counter() - t_busy
                save_stats["writer_busy_s"] += busy_s
                with save_cv:
                    save_busy[0] = False
                    save_cv.notify_all()
            # Duty-cycle idle: return the link to train-step dispatch for
            # T*(1-d)/d after a write that occupied it for T. A flush or
            # stop cuts the idle short (save_cv is notified by both).
            idle = busy_s * (1.0 - duty) / duty
            deadline = time.monotonic() + min(idle, 600.0)
            with save_cv:
                while (
                    time.monotonic() < deadline
                    and not save_stop[0]
                    and not save_flush[0]
                ):
                    save_cv.wait(
                        timeout=max(0.01, min(1.0, deadline - time.monotonic()))
                    )

    def _stop_saver():
        with save_cv:
            save_stop[0] = True
            save_cv.notify_all()

    saver = None
    if async_on:
        saver = _threading.Thread(target=_writer, daemon=True, name="ckpt-writer")
        saver.start()
        _state["stop_saver"] = _stop_saver

    def _raise_save_errors():
        if save_errors:
            errs = [f"{type(e).__name__}: {e}" for e in save_errors]
            save_errors.clear()
            raise RuntimeError(f"async checkpoint write(s) failed: {errs}")

    def do_save(params_t, opt_t, targets):
        """Write (params_t, opt_t) to every (name, meta-kwargs) in targets —
        one snapshot + one readback regardless of how many names share it
        (an improving epoch writes BEST and LAST from the same state).
        Never blocks: a save still in the mailbox is simply replaced."""
        if jax.process_count() > 1 and jax.process_index() != 0:
            # Only process 0 writes files (train/checkpoint.py guard); the
            # snapshot + banded readback on other processes would be pure
            # wasted bandwidth. The replicating ckpt_view (a collective) has
            # ALREADY run on every process by this point — skipping here is
            # local-only work.
            return
        if saver is None:
            for name, kw in targets:
                save_checkpoint(
                    config.checkpoint_dir, params_t, opt_t,
                    hyperparams=config.hyperparams(), name=name, **kw,
                )
            return
        _raise_save_errors()  # surface failures EARLY, not at end of run
        save_stats["requested"] += len(targets)
        snap = (_snapshot(params_t), _snapshot(opt_t))
        # Await the DMA (fast) so the next step may donate the live buffers.
        jax.block_until_ready(snap)
        with save_cv:
            save_seq[0] += 1
            sid = save_seq[0]
            for name, kw in targets:
                if name in save_box:  # superseded before it was written
                    save_stats["coalesced"] += 1
                save_box[name] = (sid, snap[0], snap[1], kw)
            save_cv.notify_all()

    def flush_saves():
        if saver is not None:
            with save_cv:
                save_flush[0] = True  # cut the writer's duty idle short
                save_cv.notify_all()
                while save_box or save_busy[0]:
                    save_cv.wait()
                save_flush[0] = False
            _raise_save_errors()
        if jax.process_count() > 1:
            # Readers (best-restore, a subsequent resume) must not race
            # process 0's file writes on a shared filesystem: every flush is
            # a cross-process sync point. Called at identical control-flow
            # points on every process (deterministic replicated driver), so
            # the collective barrier cannot deadlock.
            from ..parallel.distributed import barrier

            barrier("ckpt_flush")

    history = []
    best_recall = 0.0
    best_epoch = -1
    best_precision = 0.0
    best_params = None  # HBM copy of the best epoch's params (exact best
    # selection even when disk checkpointing is throttled)
    best_dirty = False  # best_params newer than the on-disk BEST checkpoint
    # A resumed run inherits the on-disk BEST as the bar to beat — otherwise
    # the resumed window's best (possibly worse) would overwrite it.
    best_meta_path = os.path.join(config.checkpoint_dir, BEST_NAME, "meta.json")
    if start_epoch > 0 and os.path.exists(best_meta_path):
        with open(best_meta_path) as f:
            bmeta = json.load(f)
        best_recall = float(bmeta.get("recall", 0.0))
        best_precision = float(bmeta.get("precision", 0.0))
        best_epoch = int(bmeta.get("epoch", -1))
        log(
            {
                "msg": (
                    f"resume: on-disk BEST (epoch {best_epoch}, "
                    f"R@{config.k} {best_recall:.6f}) is the bar to beat"
                )
            }
        )
    # Setup breakdown: the full-scale round-5 run had ~500 s of wall outside
    # the epoch loop with only the operator build logged — make every phase
    # visible so perf work targets measured time, not guesses.
    log(
        {
            "msg": (
                f"setup: {time.perf_counter() - t_setup0:.1f}s total "
                f"(graph+sampler+eval buckets {t_graph_s:.1f}s)"
            ),
            "setup_s": time.perf_counter() - t_setup0,
            "graph_setup_s": t_graph_s,
        }
    )
    for epoch in range(start_epoch, config.epochs):
        profiling = config.profile_dir and epoch == min(
            config.profile_epoch, config.epochs - 1
        )
        if profiling:
            jax.profiler.start_trace(config.profile_dir)
        t0 = time.perf_counter()
        params, opt_state, metrics = run_steps(
            params, opt_state, graph, sdata, jax.random.fold_in(key, 1000 + epoch), n_batch
        )
        jax.block_until_ready(params)
        t_train = time.perf_counter() - t0
        if profiling:
            jax.profiler.stop_trace()
            log({"msg": f"profiler trace (epoch {epoch}) -> {config.profile_dir}"})

        final_emb = compute_embedding(params)
        precision, recall = eval_buckets_fn(final_emb, val_buckets)
        del final_emb
        t_total = time.perf_counter() - t0
        rec = {
            "epoch": epoch,
            "bpr_loss": float(metrics["bpr_loss"]),
            "reg_loss": float(metrics["reg_loss"]),
            "loss": float(metrics["loss"]),
            "val_precision": precision,
            "val_recall": recall,
            "dropped_arcs": float(metrics.get("dropped_arcs", 0.0)),
            "train_s": t_train,
            # NB: through a remote device link block_until_ready is not a
            # reliable completion barrier (CLAUDE.md), so trailing step
            # compute can land in eval_s — the split is indicative, the
            # epoch_s total is the trustworthy number.
            "eval_s": t_total - t_train,
            "epoch_s": t_total,
            # Reference-equivalent work rate, NOT measured sparse ops: the
            # fast paths do algebraically less sparse work for the same
            # result; this counts the arcs x layers x 3 the reference's
            # layered fwd+bwd would process in the same wall-clock.
            "ref_equiv_edges_per_s": num_arcs
            * cfg.num_layers
            * n_batch
            * 3  # fwd + 2x in bwd (grad wrt messages and embeddings)
            / max(t_train, 1e-9),
        }
        history.append(rec)

        t_save0 = time.perf_counter()
        cur_targets = []  # saves of the CURRENT state: share one snapshot
        if recall > best_recall:
            best_recall, best_precision, best_epoch = recall, precision, epoch
            import jax.numpy as jnp

            best_params = jax.tree.map(jnp.copy, params)
            best_dirty = True
            if config.checkpoint_every == 1:
                cur_targets.append(
                    (BEST_NAME,
                     dict(epoch=epoch, precision=precision, recall=recall))
                )
                best_dirty = False
        last_due = config.checkpoint_every > 0 and (
            (epoch + 1) % config.checkpoint_every == 0
        )
        if last_due or epoch == config.epochs - 1:
            cur_targets.append(
                (LAST_NAME,
                 dict(epoch=epoch, precision=precision, recall=recall))
            )
        if cur_targets:
            do_save(ckpt_view(params), ckpt_view(opt_state), cur_targets)
            # Throttled mode persists BEST on the same cadence (when it
            # improved in an EARLIER epoch of this window) so a crash loses
            # at most checkpoint_every epochs of best-model progress. The
            # best params differ from the current state, so this is its own
            # snapshot.
            if best_dirty:
                do_save(
                    ckpt_view(best_params), ckpt_view(opt_state),
                    [(BEST_NAME,
                      dict(epoch=best_epoch, precision=best_precision,
                           recall=best_recall))],
                )
                best_dirty = False
        if cur_targets:
            # Snapshot/enqueue cost only (the readback+write runs on the
            # writer thread); lives OUTSIDE epoch_s by design.
            rec["save_s"] = time.perf_counter() - t_save0
        # Logged AFTER the save block so save_s reaches train_log.jsonl
        # (history would have it either way, but the JSONL is what survives
        # a crash).
        log(
            {
                **rec,
                "msg": (
                    f"Epoch {epoch}: Val P@{config.k}: {precision:.6f}, "
                    f"R@{config.k}: {recall:.6f}, Loss: ({metrics['bpr_loss']:.6f}, "
                    f"{metrics['reg_loss']:.6f}, {metrics['loss']:.6f}) "
                    f"[{t_total:.2f}s]"
                ),
            }
        )

    # Final test eval on the BEST params (fixes the reference bug that
    # evaluates the last-epoch model, src/train_lightgcn.py:73).
    if best_params is not None:
        params = best_params
        if best_dirty:  # improved after the last cadence save
            do_save(
                ckpt_view(params), ckpt_view(opt_state),
                [(BEST_NAME,
                  dict(epoch=best_epoch, precision=best_precision,
                       recall=best_recall))],
            )
    elif best_epoch >= 0:
        # Resumed window never beat the prior run's on-disk BEST — restore
        # it for the final test eval.
        flush_saves()
        leaves, _ = load_checkpoint(config.checkpoint_dir, BEST_NAME)
        # Checkpoints are written in the CHECKPOINT layout (ckpt_view:
        # unpadded rows, unified table) — restore into templates in that
        # same layout, then re-apply the run's padding/sharding/split
        # before compute_embedding touches the table. Restoring into the
        # RUN-layout templates would mis-map (or miscount) leaves under the
        # fast edge partition's split params.
        params, opt_state = restore_into(
            ckpt_view(params), ckpt_view(opt_state), leaves
        )
        params = post_restore(params)
    t_final0 = time.perf_counter()
    final_emb = compute_embedding(params)
    test_precision, test_recall = eval_buckets_fn(final_emb, test_buckets)
    t_test_s = time.perf_counter() - t_final0
    log(
        {
            "msg": (
                f"Best epoch ({best_epoch}): Val P@{config.k}: {best_precision:.6f}, "
                f"R@{config.k}: {best_recall:.6f} | Test P@{config.k}: "
                f"{test_precision:.6f}, R@{config.k}: {test_recall:.6f}"
            ),
            "best_epoch": best_epoch,
            "test_precision": test_precision,
            "test_recall": test_recall,
            "test_eval_s": t_test_s,
        }
    )
    t_flush0 = time.perf_counter()
    flush_saves()  # drain the async writer; surfaces worker exceptions
    if saver is not None:
        _stop_saver()  # stop the worker thread
        log(
            {
                "msg": (
                    f"async saves: {save_stats['written']} written, "
                    f"{save_stats['coalesced']} coalesced (superseded while "
                    f"the link was busy) of {save_stats['requested']} "
                    f"requested; writer busy "
                    f"{save_stats['writer_busy_s']:.0f}s for "
                    f"{save_stats['writer_bytes'] / 1e9:.1f} GB read back; "
                    f"final flush {time.perf_counter() - t_flush0:.1f}s"
                ),
                "flush_s": time.perf_counter() - t_flush0,
                **save_stats,
            }
        )
    return TrainResult(
        params=params,
        history=history,
        best_epoch=best_epoch,
        best_val_precision=best_precision,
        best_val_recall=best_recall,
        test_precision=test_precision,
        test_recall=test_recall,
    )
