"""Training CLI (reference ``python src/train_lightgcn.py -e E -g G``,
``src/train_lightgcn.py:165-189``).

    python -m gnn_ecommerce_tpu.cli.train --synthetic -e 5
    python -m gnn_ecommerce_tpu.cli.train --edges u_i_weight.csv -e 20
    python -m gnn_ecommerce_tpu.cli.train --config framework.yaml

No ``-g GPU`` flag: device selection is JAX's job (the single-controller
process sees every local TPU chip; meshes are configured via the config's
``mesh_devices``). After training, the prepared dataset artifact is saved to
``data_dir`` (the analog of the reference persisting processed split CSVs,
``src/train_lightgcn.py:39-41``) so infer/serve can start without redoing
ETL.

Multi-HOST (one process per host on a TPU slice): launch the same command on
every host with the bootstrap flags — on GCE/GKE TPU VMs the bare
``--distributed`` flag suffices (coordinator auto-detected from TPU
metadata); elsewhere pass all three explicitly:

    python -m gnn_ecommerce_tpu.cli.train --synthetic -e 20 --mesh 0 \\
        --partition edge --fast bf16 \\
        --coordinator host0:9999 --num-processes 2 --process-id $ID

Every host must see the same input data (identical seeds/paths — the
replicated-host-input contract); checkpoints/logs are written by process 0
only. The 2-process CPU rehearsal of exactly this path lives in
``tests/test_multiprocess.py``.
"""
from __future__ import annotations

import argparse
import os

import pandas as pd

from ..data.artifacts import save_prepared
from ..data.events import events_to_edges
from ..data.prepare import prepare_splits, split_edges
from ..data.synthetic import synthetic_events
from ..train.driver import train
from .config import FrameworkConfig, WEIGHT_SCHEMES


def load_edges(args, cfg: FrameworkConfig) -> pd.DataFrame:
    if args.synthetic:
        events = synthetic_events(
            n_users=args.synthetic_users,
            n_items=args.synthetic_items,
            n_events=args.synthetic_events,
            seed=cfg.train.seed,
            n_clusters=args.synthetic_clusters,
            affinity=args.synthetic_affinity,
            user_skew=args.synthetic_user_skew,
            item_skew=args.synthetic_item_skew,
            n_pairs=args.synthetic_pairs or None,
        )
        return events_to_edges(events, cfg.weights())
    if args.movielens:
        from ..data.movielens import load_movielens

        return load_movielens(args.movielens)
    path = args.edges or cfg.edges_path
    if path:
        edges = pd.read_csv(path)
        missing = {"user_id", "item_id", "weight"} - set(edges.columns)
        if missing:
            raise SystemExit(f"edges CSV missing columns: {sorted(missing)}")
        return edges
    events_path = args.events or cfg.raw_events_path
    if events_path:
        return events_to_edges(pd.read_csv(events_path), cfg.weights())
    raise SystemExit("provide --edges, --events, --synthetic, or config paths")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", help="framework YAML config")
    ap.add_argument("--edges", help="weighted-edge CSV (user_id,item_id,weight)")
    ap.add_argument("--events", help="raw event CSV (runs the weight pipeline)")
    ap.add_argument(
        "--movielens",
        help="MovieLens ratings file (u.data / ratings.dat; BASELINE config 2)",
    )
    ap.add_argument("--synthetic", action="store_true", help="synthetic dataset")
    ap.add_argument("--synthetic-users", type=int, default=2000)
    ap.add_argument("--synthetic-items", type=int, default=300)
    ap.add_argument("--synthetic-events", type=int, default=30000)
    ap.add_argument(
        "--synthetic-clusters", type=int, default=0,
        help="latent co-clusters (learnable structure; 0 = popularity only)",
    )
    ap.add_argument(
        "--synthetic-pairs", type=int, default=0,
        help="pin the unique (user,item) pair count (0 = independent draws)",
    )
    ap.add_argument(
        "--synthetic-affinity", type=float, default=0.7,
        help="P(event stays in the user's cluster) when clusters > 0; the "
        "headroom study (scripts/corpus_headroom2_r3.py) picked 0.85",
    )
    ap.add_argument(
        "--synthetic-user-skew", type=float, default=0.8,
        help="zipf exponent for user activity",
    )
    ap.add_argument(
        "--synthetic-item-skew", type=float, default=1.0,
        help="zipf exponent for item popularity (lower = flatter; 0.9 in "
        "the headroom-validated corpus)",
    )
    ap.add_argument("-e", "--epochs", type=int, help="override config epochs")
    ap.add_argument("--dim", type=int, help="override latent_dim")
    ap.add_argument("--layers", type=int, help="override n_layers")
    ap.add_argument("--scheme", choices=sorted(WEIGHT_SCHEMES), help="weight scheme")
    ap.add_argument("--resume", action="store_true", help="resume from last checkpoint")
    ap.add_argument(
        "--mesh", type=int, help="devices to mesh (1=single, 0=all visible)"
    )
    ap.add_argument(
        "--partition", choices=["gspmd", "edge"],
        help="multi-device strategy: GSPMD annotated shardings, or explicit "
        "edge partitioning (shard_map + all_to_all boundary exchange)",
    )
    ap.add_argument(
        "--fast", choices=["off", "f32", "bf16"],
        help="bipartite-factorized propagation (single device)",
    )
    ap.add_argument(
        "--heavy-users", type=int,
        help="dense-heavy-user head size K for the fast path (0=off)",
    )
    ap.add_argument(
        "--checkpoint-every", type=int,
        help="save LAST checkpoint every N epochs (0 = only at the end)",
    )
    ap.add_argument(
        "--distributed", action="store_true",
        help="initialize the multi-host JAX runtime (coordinator auto-"
        "detected from TPU metadata on GCE/GKE TPU VMs)",
    )
    ap.add_argument(
        "--coordinator",
        help="multi-host coordinator address host:port (implies --distributed)",
    )
    ap.add_argument("--num-processes", type=int, help="total host processes")
    ap.add_argument("--process-id", type=int, help="this host's process index")
    args = ap.parse_args(argv)

    if (
        args.distributed
        or args.coordinator
        # Any multi-host signal must reach init_distributed — gating on
        # --distributed/--coordinator alone would let `--num-processes 2
        # --process-id 1` (or an ambient JAX_COORDINATOR_ADDRESS) silently
        # run every host as an independent single-process job, each passing
        # the process_index()==0 write guards and tearing shared artifacts.
        or (args.num_processes or 0) > 1
        or args.process_id is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    ):
        # MUST run before any backend-initializing JAX call; the import
        # chain above is import-only (see ops/topk_score.py note).
        from ..parallel.distributed import init_distributed

        info = init_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            # Bare --distributed: the NO-ARG initialize() call is what
            # auto-detects the coordinator from TPU metadata; without
            # force the helper would skip it and every host would run as
            # an independent single-process job.
            force=args.distributed,
        )
        print(f"distributed: {info}")

    cfg = FrameworkConfig.load(args.config) if args.config else FrameworkConfig()
    if args.epochs is not None:
        cfg.train.epochs = args.epochs
    if args.dim is not None:
        cfg.train.latent_dim = args.dim
    if args.layers is not None:
        cfg.train.n_layers = args.layers
    if args.scheme:
        cfg.weight_scheme = args.scheme
    if args.resume:
        cfg.train.resume = True
    if args.mesh is not None:
        cfg.mesh_devices = args.mesh
    if args.partition:
        cfg.train.partition = args.partition
    if args.fast:
        cfg.train.fast_bipartite = args.fast
    if args.heavy_users is not None:
        cfg.train.heavy_users = args.heavy_users
    if args.checkpoint_every is not None:
        cfg.train.checkpoint_every = args.checkpoint_every
    cfg.train.mesh_devices = cfg.mesh_devices
    cfg.train.checkpoint_dir = cfg.checkpoint_dir

    edges = load_edges(args, cfg)
    print(f"{len(edges)} weighted edges; splitting + preparing ...")
    tr, va, te = split_edges(edges, seed=cfg.train.seed)
    prepared = prepare_splits(tr, va, te)
    import jax

    if jax.process_index() == 0:  # multi-host: one writer (shared fs safe)
        os.makedirs(cfg.data_dir, exist_ok=True)
        save_prepared(prepared, cfg.data_dir)
        print(f"prepared artifact -> {cfg.data_dir}")

    result = train(prepared, cfg.train)
    print(
        f"done: best epoch {result.best_epoch} "
        f"val R@{cfg.train.k} {result.best_val_recall:.6f} | "
        f"test P@{cfg.train.k} {result.test_precision:.6f} "
        f"R@{cfg.train.k} {result.test_recall:.6f}"
    )


if __name__ == "__main__":
    main()
