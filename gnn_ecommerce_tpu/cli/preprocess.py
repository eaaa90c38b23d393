"""Event-log → weighted-edge CSV (reference preprocessing notebook as a CLI).

Replaces ``notebooks/1.data_preprocessing.ipynb``: reads an event CSV with
``user_id, item_id, event_type`` columns, applies the weight-map / clamp / cap
pipeline (``data/events.py``), and writes the ``u_i_weight``-style CSV the
trainer consumes.

    python -m gnn_ecommerce_tpu.cli.preprocess --events events.csv \
        -o u_i_weight.csv --scheme v1
"""
from __future__ import annotations

import argparse
import sys

import pandas as pd

from ..data.events import events_to_edges
from .config import WEIGHT_SCHEMES


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--events", required=True, help="event CSV (user_id,item_id,event_type)")
    ap.add_argument("-o", "--output", required=True, help="output weighted-edge CSV")
    ap.add_argument(
        "--scheme", default="v1", choices=sorted(WEIGHT_SCHEMES),
        help="event-type weight scheme (reference config.yaml:10-11)",
    )
    args = ap.parse_args(argv)

    events = pd.read_csv(args.events)
    missing = {"user_id", "item_id", "event_type"} - set(events.columns)
    if missing:
        sys.exit(f"events CSV missing columns: {sorted(missing)}")
    edges = events_to_edges(events, WEIGHT_SCHEMES[args.scheme])
    edges.to_csv(args.output, index=False)
    print(
        f"{len(events)} events -> {len(edges)} weighted edges "
        f"({edges['user_id'].nunique()} users x {edges['item_id'].nunique()} items) "
        f"-> {args.output}"
    )


if __name__ == "__main__":
    main()
