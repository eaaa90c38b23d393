"""EDA CLI — dataset statistics + profiling report + event projection.

Covers the reference's notebook L1 surface (``notebooks/0.eda.ipynb``): reads
the raw event CSV (monthly dumps already concatenated, or any event log),
computes the headline statistics the notebook derives across cells 7-41
(``data/eda.py:event_stats``), writes them as JSON, optionally writes the
``user_item_event.csv`` projection artifact the notebook persists (cell 41)
and a self-contained HTML profiling report at ydata-profiling depth —
per-column distributions, quantiles, missing-value matrix, Pearson/Spearman
correlations (``data/profile.py``, matching the notebook's
``your_report.html`` from cells 13-15).

    python -m gnn_ecommerce_tpu.cli.eda --events raw.csv --item-col product_id \
        --stats stats.json --report report.html --out-events user_item_event.csv
"""
from __future__ import annotations

import argparse
import json
import sys

import pandas as pd

from ..data.eda import event_stats
from ..data.profile import profile_report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--events", required=True, help="raw event CSV")
    ap.add_argument("--user-col", default="user_id")
    ap.add_argument(
        "--item-col", default="item_id",
        help="item id column (the reference raw dump calls it product_id)",
    )
    ap.add_argument("--stats", help="write headline statistics JSON here")
    ap.add_argument(
        "--out-events",
        help="write the user_item_event.csv projection (reference eda cell 41)",
    )
    ap.add_argument("--report", help="write a self-contained HTML profile here")
    args = ap.parse_args(argv)

    # Full pandas read: the profile covers EVERY raw column (the reference
    # dump has 9; the native reader extracts only the three the pipeline
    # needs, which would silently shrink the report).
    events = pd.read_csv(args.events).rename(
        columns={args.user_col: "user_id", args.item_col: "item_id"}
    )
    missing = {"user_id", "item_id", "event_type"} - set(events.columns)
    if missing:
        sys.exit(f"events CSV missing columns: {sorted(missing)}")
    stats = event_stats(events)
    print(json.dumps(stats, indent=1))
    if args.stats:
        with open(args.stats, "w") as f:
            json.dump(stats, f, indent=1)
    if args.out_events:
        events[["user_id", "item_id", "event_type"]].to_csv(
            args.out_events, index=False
        )
        print(f"wrote {args.out_events}", file=sys.stderr)
    if args.report:
        with open(args.report, "w") as f:
            f.write(
                profile_report(
                    events, title="Event-log profile", headline=stats
                )
            )
        print(f"wrote {args.report}", file=sys.stderr)


if __name__ == "__main__":
    main()
