from .events import raw_edge_weight, proper_edge_weight, events_to_edges
from .prepare import PreparedData, prepare_splits, split_edges
from .synthetic import synthetic_events

__all__ = [
    "raw_edge_weight",
    "proper_edge_weight",
    "events_to_edges",
    "PreparedData",
    "prepare_splits",
    "split_edges",
    "synthetic_events",
]
