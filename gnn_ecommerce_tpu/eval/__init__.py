from .metrics import recall_precision_at_k, mark_frame
from .evaluate import (EvalBatch, build_eval_batch, build_eval_buckets, evaluate, evaluate_bucketed, recommend_users)

__all__ = [
    "recall_precision_at_k",
    "mark_frame",
    "EvalBatch",
    "build_eval_batch",
    "build_eval_buckets",
    "evaluate",
    "evaluate_bucketed",
    "recommend_users",
]
