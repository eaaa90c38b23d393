from .metrics import recall_precision_at_k, mark_frame
from .evaluate import EvalBatch, build_eval_batch, evaluate, recommend_users

__all__ = [
    "recall_precision_at_k",
    "mark_frame",
    "EvalBatch",
    "build_eval_batch",
    "evaluate",
    "recommend_users",
]
