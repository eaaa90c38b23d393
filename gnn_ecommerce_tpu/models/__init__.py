from .lightgcn import (
    LightGCNConfig,
    init_params,
    get_embedding,
    pair_scores,
    forward,
    predict_link,
)
from .losses import bpr_loss, bpr_loss_reference, reg_loss, link_pred_loss

__all__ = [
    "LightGCNConfig",
    "init_params",
    "get_embedding",
    "pair_scores",
    "forward",
    "predict_link",
    "bpr_loss",
    "bpr_loss_reference",
    "reg_loss",
    "link_pred_loss",
]
