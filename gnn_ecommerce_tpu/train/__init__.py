from .step import make_train_fns
from .checkpoint import save_checkpoint, load_checkpoint, restore_into
from .driver import TrainConfig, train

__all__ = [
    "make_train_fns",
    "save_checkpoint",
    "load_checkpoint",
    "restore_into",
    "TrainConfig",
    "train",
]
