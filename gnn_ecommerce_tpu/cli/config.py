"""Typed framework configuration (reference ``config.yaml:1-17``).

The reference loads a loose YAML dict (``src/train_lightgcn.py:166-167``) and
hard-codes hyperparameters in a ``tune_config`` dict in code
(``src/train_lightgcn.py:47-53``); its ``random_seed: 42`` is declared but
never consumed (SURVEY.md §7.4). Here ONE dataclass covers paths, the edge
weighting scheme, model/training hyperparameters, eval K, and the mesh spec —
and the seed is actually plumbed through sampling/init.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import yaml

from ..data.events import EVENT_TYPE_WEIGHTS_V1, EVENT_TYPE_WEIGHTS_V2
from ..train.driver import TrainConfig

WEIGHT_SCHEMES = {"v1": EVENT_TYPE_WEIGHTS_V1, "v2": EVENT_TYPE_WEIGHTS_V2}


@dataclasses.dataclass
class FrameworkConfig:
    # Paths (reference config.yaml path block).
    raw_events_path: Optional[str] = None
    edges_path: Optional[str] = None           # weighted (user,item,weight) CSV
    data_dir: str = "data/prepared"            # prepared-artifact directory
    checkpoint_dir: str = "model-checkpoints"
    recommendations_dir: str = "model-recommendations"
    # Edge weighting (reference config.yaml event_type_weight / _v2).
    weight_scheme: str = "v1"
    event_type_weights: Optional[dict] = None  # explicit override
    # Train hyperparameters (reference tune_config + CLI -e).
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # Parallelism: devices to mesh for training (1 = single device,
    # 0 = all visible, N > 1 = explicit count). Mirrored into
    # TrainConfig.mesh_devices by the train CLI.
    mesh_devices: int = 1

    def weights(self) -> dict:
        return self.event_type_weights or WEIGHT_SCHEMES[self.weight_scheme]

    @classmethod
    def load(cls, path: str) -> "FrameworkConfig":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        train_raw = raw.pop("train", {})
        known = {f.name for f in dataclasses.fields(cls)} - {"train"}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        tknown = {f.name for f in dataclasses.fields(TrainConfig)}
        tunknown = set(train_raw) - tknown
        if tunknown:
            raise ValueError(f"unknown train config keys: {sorted(tunknown)}")
        return cls(train=TrainConfig(**train_raw), **raw)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(dataclasses.asdict(self), f, sort_keys=False)
