"""Device mesh construction for multi-chip / multi-host training.

The reference is strictly single-device (``src/train_lightgcn.py:13``;
SURVEY.md §2.3) — everything here is new design, following the standard JAX
recipe: build a ``jax.sharding.Mesh`` over the slice, annotate shardings, let
GSPMD insert collectives over ICI/DCN.

Axes:
- ``data``: BPR batches are sharded here (DP). Gradients of replicated
  tensors are psum-reduced by GSPMD.
- ``model``: the embedding TABLE is row-sharded here (TP) — at cosmetics
  scale the table + Adam state dominate memory (1.7M × dim × 3 buffers), so
  the model axis is what lets a small-HBM chip hold a shard.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_factorization(n_devices: int, max_model: int = 4) -> tuple[int, int]:
    """Pick (data, model) axis sizes for n devices.

    Prefer the largest power-of-two model axis up to ``max_model`` that
    divides n; remaining devices go to data parallelism.
    """
    model = 1
    m = 2
    while m <= max_model and n_devices % m == 0:
        model = m
        m *= 2
    return n_devices // model, model


def make_mesh(
    n_devices: Optional[int] = None,
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), f"requested {n} devices, have {len(devices)}"
    if axis_sizes is None:
        axis_sizes = mesh_factorization(n)
    assert int(np.prod(axis_sizes)) == n, (axis_sizes, n)
    dev_array = np.array(devices[:n]).reshape(*axis_sizes)
    return Mesh(dev_array, axis_names)
