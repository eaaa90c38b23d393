"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by ``bench.py`` and the driver's
``__graft_entry__`` checks; the test suite stays CPU-deterministic (SURVEY.md
§4: fake-mesh / multi-process-CPU tests for sharded paths before TPU runs).
"""
import os

# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
# jax.config.update is the reliable way to force the CPU backend.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
