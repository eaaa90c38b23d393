"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by ``bench.py`` and the driver's
``__graft_entry__`` checks; the test suite stays CPU-deterministic (SURVEY.md
§4: fake-mesh / multi-process-CPU tests for sharded paths before TPU runs).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
