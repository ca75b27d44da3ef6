"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-host/multi-chip logic is validated without a TPU slice via the
standard JAX fake-backend technique (SURVEY.md section 4): 8 host platform
devices let shard_map/pjit paths compile and run under pytest.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
