"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-host/multi-chip logic is validated without a TPU slice via the
standard JAX fake-backend technique (SURVEY.md section 4): 8 host platform
devices let shard_map/pjit paths compile and run under pytest.
"""
import os

# NOTE: this image's sitecustomize imports jax at interpreter start (axon TPU
# plugin), so mutating JAX_PLATFORMS here is too late — use jax.config before
# any backend is initialized instead. XLA_FLAGS is still read lazily at CPU
# client creation.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
