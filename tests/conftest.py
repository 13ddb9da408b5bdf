"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform so (a) tests are
deterministic (exact fp32 matmuls) and fast without a TPU and (b)
multi-device sharding tests run on a host-only machine.

Note: this image's sitecustomize.py (axon TPU plugin) imports jax at
interpreter startup, so JAX_PLATFORMS set here would be ignored — the
platform must be forced through jax.config instead; XLA_FLAGS is still read
lazily at backend init, which hasn't happened yet when conftest runs.
"""

import os

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
