"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform BEFORE jax is imported so
that (a) tests are deterministic/fast without a TPU and (b) multi-device
sharding tests can run on a host-only machine. Benchmarks (bench.py) run on
the real chip and do not import this.
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
