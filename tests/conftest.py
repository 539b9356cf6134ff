"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session so the
platform/device-count flags take effect. Multi-chip sharding tests use the 8
virtual CPU devices; the real-TPU path is exercised by bench.py and
__graft_entry__.py instead.
"""

import os

# Force CPU even if the ambient environment selects a TPU platform: the test
# suite exercises numerics and sharding on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
