"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The ambient environment selects the experimental 'axon' TPU platform and its
plugin overrides env-var platform selection (JAX_PLATFORMS / XLA_FLAGS are
ignored), so the platform must be forced through jax.config *before* backend
initialization. Tests exercise numerics and sharding on 8 virtual CPU
devices; the real-TPU path is exercised by bench.py and __graft_entry__.py.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
