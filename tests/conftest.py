"""Test harness config: run all tests on a virtual 8-device CPU mesh.

This is the JAX-native "fake backend" pattern (SURVEY.md section 4): multi-chip
sharding logic is validated without TPUs by splitting the host CPU into 8 XLA
devices. Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
