"""Test harness config: run all tests on a virtual 8-device CPU mesh.

This is the JAX-native "fake backend" pattern (SURVEY.md section 4): multi-chip
sharding logic is validated without TPUs by splitting the host CPU into 8 XLA
devices.

NOTE: the environment may pre-import jax with a TPU platform pinned via
sitecustomize, so setting JAX_PLATFORMS in os.environ here is too late;
jax.config.update still works because no backend has been initialised yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
