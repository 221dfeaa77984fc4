"""Config-matrix coverage: every reference YAML and every shipped YAML loads
through the config layer, builds its solver, and runs one tiny batch."""

import glob
import os

import jax
import numpy as np
import pytest

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.solvers import build_solver
from pdp_solver_tpu.utils.config import (
    load_yaml_config, apply_classical_overrides, validate)
from tests.helpers import cnf_instance, random_ksat

REF_CONFIGS = sorted(glob.glob("/root/reference/config/*/*.yaml"))
OUR_CONFIGS = sorted(glob.glob(
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 "config", "*", "*.yaml")))


def _tiny_batch():
    rng = np.random.default_rng(0)
    return pack_instances([
        cnf_instance(8, random_ksat(rng, 8, 12, k=3)),
        cnf_instance(6, random_ksat(rng, 6, 8, k=2)),
    ])


@pytest.mark.parametrize("path", REF_CONFIGS + OUR_CONFIGS,
                         ids=lambda p: "/".join(p.split(os.sep)[-3:]))
def test_config_loads_builds_and_runs_one_batch(path):
    config = load_yaml_config(path)
    config.setdefault("test_recurrence_num", 10)
    config = validate(apply_classical_overrides(config))
    solver = build_solver(config)

    batch = _tiny_batch()
    key = jax.random.PRNGKey(0)
    params = solver.init_params(key)
    state = solver.get_init_state(key, batch, randomized=True)
    (pred, _), _ = solver.forward(params, key, batch, state, 3,
                                  is_training=False, check_termination=True)
    assert pred.shape == (batch.num_vars, 1)
    assert bool(np.all(np.isfinite(np.asarray(pred))))


def test_reference_config_count_covered():
    """The shipped matrix covers at least the reference's footprint: all six
    model types and both config directories."""
    types = set()
    for p in OUR_CONFIGS:
        types.add(load_yaml_config(p)["model_type"])
    assert types == {"np-nd-np", "p-nd-np", "np-d-np", "p-d-p", "walk-sat",
                     "reinforce"}
    assert len([p for p in OUR_CONFIGS if "Train" in p]) >= 10
    assert len([p for p in OUR_CONFIGS if "Predict" in p]) >= 4
