"""Combined verification + edge-mask kernel (ops/pallas_verify.py): must
match cnf_evaluate + the solved-freeze update + edge_masks_pair exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import cnf_instance, random_ksat
from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.ops.pallas_verify import use_verify_masks, verify_and_masks
from pdp_solver_tpu.problem.state import (
    edge_masks_pair, init_problem_state)
from pdp_solver_tpu.train.loss import cnf_evaluate


@pytest.fixture
def fused_env(monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "on")


@pytest.mark.parametrize("k,seed", [(3, 0), (4, 1)])
def test_verify_masks_matches_split_path(fused_env, k, seed):
    rng = np.random.default_rng(seed)
    cls = [random_ksat(rng, 20, 50 if k == 3 else 70, k) for _ in range(6)]
    batch = pack_instances([cnf_instance(20, c) for c in cls])
    assert use_verify_masks(batch)
    problem = init_problem_state(batch)
    # deactivate a couple of variables/clauses so em is non-trivial
    problem = problem._replace(
        active_vars=jnp.asarray(problem.active_vars).at[3].set(0.0),
        active_clauses=jnp.asarray(problem.active_clauses).at[7].set(0.0))
    V = batch.num_vars
    pred = (jax.random.uniform(jax.random.PRNGKey(5), (V, 1))
            > 0.4).astype(jnp.float32)
    active_b = jnp.asarray(batch.instance_mask).at[2].set(0.0)

    def combined(pr, ab, vp):
        return verify_and_masks(batch, pr, ab, vp, interpret=True)

    def split(pr, ab, vp):
        solved, unsat = cnf_evaluate(batch, vp)
        ab2 = ab * (solved <= 0.5).astype(jnp.float32)
        em, ae = edge_masks_pair(batch, pr, ab2)
        return solved, unsat, em, ae

    a = jax.jit(combined)(problem, active_b, pred)
    b = jax.jit(split)(problem, active_b, pred)
    names = ("solved", "unsat", "em", "ae")
    for n, xa, xb in zip(names, a, b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=0, atol=0, err_msg=n)
