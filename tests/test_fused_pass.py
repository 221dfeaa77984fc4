"""The fused edge-pass kernels must match the XLA fallback exactly.

PDP_FUSED_PASS=on forces the Pallas path (interpret mode off-TPU);
PDP_FUSED_PASS=off forces the segment-op fallback. The two must agree on
the SP sweep, the survey scorer, and a full p-d-p solve.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.modules.propagate import (
    SurveyPropagatorConfig, survey_propagator_apply,
    survey_propagator_init_state)
from pdp_solver_tpu.modules.predict import (
    SurveyScorerConfig, survey_scorer_apply)
from pdp_solver_tpu.problem.state import init_problem_state
from tests.helpers import cnf_instance, random_ksat


@pytest.fixture
def batch():
    rng = np.random.default_rng(5)
    insts = [cnf_instance(12, random_ksat(rng, 12, 30, k=3)),
             cnf_instance(9, random_ksat(rng, 9, 20, k=3))]
    b = pack_instances(insts)
    assert b.fast_var and b.fast_clause
    return b


def _sweep_n(batch, n, pi=0.0):
    cfg = SurveyPropagatorConfig(pi=pi)
    E = batch.num_edges
    state = survey_propagator_init_state(jax.random.PRNGKey(1), E, True)
    ones = jnp.ones(E)
    for _ in range(n):
        state = survey_propagator_apply({}, cfg, batch, state, state,
                                        ones * batch.edge_mask, ones)
    return state


def _assert_real_edges_close(batch, ref, got):
    """Padding-edge state is meaningless by contract (every consumer masks
    it); compare [E]-shaped leaves on real edges only."""
    m = np.asarray(batch.edge_mask)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        a, b = np.asarray(a), np.asarray(b)
        if a.shape == m.shape:
            a, b = a * m, b * m
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_sp_sweep_fused_matches_fallback(batch, monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = _sweep_n(batch, 4)
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = _sweep_n(batch, 4)
    _assert_real_edges_close(batch, ref, got)


def test_sp_sweep_fused_matches_fallback_with_pi(batch, monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = _sweep_n(batch, 3, pi=0.1)
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = _sweep_n(batch, 3, pi=0.1)
    _assert_real_edges_close(batch, ref, got)


def test_scorer_fused_matches_fallback(batch, monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    state = _sweep_n(batch, 4)
    problem = init_problem_state(batch)
    ref, _ = survey_scorer_apply({}, SurveyScorerConfig(), batch, state,
                                 problem)
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got, _ = survey_scorer_apply({}, SurveyScorerConfig(), batch, state,
                                 problem)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-6)


def test_full_pdp_solve_fused_matches_fallback(monkeypatch):
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.train.loss import cnf_evaluate
    rng = np.random.default_rng(7)
    insts = [cnf_instance(15, random_ksat(rng, 15, 40, k=3))
             for _ in range(3)]
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(model_type="p-d-p"))
    key = jax.random.PRNGKey(3)
    state = solver.get_init_state(key, batch, randomized=True)

    def solve():
        (pred, _), _ = solver.forward({}, jax.random.PRNGKey(9), batch,
                                      state, 40, is_training=False)
        return pred

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = solve()
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = solve()
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-5)


def test_walksat_fused_matches_fallback(monkeypatch):
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    rng = np.random.default_rng(17)
    insts = [cnf_instance(12, random_ksat(rng, 12, 30, k=3))
             for _ in range(3)]
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(model_type="walk-sat",
                                    local_search_iterations=60,
                                    epsilon=0.3))
    state = solver.get_init_state(jax.random.PRNGKey(0), batch, True)

    def solve():
        (pred, _), _ = solver.forward({}, jax.random.PRNGKey(2), batch,
                                      state, 1, is_training=False)
        return pred

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = solve()
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = solve()
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got))


def test_pdp_with_termination_fused_matches_fallback(monkeypatch):
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    rng = np.random.default_rng(23)
    insts = [cnf_instance(10, random_ksat(rng, 10, 25, k=3))
             for _ in range(2)]
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(model_type="p-d-p"))
    state = solver.get_init_state(jax.random.PRNGKey(1), batch, True)

    def solve():
        (pred, _), _ = solver.forward(
            {}, jax.random.PRNGKey(5), batch, state, 30,
            is_training=False, check_termination=True)
        return pred

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = solve()
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = solve()
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-5)


def test_edge_mask_and_cnf_eval_fused_match(monkeypatch, batch):
    from pdp_solver_tpu.problem.state import (
        init_problem_state, compute_edge_mask, edge_active_instance_mask)
    from pdp_solver_tpu.train.loss import cnf_evaluate

    problem = init_problem_state(batch)
    problem = problem._replace(
        active_vars=problem.active_vars
        * (np.arange(batch.num_vars) % 3 != 0),
        active_clauses=problem.active_clauses
        * (np.arange(batch.num_clauses) % 4 != 0))
    active_b = jnp.asarray(
        (np.arange(batch.batch_size) % 2 == 0).astype(np.float32))
    pred = jax.random.uniform(jax.random.PRNGKey(8),
                              (batch.num_vars, 1))

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = (compute_edge_mask(batch, problem),
           edge_active_instance_mask(batch, active_b),
           cnf_evaluate(batch, pred))
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = (compute_edge_mask(batch, problem),
           edge_active_instance_mask(batch, active_b),
           cnf_evaluate(batch, pred))
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
