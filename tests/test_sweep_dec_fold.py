"""Sweep<->decimator fold (propagate.survey_propagate_with_decimator_agg):
the sequential decimator's combined convergence+scorer reduce rides the
chained SP sweep kernel. Must be numerically identical to the split path
(survey_propagator_apply + the decimator's own fused reduce) message-wise
and across a full p-d-p solve."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import cnf_instance, random_ksat
from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.modules import decimate as D
from pdp_solver_tpu.modules import predict as P
from pdp_solver_tpu.modules import propagate as PR
from pdp_solver_tpu.problem.state import compute_edge_mask, init_problem_state
from pdp_solver_tpu.solvers import PDPSolver, SolverConfig


@pytest.fixture
def fused_env(monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "on")


def _setup(k=4, seed=0):
    rng = np.random.default_rng(seed)
    cls = [random_ksat(rng, 24, 72, k) for _ in range(5)]
    batch = pack_instances([cnf_instance(24, c) for c in cls])
    problem = init_problem_state(batch)
    prop = PR.survey_propagator_init_state(jax.random.PRNGKey(1),
                                           batch.num_edges, randomized=True)
    return batch, problem, prop


def test_fold_messages_and_agg_match_split(fused_env):
    batch, problem, prop = _setup()
    assert PR.use_sweep_decimator_fold(batch)
    cfg = PR.SurveyPropagatorConfig(include_adaptors=False, pi=0.0)
    em = compute_edge_mask(batch, problem)
    ae = jnp.ones((batch.num_edges,), jnp.float32)

    # classical p-d-p feeds the propagator its own messages as dec state
    msgs_split = jax.jit(lambda p: PR.survey_propagator_apply(
        {}, cfg, batch, p, p, em, ae))(prop)
    msgs_fold, (nd, scorer_agg) = jax.jit(
        lambda p: PR.survey_propagate_with_decimator_agg(
            cfg, batch, p, p, em, ae, problem.active_clauses))(prop)

    for a, b in zip(jax.tree_util.tree_leaves(msgs_split),
                    jax.tree_util.tree_leaves(msgs_fold)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    # reference columns: the decimator's own fused reduce on the new
    # messages with prev_eta = the sweep's input eta (the p-d-p invariant)
    from pdp_solver_tpu.ops.pallas_fused import fused_edge_pass
    nd8, _ = fused_edge_pass(
        D._smax_scorer_pass, node_cols=(problem.active_clauses,),
        gather_ids=batch.edge_clause, gather_uniform=batch.clause_width,
        edge_cols=(prop.fn[0], msgs_fold.fn[0], em, batch.edge_mask,
                   msgs_fold.fn[1], batch.edge_sign),
        reduce_ids=batch.edge_var, num_segments=batch.num_vars,
        n_red=8, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.stack(list(nd))),
                               np.asarray(nd8[:4]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.stack(list(scorer_agg))),
                               np.asarray(nd8[4:]), rtol=1e-5, atol=1e-6)


def _solve(monkeypatch, fold, seed=3):
    monkeypatch.setenv("PDP_SWEEP_DEC_FOLD", "auto" if fold else "off")
    rng = np.random.default_rng(seed)
    cls = [random_ksat(rng, 30, 110, 4) for _ in range(6)]
    batch = pack_instances([cnf_instance(30, c) for c in cls])
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.1, t_max=10,
        local_search_iterations=0, epsilon=0.5))
    key = jax.random.PRNGKey(0)
    r_state, r_fwd = jax.random.split(key)
    state = solver.get_init_state(r_state, batch, randomized=True)
    (pred, _), _ = jax.jit(lambda r, s: solver.forward(
        {}, r, batch, s, 60, is_training=False,
        check_termination=True))(r_fwd, state)
    return np.asarray(pred)


def test_full_pdp_solve_fold_matches_split(fused_env, monkeypatch):
    a = _solve(monkeypatch, fold=True)
    b = _solve(monkeypatch, fold=False)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
