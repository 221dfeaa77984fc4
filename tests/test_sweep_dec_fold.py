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


def _assert_live_messages_match(msgs_split, msgs_fold, prop):
    """The folded paths keep only the messages the p-d-p loop consumes:
    q_u (var[0]), eta and force; q_s/q_dc pass through stale."""
    np.testing.assert_allclose(msgs_split.var[0], msgs_fold.var[0],
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(msgs_split.fn, msgs_fold.fn):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(prop.var[1]),
                                  np.asarray(msgs_fold.var[1]))
    np.testing.assert_array_equal(np.asarray(prop.var[2]),
                                  np.asarray(msgs_fold.var[2]))


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

    _assert_live_messages_match(msgs_split, msgs_fold, prop)

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


def test_mask_fold_messages_and_masks_match_split(fused_env):
    from pdp_solver_tpu.problem.state import edge_masks_pair
    batch, problem, prop = _setup(seed=5)
    assert PR.use_sweep_mask_fold(batch)
    cfg = PR.SurveyPropagatorConfig(include_adaptors=False, pi=0.0)
    # a non-trivial mask state: deactivate some vars/clauses/instances
    problem = problem._replace(
        active_vars=jnp.asarray(problem.active_vars).at[::7].set(0.0),
        active_clauses=jnp.asarray(problem.active_clauses).at[::5].set(0.0))
    active_b = jnp.asarray(batch.instance_mask).at[1].set(0.0)
    em, ae = jax.jit(lambda p, a: edge_masks_pair(batch, p, a))(
        problem, active_b)

    msgs_split = jax.jit(lambda p: PR.survey_propagator_apply(
        {}, cfg, batch, p, p, em, ae))(prop)
    msgs_fold, (nd, sa), em_f, ae_f = jax.jit(
        lambda p: PR.survey_propagate_folded_masks(
            cfg, batch, p, p, problem, active_b))(prop)

    np.testing.assert_array_equal(np.asarray(em), np.asarray(em_f))
    np.testing.assert_array_equal(np.asarray(ae), np.asarray(ae_f))
    _assert_live_messages_match(msgs_split, msgs_fold, prop)


def test_verify_fold_counts_match_cnf_evaluate(fused_env):
    from pdp_solver_tpu.train.loss import cnf_evaluate
    batch, problem, prop = _setup(seed=7)
    assert PR.use_sweep_verify_fold(batch)
    cfg = PR.SurveyPropagatorConfig(include_adaptors=False, pi=0.0)
    # a partially-decimated solution state
    sol = (jax.random.uniform(jax.random.PRNGKey(9),
                              (batch.num_vars,)) > 0.5).astype(jnp.float32)
    problem = problem._replace(solution=sol)
    active_b = jnp.asarray(batch.instance_mask)

    msgs_v, agg_v, em_v, ae_v, (max_sat, got_sat) = jax.jit(
        lambda p: PR.survey_propagate_folded_masks(
            cfg, batch, p, p, problem, active_b, verify=True))(prop)
    msgs, agg, em, ae = jax.jit(
        lambda p: PR.survey_propagate_folded_masks(
            cfg, batch, p, p, problem, active_b))(prop)

    solved_ref, unsat_ref = jax.jit(
        lambda s: cnf_evaluate(batch, s[:, None]))(sol)
    solved = (max_sat == got_sat).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(solved), np.asarray(solved_ref))
    np.testing.assert_array_equal(np.asarray(max_sat - got_sat),
                                  np.asarray(unsat_ref))
    # the sweep itself must be untouched by the extra columns
    for a, b in zip(jax.tree_util.tree_leaves((msgs_v, agg_v, em_v, ae_v)),
                    jax.tree_util.tree_leaves((msgs, agg, em, ae))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def _solve(monkeypatch, fold, seed=3, mask_fold=True, verify_fold=True,
           m=110):
    monkeypatch.setenv("PDP_SWEEP_DEC_FOLD", "auto" if fold else "off")
    monkeypatch.setenv("PDP_SWEEP_MASK_FOLD",
                       "auto" if mask_fold else "off")
    monkeypatch.setenv("PDP_SWEEP_VERIFY_FOLD",
                       "auto" if verify_fold else "off")
    rng = np.random.default_rng(seed)
    cls = [random_ksat(rng, 30, m, 4) for _ in range(6)]
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
    # hard instances (alpha ~9.3) so the loop exhausts its budget in every
    # variant: the verify fold's loop-exit test lags one iteration when
    # everything solves early, which would shift the finalize rng
    kw = dict(m=280)
    b = _solve(monkeypatch, fold=False, **kw)
    a = _solve(monkeypatch, fold=True, **kw)
    c = _solve(monkeypatch, fold=True, mask_fold=False, **kw)
    d = _solve(monkeypatch, fold=True, verify_fold=False, **kw)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d, b, rtol=1e-5, atol=1e-6)
