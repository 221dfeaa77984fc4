"""Numerical parity against the reference implementation (torch CPU).

These tests run the ACTUAL reference modules from /root/reference/src on tiny
problems and assert our JAX ports produce the same numbers. Skipped when the
reference checkout is absent.

No reference code is copied; it is imported and executed as an oracle.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.modules.propagate import (
    SurveyPropagatorConfig, survey_propagator_apply,
    survey_propagator_init_state)
from pdp_solver_tpu.modules.predict import (
    SurveyScorerConfig, survey_scorer_apply)
from pdp_solver_tpu.problem.state import init_problem_state
from pdp_solver_tpu.train.loss import energy_loss, cnf_evaluate
from tests.helpers import cnf_instance, random_ksat


def _torch_problem(insts):
    import torch
    from pdp.nn.solver import SATProblem
    batch = pack_instances(insts, bucket=False)
    graph_map = torch.from_numpy(
        np.stack([np.asarray(batch.edge_var), np.asarray(batch.edge_clause)])
    ).int()
    bvm = torch.from_numpy(np.asarray(batch.var_batch)).int()
    bfm = torch.from_numpy(np.asarray(batch.clause_batch)).int()
    ef = torch.from_numpy(np.asarray(batch.edge_sign)[:, None]).float()
    problem = SATProblem((graph_map, bvm, bfm, ef, None, None),
                         torch.device("cpu"), 1)
    return batch, problem


@pytest.fixture
def tiny_batch(rng):
    insts = [cnf_instance(8, random_ksat(rng, 8, 20)),
             cnf_instance(6, random_ksat(rng, 6, 12))]
    return insts


def test_survey_propagator_parity(tiny_batch):
    import torch
    from pdp.nn.pdp_propagate import SurveyPropagator

    batch, t_problem = _torch_problem(tiny_batch)
    E = batch.num_edges

    ref_prop = SurveyPropagator(torch.device("cpu"), decimator_dimension=1,
                                include_adaptors=False)
    t_state = ref_prop.get_init_state(
        t_problem._graph_map, t_problem._batch_variable_map,
        t_problem._batch_function_map, t_problem._edge_feature, None,
        randomized=False, batch_replication=1)

    j_prop = survey_propagator_init_state(jax.random.PRNGKey(0), E,
                                          randomized=False)
    j_dec = j_prop

    t_prop = t_state
    t_dec = (t_state[0].clone(), t_state[1].clone())
    cfg = SurveyPropagatorConfig()
    ones_e = jnp.ones(E)

    for it in range(6):
        with torch.no_grad():
            t_out = ref_prop(t_prop, t_dec, t_problem, False, None)
        j_out = survey_propagator_apply({}, cfg, batch, j_prop, j_dec,
                                        ones_e, ones_e)
        np.testing.assert_allclose(np.stack([np.asarray(c)
                                             for c in j_out.var], axis=1),
                                   t_out[0].numpy(), rtol=1e-5, atol=1e-6,
                                   err_msg=f"var msgs diverge at iter {it}")
        np.testing.assert_allclose(np.stack([np.asarray(c)
                                             for c in j_out.fn], axis=1),
                                   t_out[1].numpy(), rtol=1e-5, atol=1e-6,
                                   err_msg=f"fn msgs diverge at iter {it}")
        # classical loop: decimator passes messages through
        t_prop, t_dec = t_out, t_out
        j_prop, j_dec = j_out, j_out


def test_survey_scorer_parity(tiny_batch):
    import torch
    from pdp.nn.pdp_propagate import SurveyPropagator
    from pdp.nn.pdp_predict import SurveyScorer

    batch, t_problem = _torch_problem(tiny_batch)
    E = batch.num_edges
    cfg = SurveyPropagatorConfig()
    ones_e = jnp.ones(E)

    ref_prop = SurveyPropagator(torch.device("cpu"), 1, False)
    ref_scorer = SurveyScorer(torch.device("cpu"), 1, False)

    t_state = ref_prop.get_init_state(
        t_problem._graph_map, t_problem._batch_variable_map,
        t_problem._batch_function_map, t_problem._edge_feature, None,
        False, 1)
    j_state = survey_propagator_init_state(jax.random.PRNGKey(0), E, False)

    # a few SP sweeps to land on non-trivial messages
    for _ in range(4):
        with torch.no_grad():
            t_state = ref_prop(t_state, t_state, t_problem, False, None)
        j_state = survey_propagator_apply({}, cfg, batch, j_state, j_state,
                                          ones_e, ones_e)

    with torch.no_grad():
        t_score, _ = ref_scorer(t_state, t_problem)
    problem = init_problem_state(batch)
    j_score, _ = survey_scorer_apply({}, SurveyScorerConfig(), batch,
                                     j_state, problem)
    np.testing.assert_allclose(np.asarray(j_score), t_score.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_energy_loss_parity(tiny_batch, rng):
    import torch
    from pdp.nn.util import SatLossEvaluator

    batch, t_problem = _torch_problem(tiny_batch)
    V = batch.num_vars
    pred = rng.uniform(0.05, 0.95, size=(V, 1)).astype(np.float32)

    ref_loss = SatLossEvaluator(alpha=0.1, device=torch.device("cpu"))
    with torch.no_grad():
        t_val = ref_loss(
            variable_prediction=torch.from_numpy(pred),
            label=None, graph_map=t_problem._graph_map,
            batch_variable_map=t_problem._batch_variable_map,
            batch_function_map=t_problem._batch_function_map,
            edge_feature=t_problem._edge_feature, meta_data=None,
            global_step=torch.tensor([3.0]),
            eps=torch.tensor([1e-8]), max_coeff=10.0, loss_sharpness=5)

    j_val = energy_loss(batch, jnp.asarray(pred), jnp.asarray(3.0), 0.1, 5)
    np.testing.assert_allclose(float(j_val), float(t_val), rtol=1e-5)


def test_cnf_evaluator_parity(tiny_batch, rng):
    import torch
    from pdp.nn.util import SatCNFEvaluator

    batch, t_problem = _torch_problem(tiny_batch)
    V = batch.num_vars
    pred = (rng.uniform(size=(V, 1)) > 0.5).astype(np.float32)

    ref_eval = SatCNFEvaluator(torch.device("cpu"))
    with torch.no_grad():
        t_solved, t_unsat = ref_eval(
            variable_prediction=torch.from_numpy(pred),
            graph_map=t_problem._graph_map,
            batch_variable_map=t_problem._batch_variable_map,
            batch_function_map=t_problem._batch_function_map,
            edge_feature=t_problem._edge_feature, meta_data=None)

    j_solved, j_unsat = cnf_evaluate(batch, jnp.asarray(pred))
    np.testing.assert_allclose(np.asarray(j_solved),
                               t_solved.numpy()[:, 0])
    np.testing.assert_allclose(np.asarray(j_unsat), t_unsat.numpy()[:, 0])


def test_simplify_parity(tiny_batch):
    """Unit-prop + peel must deactivate the same nodes and fix the same
    solution entries as the reference SATProblem.simplify()."""
    import torch

    # a chain formula that exercises both unit propagation and peeling
    insts = [cnf_instance(5, [[1], [-1, 2], [-2, 3], [4, 5], [4, -5]])]
    batch, t_problem = _torch_problem(insts)
    t_problem.simplify()

    from pdp_solver_tpu.problem.simplify import simplify
    problem = simplify(batch, init_problem_state(batch))

    np.testing.assert_allclose(np.asarray(problem.active_vars),
                               t_problem._active_variables.numpy()[:, 0])
    np.testing.assert_allclose(np.asarray(problem.active_clauses),
                               t_problem._active_functions.numpy()[:, 0])
    np.testing.assert_allclose(np.asarray(problem.solution),
                               t_problem._solution.numpy())
