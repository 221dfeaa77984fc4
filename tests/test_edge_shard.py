"""Edge-sharded SP must reproduce the single-device SP exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.modules.propagate import (
    SurveyPropagatorConfig, survey_propagator_apply)
from pdp_solver_tpu.modules.predict import (
    SurveyScorerConfig, survey_scorer_apply)
from pdp_solver_tpu.parallel.edge_shard import (
    shard_instance, make_edge_sharded_sp, init_states)
from pdp_solver_tpu.parallel import make_mesh
from pdp_solver_tpu.problem.state import init_problem_state
from tests.helpers import cnf_instance, random_ksat


def test_edge_sharded_sp_matches_single_device(rng):
    n, m = 60, 240
    clauses = random_ksat(rng, n, m, 3)
    inst = cnf_instance(n, clauses)

    n_shards = 8
    mesh = make_mesh(n_shards, axis_name="es")
    graph = shard_instance(inst[0], inst[1], inst[2], inst[3], n_shards)
    run = make_edge_sharded_sp(graph, n_iters=6, mesh=mesh)
    v0, f0 = init_states(graph, jax.random.PRNGKey(0), randomized=False)
    score_sharded, _ = run(graph, v0, f0)

    # single-device oracle on the identically-ordered edge list
    batch = pack_instances([inst], bucket=False)
    # shard_instance keeps the original (clause-major) edge order, and
    # pack_instances stable-sorts by clause, so orders agree
    E = batch.num_edges
    from pdp_solver_tpu.modules.propagate import SPMessages
    third = jnp.full((E,), 1.0 / 3.0)
    state = SPMessages(var=(third, third, third),
                       fn=(0.5 * jnp.ones((E,)), jnp.zeros((E,))))
    cfg = SurveyPropagatorConfig()
    ones = jnp.ones(E)
    for _ in range(6):
        state = survey_propagator_apply({}, cfg, batch, state, state,
                                        ones, ones)
    problem = init_problem_state(batch)
    score_single, _ = survey_scorer_apply({}, SurveyScorerConfig(), batch,
                                          state, problem)

    np.testing.assert_allclose(np.asarray(score_sharded),
                               np.asarray(score_single)[:, 0],
                               rtol=1e-4, atol=1e-5)


def test_edge_sharded_full_solve(rng):
    """End-to-end sharded p-d-p solve of one CNF: the assignment must
    satisfy the formula, and the unsharded solver must agree it is
    solvable at this budget."""
    from pdp_solver_tpu.parallel.edge_shard import make_edge_sharded_solver
    from tests.helpers import check_assignment

    n, m = 40, 140  # alpha=3.5 3-SAT: easy enough for SP decimation
    clauses = random_ksat(rng, n, m, 3)
    inst = cnf_instance(n, clauses)

    n_shards = 8
    mesh = make_mesh(n_shards, axis_name="es")
    graph = shard_instance(inst[0], inst[1], inst[2], inst[3], n_shards)
    # t_max=2 forces a decimation at least every 3rd sweep, enough to fix
    # all 40 variables well inside the budget
    run = make_edge_sharded_solver(graph, mesh=mesh, iteration_num=150,
                                   tolerance=0.02, t_max=2.0)
    v0, f0 = init_states(graph, jax.random.PRNGKey(1), randomized=True)
    sol, solved, iters, _ = run(graph, v0, f0, jax.random.PRNGKey(2))

    assert float(solved) == 1.0, "sharded solver did not finish the CNF"
    assert check_assignment(clauses, np.asarray(sol)[:n]), \
        "sharded 'solved' assignment does not satisfy the formula"
    assert 0 < float(iters) <= 150


def test_edge_sharded_solve_detects_unsat(rng):
    from pdp_solver_tpu.parallel.edge_shard import make_edge_sharded_solver

    # (x1) & (-x1) plus noise clauses: unit conflict -> never solved
    clauses = [[1], [-1]] + random_ksat(rng, 6, 10, 2)
    inst = cnf_instance(6, clauses)
    n_shards = 4
    mesh = make_mesh(n_shards, axis_name="es")
    graph = shard_instance(inst[0], inst[1], inst[2], inst[3], n_shards,
                           pad_multiple=8)
    run = make_edge_sharded_solver(graph, mesh=mesh, iteration_num=30,
                                   tolerance=0.02, t_max=5.0)
    v0, f0 = init_states(graph, jax.random.PRNGKey(3), randomized=True)
    sol, solved, iters, _ = run(graph, v0, f0, jax.random.PRNGKey(4))
    assert float(solved) == 0.0
