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

    assert float(solved[0]) == 1.0, "sharded solver did not finish the CNF"
    assert check_assignment(clauses, np.asarray(sol)[:n]), \
        "sharded 'solved' assignment does not satisfy the formula"
    assert 0 < float(iters) <= 150


def test_edge_sharded_walksat_rescues(rng):
    """A budget too small for decimation to finish leaves active vars; the
    sharded WalkSAT phase must rescue the instance (the round-2 version
    random-filled and failed here)."""
    from pdp_solver_tpu.parallel.edge_shard import make_edge_sharded_solver
    from tests.helpers import check_assignment

    n, m = 40, 140
    clauses = random_ksat(rng, n, m, 3)
    inst = cnf_instance(n, clauses)
    n_shards = 8
    mesh = make_mesh(n_shards, axis_name="es")
    graph = shard_instance(inst[0], inst[1], inst[2], inst[3], n_shards)

    # iteration_num=3 with t_max=100: decimation never engages
    run_no_ls = make_edge_sharded_solver(
        graph, mesh=mesh, iteration_num=3, tolerance=0.0, t_max=100.0)
    run_ls = make_edge_sharded_solver(
        graph, mesh=mesh, iteration_num=3, tolerance=0.0, t_max=100.0,
        ls_iterations=800, epsilon=0.5)
    v0, f0 = init_states(graph, jax.random.PRNGKey(1), randomized=True)
    _, solved0, _, _ = run_no_ls(graph, v0, f0, jax.random.PRNGKey(2))
    sol, solved, _, _ = run_ls(graph, v0, f0, jax.random.PRNGKey(2))

    assert float(solved0[0]) == 0.0, "random fill should not solve this CNF"
    assert float(solved[0]) == 1.0, "sharded WalkSAT failed to rescue"
    assert check_assignment(clauses, np.asarray(sol)[:n])


def test_edge_sharded_batch_solve(rng):
    """B>1: a packed batch (mixed sizes + one UNSAT instance) sharded over
    8 devices; per-instance verdicts must be correct and every claimed
    solution must satisfy its formula."""
    from pdp_solver_tpu.parallel.edge_shard import (
        make_edge_sharded_solver, shard_batch)
    from tests.helpers import check_assignment

    sizes = [(30, 100), (40, 140), (25, 85), (35, 120)]
    clause_lists = [random_ksat(rng, n, m, 3) for n, m in sizes]
    insts = [cnf_instance(n, cl) for (n, _), cl in zip(sizes, clause_lists)]
    # UNSAT instance: (x1) & (-x1) + noise
    unsat_clauses = [[1], [-1]] + random_ksat(rng, 8, 12, 2)
    insts.append(cnf_instance(8, unsat_clauses))
    clause_lists.append(unsat_clauses)

    batch = pack_instances(insts, bucket=False)
    n_shards = 8
    mesh = make_mesh(n_shards, axis_name="es")
    sharded = shard_batch(batch, n_shards, pad_multiple=32)
    run = make_edge_sharded_solver(
        sharded, mesh=mesh, iteration_num=150, tolerance=0.02, t_max=2.0,
        ls_iterations=500, epsilon=0.5)
    v0, f0 = init_states(sharded, jax.random.PRNGKey(5), randomized=True)
    sol, solved, _, _ = run(sharded, v0, f0, jax.random.PRNGKey(6))

    sol = np.asarray(sol)
    solved = np.asarray(solved)
    assert solved[-1] == 0.0, "UNSAT instance reported solved"
    assert solved[:-1].sum() >= 3, f"too few solved: {solved}"
    off = 0
    for inst, cl, ok in zip(insts, clause_lists, solved):
        n = int(inst[0])
        if ok > 0:
            assert check_assignment(cl, sol[off:off + n])
        off += n


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
    assert float(solved[0]) == 0.0
