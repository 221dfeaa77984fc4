"""Compaction composed with a data-parallel mesh (parallel/compact_mesh.py)."""

import jax
import numpy as np

from pdp_solver_tpu.parallel import make_mesh
from pdp_solver_tpu.parallel.compact_mesh import (
    parallel_compacting_solve, partition_instances)
from pdp_solver_tpu.solvers.base import PDPSolver, SolverConfig
from pdp_solver_tpu.solvers.compact import compacting_solve
from tests.helpers import check_assignment, cnf_instance, random_ksat


def _instances(rng, counts=((30, 2.6), (46, 2.6), (24, 2.4)), per=8):
    insts, clause_lists = [], []
    for n, alpha in counts:
        for _ in range(per):
            cl = random_ksat(rng, n, int(n * alpha), 3)
            insts.append(cnf_instance(n, cl))
            clause_lists.append(cl)
    return insts, clause_lists


def test_partition_balances_edges(rng):
    insts, _ = _instances(rng)
    groups = partition_instances(insts, 8)
    loads = [sum(insts[i][2].shape[1] for i in g) for g in groups]
    assert len([i for g in groups for i in g]) == len(insts)
    assert max(loads) <= 2 * min(loads) + max(
        insts[i][2].shape[1] for i in range(len(insts)))


def test_parallel_compacting_solve_mesh(rng):
    """8-device mesh vs single-device compacting path on an easy set.

    Every claimed solution must verify, and the solved counts must agree
    to within one instance: greedy decimation occasionally commits a
    conflicting assignment (a failure mode the reference shares —
    src/pdp/nn/solver.py:247-261 deactivates the conflicted instance, and
    local search only flips still-active vars), and which basin an
    instance lands in depends on the packing-derived RNG stream, so exact
    count equality across different packings is not an invariant."""
    insts, clause_lists = _instances(rng)
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=300, epsilon=0.5))
    mesh = make_mesh(8)

    solutions, solved, stats = parallel_compacting_solve(
        solver, {}, jax.random.PRNGKey(0), insts, 200,
        mesh=mesh, chunk=25, min_edges=0)

    assert stats["shards"] == 8
    for sol, ok, cl in zip(solutions, solved, clause_lists):
        if ok:
            assert check_assignment(cl, sol)

    # single-device reference path at the same budgets
    _, solved_1, _ = compacting_solve(
        solver, {}, jax.random.PRNGKey(0), insts, 200,
        chunk=25, min_edges=0)
    assert sum(solved) >= len(insts) - 1
    assert abs(sum(solved) - sum(solved_1)) <= 1, (
        f"mesh path solved {sum(solved)} vs single-device {sum(solved_1)}")


def test_parallel_compacting_ladder_engages(rng):
    """Staggered hardness: early finishers must trigger per-shard harvest +
    global repack (the bucket ladder) while stragglers keep solving."""
    insts, clause_lists = [], []
    for n, alpha, per in ((18, 2.6, 10), (30, 3.0, 8), (46, 4.0, 4)):
        for _ in range(per):
            cl = random_ksat(rng, n, int(n * alpha), 3)
            insts.append(cnf_instance(n, cl))
            clause_lists.append(cl)
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=400, epsilon=0.5))
    mesh = make_mesh(4)
    solutions, solved, stats = parallel_compacting_solve(
        solver, {}, jax.random.PRNGKey(2), insts, 300,
        mesh=mesh, chunk=10, min_edges=0, granularity=1.3)
    assert stats["compactions"], "bucket ladder never engaged"
    c0 = stats["compactions"][0]
    assert len(c0["per_shard"]) == 4
    assert sum(solved) >= len(insts) - 3
    for sol, ok, cl in zip(solutions, solved, clause_lists):
        if ok:
            assert check_assignment(cl, sol)


def test_parallel_compacting_small_shards_repack(rng):
    """Regression: small per-shard workloads floor several bucket dims at
    the 128 minimum (V == B == 128), which made the repack's remap raise
    'ambiguous packed dims' mid-solve. _common_dims must keep the four
    padded dims pairwise distinct."""
    insts, clause_lists = [], []
    for _ in range(32):
        cl = random_ksat(rng, 20, 56, 3)
        insts.append(cnf_instance(20, cl))
        clause_lists.append(cl)
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=200, epsilon=0.5))
    solutions, solved, stats = parallel_compacting_solve(
        solver, {}, jax.random.PRNGKey(0), insts, 200,
        mesh=make_mesh(8), chunk=10, min_edges=0)
    assert stats["compactions"], "repack never exercised"
    assert sum(solved) >= 28
    for sol, ok, cl in zip(solutions, solved, clause_lists):
        if ok:
            assert check_assignment(cl, sol)


def test_parallel_compacting_solve_ls_rescue(rng):
    """Instances the decimation budget cannot finish must be rescued by the
    sharded WalkSAT phase (parked state -> unpark -> per-shard LS)."""
    insts, clause_lists = _instances(rng, counts=((30, 3.0),), per=6)
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.0, t_max=1000,
        local_search_iterations=600, epsilon=0.5))
    mesh = make_mesh(4)
    # 5 iterations: decimation never converges -> everything goes to LS
    solutions, solved, stats = parallel_compacting_solve(
        solver, {}, jax.random.PRNGKey(1), insts, 5,
        mesh=mesh, chunk=5, min_edges=0)
    assert sum(solved) >= 4, f"LS rescued too few: {sum(solved)}"
    assert stats["ls_wall_s"] > 0
    for sol, ok, cl in zip(solutions, solved, clause_lists):
        if ok:
            assert check_assignment(cl, sol)
