"""Property tests (SURVEY.md section 4): semantic invariants of the
simplification machinery checked against a brute-force oracle."""

import numpy as np
import pytest

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.problem import init_problem_state, simplify
from tests.helpers import cnf_instance, random_ksat, check_assignment


def brute_force_sat(n, clauses):
    """Exhaustive SAT check for n <= 20 via bit enumeration."""
    if not clauses:
        return True
    assignments = np.arange(1 << n, dtype=np.uint32)
    sat = np.ones(len(assignments), dtype=bool)
    for clause in clauses:
        clause_sat = np.zeros(len(assignments), dtype=bool)
        for lit in clause:
            bit = (assignments >> (abs(lit) - 1)) & 1
            clause_sat |= (bit == 1) if lit > 0 else (bit == 0)
        sat &= clause_sat
        if not sat.any():
            return False
    return bool(sat.any())


def residual_formula(batch, state, clauses):
    """The simplified problem: active clauses restricted to active vars."""
    av = np.asarray(state.active_vars) > 0
    ac = np.asarray(state.active_clauses) > 0
    sol = np.asarray(state.solution)
    residual = []
    for ci, clause in enumerate(clauses):
        if not ac[ci]:
            continue
        lits = [l for l in clause if av[abs(l) - 1]]
        residual.append(lits)
    return residual, av, sol


@pytest.mark.parametrize("alpha", [2.0, 3.5, 4.5])
def test_simplify_preserves_satisfiability(rng, alpha):
    """After unit propagation + peeling: (1) the original formula is SAT iff
    the residual active formula is SAT (unless a conflict already proved
    UNSAT); (2) any model of the residual, combined with the fixed partial
    solution, satisfies the original formula."""
    for trial in range(12):
        n = int(rng.integers(6, 13))
        m = max(3, int(n * alpha))
        clauses = random_ksat(rng, n, m, k=int(rng.integers(2, 4)))
        batch = pack_instances([cnf_instance(n, clauses)], bucket=False)
        state = simplify(batch, init_problem_state(batch))

        orig_sat = brute_force_sat(n, clauses)
        if float(state.is_sat[0]) == 0.0:
            # conflict found: the original must really be UNSAT
            assert not orig_sat, f"trial {trial}: false UNSAT proof"
            continue

        residual, active, sol = residual_formula(batch, state, clauses)
        if any(len(c) == 0 for c in residual):
            # an active clause lost all its literals would be a bug: the
            # simplifier must have removed it or marked UNSAT
            raise AssertionError(f"trial {trial}: empty residual clause")

        res_sat = brute_force_sat(n, residual)
        assert res_sat == orig_sat, (
            f"trial {trial}: simplification changed satisfiability")

        if orig_sat:
            # extend: brute-force a model of the residual over active vars
            fixed = {v: sol[v] >= 0.5 for v in range(n) if not active[v]}
            found = False
            for bits in range(1 << n):
                assign = [(bits >> v) & 1 for v in range(n)]
                for v, val in fixed.items():
                    assign[v] = 1 if val else 0
                if check_assignment(residual, assign):
                    assert check_assignment(clauses, assign), (
                        f"trial {trial}: residual model does not extend")
                    found = True
                    break
            assert found


def test_decimation_only_fixes_consistent_values(rng):
    """After a full p-d-p solve of a satisfiable formula, every variable the
    simplifier fixed must be extendable to a full model (checked implicitly
    by the solve succeeding and verifying)."""
    import jax
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver

    sat_instances = []
    clause_sets = []
    while len(sat_instances) < 4:
        n = 10
        clauses = random_ksat(rng, n, 25, 3)
        if brute_force_sat(n, clauses):
            sat_instances.append(cnf_instance(n, clauses))
            clause_sets.append(clauses)

    batch = pack_instances(sat_instances)
    solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.02,
                                    t_max=10, local_search_iterations=200,
                                    epsilon=0.5))
    key = jax.random.PRNGKey(0)
    state = solver.get_init_state(key, batch, True)
    (pred, _), _ = jax.jit(lambda r, b, s: solver.forward(
        {}, r, b, s, 100, is_training=False, check_termination=True))(
        key, batch, state)
    pred = np.asarray(pred)[:, 0]
    v = 0
    solved = 0
    for inst, clauses in zip(sat_instances, clause_sets):
        if check_assignment(clauses, pred[v:v + inst[0]]):
            solved += 1
        v += inst[0]
    # all four formulas are provably SAT and easy; the solver must get them
    assert solved == 4


def test_energy_loss_finite_in_pathological_regime(rng):
    """A confidently-wrong prediction must give a large FINITE loss with
    finite gradients (f32 overflow guard; the reference's formula goes to
    inf here and NaNs its own training)."""
    import jax
    import jax.numpy as jnp
    from pdp_solver_tpu.train.loss import energy_loss

    clauses = [[1, 2, 3]] * 4
    batch = pack_instances([cnf_instance(3, clauses)], bucket=False)
    # all positive literals, prediction pushes every variable to ~0
    pred = jnp.full((3, 1), 1e-9, jnp.float32)

    val, grad = jax.value_and_grad(
        lambda p: energy_loss(batch, p, jnp.asarray(50.0), 0.1, 5))(pred)
    assert np.isfinite(float(val)) and float(val) > 10
    assert np.isfinite(np.asarray(grad)).all()
