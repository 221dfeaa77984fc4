"""Tests for the simplification fixed points (problem/simplify.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.problem import (
    init_problem_state, unit_propagate, peel, simplify, set_variables)
from tests.helpers import cnf_instance


def _setup(clauses, n, pad=False, label=-1.0):
    inst = cnf_instance(n, clauses, label)
    if pad:
        batch = pack_instances([inst], pad_v=n + 3, pad_f=len(clauses) + 2,
                               pad_e=32, pad_b=2)
    else:
        batch = pack_instances([inst], bucket=False)
    return batch, init_problem_state(batch)


def test_unit_propagation_chain():
    # (x1) & (-x1 | x2) & (-x2 | x3): forces x1=x2=x3=1
    batch, state = _setup([[1], [-1, 2], [-2, 3]], 3)
    out = unit_propagate(batch, state)
    np.testing.assert_allclose(out.solution, [1, 1, 1])
    np.testing.assert_allclose(out.active_vars, [0, 0, 0])
    np.testing.assert_allclose(out.active_clauses, [0, 0, 0])
    assert float(out.is_sat[0]) == 0.5  # not proven UNSAT


def test_unit_propagation_conflict_marks_unsat():
    # (x1) & (-x1): conflict
    batch, state = _setup([[1], [-1]], 1)
    out = unit_propagate(batch, state)
    assert float(out.is_sat[0]) == 0.0
    np.testing.assert_allclose(out.active_vars, [0])
    np.testing.assert_allclose(out.active_clauses, [0, 0])


def test_unit_propagation_satisfies_touched_clauses():
    # (x1) & (x1 | x2): x1=1 removes both clauses, x2 stays active
    batch, state = _setup([[1], [1, 2]], 2)
    out = unit_propagate(batch, state)
    assert float(out.solution[0]) == 1.0
    np.testing.assert_allclose(out.active_clauses, [0, 0])
    np.testing.assert_allclose(out.active_vars, [0, 1])


def test_peel_pure_literal():
    # x1 appears only positively -> peeled, satisfying both clauses;
    # then x2 / x3 become isolated and are peeled too.
    batch, state = _setup([[1, 2], [1, -3]], 3)
    out = peel(batch, state)
    assert float(out.solution[0]) == 1.0
    np.testing.assert_allclose(out.active_clauses, [0, 0])
    np.testing.assert_allclose(out.active_vars, [0, 0, 0])


def test_peel_isolated_variable_gets_half():
    # x3 never occurs: peeled with solution 0.5 (reference sign(0) semantics)
    batch, state = _setup([[1, -2], [-1, 2]], 3)
    out = peel(batch, state)
    assert float(out.active_vars[2]) == 0.0
    assert float(out.solution[2]) == 0.5
    # the 2-SAT core is untouched (no pure literal there)
    np.testing.assert_allclose(out.active_vars[:2], [1, 1])


def test_set_variables_decimation_triggers_simplify():
    # fix x1=0 in (x1 | x2) & (-x1 | x3) & (-x3 | x2):
    # clause2 satisfied; clause1 -> unit (x2); x2=1 satisfies clause3... chain
    batch, state = _setup([[1, 2], [-1, 3], [-3, 2]], 3)
    assignment = jnp.array([-1.0, 0.0, 0.0])
    out = set_variables(batch, state, assignment)
    assert float(out.solution[0]) == 0.0
    assert float(out.solution[1]) == 1.0
    np.testing.assert_allclose(out.active_clauses, [0, 0, 0])


def test_padding_is_inert():
    clauses = [[1], [-1, 2], [-2, 3]]
    b1, s1 = _setup(clauses, 3, pad=False)
    b2, s2 = _setup(clauses, 3, pad=True)
    o1 = simplify(b1, s1)
    o2 = simplify(b2, s2)
    np.testing.assert_allclose(o1.solution, np.asarray(o2.solution)[:3])
    np.testing.assert_allclose(o1.active_vars, np.asarray(o2.active_vars)[:3])
    np.testing.assert_allclose(o1.is_sat, np.asarray(o2.is_sat)[:1])
    # padding instance untouched
    assert float(o2.is_sat[1]) == 0.5


def test_simplify_under_jit():
    batch, state = _setup([[1], [-1, 2]], 2, pad=True)
    out = jax.jit(simplify)(batch, state)
    np.testing.assert_allclose(np.asarray(out.solution)[:2], [1, 1])


# ------------------------------------------------------------------
# Fused fixed point (one combined loop) vs the sequential reference port
# ------------------------------------------------------------------

def _states_equal(a, b):
    np.testing.assert_allclose(a.active_vars, b.active_vars)
    np.testing.assert_allclose(a.active_clauses, b.active_clauses)
    np.testing.assert_allclose(a.is_sat, b.is_sat)
    # solutions must agree exactly on assigned (inactive) variables
    inactive = np.asarray(a.active_vars) == 0
    np.testing.assert_allclose(np.asarray(a.solution)[inactive],
                               np.asarray(b.solution)[inactive])


def test_fused_simplify_matches_sequential_handcrafted():
    from pdp_solver_tpu.problem import fused_simplify
    cases = [
        [[1], [-1, 2], [-2, 3]],           # unit chain
        [[1], [-1]],                        # conflict -> UNSAT
        [[1, 2], [1, 3]],                   # pure literal x1
        [[1], [-1, 2], [2, 3], [3, 4]],     # units feeding pures
        [[1, 2, 3]],                        # nothing unit, x all pure
        [[-1], [1, 2], [-2]],               # unit + conflict chain
    ]
    for clauses in cases:
        n = max(abs(l) for c in clauses for l in c)
        batch, state = _setup(clauses, n, pad=True)
        seq = simplify(batch, state)
        fused = fused_simplify(batch, state)
        _states_equal(seq, fused)


def test_fused_simplify_matches_sequential_random():
    from pdp_solver_tpu.problem import fused_simplify
    from tests.helpers import random_ksat
    rng = np.random.default_rng(11)
    for trial in range(30):
        n = int(rng.integers(5, 25))
        m = int(rng.integers(3, 40))
        k = int(rng.integers(1, 4))
        clauses = random_ksat(rng, n, m, k=min(k, n))
        insts = [cnf_instance(n, clauses)]
        if trial % 3 == 0:   # multi-instance batches too
            clauses2 = random_ksat(rng, 8, 12, k=2)
            insts.append(cnf_instance(8, clauses2))
        batch = pack_instances(insts)
        state = init_problem_state(batch)
        _states_equal(simplify(batch, state), fused_simplify(batch, state))


def test_fused_set_variables_matches_sequential_random():
    from pdp_solver_tpu.problem import fused_set_variables
    from tests.helpers import random_ksat
    rng = np.random.default_rng(12)
    for _ in range(20):
        n = int(rng.integers(5, 20))
        clauses = random_ksat(rng, n, int(rng.integers(5, 30)), k=3)
        batch = pack_instances([cnf_instance(n, clauses)])
        state = simplify(batch, init_problem_state(batch))
        # decimate a random still-active variable (if any)
        act = np.flatnonzero(np.asarray(state.active_vars) > 0)
        if len(act) == 0:
            continue
        v = int(rng.choice(act))
        sign = float(rng.choice([-1.0, 1.0]))
        assign = np.zeros(batch.num_vars, np.float32)
        assign[v] = sign
        seq = set_variables(batch, state, jnp.asarray(assign))
        fused = fused_set_variables(batch, state, jnp.asarray(assign))
        _states_equal(seq, fused)


def test_fused_simplify_under_jit():
    from pdp_solver_tpu.problem import fused_simplify
    batch, state = _setup([[1], [-1, 2], [-2, 3]], 3, pad=True)
    out = jax.jit(fused_simplify)(batch, state)
    np.testing.assert_allclose(out.solution[:3], [1, 1, 1])
    np.testing.assert_allclose(out.active_clauses, 0.0)


def test_fused_round_kernel_path_matches(monkeypatch):
    """PDP_FUSED_PASS=on routes the round through the fused edge-pass
    Pallas kernel (interpret mode off-TPU); results must match exactly."""
    from pdp_solver_tpu.problem import fused_simplify, fused_set_variables
    from tests.helpers import random_ksat
    rng = np.random.default_rng(13)
    for trial in range(6):
        n = int(rng.integers(6, 20))
        clauses = random_ksat(rng, n, int(rng.integers(5, 30)), k=3)
        insts = [cnf_instance(n, clauses)]
        if trial % 2 == 0:
            insts.append(cnf_instance(6, random_ksat(rng, 6, 10, k=2)))
        batch = pack_instances(insts)
        assert batch.fast_var and batch.fast_clause
        state = init_problem_state(batch)
        assign = np.zeros(batch.num_vars, np.float32)
        assign[int(rng.integers(0, n))] = float(rng.choice([-1.0, 1.0]))

        monkeypatch.setenv("PDP_FUSED_PASS", "off")
        ref_s = fused_simplify(batch, state)
        ref_a = fused_set_variables(batch, state, jnp.asarray(assign))
        monkeypatch.setenv("PDP_FUSED_PASS", "on")
        got_s = fused_simplify(batch, state)
        got_a = fused_set_variables(batch, state, jnp.asarray(assign))
        monkeypatch.delenv("PDP_FUSED_PASS")
        _states_equal(ref_s, got_s)
        _states_equal(ref_a, got_a)


def test_fused_simplify_capped_rounds_defer_but_converge():
    """max_rounds caps the per-call fixed point; repeated capped calls must
    reach the same fixed point as one uncapped call (lazy simplification is
    deferral, not loss)."""
    from pdp_solver_tpu.problem.simplify import fused_simplify
    # unit chain needing several rounds: (x1)&(-x1|x2)&(-x2|x3)&(-x3|x4)
    clauses = [[1], [-1, 2], [-2, 3], [-3, 4]]
    batch, state = _setup(clauses, 4)
    full = fused_simplify(batch, state)

    capped = fused_simplify(batch, state, max_rounds=1)
    # after ONE round only the first link has propagated
    assert float(jnp.sum(capped.active_vars)) > 0
    for _ in range(5):
        capped = fused_simplify(batch, capped, max_rounds=1)
    np.testing.assert_allclose(np.asarray(capped.solution),
                               np.asarray(full.solution))
    np.testing.assert_allclose(np.asarray(capped.active_vars),
                               np.asarray(full.active_vars))
    np.testing.assert_allclose(np.asarray(capped.active_clauses),
                               np.asarray(full.active_clauses))


def test_solver_with_capped_simplify_still_verifies(rng):
    """A full p-d-p solve at simplify_rounds=2 must still produce only
    verified solutions, at a solved count close to the exact fixed point."""
    from pdp_solver_tpu.solvers.base import PDPSolver, SolverConfig
    from pdp_solver_tpu.train.loss import cnf_evaluate
    from tests.helpers import check_assignment, random_ksat

    insts, cls = [], []
    for _ in range(8):
        cl = random_ksat(rng, 30, 90, 3)
        insts.append(cnf_instance(30, cl))
        cls.append(cl)
    batch = pack_instances(insts, bucket=False)

    def run(srounds):
        solver = PDPSolver(SolverConfig(
            model_type="p-d-p", tolerance=0.02, t_max=100,
            local_search_iterations=200, epsilon=0.5,
            simplify_rounds=srounds))
        r_s, r_f = jax.random.split(jax.random.PRNGKey(3))
        state = solver.get_init_state(r_s, batch, randomized=True)
        (pred, _), _ = jax.jit(
            lambda p, r, b, s: solver.forward(
                p, r, b, s, 150, is_training=False,
                check_termination=True))({}, r_f, batch, state)
        solved, _ = cnf_evaluate(batch, pred)
        return np.asarray(pred), np.asarray(solved)

    pred_c, solved_c = run(2)
    _, solved_full = run(0)
    assert solved_c.sum() >= solved_full.sum() - 1
    off = 0
    for inst, cl, ok in zip(insts, cls, solved_c):
        n = int(inst[0])
        if ok > 0:
            assert check_assignment(cl, pred_c[off:off + n, 0])
        off += n
