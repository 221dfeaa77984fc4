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
