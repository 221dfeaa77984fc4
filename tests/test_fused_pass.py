"""The fused edge-pass kernels must match the XLA fallback exactly.

PDP_FUSED_PASS=on forces the Pallas path (interpret mode off-TPU);
PDP_FUSED_PASS=off forces the segment-op fallback. The two must agree on
the SP sweep, the survey scorer, and a full p-d-p solve.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.modules.propagate import (
    SurveyPropagatorConfig, survey_propagator_apply,
    survey_propagator_init_state)
from pdp_solver_tpu.modules.predict import (
    SurveyScorerConfig, survey_scorer_apply)
from pdp_solver_tpu.problem.state import init_problem_state
from tests.helpers import cnf_instance, random_ksat


@pytest.fixture
def batch():
    rng = np.random.default_rng(5)
    insts = [cnf_instance(12, random_ksat(rng, 12, 30, k=3)),
             cnf_instance(9, random_ksat(rng, 9, 20, k=3))]
    b = pack_instances(insts)
    assert b.fast_var and b.fast_clause
    return b


def _sweep_n(batch, n, pi=0.0):
    cfg = SurveyPropagatorConfig(pi=pi)
    E = batch.num_edges
    state = survey_propagator_init_state(jax.random.PRNGKey(1), E, True)
    ones = jnp.ones(E)
    for _ in range(n):
        state = survey_propagator_apply({}, cfg, batch, state, state,
                                        ones * batch.edge_mask, ones)
    return state


def _assert_real_edges_close(batch, ref, got, rtol=1e-5, atol=1e-6):
    """Padding-edge state is meaningless by contract (every consumer masks
    it); compare [E]-shaped leaves on real edges only."""
    m = np.asarray(batch.edge_mask)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        a, b = np.asarray(a), np.asarray(b)
        if a.shape == m.shape:
            a, b = a * m, b * m
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


def test_sp_sweep_fused_matches_fallback(batch, monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = _sweep_n(batch, 4)
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = _sweep_n(batch, 4)
    _assert_real_edges_close(batch, ref, got)


def test_sp_sweep_fused_matches_fallback_with_pi(batch, monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = _sweep_n(batch, 3, pi=0.1)
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = _sweep_n(batch, 3, pi=0.1)
    _assert_real_edges_close(batch, ref, got)


def test_scorer_fused_matches_fallback(batch, monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    state = _sweep_n(batch, 4)
    problem = init_problem_state(batch)
    ref, _ = survey_scorer_apply({}, SurveyScorerConfig(), batch, state,
                                 problem)
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got, _ = survey_scorer_apply({}, SurveyScorerConfig(), batch, state,
                                 problem)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-6)


def test_full_pdp_solve_fused_matches_fallback(monkeypatch):
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.train.loss import cnf_evaluate
    rng = np.random.default_rng(7)
    insts = [cnf_instance(15, random_ksat(rng, 15, 40, k=3))
             for _ in range(3)]
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(model_type="p-d-p"))
    key = jax.random.PRNGKey(3)
    state = solver.get_init_state(key, batch, randomized=True)

    def solve():
        (pred, _), _ = solver.forward({}, jax.random.PRNGKey(9), batch,
                                      state, 40, is_training=False)
        return pred

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = solve()
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = solve()
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-5)


def test_walksat_fused_matches_fallback(monkeypatch):
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    rng = np.random.default_rng(17)
    insts = [cnf_instance(12, random_ksat(rng, 12, 30, k=3))
             for _ in range(3)]
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(model_type="walk-sat",
                                    local_search_iterations=60,
                                    epsilon=0.3))
    state = solver.get_init_state(jax.random.PRNGKey(0), batch, True)

    def solve():
        (pred, _), _ = solver.forward({}, jax.random.PRNGKey(2), batch,
                                      state, 1, is_training=False)
        return pred

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = solve()
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = solve()
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got))


def test_pdp_with_termination_fused_matches_fallback(monkeypatch):
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    rng = np.random.default_rng(23)
    insts = [cnf_instance(10, random_ksat(rng, 10, 25, k=3))
             for _ in range(2)]
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(model_type="p-d-p"))
    state = solver.get_init_state(jax.random.PRNGKey(1), batch, True)

    def solve():
        (pred, _), _ = solver.forward(
            {}, jax.random.PRNGKey(5), batch, state, 30,
            is_training=False, check_termination=True)
        return pred

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = solve()
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = solve()
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-4, atol=1e-5)


def test_exact_size_uniform3_tail_window(monkeypatch):
    """Regression: when the real edges reach pad_e exactly, the kernel's own
    tile padding (E_pad -> multiple of the k=3 tile) shares a sub-window
    with REAL tail edges. Padding the ids with 0 used to pull that window's
    base to 0 and silently drop every real id >= WINDOW."""
    rng = np.random.default_rng(11)
    insts = [cnf_instance(60, random_ksat(rng, 60, 100, k=3))
             for _ in range(40)]
    tot_v = 60 * 40
    tot_f = 100 * 40
    tot_e = 3 * tot_f
    b = pack_instances(insts, pad_v=tot_v, pad_f=tot_f, pad_e=tot_e,
                       pad_b=40)
    assert b.clause_width == 3 and b.fast_var and b.fast_clause
    assert b.num_edges % 3072 != 0      # kernel must pad the edge arrays
    assert int(np.asarray(b.edge_var).max()) >= 2048  # ids beyond one window

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = _sweep_n(b, 3)
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = _sweep_n(b, 3)
    # f32 reduce-order differences (MXU dot vs scatter) accumulate over
    # sweeps on this larger graph; with the old 0-fill the tail windows
    # were off by O(1), not O(1e-5)
    _assert_real_edges_close(b, ref, got, rtol=1e-4, atol=1e-5)


def test_windowed_ok_rejects_straddling_spans():
    """Regression: per-slab spans can pass while a sub-window straddling two
    adjacent 1024-slabs (the k in {3,5,6,7} fused tilings) spans too much;
    the pack-time check must bound ADJACENT-PAIR spans."""
    from pdp_solver_tpu.fg.batch import _windowed_ok
    ids = np.concatenate([
        np.linspace(0, 1000, 1024).astype(np.int32),      # slab 0: span 1000
        np.linspace(1500, 2500, 1024).astype(np.int32),   # slab 1: span 1000
    ])
    assert _windowed_ok(ids)                  # nested 1024/512 tilings: fine
    assert not _windowed_ok(ids, pairwise=True)           # pair span 2500
    ok = np.concatenate([
        np.linspace(0, 500, 1024).astype(np.int32),
        np.linspace(500, 1000, 1024).astype(np.int32),
    ])
    assert _windowed_ok(ok, pairwise=True)


def test_replication_drops_fast_flags_for_odd_k(monkeypatch):
    """Replica boundaries cannot align to the 384-wide k=3 sub-windows, so
    replicate_batch must drop the windowed fast flags (scatter fallback)."""
    from pdp_solver_tpu.fg.batch import replicate_batch
    rng = np.random.default_rng(3)
    insts = [cnf_instance(12, random_ksat(rng, 12, 30, k=3))
             for _ in range(2)]
    b = pack_instances(insts)
    rb = jax.jit(lambda bb: replicate_batch(bb, 2))(b)
    assert not (rb.fast_var or rb.fast_clause)

    insts4 = [cnf_instance(12, random_ksat(rng, 12, 30, k=4))
              for _ in range(2)]
    b4 = pack_instances(insts4)
    if b4.num_edges % 1024 == 0:
        rb4 = jax.jit(lambda bb: replicate_batch(bb, 2))(b4)
        assert rb4.fast_var == b4.fast_var


def test_training_gate_disables_fused_pass(monkeypatch):
    """jax.grad through forward(is_training=True) must not hit the no-VJP
    fused kernels even when PDP_FUSED_PASS=on (p-nd-np feeds the classical
    sweep from params-dependent neural state)."""
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.train.loss import energy_loss
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    rng = np.random.default_rng(31)
    insts = [cnf_instance(9, random_ksat(rng, 9, 20, k=3))
             for _ in range(2)]
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(
        model_type="p-nd-np", hidden_dim=8, mem_hidden_dim=8,
        agg_hidden_dim=8, mem_agg_hidden_dim=8, classifier_dim=8))
    params = solver.init_params(jax.random.PRNGKey(0))
    state = solver.get_init_state(jax.random.PRNGKey(1), batch, True)

    def loss(p):
        (pred, _), _ = solver.forward(p, jax.random.PRNGKey(2), batch,
                                      state, 2, is_training=True)
        return energy_loss(batch, pred, jnp.ones(()), 0.1, 5.0)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0)))


def test_edge_mask_and_cnf_eval_fused_match(monkeypatch, batch):
    from pdp_solver_tpu.problem.state import (
        init_problem_state, compute_edge_mask, edge_active_instance_mask)
    from pdp_solver_tpu.train.loss import cnf_evaluate

    problem = init_problem_state(batch)
    problem = problem._replace(
        active_vars=problem.active_vars
        * (np.arange(batch.num_vars) % 3 != 0),
        active_clauses=problem.active_clauses
        * (np.arange(batch.num_clauses) % 4 != 0))
    active_b = jnp.asarray(
        (np.arange(batch.batch_size) % 2 == 0).astype(np.float32))
    pred = jax.random.uniform(jax.random.PRNGKey(8),
                              (batch.num_vars, 1))

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = (compute_edge_mask(batch, problem),
           edge_active_instance_mask(batch, active_b),
           cnf_evaluate(batch, pred))
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    got = (compute_edge_mask(batch, problem),
           edge_active_instance_mask(batch, active_b),
           cnf_evaluate(batch, pred))
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
