"""Per-batch minimal one-hot window (FGBatch.var_window).

The windowed kernels' dominant cost is the [SUB, W] one-hot build and its
two MXU streams, all linear in W; pack_instances verifies the tighter
512/1024 windows so the fused passes can shrink W from the default 2048.
These tests check (a) the pack-time computation, (b) numerical equivalence
of every windowed consumer at the smaller window (interpret mode), against
the XLA fallback path.
"""

import os

import jax
import numpy as np
import pytest

from pdp_solver_tpu.fg.batch import pack_instances, _min_var_window
from pdp_solver_tpu.fg.generators import UniformCNFGenerator
from pdp_solver_tpu.ops.pallas_fused import batch_var_window


def _ksat_batch(k=4, count=12, n_lo=20, n_hi=40, seed=0):
    g = UniformCNFGenerator(n_lo, n_hi, k, k, 6.0, 9.0, seed=seed)
    return pack_instances([g.generate() for _ in range(count)])


def test_min_window_computation():
    # tiny spans -> 512
    ids = np.arange(1000, dtype=np.int32) % 100
    assert _min_var_window(ids) == 512
    # a 512-run spanning ~400 ids -> still 1024 (3-slab bound is
    # conservative but must not under-report)
    ids = np.arange(4096, dtype=np.int32) // 8
    w = _min_var_window(ids)
    assert w in (512, 1024)
    span = 0
    for lo in range(0, 4096 - 1024):
        s = ids[lo:lo + 1024].max() - ids[lo:lo + 1024].min()
        span = max(span, int(s))
    assert span <= w // 2
    # huge spans -> 0 (only 2048 verified)
    ids = (np.arange(2048, dtype=np.int32) * 37) % 10000
    assert _min_var_window(ids) == 0


def test_pack_sets_var_window():
    batch = _ksat_batch()
    # n <= 40 instances: any 1024-edge run spans few instances -> 512
    assert batch.var_window in (512, 1024)
    assert batch_var_window(batch) == batch.var_window


@pytest.mark.parametrize("k", [3, 4])
def test_sweep_equivalent_at_small_window(k, monkeypatch):
    from pdp_solver_tpu.modules import propagate as PR
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.problem.state import (
        init_problem_state, compute_edge_mask)

    batch = _ksat_batch(k=k, seed=3)
    assert batch.var_window in (512, 1024), "test premise: small window"
    solver = PDPSolver(SolverConfig(model_type="p-d-p"))
    state = solver.get_init_state(jax.random.PRNGKey(0), batch,
                                  randomized=True)
    problem = init_problem_state(batch)
    em = compute_edge_mask(batch, problem)
    ae = np.ones((batch.num_edges,), np.float32)

    def sweep():
        return PR.survey_propagator_apply(
            {}, solver.prop_cfg, batch, state.prop, state.prop, em, ae)

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = sweep()
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    fast = sweep()
    mask = np.asarray(batch.edge_mask)  # padding-edge values are
    for a, b in zip(jax.tree_util.tree_leaves(ref),   # meaningless by
                    jax.tree_util.tree_leaves(fast)):  # contract
        np.testing.assert_allclose(np.asarray(a) * mask,
                                   np.asarray(b) * mask,
                                   rtol=1e-5, atol=1e-6)


def test_solver_forward_equivalent_at_small_window(monkeypatch):
    """Full p-d-p forward (sweep + folded masks + decimation + simplify +
    verify) agrees between the small-window fused path and the XLA path."""
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver

    batch = _ksat_batch(k=3, count=8, n_lo=15, n_hi=25, seed=7)
    assert batch.var_window in (512, 1024)
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.1, t_max=5,
        local_search_iterations=30, epsilon=0.5))
    r = jax.random.PRNGKey(1)
    state = solver.get_init_state(r, batch, randomized=True)

    def run():
        (pred, _), _ = solver.forward({}, r, batch, state, 30,
                                      is_training=False,
                                      check_termination=True)
        return np.asarray(pred)

    monkeypatch.setenv("PDP_FUSED_PASS", "off")
    ref = run()
    monkeypatch.setenv("PDP_FUSED_PASS", "on")
    fast = run()
    # decimation argmax ties can diverge under fp reassociation; require
    # bitwise-equal here (same reduce orders in interpret mode)
    np.testing.assert_allclose(ref, fast, rtol=1e-5, atol=1e-5)
