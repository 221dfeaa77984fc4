"""Multi-iteration WalkSAT mega-kernel (ops/pallas_walksat.py).

With eps < 0 both the per-iteration loop and the mega-kernel are pure
greedy (the coin always picks the best flip), so their trajectories are
deterministic and must match bit-for-bit - including first-index argmax
tie-breaks. The stochastic paths use different RNG streams by design, so
they are compared on solution quality, not trajectories.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import check_assignment, cnf_instance, random_ksat
from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.problem.state import init_problem_state
from pdp_solver_tpu.solvers import PDPSolver, SolverConfig


@pytest.fixture
def fused_env(monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "on")


def _mk(rng, n_inst=6, n=30, alpha=3.0, k=3):
    cls = [random_ksat(rng, n, int(n * alpha), k) for _ in range(n_inst)]
    insts = [cnf_instance(n, c) for c in cls]
    return pack_instances(insts), cls


def _run_ls(batch, iters, eps, mega, seed=3):
    import os
    os.environ["PDP_WALKSAT_MEGA"] = "on" if mega else "off"
    try:
        solver = PDPSolver(SolverConfig(
            model_type="walk-sat", local_search_iterations=iters,
            epsilon=eps))
        problem = init_problem_state(batch)
        V = batch.num_vars
        pred = (jax.random.uniform(jax.random.PRNGKey(seed), (V, 1))
                > 0.5).astype(jnp.float32)
        out = jax.jit(lambda r, p: solver.local_search(
            r, batch, problem, p, iters))(jax.random.PRNGKey(7), pred)
        return np.asarray(out)
    finally:
        os.environ.pop("PDP_WALKSAT_MEGA", None)


@pytest.mark.parametrize("iters", [16, 19])
def test_mega_greedy_matches_periter_exactly(fused_env, iters):
    rng = np.random.default_rng(0)
    batch, _ = _mk(rng)
    a = _run_ls(batch, iters, eps=-1.0, mega=False)
    b = _run_ls(batch, iters, eps=-1.0, mega=True)
    np.testing.assert_array_equal(a, b)


def test_mega_stochastic_solves_and_verifies(fused_env):
    rng = np.random.default_rng(1)
    batch, cls = _mk(rng, n_inst=8, n=25, alpha=2.5)
    pred = _run_ls(batch, 200, eps=0.5, mega=True)[:, 0]
    solved = 0
    voff = 0
    for c in cls:
        solved += check_assignment(c, pred[voff:voff + 25])
        voff += 25
    assert solved >= 6, f"mega walksat solved only {solved}/8"


def test_mega_respects_uniform4(fused_env):
    rng = np.random.default_rng(2)
    batch, cls = _mk(rng, n_inst=4, n=20, alpha=4.0, k=4)
    pred = _run_ls(batch, 64, eps=0.5, mega=True)[:, 0]
    voff = 0
    ok_rows = 0
    for c in cls:
        ok_rows += check_assignment(c, pred[voff:voff + 20])
        voff += 20
    assert ok_rows >= 2
