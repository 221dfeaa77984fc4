"""Fault-tolerant chunked solving (utils/resilient.py): device-fault
retry with carry restore, disk checkpoint/resume, and equivalence with
the single-program solve."""

import numpy as np
import pytest

import jax

from helpers import cnf_instance, random_ksat
from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.solvers import PDPSolver, SolverConfig
from pdp_solver_tpu.train.loss import cnf_evaluate
from pdp_solver_tpu.utils.resilient import resilient_solve


def _mk(seed=0):
    rng = np.random.default_rng(seed)
    cls = [random_ksat(rng, 20, 60, 3) for _ in range(4)]
    batch = pack_instances([cnf_instance(20, c) for c in cls])
    solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.5,
                                    t_max=10, local_search_iterations=20,
                                    epsilon=0.5))
    state = solver.get_init_state(jax.random.PRNGKey(1), batch,
                                  randomized=True)
    return batch, solver, state


def _solved(batch, pred):
    solved, _ = cnf_evaluate(batch, pred)
    return float(np.sum(np.asarray(solved) * np.asarray(batch.instance_mask)))


def test_chunked_solve_produces_verified_solutions():
    batch, solver, state = _mk()
    pred, _ = resilient_solve(solver, {}, jax.random.PRNGKey(2), batch,
                              state, 30, chunk=8)
    assert pred.shape == (batch.num_vars, 1)
    assert _solved(batch, pred) >= 2


class _FaultySolver:
    """Delegates to a real solver but faults on the Nth non-finalize call."""

    def __init__(self, inner, fault_on):
        self._inner = inner
        self._calls = 0
        self._fault_on = fault_on

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def forward(self, *args, **kw):
        if not kw.get("finalize", True):
            self._calls += 1
            if self._calls == self._fault_on:
                raise RuntimeError("injected device fault")
        return self._inner.forward(*args, **kw)


def test_fault_mid_solve_recovers_from_last_carry():
    batch, solver, state = _mk(seed=1)
    # forward is traced once per chunk size; fault_on=2 fires during the
    # continuation program's trace, after the first chunk succeeded
    faulty = _FaultySolver(solver, fault_on=2)
    pred, _ = resilient_solve(faulty, {}, jax.random.PRNGKey(2), batch,
                              state, 40, chunk=10, min_chunk=2)
    assert pred.shape == (batch.num_vars, 1)
    assert _solved(batch, pred) >= 2
    assert faulty._calls > 2  # it kept going after the injected fault


def test_fault_in_first_chunk_recovers_from_init_state():
    batch, solver, state = _mk(seed=3)
    faulty = _FaultySolver(solver, fault_on=1)   # fault before ANY progress
    pred, _ = resilient_solve(faulty, {}, jax.random.PRNGKey(2), batch,
                              state, 20, chunk=10, min_chunk=2)
    assert pred.shape == (batch.num_vars, 1)
    assert _solved(batch, pred) >= 2


def test_checkpoint_resume_roundtrip(tmp_path):
    batch, solver, state = _mk(seed=2)
    ck = str(tmp_path / "solve.ck")

    class _Killer(_FaultySolver):
        def forward(self, *args, **kw):
            if not kw.get("finalize", True):
                self._calls += 1
                if self._calls == self._fault_on:
                    raise KeyboardInterrupt  # process death mid-solve
            return self._inner.forward(*args, **kw)

    killer = _Killer(solver, fault_on=2)
    with pytest.raises(KeyboardInterrupt):
        resilient_solve(killer, {}, jax.random.PRNGKey(2), batch, state,
                        40, chunk=10, min_chunk=10, checkpoint_path=ck)
    assert (tmp_path / "solve.ck").exists()

    # a fresh call resumes from disk and completes
    pred, _ = resilient_solve(solver, {}, jax.random.PRNGKey(2), batch,
                              state, 40, chunk=10, checkpoint_path=ck)
    assert pred.shape == (batch.num_vars, 1)
    assert not (tmp_path / "solve.ck").exists()  # cleaned up on success
