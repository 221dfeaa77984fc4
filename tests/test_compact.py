"""Progressive batch compaction (solvers/compact.py).

Invariants tested:
  * remap_state is a faithful relayout: every kept instance's per-edge,
    per-var, per-clause, and per-instance state lands at its new offsets
    unchanged, padding is zero-filled;
  * compacting_solve solves (verified) at least as well as the plain
    uncompacted solver on the same formulas, and actually compacts;
  * harvested solutions are verified assignments in {0,1}.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from pdp_solver_tpu.solvers.compact import (
    compacting_solve, instance_slices, remap_state)
from tests.helpers import cnf_instance, check_assignment, random_ksat


def _mixed_instances(rng, counts=((30, 3.0), (50, 3.2), (40, 2.8)), per=3):
    insts, clause_lists = [], []
    for n, alpha in counts:
        for _ in range(per):
            cl = random_ksat(rng, n, int(n * alpha), 3)
            clause_lists.append(cl)
            insts.append(cnf_instance(n, cl))
    return insts, clause_lists


def test_remap_state_relayout(rng):
    insts, _ = _mixed_instances(rng)
    batch = pack_instances(insts)
    slices = instance_slices(insts)
    E, V, F, B = (batch.num_edges, batch.num_vars, batch.num_clauses,
                  batch.batch_size)
    # a state tree with one leaf per dim, values = global index so the
    # relayout is directly checkable
    tree = {
        "e": np.arange(E, dtype=np.float32),
        "v": np.arange(V, dtype=np.float32) + 1000,
        "f": np.arange(F, dtype=np.float32) + 2000,
        "b": np.arange(B, dtype=np.float32) + 3000,
        "scalar": np.float32(7.0),
        "e2d": np.stack([np.arange(E), np.arange(E)], axis=1).astype(
            np.float32),
    }
    keep = [1, 4, 7]
    kept = [insts[i] for i in keep]
    new_batch = pack_instances(kept)
    new_slices = instance_slices(kept)
    out = remap_state(tree, keep, batch, new_batch, slices, new_slices)

    assert out["scalar"] == 7.0
    for j, i in enumerate(keep):
        ov, of, oe, n, m, e = slices[i]
        nv, nf, ne = new_slices[j][0], new_slices[j][1], new_slices[j][2]
        np.testing.assert_array_equal(out["e"][ne:ne + e],
                                      np.arange(oe, oe + e))
        np.testing.assert_array_equal(out["v"][nv:nv + n],
                                      np.arange(ov, ov + n) + 1000)
        np.testing.assert_array_equal(out["f"][nf:nf + m],
                                      np.arange(of, of + m) + 2000)
        np.testing.assert_array_equal(out["e2d"][ne:ne + e, 0],
                                      np.arange(oe, oe + e))
        assert out["b"][j] == 3000 + i
    # padding rows zero-filled
    last_e = new_slices[-1][2] + new_slices[-1][5]
    assert (out["e"][last_e:] == 0).all()


def test_remap_state_rejects_ambiguous_dims(rng):
    insts, _ = _mixed_instances(rng, counts=((8, 2.0),), per=2)
    # force colliding padded dims
    batch = pack_instances(insts, pad_v=64, pad_f=64, pad_e=128, pad_b=64)
    slices = instance_slices(insts)
    with pytest.raises(ValueError, match="ambiguous"):
        remap_state({"x": np.zeros(64)}, [0], batch,
                    pack_instances(insts[:1]), slices,
                    instance_slices(insts[:1]))


def test_compacting_solve_matches_plain_solver(rng):
    # the alpha=1.5 instances decimate to verified solutions in-loop and
    # freeze early, shrinking the live edge count enough for the packed
    # bucket to step down (compaction); the alpha=3.x ones go the distance
    # and exercise the parked/local-search path
    easy, easy_cl = _mixed_instances(rng, counts=((60, 1.5),), per=12)
    hard, hard_cl = _mixed_instances(rng, counts=((40, 2.8),), per=3)
    insts, clause_lists = easy + hard, easy_cl + hard_cl
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=300, epsilon=0.5))

    solutions, solved, stats = compacting_solve(
        solver, {}, jax.random.PRNGKey(0), insts, 300,
        chunk=25, min_edges=0)

    n_solved = sum(solved)
    # verify every claimed solution against the formula
    for sol, ok, cl in zip(solutions, solved, clause_lists):
        assert set(np.unique(sol)).issubset({0.0, 1.0})
        if ok:
            assert check_assignment(cl, sol)
    # easy 3-SAT: nearly everything should be solved (plain-solver bar is
    # 0.8 in test_pdp_sp_solver_on_easy_3sat)
    assert n_solved >= int(0.8 * len(insts))
    # the batch must actually have compacted at least once
    assert stats["compactions"], f"no compaction happened: {stats}"
    e0 = pack_instances(insts).num_edges
    assert stats["compactions"][-1]["edges"] < e0


def test_compaction_preserves_survivor_trajectories(rng):
    """Remapping mid-solve must continue the same per-instance dynamics:
    with decimation disabled (tolerance 0, huge t_max) the SP messages are
    a deterministic function of the init state, so the kept instances'
    surveys after [50 iters -> compact -> 25 iters] must match the
    uncompacted [75 iters] run on the same batch (up to reduce-order
    rounding)."""
    insts, _ = _mixed_instances(rng, counts=((40, 3.0), (60, 3.5)), per=4)
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.0, t_max=1e9,
        local_search_iterations=0, epsilon=0.5))
    batch = pack_instances(insts)
    slices = instance_slices(insts)
    r_init, r_fwd = jax.random.split(jax.random.PRNGKey(5))
    state0 = solver.get_init_state(r_init, batch, randomized=True)

    step = jax.jit(lambda r, b, s, c, n: solver.forward(
        {}, r, b, s, n, is_training=False, check_termination=True,
        carry=c, finalize=False), static_argnames="n")
    first = jax.jit(lambda r, b, s, n: solver.forward(
        {}, r, b, s, n, is_training=False, check_termination=True,
        finalize=False), static_argnames="n")

    # uncompacted: 50 + 25
    _, s_a, c_a = first(r_fwd, batch, state0, 50)
    _, s_a, c_a = step(jax.random.fold_in(r_fwd, 1), batch, s_a, c_a, 25)

    # compacted at iter 50 to a subset, then 25 more
    _, s_b, c_b = first(r_fwd, batch, state0, 50)
    keep = [0, 2, 5, 6, 7]
    kept = [insts[i] for i in keep]
    new_batch = pack_instances(kept)
    new_slices = instance_slices(kept)
    host_s = jax.tree_util.tree_map(np.asarray, s_b)
    host_c = jax.tree_util.tree_map(np.asarray, c_b)
    s_b = jax.device_put(remap_state(host_s, keep, batch, new_batch,
                                     slices, new_slices))
    c_b = jax.device_put(remap_state(host_c, keep, batch, new_batch,
                                     slices, new_slices))
    _, s_b, c_b = step(jax.random.fold_in(r_fwd, 1), new_batch, s_b, c_b, 25)

    eta_a = np.asarray(s_a.prop.fn[0])
    eta_b = np.asarray(s_b.prop.fn[0])
    for j, i in enumerate(keep):
        oe, e = slices[i][2], slices[i][5]
        ne = new_slices[j][2]
        np.testing.assert_allclose(eta_b[ne:ne + e], eta_a[oe:oe + e],
                                   atol=1e-4)


class _FaultyOnce:
    """Delegates to a real solver; raises on one specific forward call."""

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


def test_compacting_solve_recovers_from_fault(rng):
    """An injected mid-solve fault must halve the chunk, restore the last
    good carry, and still produce verified solutions."""
    insts, clause_lists = _mixed_instances(rng, counts=((30, 3.0),), per=6)
    real = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=200, epsilon=0.5))
    # fault_on=2 fires during the first step_fn trace (first_fn traces on
    # call 1), deterministically mid-solve regardless of compaction timing
    solver = _FaultyOnce(real, fault_on=2)

    solutions, solved, stats = compacting_solve(
        solver, {}, jax.random.PRNGKey(0), insts, 150,
        chunk=25, min_edges=0, min_chunk=5)
    assert stats["faults"] == 1
    assert sum(solved) >= 4
    for sol, ok, cl in zip(solutions, solved, clause_lists):
        if ok:
            assert check_assignment(cl, sol)


def test_compacting_solve_sparse_mirror_recovers(rng):
    """With sparse mirrors (mirror_every=3) a fault on a later, non-mirrored
    chunk must rewind to the last mirror — done counter, rng stream, and
    chunk-counter cadence — replay the lost chunks, and still produce
    verified solutions (advisor round-2 findings)."""
    insts, clause_lists = _mixed_instances(rng, counts=((30, 3.0),), per=6)
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=200, epsilon=0.5))
    from pdp_solver_tpu.solvers.compact import _compact_fns
    fns = _compact_fns(solver)
    calls = {"n": 0}

    def wrap(fn):
        def f(*args, **kw):
            calls["n"] += 1
            # chunk 4: mirrors were taken at chunk-counter 0 and (cadence 3)
            # would next fire here, so chunks 2-3 are unmirrored and lost
            if calls["n"] == 4:
                raise RuntimeError("injected device fault")
            return fn(*args, **kw)
        return f

    solver._compact_jit_fns = (wrap(fns[0]), wrap(fns[1]), fns[2])
    try:
        solutions, solved, stats = compacting_solve(
            solver, {}, jax.random.PRNGKey(0), insts, 150,
            chunk=25, min_edges=0, min_chunk=5, mirror_every=3)
    finally:
        solver._compact_jit_fns = fns
    assert stats["faults"] == 1
    assert sum(solved) >= 4
    for sol, ok, cl in zip(solutions, solved, clause_lists):
        if ok:
            assert check_assignment(cl, sol)


def test_unpack_instances_roundtrip(rng):
    """pack -> unpack -> pack must reproduce the batch exactly."""
    insts, _ = _mixed_instances(rng)
    b1 = pack_instances(insts)
    from pdp_solver_tpu.fg.batch import unpack_instances
    b2 = pack_instances(unpack_instances(b1))
    for f in ("edge_var", "edge_clause", "edge_sign", "var_batch",
              "clause_batch", "edge_mask", "var_mask", "clause_mask",
              "instance_mask", "label"):
        np.testing.assert_array_equal(np.asarray(getattr(b1, f)),
                                      np.asarray(getattr(b2, f)),
                                      err_msg=f)


def test_trainer_compact_route_produces_verified_predictions(rng, tmp_path,
                                                             monkeypatch):
    """PDP_SOLVE_COMPACT=1 routes long classical predict budgets through
    the compacting solve; the emitted predictions must keep the output
    contract (solved rows verify, one dict per instance)."""
    import io
    import json as _json
    from pdp_solver_tpu.fg.jsonfmt import clauses_to_line
    from pdp_solver_tpu.train.trainer import SatTrainer

    _, clause_lists = _mixed_instances(rng, counts=((20, 2.0),), per=5)
    path = tmp_path / "set.json"
    path.write_text("\n".join(
        clauses_to_line(20, cl, 1.0, [f"id{i}"])
        for i, cl in enumerate(clause_lists)) + "\n")

    monkeypatch.setenv("PDP_SOLVE_CHUNK", "20")
    monkeypatch.setenv("PDP_SOLVE_COMPACT", "1")
    trainer = SatTrainer({
        "model_type": "p-d-p", "model_name": "t", "tolerance": 0.02,
        "t_max": 100, "local_search_iteration": 100, "epsilon": 0.5,
        "test_recurrence_num": 100, "batch_size": 5000,
        "hidden_dim": 3}, seed=0)
    out = io.StringIO()
    trainer.predict(str(path), out)
    rows = [_json.loads(l) for l in out.getvalue().strip().split("\n")]
    assert len(rows) == 5
    n_solved = 0
    for row, cl in zip(rows, clause_lists):
        if int(row["solved"]) == 1:
            n_solved += 1
            assert check_assignment(cl, np.asarray(row["solution"],
                                                   np.float32))
    assert n_solved >= 4


def test_compacting_solve_neural_solver(rng):
    """The generic E/V/F/B remap must carry the neural solver's [E, h]
    GRU/message states through a compaction; np-nd-np (untrained) with
    WalkSAT still solves easy formulas and never mislabels solutions."""
    easy, easy_cl = _mixed_instances(rng, counts=((40, 1.5),), per=8)
    hard, hard_cl = _mixed_instances(rng, counts=((30, 2.5),), per=2)
    insts, clause_lists = easy + hard, easy_cl + hard_cl
    solver = PDPSolver(SolverConfig(
        model_type="np-nd-np", hidden_dim=8, mem_hidden_dim=6,
        agg_hidden_dim=6, mem_agg_hidden_dim=4, classifier_dim=4,
        prediction_dim=1, local_search_iterations=200, epsilon=0.5))
    params = solver.init_params(jax.random.PRNGKey(9))

    solutions, solved, stats = compacting_solve(
        solver, params, jax.random.PRNGKey(0), insts, 60,
        chunk=15, min_edges=0)
    for sol, ok, cl in zip(solutions, solved, clause_lists):
        if ok:
            assert check_assignment(cl, sol)
    assert sum(solved) >= 7


def test_compacting_solve_replicas(rng):
    """In-batch replication (reference batch_replication,
    src/pdp/nn/solver.py:56-99): R=2 replicas per instance must (a) return
    one verified solution per ORIGINAL instance, (b) solve at least as many
    as it would with any single init (union of basins), (c) drop sibling
    replicas of solved owners — compaction telemetry shows the live count
    shrinking below the replica total."""
    easy, easy_cl = _mixed_instances(rng, counts=((60, 1.5),), per=10)
    hard, hard_cl = _mixed_instances(rng, counts=((40, 2.8),), per=3)
    insts, clause_lists = easy + hard, easy_cl + hard_cl
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=300, epsilon=0.5))

    solutions, solved, stats = compacting_solve(
        solver, {}, jax.random.PRNGKey(0), insts, 300,
        chunk=25, min_edges=0, replicas=2)

    assert len(solutions) == len(insts)
    assert len(solved) == len(insts)
    for sol, ok, cl, inst in zip(solutions, solved, clause_lists, insts):
        assert sol.shape[0] == int(inst[0])
        assert set(np.unique(sol)).issubset({0.0, 1.0})
        if ok:
            assert check_assignment(cl, sol)
    assert sum(solved) >= int(0.8 * len(insts))
    # compaction must have engaged and gone below the 2x replica pack
    assert stats["compactions"], f"no compaction happened: {stats}"


def test_replicas_match_single_on_quality(rng):
    """R=2 at half the iteration budget should solve at least as many
    instances as R=1 at the same half budget (the union of two basins
    dominates either one) — a statistical property on an easy set where
    both configurations leave headroom."""
    insts, clause_lists = _mixed_instances(
        rng, counts=((40, 2.6), (30, 2.8)), per=4)
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=50,
        local_search_iterations=0, epsilon=0.5))

    def run(reps, seed=0):
        _, solved, _ = compacting_solve(
            solver, {}, jax.random.PRNGKey(seed), insts, 150,
            chunk=25, min_edges=0, replicas=reps)
        return sum(solved)

    s1 = run(1)
    s2 = run(2)
    assert s2 >= s1 - 1  # allow one-instance basin noise


def test_fault_on_first_chunk_lazy_mirror(rng):
    """A fault on the VERY FIRST chunk, before any full mirror exists
    (mirror_every > 1 + the round-4 lazy initial mirror), must re-create
    the deterministic init state from its key and still complete with
    verified solutions."""
    insts, clause_lists = _mixed_instances(rng, counts=((30, 3.0),), per=6)
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=200, epsilon=0.5))
    from pdp_solver_tpu.solvers.compact import _compact_fns
    fns = _compact_fns(solver)
    calls = {"n": 0}

    def wrap(fn):
        def f(*args, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected device fault")
            return fn(*args, **kw)
        return f

    solver._compact_jit_fns = (wrap(fns[0]), wrap(fns[1]), fns[2])
    try:
        solutions, solved, stats = compacting_solve(
            solver, {}, jax.random.PRNGKey(0), insts, 150,
            chunk=25, min_edges=0, min_chunk=5, mirror_every=4)
    finally:
        solver._compact_jit_fns = fns
    assert stats["faults"] == 1
    assert sum(solved) >= 4
    for sol, ok, cl in zip(solutions, solved, clause_lists):
        if ok:
            assert check_assignment(cl, sol)
