"""Hybrid based-window reduce + community reordering (the modular fast path).

Covers: pack-time hybrid metadata exactness (kernel(bases) + residual
scatter == segment_sum for ARBITRARY id layouts), dispatch through
modules/common.py, gradient parity, community recovery + formula
preservation under fg/reorder.py, and replication of the metadata."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import (
    FGBatch, pack_instances, replicate_batch, _hybrid_var_meta,
    REDUCE_TILE)
from pdp_solver_tpu.fg.reorder import (
    community_labels, reorder_instance, restore_solution)
from pdp_solver_tpu.modules import common
from pdp_solver_tpu.ops.pallas_reduce import (
    windowed_segment_sum_cols_based)
from pdp_solver_tpu.ops import segment_sum


def _hybrid_reduce_ref(x, ids, bases, resid, resid_mask, num_segments):
    main = windowed_segment_sum_cols_based(
        (x,), ids, bases, num_segments, interpret=True)[0]
    tail = segment_sum(x[resid] * resid_mask, ids[resid], num_segments)
    return main + tail


def test_hybrid_meta_exact_random_ids(rng):
    """Worst case: fully random ids (no locality at all)."""
    E, N = 4 * REDUCE_TILE, 3000
    ids = rng.integers(0, N, size=E).astype(np.int32)
    bases, resid, rmask, coverage = _hybrid_var_meta(ids)
    assert 0.0 < coverage < 1.0
    x = rng.normal(size=E).astype(np.float32)
    got = _hybrid_reduce_ref(jnp.asarray(x), jnp.asarray(ids),
                             jnp.asarray(bases), jnp.asarray(resid),
                             jnp.asarray(rmask), N)
    want = segment_sum(jnp.asarray(x), jnp.asarray(ids), N)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hybrid_meta_exact_blocked_ids(rng):
    """Community-like layout: high coverage, few residuals."""
    E, N = 8 * REDUCE_TILE, 8192
    block = rng.integers(0, 8, size=E // REDUCE_TILE)
    ids = (block[:, None] * 1024
           + rng.integers(0, 1024, size=(E // REDUCE_TILE, REDUCE_TILE))
           ).reshape(-1).astype(np.int32)
    # sprinkle 2% global outliers
    out = rng.random(E) < 0.02
    ids[out] = rng.integers(0, N, size=out.sum())
    bases, resid, rmask, coverage = _hybrid_var_meta(ids)
    assert coverage > 0.9
    x = rng.normal(size=E).astype(np.float32)
    got = _hybrid_reduce_ref(jnp.asarray(x), jnp.asarray(ids),
                             jnp.asarray(bases), jnp.asarray(resid),
                             jnp.asarray(rmask), N)
    want = segment_sum(jnp.asarray(x), jnp.asarray(ids), N)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hybrid_grad_matches_scatter(rng):
    E, N = 2 * REDUCE_TILE, 2000
    ids = rng.integers(0, N, size=E).astype(np.int32)
    bases, resid, rmask, _ = _hybrid_var_meta(ids)
    x = jnp.asarray(rng.normal(size=E).astype(np.float32))
    w = jnp.asarray(rng.normal(size=N).astype(np.float32))

    def f_hybrid(x):
        return jnp.sum(w * _hybrid_reduce_ref(
            x, jnp.asarray(ids), jnp.asarray(bases), jnp.asarray(resid),
            jnp.asarray(rmask), N))

    def f_scatter(x):
        return jnp.sum(w * segment_sum(x, jnp.asarray(ids), N))

    g1 = jax.grad(f_hybrid)(x)
    g2 = jax.grad(f_scatter)(x)
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-5)


def _modular_instance(seed=3, n=2000, alpha=3.0):
    from pdp_solver_tpu.fg.generators import ModularCNFGenerator
    g = ModularCNFGenerator(k=3, min_n=n, max_n=n, min_q=0.8, max_q=0.9,
                            min_c=8, max_c=12, min_alpha=alpha,
                            max_alpha=alpha, seed=seed)
    return g.generate()


def test_community_recovery_and_reorder_locality():
    inst = _modular_instance()
    n, m = inst[0], inst[1]
    labels = community_labels(n, inst[2][0], inst[2][1])
    n_comm = len(np.unique(labels))
    assert 4 <= n_comm <= 16          # ~c planted communities recovered
    inst2, var_order = reorder_instance(inst)
    ev2 = inst2[2][0].reshape(m, 3)
    span = ev2.max(1) - ev2.min(1)
    assert (span <= 1024).mean() > 0.85


def test_reorder_preserves_formula():
    inst = _modular_instance(seed=5, n=300)
    inst2, var_order = reorder_instance(inst)
    n, m = inst[0], inst[1]
    assert inst2[0] == n and inst2[1] == m
    # clause multiset over ORIGINAL variable ids must be identical
    def clause_set(i, order=None):
        ev, ec = i[2][0].astype(np.int64), i[2][1].astype(np.int64)
        sg = np.asarray(i[3]).reshape(-1)
        if order is not None:
            ev = np.asarray(order)[ev]     # renumbered -> original
        lits = ev * 2 + (sg > 0)
        return sorted(tuple(sorted(lits[ec == c])) for c in range(i[1]))
    assert clause_set(inst) == clause_set(inst2, var_order)


def test_restore_solution_roundtrip(rng):
    inst = _modular_instance(seed=7, n=400)
    inst2, var_order = reorder_instance(inst)
    sol_new = rng.integers(0, 2, size=inst[0]).astype(np.float32)
    sol_old = restore_solution(sol_new, var_order)
    # literal satisfaction must agree clause-by-clause
    ev, ec = inst[2][0], inst[2][1]
    sg = np.asarray(inst[3]).reshape(-1)
    ev2, ec2 = inst2[2][0], inst2[2][1]
    sg2 = np.asarray(inst2[3]).reshape(-1)
    sat1 = np.zeros(inst[1], bool)
    np.logical_or.at(sat1, ec, (sol_old[ev] > 0.5) == (sg > 0))
    sat2 = np.zeros(inst[1], bool)
    np.logical_or.at(sat2, ec2, (sol_new[ev2] > 0.5) == (sg2 > 0))
    assert sat1.sum() == sat2.sum()


def test_pack_sets_hybrid_and_dispatch_matches(rng, monkeypatch):
    inst = _modular_instance(seed=11, n=4000)
    inst2, _ = reorder_instance(inst)
    batch = pack_instances([inst2])
    assert not batch.fast_var            # global invariant still fails
    assert batch.hybrid_var              # ...but the hybrid split is on
    x = jnp.asarray(rng.normal(size=batch.num_edges).astype(np.float32))
    monkeypatch.setenv("PDP_SEGMENT_BACKEND", "windowed")
    got = common.scatter_to_vars(batch, x)
    monkeypatch.setenv("PDP_SEGMENT_BACKEND", "scatter")
    want = common.scatter_to_vars(batch, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # 2-D and cols paths
    x2 = jnp.asarray(rng.normal(size=(batch.num_edges, 3)).astype(np.float32))
    monkeypatch.setenv("PDP_SEGMENT_BACKEND", "windowed")
    got2 = common.scatter_to_vars(batch, x2)
    gotc = common.scatter_to_vars_cols(batch, (x2[:, 0], x2[:, 1]))
    monkeypatch.setenv("PDP_SEGMENT_BACKEND", "scatter")
    want2 = common.scatter_to_vars(batch, x2)
    wantc = common.scatter_to_vars_cols(batch, (x2[:, 0], x2[:, 1]))
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gotc, wantc, rtol=1e-4, atol=1e-4)


def test_replicate_batch_keeps_hybrid_exact(rng, monkeypatch):
    from pdp_solver_tpu.fg.generators import ModularCNFGenerator
    # two ~1500-var communities: too wide for the global invariant even
    # after reordering, so the hybrid path engages
    g = ModularCNFGenerator(k=3, min_n=3000, max_n=3000, min_q=0.8,
                            max_q=0.9, min_c=2, max_c=2, min_alpha=3.0,
                            max_alpha=3.0, seed=13)
    inst2, _ = reorder_instance(g.generate())
    batch = pack_instances([inst2])
    if not batch.hybrid_var:
        pytest.skip("pack did not produce hybrid metadata")
    rep = replicate_batch(batch, 2)
    assert rep.hybrid_var == (batch.num_edges % REDUCE_TILE == 0
                              and batch.num_vars % 1024 == 0)
    x = jnp.asarray(rng.normal(size=rep.num_edges).astype(np.float32))
    monkeypatch.setenv("PDP_SEGMENT_BACKEND", "windowed")
    got = common.scatter_to_vars(rep, x)
    monkeypatch.setenv("PDP_SEGMENT_BACKEND", "scatter")
    want = common.scatter_to_vars(rep, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_solve_parity_hybrid_vs_scatter(monkeypatch):
    """End-to-end: a small modular p-d-p solve must produce identical
    verified results on the hybrid path and the scatter path."""
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.train.loss import cnf_evaluate

    inst = _modular_instance(seed=17, n=2000, alpha=2.5)
    inst2, _ = reorder_instance(inst)
    batch = pack_instances([inst2])
    assert batch.hybrid_var
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.05, t_max=100,
        local_search_iterations=0, epsilon=0.5))
    rng = jax.random.PRNGKey(0)
    outs = {}
    for mode in ("windowed", "scatter"):
        monkeypatch.setenv("PDP_SEGMENT_BACKEND", mode)
        state = solver.get_init_state(jax.random.PRNGKey(1), batch,
                                      randomized=True)
        (pred, _), _ = solver.forward({}, rng, batch, state, 60,
                                      is_training=False,
                                      check_termination=True)
        solved_v, unsat = cnf_evaluate(batch, pred)
        outs[mode] = (np.asarray(solved_v), np.asarray(unsat))
    np.testing.assert_allclose(outs["windowed"][1], outs["scatter"][1],
                               atol=1e-3)
