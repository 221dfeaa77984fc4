"""Windowed multi-column reduce + uniform-k reshape reduce: exactness,
gradients, pack-time fast-path flags, and end-to-end dispatch parity."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdp_solver_tpu.fg.batch import (
    FGBatch, pack_instances, replicate_batch, REDUCE_TILE)
from pdp_solver_tpu.ops.pallas_reduce import (
    windowed_segment_sum, uniform_clause_sum)
from pdp_solver_tpu.utils.benchdata import make_ksat_set
from tests.helpers import cnf_instance, random_ksat


def _ref(x, ids, n):
    m = x if x.ndim == 1 else x
    return jax.ops.segment_sum(m, ids, num_segments=n)


def test_windowed_matches_segment_sum_clause_dir():
    batch = pack_instances(make_ksat_set(count=4, n=40, alpha=5.0, k=3))
    assert batch.fast_clause
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=batch.num_edges).astype(np.float32)) * batch.edge_mask
    got = windowed_segment_sum(x, batch.edge_clause, batch.num_clauses,
                               interpret=True)
    np.testing.assert_allclose(got, _ref(x, batch.edge_clause,
                                         batch.num_clauses),
                               rtol=1e-5, atol=1e-6)


def test_windowed_matches_segment_sum_var_dir_multicol():
    batch = pack_instances(make_ksat_set(count=6, n=30, alpha=4.0, k=3))
    assert batch.fast_var
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(batch.num_edges, 4)).astype(np.float32))
    x = x * batch.edge_mask[:, None]
    got = windowed_segment_sum(x, batch.edge_var, batch.num_vars,
                               interpret=True)
    np.testing.assert_allclose(got, _ref(x, batch.edge_var, batch.num_vars),
                               rtol=1e-6, atol=1e-6)


def test_windowed_non_tile_multiple():
    # E=384 edges: exercises the in-op padding to a TILE multiple
    ids = jnp.asarray(np.sort(np.random.default_rng(2).integers(
        0, 50, size=384)).astype(np.int32))
    x = jnp.asarray(np.random.default_rng(3).normal(size=384),
                    dtype=jnp.float32)
    got = windowed_segment_sum(x, ids, 50, interpret=True)
    np.testing.assert_allclose(got, _ref(x, ids, 50), rtol=1e-6, atol=1e-6)


def test_windowed_gradient_is_gather():
    ids = jnp.asarray(np.repeat(np.arange(8), 16).astype(np.int32))
    x = jnp.asarray(np.random.default_rng(4).normal(size=(128, 2)),
                    dtype=jnp.float32)

    def f(x):
        return jnp.sum(windowed_segment_sum(x, ids, 8, interpret=True) ** 2)

    def f_ref(x):
        return jnp.sum(_ref(x, ids, 8) ** 2)

    np.testing.assert_allclose(jax.grad(f)(x), jax.grad(f_ref)(x), rtol=1e-5)


def test_uniform_clause_sum_matches():
    batch = pack_instances(make_ksat_set(count=4, n=40, alpha=5.0, k=4))
    assert batch.clause_width == 4
    rng = np.random.default_rng(5)
    for shape in [(batch.num_edges,), (batch.num_edges, 3)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        x = x * (batch.edge_mask if x.ndim == 1
                 else batch.edge_mask[:, None])
        got = uniform_clause_sum(x, 4, batch.num_clauses)
        np.testing.assert_allclose(
            got, _ref(x, batch.edge_clause, batch.num_clauses),
            rtol=1e-6, atol=1e-6)


def test_uniform_clause_sum_gradient():
    batch = pack_instances(make_ksat_set(count=2, n=20, alpha=4.0, k=4))

    def f(x):
        return jnp.sum(uniform_clause_sum(
            x * batch.edge_mask, 4, batch.num_clauses) ** 2)

    def f_ref(x):
        return jnp.sum(_ref(x * batch.edge_mask, batch.edge_clause,
                            batch.num_clauses) ** 2)

    x = jnp.asarray(np.random.default_rng(6).normal(size=batch.num_edges),
                    dtype=jnp.float32)
    np.testing.assert_allclose(jax.grad(f)(x), jax.grad(f_ref)(x), rtol=1e-5)


# ---------------------------------------------------------------- flags ----

def test_pack_flags_uniform_ksat():
    batch = pack_instances(make_ksat_set(count=8, n=50, alpha=6.0, k=4))
    assert batch.clause_width == 4
    assert batch.fast_var and batch.fast_clause


def test_pack_flags_ragged_mixed():
    rng = np.random.default_rng(7)
    insts = [cnf_instance(20, random_ksat(rng, 20, 40, k=int(k)))
             for k in rng.integers(2, 5, size=6)]
    batch = pack_instances(insts)
    # random mixed-k instances: no uniform width, but spans stay tiny
    assert batch.fast_var and batch.fast_clause


def test_pack_flags_span_violation():
    # one instance with 5000 vars hit in random order: a TILE of edges spans
    # nearly the whole variable range -> var fast path must switch off
    rng = np.random.default_rng(8)
    n = 5000
    ev = rng.permutation(n).astype(np.int32)
    ec = np.arange(n, dtype=np.int32)
    signs = np.ones(n, np.float32)
    batch = pack_instances([(n, n, np.stack([ev, ec]), signs, -1.0)])
    assert not batch.fast_var
    assert batch.fast_clause  # clause ids are still sorted and gap-free


def test_replicate_preserves_flags():
    batch = pack_instances(make_ksat_set(count=4, n=40, alpha=5.0, k=4))
    rep = replicate_batch(batch, 3)
    if batch.num_edges % REDUCE_TILE == 0:
        assert rep.fast_var == batch.fast_var
        assert rep.fast_clause == batch.fast_clause
    # reshape-reduce survives only when pad_e == k * pad_f
    if batch.num_edges == 4 * batch.num_clauses:
        assert rep.clause_width == 4
    # replicated reduce must still be exact through the dispatcher
    x = jnp.asarray(np.random.default_rng(9).normal(
        size=rep.num_edges).astype(np.float32))
    from pdp_solver_tpu.modules.common import scatter_to_clauses
    got = scatter_to_clauses(rep, x)
    want = _ref(x * rep.edge_mask, rep.edge_clause, rep.num_clauses)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_batch_is_pytree_with_static_aux():
    batch = pack_instances(make_ksat_set(count=2, n=20, alpha=4.0, k=4))
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    assert all(hasattr(x, "shape") for x in leaves)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.clause_width == batch.clause_width
    assert rebuilt.fast_var == batch.fast_var

    @jax.jit
    def f(b):
        # static aux is visible as plain python inside jit
        assert isinstance(b.clause_width, int)
        return jnp.sum(b.edge_sign)

    f(batch)


# ------------------------------------------------ end-to-end dispatch ------

def test_solver_forward_windowed_backend_parity():
    """Full p-d-p solve through the windowed dispatch (interpret mode on
    CPU) must match the scatter backend exactly."""
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver

    insts = make_ksat_set(count=4, n=20, alpha=3.0, k=3)
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.02,
                                    t_max=10, local_search_iterations=5,
                                    epsilon=0.5))
    key = jax.random.PRNGKey(0)
    state = solver.get_init_state(key, batch, randomized=True)

    def run():
        (pred, _), _ = solver.forward({}, key, batch, state, 15,
                                      is_training=False,
                                      check_termination=True)
        return np.asarray(pred)

    old = os.environ.get("PDP_SEGMENT_BACKEND")
    try:
        os.environ["PDP_SEGMENT_BACKEND"] = "scatter"
        p_scatter = run()
        os.environ["PDP_SEGMENT_BACKEND"] = "windowed"
        p_windowed = run()
    finally:
        if old is None:
            os.environ.pop("PDP_SEGMENT_BACKEND", None)
        else:
            os.environ["PDP_SEGMENT_BACKEND"] = old
    np.testing.assert_allclose(p_scatter, p_windowed, rtol=1e-5, atol=1e-5)
