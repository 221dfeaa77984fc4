"""Backend parity: the ELL gather path must match the scatter path exactly."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdp_solver_tpu.fg.batch import pack_instances, build_ell_table, \
    replicate_batch
from pdp_solver_tpu.modules import common
from tests.helpers import cnf_instance, random_ksat


@pytest.fixture
def batch(rng):
    insts = [cnf_instance(12, random_ksat(rng, 12, 30)),
             cnf_instance(8, random_ksat(rng, 8, 16))]
    return pack_instances(insts, pad_v=32, pad_f=64, pad_e=256, pad_b=4)


def _both(fn, *args):
    os.environ["PDP_SEGMENT_BACKEND"] = "scatter"
    a = np.asarray(fn(*args))
    os.environ["PDP_SEGMENT_BACKEND"] = "ell"
    b = np.asarray(fn(*args))
    os.environ["PDP_SEGMENT_BACKEND"] = "auto"
    return a, b


def test_ell_table_structure(batch):
    table = np.asarray(batch.var_edges)
    ev = np.asarray(batch.edge_var)
    em = np.asarray(batch.edge_mask)
    for v in range(batch.num_vars):
        mine = sorted(int(e) for e in table[v] if e >= 0)
        expect = sorted(np.flatnonzero((ev == v) & (em > 0)).tolist())
        assert mine == expect, f"var {v}"


def test_scatter_vs_ell_sum_1d(batch, rng):
    x = jnp.asarray(rng.normal(size=batch.num_edges).astype(np.float32))
    a, b = _both(common.scatter_to_vars, batch, x)
    np.testing.assert_allclose(a, b, rtol=1e-6)
    a, b = _both(common.scatter_to_clauses, batch, x)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_scatter_vs_ell_sum_2d_wide(batch, rng):
    # width > chunk budget path
    x = jnp.asarray(rng.normal(size=(batch.num_edges, 40)).astype(np.float32))
    a, b = _both(common.scatter_to_vars, batch, x)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_smooth_max_backends(batch, rng):
    x = jnp.asarray(
        rng.uniform(size=batch.num_edges).astype(np.float32)
        * np.asarray(batch.edge_mask))
    a, b = _both(common.var_smooth_max, batch, x)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_replicated_tables_consistent(batch, rng):
    rep = replicate_batch(batch, 2)
    table = np.asarray(rep.var_edges)
    ev = np.asarray(rep.edge_var)
    em = np.asarray(rep.edge_mask)
    for v in range(rep.num_vars):
        mine = sorted(int(e) for e in table[v] if e >= 0)
        expect = sorted(np.flatnonzero((ev == v) & (em > 0)).tolist())
        assert mine == expect, f"replicated var {v}"


def test_degree_cap_falls_back():
    ids = np.zeros(600, dtype=np.int32)  # one node with degree 600
    table = build_ell_table(ids, 4)
    assert table.shape == (4, 0)


def test_full_solve_backend_parity(rng):
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    insts = [cnf_instance(15, random_ksat(rng, 15, 45)) for _ in range(3)]
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.02,
                                    t_max=10, local_search_iterations=20,
                                    epsilon=0.5))
    key = jax.random.PRNGKey(0)
    state = solver.get_init_state(key, batch, randomized=True)

    def run():
        (pred, _), _ = solver.forward({}, key, batch, state, 40,
                                      is_training=False,
                                      check_termination=True)
        return pred

    a, b = _both(run)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
