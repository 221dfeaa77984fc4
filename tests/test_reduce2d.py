"""2-D windowed reduce/gather kernels: exactness + gradients + e2e neural."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.ops.pallas_reduce2d import (
    windowed_segment_sum_2d, windowed_gather_2d)
from tests.helpers import cnf_instance, random_ksat


@pytest.fixture
def data():
    rng = np.random.default_rng(3)
    E, N, d = 700, 90, 50
    ids = np.sort(rng.integers(0, N, E)).astype(np.int32)
    x = rng.standard_normal((E, d)).astype(np.float32)
    nodes = rng.standard_normal((N, d)).astype(np.float32)
    return ids, x, nodes, E, N, d


def test_reduce2d_exact(data):
    ids, x, nodes, E, N, d = data
    got = np.asarray(windowed_segment_sum_2d(
        jnp.asarray(x), jnp.asarray(ids), N, True))
    want = np.zeros((N, d), np.float32)
    np.add.at(want, ids, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gather2d_exact(data):
    ids, x, nodes, E, N, d = data
    got = np.asarray(windowed_gather_2d(
        jnp.asarray(nodes), jnp.asarray(ids), E, True))
    np.testing.assert_allclose(got, nodes[ids], rtol=1e-6, atol=1e-6)


def test_reduce2d_grad(data):
    ids, x, nodes, E, N, d = data
    w = jnp.asarray(np.random.default_rng(5)
                    .standard_normal((N, d)).astype(np.float32))

    def loss(x):
        return jnp.sum(windowed_segment_sum_2d(
            x, jnp.asarray(ids), N, True) * w)

    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    np.testing.assert_allclose(g, np.asarray(w)[ids], rtol=1e-5, atol=1e-5)


def test_gather2d_grad(data):
    ids, x, nodes, E, N, d = data
    w = jnp.asarray(x)

    def loss(nodes):
        return jnp.sum(windowed_gather_2d(
            nodes, jnp.asarray(ids), E, True) * w)

    g = np.asarray(jax.grad(loss)(jnp.asarray(nodes)))
    want = np.zeros((N, d), np.float32)
    np.add.at(want, ids, x)
    np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-5)


def test_neural_forward_2d_kernel_matches(monkeypatch):
    """np-nd-np forward with the 2-D kernels (forced) vs the XLA path."""
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    rng = np.random.default_rng(9)
    insts = [cnf_instance(12, random_ksat(rng, 12, 30, k=3))
             for _ in range(2)]
    batch = pack_instances(insts)
    solver = PDPSolver(SolverConfig(
        model_type="np-nd-np", hidden_dim=32, mem_hidden_dim=24,
        agg_hidden_dim=24, mem_agg_hidden_dim=16, classifier_dim=16))
    params = solver.init_params(jax.random.PRNGKey(0))
    state = solver.get_init_state(jax.random.PRNGKey(1), batch, True)

    def fwd():
        (pred, _), _ = solver.forward(params, jax.random.PRNGKey(2), batch,
                                      state, 4, is_training=False)
        return pred

    monkeypatch.setenv("PDP_SEGMENT_BACKEND", "scatter")
    ref = fwd()
    monkeypatch.setenv("PDP_SEGMENT_BACKEND", "windowed")
    got = fwd()
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-5)
