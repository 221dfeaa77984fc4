"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.parallel import (
    make_mesh, stack_batches, make_parallel_train_step, make_parallel_solve)
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from tests.helpers import cnf_instance, random_ksat


def _batches(rng, n_dev, n=10, m=25, count=2):
    return [pack_instances(
        [cnf_instance(n, random_ksat(rng, n, m)) for _ in range(count)],
        pad_v=64, pad_f=64, pad_e=256, pad_b=8) for _ in range(n_dev)]


def _solver(mt="np-nd-np"):
    return PDPSolver(SolverConfig(
        model_type=mt, hidden_dim=8, mem_hidden_dim=8, agg_hidden_dim=8,
        mem_agg_hidden_dim=8, classifier_dim=8,
        local_search_iterations=20, epsilon=0.5, tolerance=0.02, t_max=10))


def test_devices_available():
    assert len(jax.devices()) == 8


def test_parallel_train_step_matches_grads(rng):
    n_dev = 4
    mesh = make_mesh(n_dev)
    solver = _solver()
    optimizer = optax.chain(optax.clip_by_global_norm(0.65),
                            optax.scale_by_adam(), optax.scale(-1e-3))
    params = solver.init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = make_parallel_train_step(solver, optimizer, t_outer=2,
                                    exploration=0.1, loss_sharpness=5,
                                    mesh=mesh)
    batches = stack_batches(_batches(rng, n_dev))
    rngs = jax.random.split(jax.random.PRNGKey(1), n_dev)
    p2, o2, loss = step(params, opt_state, jnp.ones(()), rngs, batches)
    assert np.isfinite(float(loss))
    # parameters actually moved
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)))
    assert diff > 0


def test_parallel_solve_pdp(rng):
    n_dev = 8
    mesh = make_mesh(n_dev)
    solver = _solver("p-d-p")
    solve = make_parallel_solve(solver, 60, mesh=mesh)
    batches = [pack_instances(
        [cnf_instance(12, random_ksat(rng, 12, 30)) for _ in range(2)],
        pad_v=64, pad_f=64, pad_e=256, pad_b=8) for _ in range(n_dev)]
    states = [solver.get_init_state(jax.random.PRNGKey(i), b, True)
              for i, b in enumerate(batches)]
    preds, solved_frac = solve(
        {}, jax.random.split(jax.random.PRNGKey(9), n_dev),
        stack_batches(batches),
        jax.tree_util.tree_map(lambda *x: jnp.stack(x), *states))
    assert preds.shape[0] == n_dev
    assert float(solved_frac) >= 0.5  # easy alpha=2.5 instances


def test_replica_parallel_solve(rng):
    """4 dp x 2 rep mesh: each replica column solves from a different init;
    the min-energy replica is selected over ICI collectives."""
    from pdp_solver_tpu.parallel import make_mesh_2d, make_replica_parallel_solve
    n_dp, n_rep = 4, 2
    mesh = make_mesh_2d(n_dp, n_rep)
    solver = _solver("p-d-p")
    solve = make_replica_parallel_solve(solver, 60, mesh=mesh)
    batches = stack_batches(_batches(rng, n_dp, n=12, m=30))
    rngs = jax.random.split(jax.random.PRNGKey(5), n_dp * n_rep)
    rngs = rngs.reshape(n_dp, n_rep, 2)
    preds, solved_frac = solve({}, rngs, batches)
    assert preds.shape[0] == n_dp
    assert np.isfinite(np.asarray(preds)).all()
    assert float(solved_frac) >= 0.5
