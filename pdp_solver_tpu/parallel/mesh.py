"""Multi-chip execution: device meshes, sharded training and inference.

The reference's only parallelism is single-process `nn.DataParallel`
(src/pdp/factorgraph/base.py:93-97). The TPU-native equivalents here
(SURVEY.md section 2.9):

  * data parallelism: the instance stream is sharded along a leading device
    axis of the packed FGBatch; each chip solves / differentiates its own
    shard and gradients (or solved-count metrics) are `psum`-ed over ICI via
    `shard_map`;
  * search parallelism (batch replication) composes with this: each shard can
    carry its own replicas, de-duplicated locally;
  * multi-host: `jax.distributed.initialize` + per-host input sharding; the
    same mesh code covers one chip, one host, or N hosts because the mesh is
    built from whatever `jax.devices()` reports.

Weights are tiny (<1M params, SURVEY.md 2.9: no TP/PP needed) and stay
replicated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pdp_solver_tpu.fg.batch import FGBatch
from pdp_solver_tpu.train.loss import energy_loss, cnf_evaluate


def distributed_initialize(**kwargs):
    """Multi-host runtime init (call once per host before device queries)."""
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices=None, axis_name="dp"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(n_dp, n_rep, dp_axis="dp", rep_axis="rep"):
    """(dp, rep) mesh: data parallelism x search (replica) parallelism."""
    devices = np.asarray(jax.devices()[:n_dp * n_rep]).reshape(n_dp, n_rep)
    return Mesh(devices, (dp_axis, rep_axis))


def stack_batches(batches) -> FGBatch:
    """Stack equal-shape FGBatches along a new leading device axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *batches)


def make_parallel_train_step(solver, optimizer, *, t_outer=1, t_inner=1,
                             lam=1.0, exploration=1.0, loss_sharpness=1,
                             randomized=True, mesh=None, axis_name="dp"):
    """Data-parallel training step over a 1-D mesh.

    Input batch pytree has a leading [n_devices] axis; parameters and
    optimizer state are replicated. Per-device gradients are averaged with
    `jax.lax.pmean` over ICI, so the update is identical on every chip.
    """
    if mesh is None:
        mesh = make_mesh()

    def loss_fn(params, rng, batch, global_step):
        r_state, rng = jax.random.split(rng)
        state = solver.get_init_state(r_state, batch, randomized)
        loss = jnp.zeros(())
        for t in range(t_outer):
            rng, r_fwd = jax.random.split(rng)
            (var_pred, _), state = solver.forward(
                params, r_fwd, batch, state, t_inner,
                is_training=True, check_termination=False)
            loss = loss + energy_loss(
                batch, var_pred, global_step, exploration,
                loss_sharpness) * (lam ** (t_outer - t - 1))
        return loss

    def device_step(params, opt_state, global_step, rng, batch):
        # shard_map gives each device its [1, ...] slice; drop the axis
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        rng = rng[0]
        loss, grads = jax.value_and_grad(loss_fn)(
            params, rng, batch, global_step)
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # check_vma=False everywhere shard_map wraps the solver: the Pallas
    # kernels' ShapeDtypeStruct out_shapes carry no vma annotation, which
    # JAX >= 0.9 rejects when the (default-on) vma check is active
    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()), check_vma=False)

    @jax.jit
    def train_step(params, opt_state, global_step, rngs, batches):
        return sharded(params, opt_state, global_step, rngs, batches)

    return train_step


def make_parallel_solve(solver, iteration_num, *, replication=1, mesh=None,
                        axis_name="dp"):
    """Data-parallel inference: every chip solves its own packed shard; the
    solved-count reduction rides ICI. Returns per-shard predictions plus the
    global solved fraction."""
    if mesh is None:
        mesh = make_mesh()

    def device_solve(params, rng, batch, state):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        state = jax.tree_util.tree_map(lambda x: x[0], state)
        rng = rng[0]
        (var_pred, _), _ = solver.forward(
            params, rng, batch, state, iteration_num,
            is_training=False, check_termination=True,
            replication=replication)
        solved, _ = cnf_evaluate(batch, var_pred)
        solved = solved * batch.instance_mask
        n_solved = jax.lax.psum(jnp.sum(solved), axis_name)
        n_total = jax.lax.psum(jnp.sum(batch.instance_mask), axis_name)
        return var_pred[None], n_solved / jnp.maximum(n_total, 1.0)

    sharded = shard_map(
        device_solve, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P()), check_vma=False)

    @jax.jit
    def solve(params, rngs, batches, states):
        return sharded(params, rngs, batches, states)

    return solve


def make_replica_parallel_solve(solver, iteration_num, *, mesh,
                                dp_axis="dp", rep_axis="rep"):
    """Search parallelism across chips: a 2-D (dp, rep) mesh where every
    `rep` slice solves the same instance shard from a different random
    message initialisation, and the minimum-energy replica is selected with
    an `all_gather` + masked `psum` over the replica axis (the multi-chip
    analog of the reference's in-batch replication + de-dup,
    solver.py:56-99/401-431).

    Input batch pytree has a leading [n_dp] axis (replicated over `rep`);
    rngs have shape [n_dp, n_rep, 2]. Returns ([n_dp, ...] predictions
    selected per-variable from the best replica, global solved fraction).
    """
    from pdp_solver_tpu.solvers.base import _compute_energy
    from pdp_solver_tpu.problem.state import init_problem_state

    def device_solve(params, rng, batch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        # the batch is replicated over the replica axis while the rng varies,
        # so mark it replica-varying up front or the solver's while_loop carry
        # types diverge between input and output
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, (rep_axis,), to="varying"), batch)
        rng = rng[0, 0]
        r_state, r_fwd = jax.random.split(rng)
        state = solver.get_init_state(r_state, batch, randomized=True)
        (var_pred, _), _ = solver.forward(
            params, r_fwd, batch, state, iteration_num,
            is_training=False, check_termination=True)

        # replica selection by energy (uses the ORIGINAL formula: the solve
        # already merged its decimated solution into var_pred)
        problem = init_problem_state(batch)
        assign = 2.0 * var_pred[:, 0] - 1.0
        energy, _ = _compute_energy(batch, problem, assign)       # [B]

        e_all = jax.lax.all_gather(energy, rep_axis)              # [R, B]
        best_r = jnp.argmin(e_all, axis=0)                        # [B]
        my_r = jax.lax.axis_index(rep_axis)
        mine = (best_r[batch.var_batch] == my_r).astype(var_pred.dtype)
        selected = jax.lax.psum(var_pred * mine[:, None], rep_axis)

        solved, _ = cnf_evaluate(batch, selected)
        solved = solved * batch.instance_mask
        # sum over BOTH axes (each instance counted n_rep times in both
        # numerator and denominator) so the ratio is exact and statically
        # replica-invariant
        n_solved = jax.lax.psum(jnp.sum(solved), (dp_axis, rep_axis))
        n_total = jax.lax.psum(jnp.sum(batch.instance_mask),
                               (dp_axis, rep_axis))
        return selected[None], n_solved / jnp.maximum(n_total, 1.0)

    sharded = shard_map(
        device_solve, mesh=mesh,
        in_specs=(P(), P(dp_axis, rep_axis), P(dp_axis)),
        out_specs=(P(dp_axis), P()), check_vma=False)

    @jax.jit
    def solve(params, rngs, batches):
        return sharded(params, rngs, batches)

    return solve
