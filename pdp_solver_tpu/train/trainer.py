"""Trainer / tester / predictor orchestration.

Port of reference `FactorGraphTrainerBase` (src/pdp/factorgraph/base.py) +
`SatFactorGraphTrainer` (src/pdp/trainer.py) with the torch loops replaced by
jitted JAX steps:

  * training: T-step BPTT with lambda-discounted energy loss
    (base.py:149-182), Adam + global-norm clip + L2 weight decay in the same
    order torch applies them (clip grads -> add wd -> Adam moments);
  * testing: per-instance termination + metric vector
    [accuracy(L1), recall, loss] (trainer.py:109-123);
  * prediction: byte-compatible JSON-lines output (trainer.py:125-148).

The annealing `global_step` is part of the train state and checkpointed, like
the reference's non-grad `_global_step` parameter (solver.py:310).
"""

import json
import os
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pdp_solver_tpu.fg.batch import FGBatch
from pdp_solver_tpu.fg.loader import BatchLoader
from pdp_solver_tpu.solvers.base import PDPSolver, build_solver
from pdp_solver_tpu.train import checkpoint as ckpt
from pdp_solver_tpu.train.loss import energy_loss, cnf_evaluate, LOSS_EPS


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    global_step: jnp.ndarray  # f32 scalar, drives loss-temperature annealing


class SatTrainer:
    def __init__(self, config: dict, logger=None, seed=0):
        self._config = dict(config)
        self._logger = logger
        self.solver: PDPSolver = build_solver(config)
        self._seed = int(config.get("random_seed", seed)) & 0x7FFFFFFF
        self._rng = jax.random.PRNGKey(self._seed)
        self._rng, r_init = jax.random.split(self._rng)
        self.params = self.solver.init_params(r_init)
        if self._config.get("verbose"):
            self._log("The model parameter count is %d."
                      % self.solver.parameter_count(self.params))
        # trained annealing step, used by metric losses (reference evaluates
        # at model._global_step, trainer.py:119-122)
        self.global_step = jnp.ones((), jnp.float32)

        self._optimizer = None
        self._step_cache = {}
        # reference trainer.py:45 _counter (per-formatted-prediction count)
        self._prediction_counter = 0
        # multi-device telemetry: sharded solve groups / train steps run
        # (asserted by the 8-CPU-mesh tests)
        self._parallel_groups = 0
        self._parallel_steps = 0

    # ---------------------------------------------------------------- utils

    def _log(self, msg):
        if self._logger is not None:
            self._logger.info(msg)

    def _next_rng(self):
        self._rng, r = jax.random.split(self._rng)
        return r

    def _make_optimizer(self):
        c = self._config
        self._optimizer = optax.chain(
            optax.clip_by_global_norm(c.get("clip_norm", 0.65)),
            optax.add_decayed_weights(c.get("weight_decay", 0.0)),
            optax.scale_by_adam(),
            optax.scale(-c.get("learning_rate", 1e-4)),
        )
        return self._optimizer

    def init_train_state(self) -> TrainState:
        opt = self._make_optimizer()
        return TrainState(params=self.params,
                          opt_state=opt.init(self.params),
                          global_step=jnp.zeros((), jnp.float32))

    # ---------------------------------------------------------------- train

    def _loss_fn(self):
        """The T-step lambda-discounted BPTT energy loss (reference
        base.py:162-173), shared by the single-device and data-parallel
        train steps."""
        c = self._config
        solver = self.solver
        t_outer = int(c.get("train_outer_recurrence_num", 1))
        t_inner = int(c.get("train_inner_recurrence_num", 1))
        lam = float(c.get("lambda", 1.0))
        alpha = float(c.get("exploration", 1.0))
        kappa = float(c.get("loss_sharpness", 1))
        randomized = bool(c.get("randomized", True))
        # rematerialize each outer BPTT step: without it the T-step unroll
        # holds every per-edge GRU activation alive through the backward
        # pass — 19.5 GB HBM at E=131072/T=10, an OOM on one v5e chip;
        # with per-step checkpoints memory is O(E*h) instead of O(T*E*h)
        # at the cost of one extra forward
        remat = bool(c.get("train_remat", True))

        # lax.scan over the T outer steps compiles the step body ONCE
        # instead of unrolling it T times: for np-d-np (decimate-inside-
        # BPTT, a step graph ~5x the flagship's) the unrolled T=10 program
        # never finished its remote compile within a 45-min budget
        # (docs/ROUND4.md section 5); the scanned program is ~T-times
        # smaller. Default off so the flagship's committed compiled
        # programs stay valid.
        scan = bool(c.get("train_scan", False))

        def loss_fn(params, rng, batch, global_step):
            r_state, rng = jax.random.split(rng)
            state = solver.get_init_state(r_state, batch, randomized)

            def step_t(params, state, r_fwd):
                return solver.forward(
                    params, r_fwd, batch, state, t_inner,
                    is_training=True, check_termination=False)

            if remat:
                step_t = jax.checkpoint(step_t)

            if scan:
                def body(carry, t):
                    state, rng, loss = carry
                    rng, r_fwd = jax.random.split(rng)
                    (var_pred, _), state = step_t(params, state, r_fwd)
                    step_loss = energy_loss(batch, var_pred, global_step,
                                            alpha, kappa)
                    w = jnp.power(jnp.float32(lam),
                                  (t_outer - 1 - t).astype(jnp.float32))
                    return (state, rng, loss + step_loss * w), None

                (state, rng, loss), _ = jax.lax.scan(
                    body, (state, rng, jnp.zeros(())),
                    jnp.arange(t_outer))
                return loss

            loss = jnp.zeros(())
            for t in range(t_outer):
                rng, r_fwd = jax.random.split(rng)
                (var_pred, _), state = step_t(params, state, r_fwd)
                step_loss = energy_loss(batch, var_pred, global_step,
                                        alpha, kappa)
                loss = loss + step_loss * (lam ** (t_outer - t - 1))
            return loss

        return loss_fn

    def _train_step_fn(self):
        optimizer = self._optimizer
        loss_fn = self._loss_fn()

        @jax.jit
        def train_step(train_state: TrainState, rng, batch: FGBatch):
            loss, grads = jax.value_and_grad(loss_fn)(
                train_state.params, rng, batch, train_state.global_step)
            updates, opt_state = optimizer.update(
                grads, train_state.opt_state, train_state.params)
            params = optax.apply_updates(train_state.params, updates)
            return TrainState(params, opt_state,
                              train_state.global_step), loss

        return train_step

    def _train_step_seeded_fn(self, base_seed=0):
        """Like _train_step_fn but takes an i32 step index instead of a PRNG
        key and derives the key INSIDE the jitted program.

        On the tunneled TPU backend every eager op is a device round-trip;
        the host-side jax.random.split per step (plus its D2H of the new
        key) serialises the dispatch pipeline and dominates the step time.
        With the key folded in-program from (base_seed, step) the host loop
        is pure dispatch and the device pipelines batches back-to-back."""
        inner = self._train_step_fn()

        def train_step(train_state: TrainState, step, batch: FGBatch):
            rng = jax.random.fold_in(
                jax.random.PRNGKey(base_seed), step.astype(jnp.uint32))
            return inner(train_state, rng, batch)

        # inner is already jitted; jitting the wrapper fuses the fold_in
        # into the same program (one dispatch per step)
        return jax.jit(train_step)

    # ------------------------------------------------------- multi-device

    def _data_parallel_devices(self):
        """Automatic data parallelism (the reference's nn.DataParallel
        wrap, src/pdp/factorgraph/base.py:93-97): number of devices to
        shard the instance stream over. config['data_parallel'] overrides
        (0/1 disables); default = every visible device."""
        n = int(self._config.get("data_parallel", jax.device_count()))
        return max(min(n, jax.device_count()), 1)

    def _train_step_parallel_fn(self, n_dev, base_seed=0):
        """Data-parallel seeded train step over a 1-D mesh: each device
        differentiates its own stacked segment (leading [n_dev] axis),
        grads/losses are pmean'd over ICI so the TrainState update is
        identical on every device; per-device PRNG streams are folded
        in-program from (base_seed, step, device)."""
        import optax as _optax
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from pdp_solver_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dev)
        optimizer = self._optimizer
        loss_fn = self._loss_fn()

        def device_step(params, opt_state, global_step, step, batch):
            batch = jax.tree_util.tree_map(lambda x: x[0], batch)
            didx = jax.lax.axis_index("dp")
            rng = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(base_seed),
                                   step.astype(jnp.uint32)),
                didx.astype(jnp.uint32))
            loss, grads = jax.value_and_grad(loss_fn)(
                params, rng, batch, global_step)
            grads = jax.lax.pmean(grads, "dp")
            loss = jax.lax.pmean(loss, "dp")
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = _optax.apply_updates(params, updates)
            return params, opt_state, loss

        sharded = shard_map(
            device_step, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("dp")),
            out_specs=(P(), P(), P()), check_vma=False)

        @jax.jit
        def train_step(train_state: TrainState, step, batches):
            params, opt_state, loss = sharded(
                train_state.params, train_state.opt_state,
                train_state.global_step, step, batches)
            return TrainState(params, opt_state,
                              train_state.global_step), loss

        return train_step

    def train(self, train_files, validation_files, last_export_path=None,
              best_export_path=None, metric_index=0, load_model=None,
              reset_step=False, generator=None, train_epoch_size=0):
        """Reference train loop (base.py:311-404): epochs of generated or
        file-backed batches, validation each epoch, best/last checkpoints."""
        c = self._config
        train_state = self.init_train_state()

        def restore(train_state):
            """Reference reloads the checkpoint at the START of every
            repetition (base.py:343-350), so repetitions are independent
            restarts."""
            if load_model == "best" and best_export_path:
                train_state = self._load_train_state(train_state,
                                                     best_export_path)
            elif load_model == "last" and last_export_path:
                train_state = self._load_train_state(train_state,
                                                     last_export_path)
            if reset_step:
                train_state = train_state._replace(
                    global_step=jnp.zeros((), jnp.float32))
            return train_state

        train_loader = BatchLoader(
            input_file=None if generator is not None else train_files[0],
            generator=generator, epoch_size=train_epoch_size,
            batch_size=c.get("batch_size", 5000),
            limit=c.get("train_batch_limit", 4000000),
            hidden_dim=c.get("hidden_dim", 3), shuffle=True,
            fixed_shape=generator is not None,
            fixed_dims=c.get("fixed_dims"),
            max_cache_size=c.get("max_cache_size", 100000))
        val_loader = BatchLoader(
            input_file=validation_files[0],
            batch_size=c.get("batch_size", 5000),
            limit=c.get("test_batch_limit", 40000000),
            hidden_dim=c.get("hidden_dim", 3),
            max_cache_size=c.get("max_cache_size", 100000))

        # seeded step: the PRNG key is folded in-program from the step
        # index (host-side eager key splits serialise dispatch on remote
        # backends), and batches are device_put explicitly (implicit H2D
        # inside dispatch stalls the tunnel)
        train_step = self._train_step_seeded_fn(base_seed=self._seed)
        # automatic data parallelism over the visible devices: generator
        # segments share one fixed shape, so groups of n_dev stack into a
        # leading device axis and run the pmean'd parallel step
        n_dev = (self._data_parallel_devices()
                 if generator is not None else 1)
        par_step = (self._train_step_parallel_fn(n_dev,
                                                 base_seed=self._seed)
                    if n_dev > 1 else None)
        step_idx = 0
        epoch_num = int(c.get("epoch_num", 1))
        rep_num = int(c.get("repetition_num", 1))
        errors = np.zeros((3, epoch_num, rep_num), np.float32)
        losses = np.zeros((epoch_num, rep_num), np.float32)
        best_error = np.inf

        for rep in range(rep_num):
            train_state = restore(train_state)
            for epoch in range(epoch_num):
                start = time.time()
                # losses stay ON DEVICE until the epoch ends: a per-step
                # float() would be a blocking host sync that re-serialises
                # the dispatch pipeline the seeded step exists to unblock
                step_losses = []
                n_batches = 0
                total_examples = 0
                n_total_batches = len(train_loader)
                pending = []

                def account(b):
                    nonlocal n_batches, total_examples
                    n_batches += 1
                    total_examples += int(np.asarray(
                        b.instance_mask).sum())
                    if c.get("verbose"):
                        print("Training epoch, batch %4d (%6d examples):"
                              " %3d%% complete..." % (
                                  n_batches, total_examples,
                                  int(min(n_batches, n_total_batches) * 100
                                      / max(n_total_batches, 1))),
                              end="\r")

                def fold_losses():
                    # fold periodically into one device scalar: still no
                    # host sync, but bounded live buffers on long epochs
                    # (tens of thousands of segments otherwise keep one
                    # device scalar alive each)
                    nonlocal step_losses
                    if len(step_losses) >= 256:
                        step_losses = [jnp.sum(jnp.stack(step_losses))]

                def drain(force_all):
                    """Run buffered segments: full groups of n_dev stack
                    into the data-parallel step (one pmean'd update);
                    with force_all (a macro-batch boundary) the remainder
                    runs as single steps, so global_step advances at the
                    exact reference point (base.py:144-145)."""
                    nonlocal train_state, step_idx
                    from pdp_solver_tpu.parallel.mesh import stack_batches
                    while len(pending) >= n_dev:
                        stacked = stack_batches(pending[:n_dev])
                        train_state, loss = par_step(
                            train_state, np.int32(step_idx & 0x7FFFFFFF),
                            stacked)
                        step_idx += 1
                        self._parallel_steps += 1
                        # pmean'd loss, rescaled to sum-of-segments
                        step_losses.append(loss * n_dev)
                        del pending[:n_dev]
                    if force_all:
                        for b in pending:
                            train_state, loss = train_step(
                                train_state,
                                np.int32(step_idx & 0x7FFFFFFF),
                                jax.device_put(b))
                            step_idx += 1
                            step_losses.append(loss)
                        pending.clear()
                    fold_losses()

                for batch, _, macro_done in train_loader.iter_segments():
                    account(batch)
                    if par_step is not None:
                        pending.append(batch)
                        drain(force_all=macro_done)
                    else:
                        train_state, loss = train_step(
                            train_state, np.int32(step_idx & 0x7FFFFFFF),
                            jax.device_put(batch))
                        step_idx += 1
                        step_losses.append(loss)
                        fold_losses()
                    # the reference increments once per macro batch
                    # (base.py:144-145), so the annealing temperature must
                    # only advance on the last segment of each macro-batch
                    if macro_done:
                        train_state = train_state._replace(
                            global_step=train_state.global_step + 1.0)

                total_loss = (float(jnp.sum(jnp.stack(step_losses)))
                              if step_losses else 0.0)
                losses[epoch, rep] = total_loss / max(total_examples, 1)
                self.params = train_state.params
                self.global_step = train_state.global_step
                err = self.test_metrics(val_loader, 1)
                errors[:, epoch, rep] = err
                duration = time.time() - start

                if last_export_path:
                    self._save_train_state(train_state, last_export_path)
                if best_export_path and err[metric_index] < best_error:
                    best_error = err[metric_index]
                    self._save_train_state(train_state, best_export_path)

                self._log(
                    "Rep %d, Epoch %d: error=%s loss=%.5f (%.1fs)" % (
                        rep + 1, epoch + 1, np.array_str(err),
                        losses[epoch, rep], duration))

        if best_export_path:
            np.save(os.path.join(best_export_path, "losses"), losses)
            np.save(os.path.join(best_export_path, "errors"), errors)
        self.params = train_state.params
        return train_state, errors, losses

    # ---------------------------------------------------------------- test

    def _forward_fn(self, iteration_num, replication):
        key = (iteration_num, replication)
        if key not in self._step_cache:
            solver = self.solver

            def fwd(params, rng, batch, state):
                return solver.forward(
                    params, rng, batch, state, iteration_num,
                    is_training=False, check_termination=True,
                    replication=replication)

            self._step_cache[key] = jax.jit(fwd)
        return self._step_cache[key]

    def _run_batch(self, batch, replication):
        c = self._config
        iters = int(c.get("test_recurrence_num", 1000))
        # long budgets run through the fault-tolerant chunked solve: a
        # single monolithic program of e.g. the reference's 8800-iteration
        # predict budget can crash tunneled TPU workers. PDP_SOLVE_CHUNK
        # overrides (0 = monolithic); replication composes with the carry
        # only if the caller replicates, so replicated runs stay monolithic
        default_chunk = "100" if jax.default_backend() == "tpu" else "0"
        chunk = int(os.environ.get("PDP_SOLVE_CHUNK", default_chunk))
        if chunk > 0 and replication == 1 and iters > chunk:
            # PDP_SOLVE_COMPACT=1 additionally harvests solved instances at
            # chunk boundaries and repacks the survivors into smaller
            # buckets (solvers/compact.py) - worthwhile for long budgets
            # over many instances; default off to keep the reference's
            # single-batch semantics (identical RNG stream per batch)
            if os.environ.get("PDP_SOLVE_COMPACT", "0") == "1":
                from pdp_solver_tpu.fg.batch import unpack_instances
                from pdp_solver_tpu.solvers.compact import compacting_solve
                insts = unpack_instances(batch)
                sols, _, _ = compacting_solve(
                    self.solver, self.params, self._next_rng(), insts,
                    iters, chunk=chunk)
                pred = np.full((batch.num_vars, 1), 0.5, np.float32)
                off = 0
                for sol in sols:
                    pred[off:off + sol.shape[0], 0] = sol
                    off += sol.shape[0]
                return jnp.asarray(pred)
            from pdp_solver_tpu.utils.resilient import resilient_solve
            r_state, r_fwd = jax.random.split(self._next_rng())
            state = self.solver.get_init_state(r_state, batch,
                                               randomized=True)
            var_pred, _ = resilient_solve(self.solver, self.params, r_fwd,
                                          batch, state, iters, chunk=chunk)
            return var_pred
        fwd = self._forward_fn(iters, replication)
        r_state, r_fwd = jax.random.split(self._next_rng())
        state = self.solver.get_init_state(r_state, batch, randomized=True,
                                           replication=replication)
        (var_pred, _), _ = fwd(self.params, r_fwd, batch, state)
        return var_pred

    def _parallel_solve_fn(self, iters, replication, n_dev):
        key = ("par", iters, replication, n_dev)
        if key not in self._step_cache:
            from pdp_solver_tpu.parallel.mesh import (
                make_mesh, make_parallel_solve)
            self._step_cache[key] = make_parallel_solve(
                self.solver, iters, replication=replication,
                mesh=make_mesh(n_dev))
        return self._step_cache[key]

    def _solved_preds(self, pairs, replication):
        """Yield (batch, misc, var_pred) in input order, sharding groups of
        consecutive same-shape batches across the device mesh when more
        than one device is visible (the reference's automatic
        nn.DataParallel scatter, base.py:93-97). Per-batch PRNG draws and
        init states are identical to the serial path, so predictions are
        the same either way."""
        c = self._config
        iters = int(c.get("test_recurrence_num", 1000))
        default_chunk = "100" if jax.default_backend() == "tpu" else "0"
        chunk = int(os.environ.get("PDP_SOLVE_CHUNK", default_chunk))
        chunked = chunk > 0 and replication == 1 and iters > chunk
        n_dev = self._data_parallel_devices()
        if n_dev <= 1 or chunked:
            for batch, misc in pairs:
                yield batch, misc, self._run_batch(batch, replication)
            return

        from pdp_solver_tpu.parallel.mesh import stack_batches

        def shape_key(batch):
            return (batch.num_vars, batch.num_clauses, batch.num_edges,
                    batch.batch_size, batch.tree_flatten()[1])

        def flush(group):
            if len(group) == 1:
                batch, misc = group[0]
                yield batch, misc, self._run_batch(batch, replication)
                return
            rngs, states = [], []
            batches = [b for b, _ in group]
            for batch in batches:
                r_state, r_fwd = jax.random.split(self._next_rng())
                rngs.append(r_fwd)
                states.append(self.solver.get_init_state(
                    r_state, batch, randomized=True,
                    replication=replication))
            solve = self._parallel_solve_fn(iters, replication, len(group))
            preds, _ = solve(self.params, jnp.stack(rngs),
                             stack_batches(batches),
                             jax.tree_util.tree_map(
                                 lambda *xs: jnp.stack(xs, 0), *states))
            self._parallel_groups += 1
            for i, (batch, misc) in enumerate(group):
                yield batch, misc, preds[i]

        group = []
        for batch, misc in pairs:
            if group and (len(group) >= n_dev
                          or shape_key(group[-1][0]) != shape_key(batch)):
                yield from flush(group)
                group = []
            group.append((batch, misc))
        if group:
            yield from flush(group)

    def test_metrics(self, loader, replication=1):
        """Metric vector [accuracy(L1 of solved vs label), recall, loss]
        summed over instances / total (reference base.py:184-250)."""
        c = self._config
        err = np.zeros(3, np.float64)
        total = 0
        for batch, _, var_pred in self._solved_preds(loader, replication):
            solved, _ = cnf_evaluate(batch, var_pred)
            mask = np.asarray(batch.instance_mask)
            s = (np.asarray(solved) > 0.5).astype(np.float32)
            lab = np.asarray(batch.label)
            n_real = mask.sum()
            l1 = float((np.abs(s - lab) * mask).sum() / max(n_real, 1))
            recall = float((lab * np.abs(s - lab) * mask).sum()
                           / max((lab * mask).sum(), LOSS_EPS))
            loss = float(energy_loss(
                batch, jnp.asarray(var_pred), self.global_step,
                c.get("exploration", 1.0), c.get("loss_sharpness", 1)))
            err += np.array([l1, recall, loss]) * n_real
            total += n_real
        return (err / max(total, 1)).astype(np.float32)

    def test(self, test_files, import_path=None, batch_replication=1):
        """Reference test() (base.py:406-449): per-file metric vector +
        wall time."""
        c = self._config
        if isinstance(test_files, str):
            if os.path.isdir(test_files):
                test_files = sorted(
                    os.path.join(test_files, f)
                    for f in os.listdir(test_files)
                    if f.lower().endswith(".json"))
            else:
                test_files = [test_files]
        if import_path:
            self._load_params(import_path)
        results = []
        for path in test_files:
            loader = BatchLoader(
                input_file=path, batch_size=c.get("batch_size", 5000),
                limit=c.get("test_batch_limit", 40000000),
                hidden_dim=c.get("hidden_dim", 3),
                batch_replication=batch_replication,
                max_cache_size=c.get("max_cache_size", 100000))
            start = time.time()
            err = self.test_metrics(loader, batch_replication)
            duration = time.time() - start
            self._log("dataset %s error=%s (%.1fs)" % (
                path, np.array_str(err), duration))
            results.append([path, err.reshape(3, 1), duration])
        return results

    # ---------------------------------------------------------------- predict

    def predict(self, test_path, out_file, import_path=None,
                batch_replication=1):
        """Reference predict (base.py:451-472) + JSON formatting
        (trainer.py:125-148). `out_file` is a writable file object."""
        c = self._config
        if import_path:
            self._load_params(import_path)
        loader = BatchLoader(
            input_file=test_path, batch_size=c.get("batch_size", 5000),
            limit=c.get("test_batch_limit", 40000000),
            hidden_dim=c.get("hidden_dim", 3),
            batch_replication=batch_replication,
            max_cache_size=c.get("max_cache_size", 100000))
        from pdp_solver_tpu.utils import profiler
        do_profile = profiler.profiling_enabled()
        timer = profiler.PhaseTimer()
        iters = int(c.get("test_recurrence_num", 1000))
        n_instances = 0
        first_batch = None
        start = time.time()
        with profiler.maybe_trace():
            stream = iter(self._solved_preds(loader, batch_replication))
            while True:
                with timer.phase("solve"):
                    item = next(stream, None)
                if item is None:
                    break
                batch, misc, var_pred = item
                if first_batch is None:
                    first_batch = batch
                n_instances += int(np.asarray(batch.instance_mask).sum())
                with timer.phase("output"):
                    out_file.write(
                        self._format_predictions(batch, misc, var_pred))
        wall = time.time() - start
        self._log("Time spent: %s seconds" % wall)
        if do_profile and first_batch is not None:
            record = {"wall_s": round(wall, 3), "instances": n_instances,
                      "iterations": iters,
                      "instances_per_sec": round(n_instances / wall, 4),
                      "iterations_per_sec": round(
                          iters * max(n_instances, 1) / wall, 2)}
            record.update(timer.summary())
            try:
                record.update(profiler.solver_phase_slopes(
                    self.solver, jax.device_put(first_batch)))
            except Exception as e:  # classical-only probe; never fatal
                record["phase_slopes_error"] = str(e)
            profiler.emit_profile(record)

    def _format_predictions(self, batch: FGBatch, misc, var_pred):
        """One JSON dict per instance, exactly the reference's dict layout and
        quoting (trainer.py:137-147)."""
        solved, unsat = cnf_evaluate(batch, var_pred)
        solved = np.asarray(solved)
        unsat = np.asarray(unsat)
        pred = np.asarray(var_pred)[:, 0]
        var_batch = np.asarray(batch.var_batch)
        var_mask = np.asarray(batch.var_mask) > 0
        labels = np.asarray(batch.label)
        n_real = int(np.asarray(batch.instance_mask).sum())

        lines = []
        for b in range(n_real):
            sel = (var_batch == b) & var_mask
            # byte-compat with the reference (trainer.py:137-146): unnamed
            # instances emit ID "" - the reference's _counter is incremented
            # per instance but never used in the output; mirrored here so
            # callers can read how many predictions have been formatted
            self._prediction_counter += 1
            instance = {
                "ID": misc[b][0] if len(misc[b]) > 0 else "",
                "label": int(labels[b]),
                "solved": int(solved[b] == 1),
                "unsat_clauses": int(unsat[b]),
                "solution": (pred[sel] > 0.5).astype(int).tolist(),
            }
            lines.append(str(instance).replace("'", '"'))
        return "\n".join(lines) + "\n"

    # ---------------------------------------------------------------- ckpt

    def _load_params(self, path):
        """Load model parameters from a best/last checkpoint (checkpoints
        store the full train-state layout incl. global_step)."""
        restored = ckpt.load_params(path, {
            "params": self.params,
            "global_step": jnp.zeros((), jnp.float32),
        }, self.solver.cfg.name)
        self.params = restored["params"]
        self.global_step = restored["global_step"]

    def _save_train_state(self, train_state: TrainState, path):
        """Full train-state checkpoint: params + OPTIMIZER state +
        global_step. The reference only persists the model state_dict
        (src/pdp/nn/solver.py:318-322) so every resume resets Adam moments;
        here long runs restart via the supervisor dozens of times, so the
        optax state must survive for the resumed run to be a continuation
        of the unbroken one (tests/test_checkpoint_continuity.py)."""
        ckpt.save_params(path, {
            "params": train_state.params,
            "opt": train_state.opt_state,
            "global_step": train_state.global_step,
        }, self.solver.cfg.name)

    def _load_train_state(self, train_state: TrainState, path):
        name = self.solver.cfg.name
        has_opt = any(k.startswith("['opt']")
                      for k in ckpt.checkpoint_keys(path, name))
        if has_opt:
            restored = ckpt.load_params(path, {
                "params": train_state.params,
                "opt": train_state.opt_state,
                "global_step": train_state.global_step,
            }, name)
            return train_state._replace(params=restored["params"],
                                        opt_state=restored["opt"],
                                        global_step=restored["global_step"])
        # pre-round-5 checkpoint: params only; optimizer restarts fresh
        restored = ckpt.load_params(path, {
            "params": train_state.params,
            "global_step": train_state.global_step,
        }, name)
        return train_state._replace(params=restored["params"],
                                    global_step=restored["global_step"])
