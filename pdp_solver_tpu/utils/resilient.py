"""Fault-tolerant solving: chunked resumable forward with retry + disk
checkpointing.

The reference recovers from nothing - a CUDA fault kills the run
(src/pdp/trainer.py has no retry path); its only resilience is the
trainer's per-epoch `last` checkpoint. On the tunneled TPU, device faults
are a fact of life for very long programs, so the solver exposes a
resumable carry (`PDPSolver.forward(carry=..., finalize=False)`,
solvers/base.py) and this module builds the production loop on top of it:

  * the iteration budget runs in bounded chunks (one compiled program per
    chunk size - long budgets never produce a single long-running program,
    which can crash tunneled workers);
  * after every chunk the carry is mirrored to host memory; if the device
    faults mid-chunk, the chunk size is halved and the solve resumes from
    the last good carry (re-uploaded from the host mirror) instead of
    restarting from zero;
  * optionally the mirror is persisted to disk, so even a killed process
    resumes where it left off (`checkpoint_path=`).

bench.py uses the same chunking/retry discipline inline; this is the
library-grade version.
"""

import os
import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _solver_fns(solver, check_termination):
    """Jitted step/final programs, cached ON the solver object so their
    lifetime tracks it (callers like the trainer invoke resilient_solve
    once per batch - rebuilding jax.jit wrappers there would recompile;
    a module-level cache would leak, since the jitted closures reference
    the solver)."""
    per_solver = getattr(solver, "_resilient_fns", None)
    if per_solver is None:
        per_solver = {}
        solver._resilient_fns = per_solver
    if check_termination not in per_solver:
        def step(params, r, b, s, carry, n):
            _, s2, carry2 = solver.forward(
                params, r, b, s, n, is_training=False,
                check_termination=check_termination, carry=carry,
                finalize=False)
            return s2, carry2

        def final(params, r, b, s, carry):
            (pred, _), _ = solver.forward(
                params, r, b, s, 0, is_training=False,
                check_termination=check_termination, carry=carry,
                finalize=True)
            return pred

        per_solver[check_termination] = (
            jax.jit(lambda p, r, b, s, n: step(p, r, b, s, None, n),
                    static_argnames="n"),
            jax.jit(step, static_argnames="n"),
            jax.jit(final))
    return per_solver[check_termination]


def resilient_solve(solver, params, rng, batch, init_state, iterations, *,
                    chunk=100, min_chunk=10, checkpoint_path=None,
                    check_termination=True):
    """Run a full solve of `iterations` decimation iterations, chunked and
    fault-tolerant. Returns (var_pred, final_state).

    chunk: iterations per compiled program execution (0 disables chunking).
    min_chunk: smallest chunk to retry with after a device fault.
    checkpoint_path: optional path; progress is pickled there after every
        chunk and reloaded on the next call (delete the file to restart).
    """
    if chunk <= 0:
        chunk = iterations

    first_fn, next_fn, final_fn = _solver_fns(solver, check_termination)

    done = 0
    state = init_state
    carry = None
    # mirror the INITIAL state too: a device fault in the very first chunk
    # surfaces after `state` was already rebound to the faulted execution's
    # output buffers, so the retry must rebuild it from a host copy
    host_mirror = (_to_host(init_state), None)
    if checkpoint_path and os.path.exists(checkpoint_path):
        with open(checkpoint_path, "rb") as f:
            saved = pickle.load(f)
        done = saved["done"]
        state = jax.device_put(saved["state"])
        carry = jax.device_put(saved["carry"])
        host_mirror = (saved["state"], saved["carry"])

    while done < iterations:
        rng, r = jax.random.split(rng)
        n = min(chunk, iterations - done)
        try:
            if carry is None:
                state, carry = first_fn(params, r, batch, state, n)
            else:
                state, carry = next_fn(params, r, batch, state, carry, n)
            # force completion so a device fault surfaces HERE, while the
            # last good carry is still intact on the host
            host_mirror = (_to_host(state), _to_host(carry))
        except Exception:
            if chunk <= min_chunk:
                raise
            chunk = max(chunk // 2, min_chunk)
            state = jax.device_put(host_mirror[0])
            carry = (None if host_mirror[1] is None
                     else jax.device_put(host_mirror[1]))
            continue
        done += n
        if checkpoint_path:
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump({"done": done, "state": host_mirror[0],
                             "carry": host_mirror[1]}, f)
            os.replace(tmp, checkpoint_path)

    rng, r = jax.random.split(rng)
    pred = final_fn(params, r, batch, state, carry)
    if checkpoint_path and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)
    return pred, state
