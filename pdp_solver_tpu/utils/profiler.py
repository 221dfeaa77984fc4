"""In-package step timing and phase profiling (SURVEY §5: tracing).

The reference's only observability is coarse wall-clock spans around epochs
and test runs (reference src/pdp/factorgraph/base.py:356-364, :431-433);
iterations/s is a north-star metric here, so phase timing is a first-class
utility rather than an ad-hoc tool.

Three layers:

* ``PhaseTimer`` — named wall-clock accumulators for coarse pipeline
  phases (pack, solve, local-search, output). Used by the CLIs when
  ``PDP_PROFILE=1``.
* ``measure_slope`` — the min-wall slope estimator shared by bench.py and
  the tools/ scripts: run a jitted program at two sizes, take
  ``(min(hi walls) - min(lo walls)) / (hi - lo)``. Tunnel/host throttling
  is strictly additive noise, so the minimum over repeats is the
  consistent estimator of true program cost and the min-wall difference
  cancels fixed per-dispatch overhead (a median of noisy differences can
  triple under a throttled regime).
* ``solver_phase_slopes`` — per-phase ms for the three hot phases of a
  p-d-p style solver (SP sweep, WalkSAT iteration, full p-d-p iteration)
  at the shapes of a given packed batch.

Env flags:

  PDP_PROFILE=1        CLIs emit a per-run profile JSON line to stderr.
  PDP_PROFILE_TRACE=d  additionally capture a jax.profiler trace into
                       directory *d* around the profiled region.
"""

import contextlib
import json
import os
import sys
import time


def profiling_enabled():
    return os.environ.get("PDP_PROFILE", "0") not in ("", "0", "off")


class PhaseTimer:
    """Named wall-clock accumulators.

    >>> t = PhaseTimer()
    >>> with t.phase("solve"): ...
    >>> t.summary()  # {"solve_ms": ..., "solve_calls": ...}
    """

    def __init__(self):
        self._acc = {}
        self._calls = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self._acc[name] = self._acc.get(name, 0.0) + dt
            self._calls[name] = self._calls.get(name, 0) + 1

    def add(self, name, seconds, calls=1):
        self._acc[name] = self._acc.get(name, 0.0) + seconds
        self._calls[name] = self._calls.get(name, 0) + calls

    def summary(self):
        out = {}
        for k, v in self._acc.items():
            out[k + "_ms"] = round(v * 1e3, 2)
            out[k + "_calls"] = self._calls[k]
        return out


@contextlib.contextmanager
def maybe_trace():
    """jax.profiler trace capture behind PDP_PROFILE_TRACE=<dir>."""
    trace_dir = os.environ.get("PDP_PROFILE_TRACE", "")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield


def _sync(out):
    """Force completion of a pytree of device arrays via a tiny D2H read
    (block_until_ready has unreliable semantics on some PJRT tunnels)."""
    import jax
    import jax.numpy as jnp
    total = 0.0
    for x in jax.tree_util.tree_leaves(out):
        if hasattr(x, "dtype"):
            total += float(jnp.sum(x)) if x.dtype != bool else float(
                jnp.sum(x.astype(jnp.int32)))
    return total


def measure_slope(fn, lo, hi, repeats=3, sync=_sync):
    """Per-unit cost of a jitted program via min-wall differences.

    fn(k) must run k units of work and return device output; both sizes
    are compiled + executed once for warm-up, then timed `repeats` times.
    Returns seconds per unit (>= 0).
    """
    fn(lo), fn(hi)

    def timed(k):
        t0 = time.time()
        sync(fn(k))
        return time.time() - t0

    timed(lo)
    lo_w = [timed(lo) for _ in range(repeats)]
    hi_w = [timed(hi) for _ in range(repeats)]
    return max((min(hi_w) - min(lo_w)) / (hi - lo), 0.0)


def solver_phase_slopes(solver, batch, state=None, rng=None,
                        full_iteration=True, repeats=3):
    """Per-phase ms at the shapes of `batch` for a p-d-p style solver.

    Returns {"sp_sweep_ms", "walksat_iter_ms", "pdp_iteration_ms"};
    pdp_iteration_ms (the full active-regime iteration: SP convergence
    loop + decimation + simplify + termination) is the expensive one and
    can be disabled with full_iteration=False.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from pdp_solver_tpu.modules import propagate as PR
    from pdp_solver_tpu.problem.state import init_problem_state

    rng = jax.random.PRNGKey(0) if rng is None else rng
    if state is None:
        state = solver.get_init_state(rng, batch, randomized=True)

    problem0 = init_problem_state(batch)
    em0 = jnp.ones((batch.num_edges,), jnp.float32)
    ae0 = jnp.ones((batch.num_edges,), jnp.float32)
    phases = {}

    @partial(jax.jit, static_argnums=0)
    def sweep_n(n, ps):
        def body(i, ps):
            return PR.survey_propagator_apply(
                {}, solver.prop_cfg, batch, ps, ps, em0, ae0)
        return jax.lax.fori_loop(0, n, body, ps)

    phases["sp_sweep_ms"] = round(
        measure_slope(lambda n: sweep_n(n, state.prop), 5, 25,
                      repeats=repeats) * 1e3, 2)

    @partial(jax.jit, static_argnums=3)
    def ls_n(r, problem, pred, n):
        return solver._local_search(r, batch, problem, pred, 1, n)

    pred0 = 0.5 * jnp.ones((batch.num_vars, 1))
    phases["walksat_iter_ms"] = round(
        measure_slope(lambda n: ls_n(rng, problem0, pred0, n), 10, 50,
                      repeats=repeats) * 1e3, 2)

    if full_iteration:
        def step(r, s, carry, n):
            _, s2, c2 = solver.forward(
                {}, r, batch, s, n, is_training=False,
                check_termination=True, carry=carry, finalize=False)
            return s2, c2

        first = jax.jit(lambda r, s, n: step(r, s, None, n),
                        static_argnames="n")
        nxt = jax.jit(step, static_argnames="n")
        step_chunk = 50

        def run_fixed(n_chunks):
            st, carry = first(rng, state, step_chunk)
            for c in range(1, n_chunks):
                st, carry = nxt(jax.random.fold_in(rng, c), st, carry,
                                step_chunk)
            return carry[0].solution

        phases["pdp_iteration_ms"] = round(
            measure_slope(run_fixed, 1, 3, repeats=repeats)
            / step_chunk * 1e3, 2)
    return phases


def emit_profile(record, stream=None):
    """One JSON line to stderr (or `stream`), tagged for greppability."""
    stream = stream or sys.stderr
    stream.write("PDP_PROFILE " + json.dumps(record) + "\n")
    stream.flush()
