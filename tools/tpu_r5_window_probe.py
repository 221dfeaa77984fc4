#!/usr/bin/env python
"""Round-5 probe: SP sweep + full-iteration slopes vs one-hot window size.

Measures the var_window effect (fg/batch.py FGBatch.var_window; the
windowed kernels' one-hot build + MXU streams scale linearly with W) at
the headline operating point (128 x 4-SAT, E~460k) and the large-batch
point (2048 instances, E~7.4M). Run ON the chip:

    python tools/tpu_r5_window_probe.py

Prints one JSON dict with per-window sweep/iteration slopes.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from pdp_solver_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.modules import propagate as PR
from pdp_solver_tpu.problem.state import (
    init_problem_state, compute_edge_mask)
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from pdp_solver_tpu.utils.benchdata import make_ksat_set


def sweep_slope(solver, batch, lo=5, hi=25, reps=3):
    state = solver.get_init_state(jax.random.PRNGKey(0), batch,
                                  randomized=True)
    problem0 = init_problem_state(batch)
    em0 = compute_edge_mask(batch, problem0)
    ae0 = jnp.ones((batch.num_edges,), jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def sweep_n(n, ps):
        def body(i, ps):
            return PR.survey_propagator_apply(
                {}, solver.prop_cfg, batch, ps, ps, em0, ae0)
        return jax.lax.fori_loop(0, n, body, ps)

    def timed(n):
        t0 = time.time()
        out = sweep_n(n, state.prop)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        return time.time() - t0

    sweep_n(lo, state.prop), sweep_n(hi, state.prop)
    timed(lo)
    lo_w = [timed(lo) for _ in range(reps)]
    hi_w = [timed(hi) for _ in range(reps)]
    return max((min(hi_w) - min(lo_w)) / (hi - lo), 1e-9)


def iter_slope(solver, batch, chunk=50, reps=2):
    state = solver.get_init_state(jax.random.PRNGKey(0), batch,
                                  randomized=True)
    r_fwd = jax.random.split(jax.random.PRNGKey(0))[1]

    def fixed_step(rng, b, s, carry, n):
        _, s2, c2 = solver.forward(
            {}, rng, b, s, n, is_training=False, check_termination=True,
            carry=carry, finalize=False)
        return s2, c2

    first = jax.jit(lambda r, b, s, n: fixed_step(r, b, s, None, n),
                    static_argnames="n")
    nxt = jax.jit(fixed_step, static_argnames="n")

    def run(n_chunks):
        t0 = time.time()
        st, carry = first(r_fwd, batch, state, chunk)
        for c in range(1, n_chunks):
            st, carry = nxt(jax.random.fold_in(r_fwd, c), batch, st,
                            carry, chunk)
        float(jnp.sum(carry[0].solution))
        return time.time() - t0

    run(3)
    l1 = [run(1) for _ in range(reps)]
    l3 = [run(3) for _ in range(reps)]
    return max((min(l3) - min(l1)) / (2 * chunk), 1e-9)


def main():
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.08, t_max=50,
        local_search_iterations=0, epsilon=0.5, simplify_rounds=1))

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0])}

    insts = make_ksat_set()
    small = jax.device_put(pack_instances(insts))
    real_e_small = sum(i[2].shape[1] for i in insts)
    out["headline_var_window"] = small.var_window

    lb_n = int(os.environ.get("PROBE_LARGE_N", "2048"))
    lb_insts = make_ksat_set(count=lb_n)
    large = jax.device_put(pack_instances(lb_insts))
    real_e_large = sum(i[2].shape[1] for i in lb_insts)

    for label in ("on", "off"):
        os.environ["PDP_VAR_WINDOW"] = label if label == "off" else "auto"
        tag = ("w%d" % small.var_window) if label == "on" else "w2048"
        s = sweep_slope(solver, small)
        out[f"headline_sweep_ms_{tag}"] = round(s * 1e3, 3)
        out[f"headline_sweep_eups_{tag}"] = round(real_e_small / s)
        i = iter_slope(solver, small)
        out[f"headline_iter_ms_{tag}"] = round(i * 1e3, 3)
        ls = sweep_slope(solver, large, lo=2, hi=10)
        out[f"large_sweep_ms_{tag}"] = round(ls * 1e3, 3)
        out[f"large_sweep_eups_{tag}"] = round(real_e_large / ls)
        print(json.dumps(out), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
