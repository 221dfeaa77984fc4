#!/usr/bin/env python
"""Compile-check + time the scatter-free reduce backends on the real chip.

Validates windowed_segment_sum / uniform_clause_sum against XLA segment_sum
at headline bench shapes, then times: each reduce, one SP sweep, one
decimator step, and a fixed 25-iteration forward chunk. Prints one JSON
line; exits non-zero on a numeric mismatch.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn):
    import jax.numpy as jnp
    import jax
    t0 = time.time()
    out = fn()
    leaves = jax.tree_util.tree_leaves(out)
    s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves
            if hasattr(x, "astype"))
    float(s)
    return time.time() - t0


def slope(fn, lo, hi):
    fn(lo), fn(hi)
    timed(lambda: fn(lo))
    ds = []
    for _ in range(3):
        t1 = timed(lambda: fn(lo))
        t2 = timed(lambda: fn(hi))
        ds.append(max((t2 - t1) / (hi - lo), 0.0))
    ds.sort()
    return ds[1]


def main():
    import jax
    import jax.numpy as jnp

    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.modules import common, decimate as D, propagate as PR
    from pdp_solver_tpu.ops.pallas_reduce import (
        windowed_segment_sum, uniform_clause_sum)
    from pdp_solver_tpu.problem.state import (
        init_problem_state, compute_edge_mask)
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    res = {"backend": jax.default_backend()}
    insts = make_ksat_set()
    batch = jax.device_put(pack_instances(insts))
    E, V, F, B = (batch.num_edges, batch.num_vars, batch.num_clauses,
                  batch.batch_size)
    res["flags"] = {"clause_width": batch.clause_width,
                    "fast_var": batch.fast_var,
                    "fast_clause": batch.fast_clause}
    key = jax.random.PRNGKey(0)

    rng = np.random.default_rng(0)
    x4 = jnp.asarray(rng.normal(size=(E, 4)).astype(np.float32))
    x4 = x4 * batch.edge_mask[:, None]

    # --- correctness on chip ---
    w_var = jax.jit(lambda x: windowed_segment_sum(x, batch.edge_var, V))
    got = np.asarray(w_var(x4))
    want = np.asarray(jax.jit(lambda x: jax.ops.segment_sum(
        x, batch.edge_var, num_segments=V))(x4))
    err_var = float(np.abs(got - want).max())

    u_cl = jax.jit(lambda x: uniform_clause_sum(x, batch.clause_width, F))
    got = np.asarray(u_cl(x4))
    want = np.asarray(jax.jit(lambda x: jax.ops.segment_sum(
        x, batch.edge_clause, num_segments=F))(x4))
    err_cl = float(np.abs(got - want).max())
    res["max_err"] = {"windowed_var": err_var, "uniform_clause": err_cl}
    ok = err_var < 1e-3 and err_cl < 1e-3
    res["ok"] = ok

    # --- timing ---
    @partial(jax.jit, static_argnums=0)
    def wloop(n, x):
        def body(i, x):
            s = windowed_segment_sum(x, batch.edge_var, V)
            return x * 0.9999 + s[batch.edge_var] * 1e-9
        return jax.lax.fori_loop(0, n, body, x)

    res["windowed_var4_ms"] = round(slope(lambda n: wloop(n, x4), 5, 25) * 1e3, 3)

    @partial(jax.jit, static_argnums=0)
    def uloop(n, x):
        def body(i, x):
            s = uniform_clause_sum(x, batch.clause_width, F)
            return x * 0.9999 + s[batch.edge_clause] * 1e-9
        return jax.lax.fori_loop(0, n, body, x)

    res["uniform_clause4_ms"] = round(slope(lambda n: uloop(n, x4), 5, 25) * 1e3, 3)

    solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.02,
                                    t_max=100, local_search_iterations=0))
    state0 = solver.get_init_state(key, batch, randomized=True)
    problem0 = init_problem_state(batch)
    em0 = compute_edge_mask(batch, problem0)
    ae0 = jnp.ones((E,), jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def sweep_n(n, ps):
        def body(i, ps):
            return PR.survey_propagator_apply({}, solver.prop_cfg, batch, ps,
                                              ps, em0, ae0)
        return jax.lax.fori_loop(0, n, body, ps)

    res["sp_sweep_ms"] = round(slope(lambda n: sweep_n(n, state0.prop), 5, 25) * 1e3, 3)

    scorer_fn = solver._scorer_fn({}, batch)

    @partial(jax.jit, static_argnums=0)
    def dec_n(n, carry):
        def body(i, carry):
            aux, problem = carry
            aux, problem, _ = D.sequential_decimator_apply(
                solver.dec_cfg, scorer_fn, batch, aux,
                (state0.prop[0], state0.prop[1]), problem, em0,
                batch.instance_mask)
            return aux, problem
        return jax.lax.fori_loop(0, n, body, carry)

    aux0 = state0.aux._replace(has_prev=jnp.ones_like(state0.aux.has_prev))
    res["decimate_ms"] = round(slope(lambda n: dec_n(n, (aux0, problem0)), 3, 9) * 1e3, 3)

    @partial(jax.jit, static_argnums=(4,))
    def fwd_chunk(rng, b, st, carry, n):
        _, st, carry = solver.forward(
            {}, rng, b, st, n, is_training=False,
            check_termination=True, carry=carry, finalize=False)
        return st, carry

    st, carry = fwd_chunk(key, batch, state0, None, 5)
    timed(lambda: fwd_chunk(key, batch, state0, carry, 5))
    fwd_chunk(key, batch, state0, carry, 25)
    ts = []
    for _ in range(3):
        t1 = timed(lambda: fwd_chunk(key, batch, state0, carry, 5))
        t2 = timed(lambda: fwd_chunk(key, batch, state0, carry, 25))
        ts.append(max((t2 - t1) / 20, 1e-9))
    ts.sort()
    res["iteration_ms"] = round(ts[1] * 1e3, 3)
    res["edge_updates_per_sec"] = round(460800 / ts[1])

    print(json.dumps(res))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
