#!/usr/bin/env python
"""Lean on-chip slopes for the fused kernels: round, sweep, iteration.

Parity vs the XLA fallback is covered by tests (interpret mode) and by
tools/tpu_fused_check.py; this script only compiles the fused-path
programs so one chip session stays short.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn):
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    out = fn()
    s = sum(jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(out))
    float(s)
    return time.time() - t0


def slope(fn, lo=5, hi=25):
    fn(lo), fn(hi)
    timed(lambda: fn(lo))
    ds = []
    for _ in range(3):
        t1 = timed(lambda: fn(lo))
        t2 = timed(lambda: fn(hi))
        ds.append(max((t2 - t1) / (hi - lo), 0.0))
    ds.sort()
    return round(ds[1] * 1e3, 3)


def main():
    import jax
    import jax.numpy as jnp

    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.modules import propagate as PR
    import importlib
    S = importlib.import_module("pdp_solver_tpu.problem.simplify")
    from pdp_solver_tpu.problem.state import init_problem_state
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    res = {"backend": jax.default_backend(), "mode": "fused"}
    batch = jax.device_put(pack_instances(make_ksat_set()))
    E, V = batch.num_edges, batch.num_vars
    problem0 = init_problem_state(batch)
    solver = PDPSolver(SolverConfig(model_type="p-d-p"))
    st = solver.get_init_state(jax.random.PRNGKey(0), batch, randomized=True)
    em0 = jnp.ones((E,)) * batch.edge_mask
    ae0 = jnp.ones((E,))
    rng = jax.random.PRNGKey(3)

    @partial(jax.jit, static_argnums=0)
    def round_n(n, p):
        def body(i, p):
            p2, _ = S._fused_round(batch, p)
            return p2._replace(solution=p2.solution * 0.999999)
        return jax.lax.fori_loop(0, n, body, p)

    res["round_ms"] = slope(lambda n: round_n(n, problem0), 3, 15)
    print(json.dumps(res), flush=True)

    @partial(jax.jit, static_argnums=0)
    def sweep_n(n, ps):
        return jax.lax.fori_loop(
            0, n, lambda i, ps: PR.survey_propagator_apply(
                {}, solver.prop_cfg, batch, ps, ps, em0, ae0), ps)

    res["sweep_ms"] = slope(lambda n: sweep_n(n, st.prop))
    print(json.dumps(res), flush=True)

    @partial(jax.jit, static_argnums=3)
    def ls_n(r, p, pred, n):
        return solver._local_search(r, batch, p, pred, 1, n)

    pred0 = 0.5 * jnp.ones((V, 1))
    res["walksat_iter_ms"] = slope(
        lambda n: ls_n(rng, problem0, pred0, n), 10, 50)
    print(json.dumps(res), flush=True)

    @partial(jax.jit, static_argnums=4)
    def fwd(params, r, st, carry, iters):
        return solver.forward(params, r, batch, st, iters,
                              is_training=False, check_termination=True,
                              carry=carry, finalize=False)

    _, _, carry0 = fwd({}, rng, st, None, 1)

    res["iteration_ms"] = slope(lambda n: fwd({}, rng, st, carry0, n), 5, 25)
    res["edge_updates_per_sec"] = (
        int(float(jnp.sum(batch.edge_mask)) / (res["iteration_ms"] / 1e3))
        if res["iteration_ms"] > 0 else None)
    print("FINAL " + json.dumps(res))


if __name__ == "__main__":
    main()
