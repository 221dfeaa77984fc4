#!/usr/bin/env python
"""Validate + time the fused edge-pass kernels on chip at bench shapes.

Compares one simplify round / SP sweep / scorer / WalkSAT iteration between
PDP_FUSED_PASS=off (windowed-reduce XLA path) and =on (fused kernels), then
measures slopes for the fused hot loops.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    from pdp_solver_tpu.modules import predict as P
    import importlib
    S = importlib.import_module("pdp_solver_tpu.problem.simplify")
    from pdp_solver_tpu.problem.state import (init_problem_state,
                                              compute_edge_mask)
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    res = {"backend": jax.default_backend()}
    batch = jax.device_put(pack_instances(make_ksat_set()))
    E, V, B = batch.num_edges, batch.num_vars, batch.batch_size
    problem0 = init_problem_state(batch)
    solver = PDPSolver(SolverConfig(model_type="p-d-p"))
    key = jax.random.PRNGKey(0)
    st = solver.get_init_state(key, batch, randomized=True)
    em0 = jnp.ones((E,)) * batch.edge_mask
    ae0 = jnp.ones((E,))

    rng = jax.random.PRNGKey(3)
    assign = jnp.where(
        jax.random.bernoulli(rng, 0.25, (V,)) & (batch.var_mask > 0),
        jnp.sign(jax.random.normal(rng, (V,))), 0.0)

    # ---- parity: fused vs fallback on chip ----------------------------
    def mk_fns():
        f_round = jax.jit(lambda p, a: S.fused_set_variables(batch, p, a))
        f_sweep = jax.jit(lambda ps: PR.survey_propagator_apply(
            {}, solver.prop_cfg, batch, ps, ps, em0, ae0))
        f_score = jax.jit(lambda ps, p: P.survey_scorer_apply(
            {}, solver.scorer_cfg, batch, ps, p)[0])
        return f_round, f_sweep, f_score

    os.environ["PDP_FUSED_PASS"] = "off"
    r_off, s_off, c_off = mk_fns()
    ref_round = r_off(problem0, assign)
    ref_sweep = s_off(st.prop)
    ref_score = c_off(st.prop, problem0)

    os.environ["PDP_FUSED_PASS"] = "on"
    r_on, s_on, c_on = mk_fns()
    got_round = r_on(problem0, assign)
    got_sweep = s_on(st.prop)
    got_score = c_on(st.prop, problem0)

    def maxerr(a, b):
        return float(max(
            jnp.max(jnp.abs(x - y)) for x, y in
            zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))))

    res["err_round"] = maxerr(ref_round, got_round)
    res["err_sweep"] = maxerr(ref_sweep, got_sweep)
    res["err_score"] = maxerr(ref_score, got_score)
    res["ok"] = (res["err_round"] < 1e-4 and res["err_sweep"] < 1e-4
                 and res["err_score"] < 1e-3)
    print(json.dumps(res), flush=True)

    # ---- slopes on the fused path -------------------------------------
    @partial(jax.jit, static_argnums=0)
    def sweep_n(n, ps):
        return jax.lax.fori_loop(
            0, n, lambda i, ps: PR.survey_propagator_apply(
                {}, solver.prop_cfg, batch, ps, ps, em0, ae0), ps)

    res["sweep_ms"] = slope(lambda n: sweep_n(n, st.prop))

    @partial(jax.jit, static_argnums=0)
    def round_n(n, p):
        def body(i, p):
            p2, _ = S._fused_round(batch, p)
            return p2._replace(solution=p2.solution * 0.999999)
        return jax.lax.fori_loop(0, n, body, p)

    res["round_ms"] = slope(lambda n: round_n(n, problem0), 3, 15)

    @partial(jax.jit, static_argnums=3)
    def ls_n(r, p, pred, n):
        return solver._local_search(r, batch, p, pred, 1, n)

    pred0 = 0.5 * jnp.ones((V, 1))
    res["walksat_iter_ms"] = slope(
        lambda n: ls_n(rng, problem0, pred0, n), 10, 50)

    # full p-d-p iteration (forward chunk slope)
    @partial(jax.jit, static_argnums=4)
    def fwd(params, r, st, carry, iters):
        return solver.forward(params, r, batch, st, iters,
                              is_training=False, check_termination=True,
                              carry=carry, finalize=False)

    _, _, carry0 = fwd({}, rng, st, None, 1)

    def iter_n(n):
        return fwd({}, rng, st, carry0, n)

    res["iteration_ms"] = slope(iter_n, 5, 25)
    res["edge_updates_per_sec"] = (
        int(float(jnp.sum(batch.edge_mask)) / (res["iteration_ms"] / 1e3))
        if res["iteration_ms"] > 0 else None)
    print("FINAL " + json.dumps(res))


if __name__ == "__main__":
    main()
