#!/usr/bin/env python
"""Decompose the fused simplify round + SP sweep costs on chip."""

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
    return round(ds[1] * 1e3, 3)


def main():
    import jax
    import jax.numpy as jnp

    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.modules import common
    from pdp_solver_tpu.ops import segment_sum
    from pdp_solver_tpu.problem.simplify import _fused_round, fused_simplify
    from pdp_solver_tpu.problem.state import init_problem_state
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    res = {}
    batch = jax.device_put(pack_instances(make_ksat_set()))
    E, V, F, B = (batch.num_edges, batch.num_vars, batch.num_clauses,
                  batch.batch_size)
    problem0 = init_problem_state(batch)

    def loop(body):
        @partial(jax.jit, static_argnums=0)
        def f(n, p):
            def b(i, p):
                p = body(p)
                return p._replace(solution=p.solution * 0.99999)
            return jax.lax.fori_loop(0, n, b, p)
        return f

    # a) full fused round, no while machinery
    f = loop(lambda p: _fused_round(batch, p)[0])
    res["round_body_ms"] = slope(lambda n: f(n, problem0), 3, 15)

    # b) fused_simplify (while loop)
    f = loop(lambda p: fused_simplify(batch, p))
    res["fused_simplify_while_ms"] = slope(lambda n: f(n, problem0), 3, 15)

    # c) phase C only: gathers + uniform clause reduce + clause updates
    def phase_c(p):
        av_e = p.active_vars[batch.edge_var]
        sol_e = p.solution[batch.edge_var]
        lit_true = jnp.where(batch.edge_sign > 0, sol_e >= 1.0, sol_e <= 0.0)
        at = (lit_true & (av_e <= 0)).astype(jnp.float32)
        cd = common.scatter_to_clauses_cols(batch, (av_e, at))
        ac = jnp.where(cd[1] > 0, 0.0, p.active_clauses)
        single = (cd[0] == 1).astype(jnp.float32) * ac
        return p._replace(active_clauses=ac + 0.0 * single)

    f = loop(phase_c)
    res["phase_c_ms"] = slope(lambda n: f(n, problem0), 3, 15)

    # d) phase V only
    def phase_v(p):
        s_e = p.active_clauses[batch.edge_clause] * batch.edge_mask
        vd = common.scatter_to_vars_cols(
            batch, (s_e, batch.edge_sign * s_e, s_e, batch.edge_sign * s_e))
        conflict = ((jnp.abs(vd[1]) != vd[0]).astype(jnp.float32)
                    * p.active_vars)
        unsat_b = segment_sum(conflict, batch.var_batch, B,
                              indices_are_sorted=True) >= 1
        av = jnp.where(unsat_b[batch.var_batch], 0.0, p.active_vars)
        return p._replace(active_vars=av)

    f = loop(phase_v)
    res["phase_v_ms"] = slope(lambda n: f(n, problem0), 3, 15)

    # e) trivial while loop (1 body iteration) per rep
    def trivial_while(p):
        def cond(c):
            return c[1] > 0

        def body(c):
            p, k = c
            return p._replace(solution=p.solution * 0.999), k - 1.0

        p, _ = jax.lax.while_loop(cond, body, (p, jnp.sum(p.is_sat) * 0 + 1))
        return p

    f = loop(trivial_while)
    res["trivial_while_ms"] = slope(lambda n: f(n, problem0), 3, 15)

    # f) while loop whose body is ONE windowed reduce
    def reduce_while(p):
        def cond(c):
            return c[1] > 0

        def body(c):
            p, k = c
            vd = common.scatter_to_vars_cols(
                batch, (p.active_clauses[batch.edge_clause],))
            return p._replace(active_vars=p.active_vars + 0.0 * vd[0]), k - 1

        p, _ = jax.lax.while_loop(cond, body, (p, jnp.sum(p.is_sat) * 0 + 1))
        return p

    f = loop(reduce_while)
    res["windowed_in_while_ms"] = slope(lambda n: f(n, problem0), 3, 15)

    # g) SP sweep split: clause-direction agg only / var-direction only
    from pdp_solver_tpu.ops import safe_log, safe_exp
    from pdp_solver_tpu.ops.segment import LOG_EPS_PROP
    eta0 = jnp.full((E,), 0.5)

    def sweep_c(x):
        log_u = safe_log(x, LOG_EPS_PROP) * batch.edge_mask
        agg = common.scatter_to_clauses_cols(batch, (log_u,))[0]
        eta = safe_exp(agg[batch.edge_clause] - log_u)
        return x * 0.9999 + eta * 1e-9

    @partial(jax.jit, static_argnums=0)
    def fc(n, x):
        return jax.lax.fori_loop(0, n, lambda i, x: sweep_c(x), x)

    res["sweep_clause_dir_ms"] = slope(lambda n: fc(n, eta0), 5, 25)

    def sweep_v(x):
        lm = safe_log(1.0 - x, LOG_EPS_PROP) * batch.edge_mask
        pos_w = (batch.edge_sign == 1).astype(jnp.float32)
        neg_w = (batch.edge_sign == -1).astype(jnp.float32)
        pn = common.scatter_to_vars_cols(batch, (lm * pos_w, lm * neg_w))
        pos = pn[0][batch.edge_var]
        neg = pn[1][batch.edge_var]
        return x * 0.9999 + (pos + neg) * 1e-9

    @partial(jax.jit, static_argnums=0)
    def fv(n, x):
        return jax.lax.fori_loop(0, n, lambda i, x: sweep_v(x), x)

    res["sweep_var_dir_ms"] = slope(lambda n: fv(n, eta0), 5, 25)

    # h) full sweep via the real module
    from pdp_solver_tpu.modules import propagate as PR
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    solver = PDPSolver(SolverConfig(model_type="p-d-p"))
    key = jax.random.PRNGKey(0)
    st = solver.get_init_state(key, batch, randomized=True)
    em0 = jnp.ones((E,)) * batch.edge_mask
    ae0 = jnp.ones((E,))

    @partial(jax.jit, static_argnums=0)
    def fs(n, ps):
        def body(i, ps):
            return PR.survey_propagator_apply({}, solver.prop_cfg, batch, ps,
                                              ps, em0, ae0)
        return jax.lax.fori_loop(0, n, body, ps)

    res["sweep_full_ms"] = slope(lambda n: fs(n, st.prop), 5, 25)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
