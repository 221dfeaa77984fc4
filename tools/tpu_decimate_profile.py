#!/usr/bin/env python
"""Micro-profile the sequential decimator's sub-parts on chip."""

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
    from pdp_solver_tpu.modules import common, decimate as D, predict as P
    from pdp_solver_tpu.ops import safe_exp
    from pdp_solver_tpu.ops.segment import (
        segment_argmax_first, segment_max)
    from pdp_solver_tpu.problem.simplify import (
        fused_simplify, fused_set_variables, simplify, set_variables)
    from pdp_solver_tpu.problem.state import (
        init_problem_state, compute_edge_mask)
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    res = {}
    batch = jax.device_put(pack_instances(make_ksat_set()))
    E, V, F, B = (batch.num_edges, batch.num_vars, batch.num_clauses,
                  batch.batch_size)
    key = jax.random.PRNGKey(0)
    solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.02,
                                    t_max=100, local_search_iterations=0))
    state0 = solver.get_init_state(key, batch, randomized=True)
    problem0 = init_problem_state(batch)
    em0 = compute_edge_mask(batch, problem0)
    eta = state0.prop[1][:, 0]
    prev = jnp.zeros_like(eta)

    # 1. the stacked smooth-max reduce through the dispatcher
    @partial(jax.jit, static_argnums=0)
    def smax_n(n, eta):
        def body(i, eta):
            diff = jnp.abs(prev - eta) * em0
            cols = []
            for x in (diff, eta):
                c = safe_exp(30.0 * x) * batch.edge_mask
                cols.extend([x * c, c])
            nd = common.scatter_to_vars(batch, jnp.stack(cols, axis=1))
            sm = nd[:, 0::2] / jnp.maximum(nd[:, 1::2], 1.0)
            return eta * 0.9999 + jnp.sum(sm) * 1e-12
        return jax.lax.fori_loop(0, n, body, eta)

    res["stacked_smoothmax_ms"] = slope(lambda n: smax_n(n, eta), 5, 25)

    # 2. segment_max [V,2] -> B
    sm2 = jnp.ones((V, 2))

    @partial(jax.jit, static_argnums=0)
    def segmax_n(n, x):
        def body(i, x):
            m = segment_max(x, batch.var_batch, B, indices_are_sorted=True)
            return x * 0.9999 + m[batch.var_batch] * 1e-9
        return jax.lax.fori_loop(0, n, body, x)

    res["segmax_v2_ms"] = slope(lambda n: segmax_n(n, sm2), 10, 50)

    # 3. the survey scorer
    @partial(jax.jit, static_argnums=0)
    def scorer_n(n, msg):
        def body(i, msg):
            v, f = msg
            s = P.survey_scorer_apply({}, solver.scorer_cfg, batch,
                                      (v, f), problem0)[0]
            return (v, f * 0.9999 + jnp.sum(s) * 1e-12)
        return jax.lax.fori_loop(0, n, body, msg)

    res["scorer_ms"] = slope(lambda n: scorer_n(n, state0.prop), 5, 25)

    # 4. argmax + norm
    coeff = jnp.abs(jnp.asarray(np.random.default_rng(0).normal(size=V),
                                dtype=jnp.float32))

    @partial(jax.jit, static_argnums=0)
    def argmax_n(n, c):
        def body(i, c):
            ind = segment_argmax_first(c, batch.var_batch, B,
                                       valid=batch.var_mask,
                                       indices_are_sorted=True)
            return c * 0.9999 + ind[batch.var_batch] * 1e-9
        return jax.lax.fori_loop(0, n, body, c)

    res["argmax_ms"] = slope(lambda n: argmax_n(n, coeff), 10, 50)

    # 5. full decimator step (non-decimating path)
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
    res["decimator_full_ms"] = slope(lambda n: dec_n(n, (aux0, problem0)), 3, 9)

    # 6. fused simplify: no-op fixed point and a forced decimation round
    @partial(jax.jit, static_argnums=0)
    def fsimp_n(n, problem):
        def body(i, p):
            p = fused_simplify(batch, p)
            return p._replace(solution=p.solution * 0.99999)
        return jax.lax.fori_loop(0, n, body, problem)

    res["fused_simplify_noop_ms"] = slope(lambda n: fsimp_n(n, problem0), 3, 9)

    assign = jnp.zeros((V,)).at[jnp.arange(B) * (V // B)].set(1.0)

    @partial(jax.jit, static_argnums=0)
    def fsetvar_n(n, problem):
        def body(i, p):
            p = fused_set_variables(batch, p, assign * (i % 2 * 2 - 1.0))
            return p
        return jax.lax.fori_loop(0, n, body, problem)

    res["fused_set_variables_ms"] = slope(lambda n: fsetvar_n(n, problem0), 3, 9)

    # 7. old sequential simplify for comparison
    @partial(jax.jit, static_argnums=0)
    def oldsimp_n(n, problem):
        def body(i, p):
            p = simplify(batch, p)
            return p._replace(solution=p.solution * 0.99999)
        return jax.lax.fori_loop(0, n, body, problem)

    res["old_simplify_noop_ms"] = slope(lambda n: oldsimp_n(n, problem0), 3, 9)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
