#!/usr/bin/env python
"""On-chip cost model for the p-d-p hot loop.

Measures, at the headline bench shapes (128 x 4-SAT n=100 alpha=9:
V=16384, F=131072, E=524288 padded), the per-op and per-phase costs that
bound the solver's iteration time:

  op_floor          slope cost of one unfusable tiny op (chained scatters
                    on a 128-element array) - the device/tunnel dispatch floor
  scatter_unsorted  jax segment_sum at E=524288 -> V=16384 (1/2/4 columns)
  scatter_sorted    jax segment_sum (sorted) E -> F=131072
  pallas_clause     ops/pallas_segment sorted_segment_sum E -> F
  gather            x_v[edge_var] at E
  segmax_vb         segment_max V -> B
  sp_sweep          one survey_propagator_apply
  decimate          one sequential_decimator_apply (incl. set_variables cond)
  simplify          one full simplify() on the fresh problem
  iteration         one full _forward_core iteration (from bench slope)
  walksat           one local-search iteration

Methodology: every timed program is a lax.fori_loop whose carry feeds each
rep's output into the next rep's input (no loop-invariant hoisting), timed
at two rep counts; the reported cost is the slope, which cancels program
launch overhead. Sync is via materialising a scalar (block_until_ready is
unreliable on the axon tunnel). Programs are kept short (< ~45 s) to avoid
tripping the tunnel's long-execution kill.

Writes JSON to stdout (one dict) and docs/profile_phases.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args):
    """Run jitted fn, sync via scalar materialisation, return seconds."""
    t0 = time.time()
    out = fn(*args)
    # reduce to one scalar and pull it
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(out)
    s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves if hasattr(x, "astype"))
    float(s)
    return time.time() - t0


def slope(fn, lo, hi, *args):
    """Cost per rep: (T(hi) - T(lo)) / (hi - lo), median of 3."""
    fn(lo, *args), fn(hi, *args)  # compile both
    import jax
    jax.block_until_ready  # noqa - no-op ref
    # sync compile results
    timed(lambda: fn(lo, *args))
    diffs = []
    for _ in range(3):
        t_lo = timed(lambda: fn(lo, *args))
        t_hi = timed(lambda: fn(hi, *args))
        diffs.append(max((t_hi - t_lo) / (hi - lo), 0.0))
    diffs.sort()
    return diffs[1], diffs


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.modules import common, decimate as D, propagate as PR
    from pdp_solver_tpu.ops import segment_sum
    from pdp_solver_tpu.ops.segment import segment_max
    from pdp_solver_tpu.problem.simplify import simplify, set_variable_core
    from pdp_solver_tpu.problem.state import (
        init_problem_state, compute_edge_mask)
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0])}
    only = os.environ.get("PROFILE_ONLY", "").split(",") if \
        os.environ.get("PROFILE_ONLY") else None

    def want(name):
        return only is None or name in only

    insts = make_ksat_set()
    batch = jax.device_put(pack_instances(insts))
    E, V, F, B = (batch.num_edges, batch.num_vars, batch.num_clauses,
                  batch.batch_size)
    results["shapes"] = {"E": E, "V": V, "F": F, "B": B}
    key = jax.random.PRNGKey(0)

    # ---- 1. op floor: chained dependent tiny scatters --------------------
    if want("op_floor"):
        idx = jnp.arange(128, dtype=jnp.int32)

        @partial(jax.jit, static_argnums=0)
        def tiny_chain(n, x):
            def body(i, x):
                return jax.ops.segment_sum(x * 1.0001, idx[::-1], 128)
            return jax.lax.fori_loop(0, n, body, x)

        med, all3 = slope(lambda n: tiny_chain(n, jnp.ones(128)), 50, 150)
        results["op_floor_ms"] = round(med * 1e3, 3)

    # ---- 2. scatter costs at bench shapes --------------------------------
    x1 = jnp.ones((E,), jnp.float32)

    def scatter_loop(n, x, ids, nseg, sorted_):
        def body(i, x):
            s = jax.ops.segment_sum(x, ids, num_segments=nseg,
                                    indices_are_sorted=sorted_)
            return x * 0.9999 + s[ids] * 1e-9
        return jax.lax.fori_loop(0, n, body, x)

    if want("scatter"):
        f = jax.jit(partial(scatter_loop, ids=batch.edge_var, nseg=V,
                            sorted_=False), static_argnums=0)
        med, _ = slope(lambda n: f(n, x1), 5, 25)
        results["scatter_unsorted_var_ms"] = round(med * 1e3, 3)

        f = jax.jit(partial(scatter_loop, ids=batch.edge_clause, nseg=F,
                            sorted_=True), static_argnums=0)
        med, _ = slope(lambda n: f(n, x1), 5, 25)
        results["scatter_sorted_clause_ms"] = round(med * 1e3, 3)

        # 4-column variant (stacking amortisation)
        x4 = jnp.ones((E, 4), jnp.float32)

        @partial(jax.jit, static_argnums=0)
        def scat4(n, x):
            def body(i, x):
                s = jax.ops.segment_sum(x, batch.edge_var, num_segments=V)
                return x * 0.9999 + s[batch.edge_var] * 1e-9
            return jax.lax.fori_loop(0, n, body, x)

        med, _ = slope(lambda n: scat4(n, x4), 5, 25)
        results["scatter_unsorted_var4_ms"] = round(med * 1e3, 3)

    if want("pallas"):
        from pdp_solver_tpu.ops.pallas_segment import sorted_segment_sum

        @partial(jax.jit, static_argnums=0)
        def pal(n, x):
            def body(i, x):
                s = sorted_segment_sum(x, batch.edge_clause, F)
                return x * 0.9999 + s[batch.edge_clause] * 1e-9
            return jax.lax.fori_loop(0, n, body, x)

        med, _ = slope(lambda n: pal(n, x1), 5, 25)
        results["pallas_clause_ms"] = round(med * 1e3, 3)

    if want("gather"):
        xv = jnp.ones((V,), jnp.float32)

        @partial(jax.jit, static_argnums=0)
        def gat(n, xv):
            def body(i, xv):
                e = xv[batch.edge_var]
                return xv * 0.9999 + jax.ops.segment_sum(
                    e, batch.edge_var, V) * 1e-9
            return jax.lax.fori_loop(0, n, body, xv)

        med, _ = slope(lambda n: gat(n, xv), 5, 25)
        results["gather_plus_scatter_ms"] = round(med * 1e3, 3)

    if want("segmax"):
        xv = jnp.ones((V,), jnp.float32)

        @partial(jax.jit, static_argnums=0)
        def smax(n, xv):
            def body(i, xv):
                m = segment_max(xv, batch.var_batch, B,
                                indices_are_sorted=True)
                return xv * 0.9999 + m[batch.var_batch] * 1e-9
            return jax.lax.fori_loop(0, n, body, xv)

        med, _ = slope(lambda n: smax(n, xv), 10, 50)
        results["segmax_vb_ms"] = round(med * 1e3, 3)

    # ---- 3. phase costs ---------------------------------------------------
    solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.02,
                                    t_max=100, local_search_iterations=0))
    state0 = solver.get_init_state(key, batch, randomized=True)
    problem0 = init_problem_state(batch)
    em0 = compute_edge_mask(batch, problem0)
    ae0 = jnp.ones((E,), jnp.float32)

    if want("sp_sweep"):
        @partial(jax.jit, static_argnums=0)
        def sweep_n(n, prop_state):
            spcfg = solver.prop_cfg

            def body(i, ps):
                return PR.survey_propagator_apply({}, spcfg, batch, ps, ps,
                                                  em0, ae0)
            return jax.lax.fori_loop(0, n, body, prop_state)

        med, _ = slope(lambda n: sweep_n(n, state0.prop), 5, 25)
        results["sp_sweep_ms"] = round(med * 1e3, 3)

    if want("decimate"):
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
        med, _ = slope(lambda n: dec_n(n, (aux0, problem0)), 3, 9)
        results["decimate_plus_simplify_ms"] = round(med * 1e3, 3)

    if want("simplify"):
        # repeated simplify on an already-simplified problem: measures the
        # fixed overhead of entering/leaving the two fixpoint loops
        @partial(jax.jit, static_argnums=0)
        def simp_n(n, problem):
            def body(i, p):
                p = simplify(batch, p)
                return p._replace(solution=p.solution * 0.99999)
            return jax.lax.fori_loop(0, n, body, problem)

        med, _ = slope(lambda n: simp_n(n, problem0), 3, 9)
        results["simplify_noop_ms"] = round(med * 1e3, 3)

        # one real decimation step per rep: fix one random variable then
        # fully simplify (upper bound per decimation event)
        assign = jnp.zeros((V,)).at[jnp.arange(B) * (V // B)].set(1.0)

        @partial(jax.jit, static_argnums=0)
        def simp_real(n, problem):
            def body(i, p):
                p = set_variable_core(batch, p, assign * (i % 2 * 2 - 1.0))
                return simplify(batch, p)
            return jax.lax.fori_loop(0, n, body, problem)

        med, _ = slope(lambda n: simp_real(n, problem0), 3, 9)
        results["simplify_real_ms"] = round(med * 1e3, 3)

    if want("iteration"):
        @partial(jax.jit, static_argnums=(4,))
        def fwd_chunk(rng, b, st, carry, n):
            _, st, carry = solver.forward(
                {}, rng, b, st, n, is_training=False,
                check_termination=True, carry=carry, finalize=False)
            return st, carry

        st, carry = fwd_chunk(key, batch, state0, None, 5)
        t_lo = timed(lambda: fwd_chunk(key, batch, state0, carry, 5))
        st25, carry25 = fwd_chunk(key, batch, state0, None, 25)
        timed(lambda: fwd_chunk(key, batch, state0, carry, 25))
        ts = []
        for _ in range(3):
            t_lo = timed(lambda: fwd_chunk(key, batch, state0, carry, 5))
            t_hi = timed(lambda: fwd_chunk(key, batch, state0, carry, 25))
            ts.append(max((t_hi - t_lo) / 20, 0.0))
        ts.sort()
        results["iteration_ms"] = round(ts[1] * 1e3, 3)
        results["edge_updates_per_sec"] = (
            round(460800 / ts[1]) if ts[1] > 0 else None)

    if want("walksat"):
        @partial(jax.jit, static_argnums=(3,))
        def ls_n(rng, problem, pred, n):
            return solver._local_search(rng, batch, problem, pred, 1, n)

        pred0 = 0.5 * jnp.ones((V, 1))
        med, _ = slope(lambda n: ls_n(key, problem0, pred0, n), 10, 50)
        results["walksat_iter_ms"] = round(med * 1e3, 3)

    out = json.dumps(results)
    print(out)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "profile_phases.json")
    with open(path, "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
