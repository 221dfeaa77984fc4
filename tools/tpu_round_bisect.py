#!/usr/bin/env python
"""Cumulative-prefix bisection of the fused simplify round on chip.

Every stage body decays ALL of its inputs each iteration and folds every
computed array back into the loop carry, so XLA can neither hoist
loop-invariant subtrees (which corrupted tools/tpu_round_profile.py's
phase_v number) nor dead-code-eliminate a stage. Stage deltas attribute
the round's cost op-group by op-group.
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


def slope(fn, lo=3, hi=15):
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
    from pdp_solver_tpu.problem.state import init_problem_state
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    batch = jax.device_put(pack_instances(make_ksat_set()))
    V, B = batch.num_vars, batch.batch_size
    problem0 = init_problem_state(batch)

    def stage_body(stage, p):
        # decay every input so nothing is loop-invariant
        av = p.active_vars * 0.999999
        ac = p.active_clauses * 0.999999
        sol = p.solution * 0.999999
        eps = 1e-12

        if stage >= 1:                       # var->edge gathers (unsorted)
            av_e = av[batch.edge_var]
            sol_e = sol[batch.edge_var]
            av = av + eps * (av_e[:V] + sol_e[:V])
        if stage >= 2:                       # elementwise + clause reduce
            lit_true = jnp.where(batch.edge_sign > 0,
                                 sol_e >= 1.0, sol_e <= 0.0)
            at = (lit_true & (av_e <= 0)).astype(jnp.float32)
            cd = common.scatter_to_clauses_cols(batch, (av_e, at))
            ac = ac + eps * (cd[0] + cd[1])
        if stage >= 3:                       # clause elementwise
            ac2 = jnp.where(cd[1] > 0, 0.0, ac)
            single_f = (cd[0] == 1).astype(jnp.float32) * ac2
            ac = ac2 + eps * single_f
        if stage >= 4:                       # clause->edge gathers (sorted)
            s_e = single_f[batch.edge_clause] * batch.edge_mask
            c_e = ac[batch.edge_clause] * batch.edge_mask
            av = av + eps * (s_e[:V] + c_e[:V])
        if stage >= 5:                       # 4-col var reduce (windowed)
            vd = common.scatter_to_vars_cols(
                batch, (s_e, batch.edge_sign * s_e,
                        c_e, batch.edge_sign * c_e))
            av = av + eps * (vd[0] + vd[1] + vd[2] + vd[3])
        if stage >= 6:                       # conflict + instance marking
            conflict = ((jnp.abs(vd[1]) != vd[0]).astype(jnp.float32) * av)
            unsat_b = segment_sum(conflict, batch.var_batch, B,
                                  indices_are_sorted=True) >= 1
            av = jnp.where(unsat_b[batch.var_batch], 0.0, av)
            ac = jnp.where(unsat_b[batch.clause_batch], 0.0, ac)
        if stage >= 7:                       # forcing + pure + writes
            forced = ((vd[0] > 0) & (jnp.abs(vd[1]) == vd[0]))
            forced = forced.astype(jnp.float32) * av
            pure = (vd[2] == jnp.abs(vd[3])).astype(jnp.float32) \
                * av * (1.0 - forced)
            value = forced * jnp.sign(vd[1]) + pure * jnp.sign(vd[3])
            fixed = jnp.maximum(forced, pure * (vd[2] > 0)) \
                * (jnp.abs(value) > 0)
            deact = jnp.maximum(forced * (jnp.abs(value) > 0), pure)
            sol = jnp.where(fixed > 0, (value + 1.0) / 2.0, sol)
            av = jnp.where(deact > 0, av * 0.5, av)

        return p._replace(active_vars=av, active_clauses=ac, solution=sol)

    res = {}
    for stage in range(8):
        @partial(jax.jit, static_argnums=0)
        def f(n, p, _s=stage):
            return jax.lax.fori_loop(
                0, n, lambda i, p: stage_body(_s, p), p)
        res[f"stage{stage}_ms"] = slope(lambda n, _f=f: _f(n, problem0))
        print(json.dumps(res), flush=True)

    print("FINAL " + json.dumps(res))


if __name__ == "__main__":
    main()
