#!/usr/bin/env python
"""Multi-variable decimation study (CPU).

For each decimation_threshold variant, runs the headline solve on a subset
of the shared 4-SAT bench set and records: solved fraction, wall, and the
number of p-d-p iterations until every instance terminates (measured by
chunked solving and reading the active-instance count between chunks).

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
           python tools/decimation_study.py [count] [thetas...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from pdp_solver_tpu.train.loss import cnf_evaluate
from pdp_solver_tpu.utils.benchdata import make_ksat_set


def run_variant(batch, count, theta, guard=0.0, iters=1000, ls=1000,
                chunk=50):
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=ls, epsilon=0.5,
        decimation_threshold=theta, decimation_guard=guard))

    first = jax.jit(
        lambda r, b, s, n: solver.forward(
            {}, r, b, s, n, is_training=False, check_termination=True,
            finalize=False),
        static_argnames="n")
    step = jax.jit(
        lambda r, b, s, c, n: solver.forward(
            {}, r, b, s, n, is_training=False, check_termination=True,
            carry=c, finalize=False),
        static_argnames="n")

    def final_fn(r, b, s, c):
        (pred, _), _ = solver.forward(
            {}, r, b, s, 0, is_training=False, check_termination=True,
            carry=c, finalize=True)
        solved_v, _ = cnf_evaluate(b, pred)
        return pred, jnp.sum(solved_v * b.instance_mask)

    final = jax.jit(final_fn)

    key = jax.random.PRNGKey(0)
    r_state, r_fwd = jax.random.split(key)
    state = solver.get_init_state(r_state, batch, randomized=True)

    t0 = time.time()
    carry = None
    active_trace = []
    done = 0
    rng = r_fwd
    while done < iters:
        rng, r = jax.random.split(rng)
        if carry is None:
            _, state, carry = first(r, batch, state, chunk)
        else:
            _, state, carry = step(r, batch, state, carry, chunk)
        done += chunk
        n_active = float(jnp.sum(carry[1]))
        active_trace.append((done, n_active))
        if n_active == 0:
            break
    rng, r = jax.random.split(rng)
    pred, solved = final(r, batch, state, carry)
    solved = int(solved)
    wall = time.time() - t0
    # iterations until all terminated (upper bound = last chunk boundary)
    term_iter = active_trace[-1][0] if active_trace[-1][1] == 0 else iters
    return {
        "theta": theta,
        "guard": guard,
        "solved": solved,
        "solved_fraction": round(solved / count, 4),
        "term_iter_ub": term_iter,
        "wall_s": round(wall, 1),
        "active_trace": [(d, int(a)) for d, a in active_trace],
    }


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    # each variant is "theta" or "theta:guard"
    specs = (sys.argv[2:] if len(sys.argv) > 2
             else ["1.0", "0.9", "0.7", "0.5"])
    insts = make_ksat_set()[:count]
    batch = pack_instances(insts)
    out = []
    for spec in specs:
        parts = spec.split(":")
        theta = float(parts[0])
        guard = float(parts[1]) if len(parts) > 1 else 0.0
        r = run_variant(batch, count, theta, guard)
        print(json.dumps(r))
        out.append(r)
    with open("/tmp/decimation_study.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
