#!/usr/bin/env python
"""Round-3 perf probes at the bench operating point (run on an idle chip).

Measures, at the shared 4-SAT bench shapes:
  1. the full p-d-p per-iteration slope at simplify_rounds in {0, 1, 2, 4}
     (lazy simplification: problem/simplify.py fused_simplify);
  2. the SP-sweep-only slope (floor);
  3. full-budget solved fraction at simplify_rounds 0 vs 2 (same protocol
     as bench.py, single attempt) to check the cap is quality-neutral.

Writes docs/tpu_r3_probe.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from pdp_solver_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.solvers.base import PDPSolver, SolverConfig
from pdp_solver_tpu.solvers.compact import compacting_solve
from pdp_solver_tpu.train.loss import cnf_evaluate
from pdp_solver_tpu.utils.benchdata import make_ksat_set


def make_solver(srounds):
    return PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.05, t_max=100,
        local_search_iterations=1000, epsilon=0.5,
        simplify_rounds=srounds))


def iter_slope(solver, batch, state0, r_fwd, chunk=50):
    def fixed_step(rng, batch, state, carry, n):
        _, state, carry = solver.forward(
            {}, rng, batch, state, n, is_training=False,
            check_termination=True, carry=carry, finalize=False)
        return state, carry

    first = jax.jit(lambda r, b, s, n: fixed_step(r, b, s, None, n),
                    static_argnames="n")
    nxt = jax.jit(fixed_step, static_argnames="n")

    def run(n_chunks):
        t0 = time.time()
        st, carry = first(r_fwd, batch, state0, chunk)
        for c in range(1, n_chunks):
            st, carry = nxt(jax.random.fold_in(r_fwd, c), batch, st,
                            carry, chunk)
        float(jnp.sum(carry[0].solution))
        return time.time() - t0

    run(3)
    lo = [run(1) for _ in range(3)]
    hi = [run(3) for _ in range(3)]
    return max((min(hi) - min(lo)) / (2 * chunk), 1e-9)


def main():
    insts = make_ksat_set()
    batch = jax.device_put(pack_instances(insts))
    total_edges = sum(i[2].shape[1] for i in insts)
    out = {"backend": jax.default_backend(), "total_edges": total_edges}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "tpu_r3_probe.json")

    key = jax.random.PRNGKey(0)
    r_state, r_fwd = jax.random.split(key)

    for srounds in (0, 1, 2, 4):
        solver = make_solver(srounds)
        state0 = solver.get_init_state(r_state, batch, randomized=True)
        s = iter_slope(solver, batch, state0, r_fwd)
        out[f"pdp_iteration_ms_sr{srounds}"] = round(s * 1e3, 2)
        out[f"edge_updates_per_sec_sr{srounds}"] = round(total_edges / s)
        print(json.dumps(out), flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)

    # quality check: full bench protocol (single attempt), sr 0 vs 2
    for srounds in (0, 2):
        solver = make_solver(srounds)
        t0 = time.time()
        _, solved, _ = compacting_solve(
            solver, {}, r_fwd, insts, 1000, ls_iterations=1000,
            chunk=50, min_edges=131072, mirror_every=8)
        out[f"solved_sr{srounds}"] = int(sum(solved))
        out[f"solve_wall_sr{srounds}"] = round(time.time() - t0, 1)
        print(json.dumps(out), flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
