#!/usr/bin/env python
"""On-chip sweep of the bench operating point (one process, shared compiles).

Compares restart schedules and fault-mirror cadences for the compacting
solve on the shared 128-instance 4-SAT set, so bench.py's defaults are
picked from measurements on the actual device rather than the CPU (where
D2H mirroring is free and program dispatch has no tunnel floor).

Usage: python tools/tpu_bench_sweep.py [repeats]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.solvers.compact import compacting_solve
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters, ls_iters = 1000, 1000
    insts = make_ksat_set()
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.05, t_max=100,
        local_search_iterations=ls_iters, epsilon=0.5))
    min_edges = 131072
    rng = jax.random.PRNGKey(0)
    _, r_fwd = jax.random.split(rng)

    def sched(fracs):
        if fracs is None:
            return None
        return [(int(iters * f), int(ls_iters * f)) for f in fracs]

    configs = [
        ("single_m1", None, 1),
        ("single_m5", None, 5),
        ("r5050_m1", (0.5, 0.5), 1),
        ("r5050_m5", (0.5, 0.5), 5),
    ]
    results = {}
    for name, fracs, mirror in configs:
        walls, solved_counts = [], []
        for rep in range(repeats + 1):  # rep 0 = compile pass, discarded
            t0 = time.time()
            _, solved_list, stats = compacting_solve(
                solver, {}, r_fwd, insts, iters, ls_iterations=ls_iters,
                chunk=50, min_edges=min_edges, schedule=sched(fracs),
                mirror_every=mirror)
            w = time.time() - t0
            if rep > 0:
                walls.append(round(w, 2))
                solved_counts.append(int(sum(solved_list)))
        s = solved_counts[-1]
        wmin = min(walls)
        results[name] = {"solved": s, "walls": walls,
                         "solutions_per_sec": round(s / wmin, 3),
                         "ladder": stats["compactions"]}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
