#!/usr/bin/env python
"""One-process pipeline comparison for the TPU: measures the bench
contenders (decimation band on/off x restart schedule) with shared
compiles, median-of-3 walls each, and prints one JSON line per variant.

Run on the chip:  timeout 5400 python tools/tpu_pipeline_compare.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from pdp_solver_tpu.solvers.compact import compacting_solve
from pdp_solver_tpu.utils.benchdata import make_ksat_set


def run_variant(name, insts, theta, guard, sched, repeats=3,
                min_edges=131072):
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=1000, epsilon=0.5,
        decimation_threshold=theta, decimation_guard=guard))
    walls, solved = [], 0
    for rep in range(repeats + 1):   # rep 0 = warm-up/compile
        t0 = time.time()
        _, solved_list, stats = compacting_solve(
            solver, {}, jax.random.PRNGKey(0), insts, 1000, chunk=50,
            schedule=sched, min_edges=min_edges)
        w = time.time() - t0
        solved = int(sum(solved_list))
        if rep > 0:
            walls.append(w)
        if rep == 0:
            warm = w
        if w > 300:
            break
    walls.sort()
    wall = walls[len(walls) // 2] if walls else warm
    print(json.dumps({
        "variant": name, "solved": solved, "wall_s": round(wall, 2),
        "walls": [round(x, 2) for x in walls], "warmup_s": round(warm, 1),
        "rate": round(solved / wall, 3),
        "vs_baseline": round((solved / wall) / 0.0565, 1),
        "ladder": stats["compactions"], "faults": stats["faults"],
        "backend": jax.default_backend()}), flush=True)


def main():
    insts = make_ksat_set()
    sched = [(500, 500), (500, 500)]
    variants = os.environ.get(
        "PIPELINE_VARIANTS", "theta_sched,argmax_sched").split(",")
    if "theta_sched" in variants:
        run_variant("theta_sched", insts, 0.7, 50, sched)
    if "argmax_sched" in variants:
        run_variant("argmax_sched", insts, 1.0, 0, sched)
    if "theta_single" in variants:
        run_variant("theta_single", insts, 0.7, 50, None)
    if "argmax_single" in variants:
        run_variant("argmax_single", insts, 1.0, 0, None)


if __name__ == "__main__":
    main()
