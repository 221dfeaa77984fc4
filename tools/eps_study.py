#!/usr/bin/env python
"""WalkSAT noise (epsilon) study on the shared 4-SAT set (CPU).

Runs the full compacting bench pipeline for several epsilon values and
seeds; prints solved counts and walls. Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/eps_study.py \
      [count] [eps...]
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


def main():
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    eps_list = ([float(x) for x in sys.argv[2:]] if len(sys.argv) > 2
                else [0.3, 0.4, 0.5, 0.6])
    insts = make_ksat_set()[:count]
    out = []
    for eps in eps_list:
        solver = PDPSolver(SolverConfig(
            model_type="p-d-p", tolerance=0.02, t_max=100,
            local_search_iterations=1000, epsilon=eps,
            decimation_threshold=0.7, decimation_guard=50))
        for seed in (0, 1):
            t0 = time.time()
            _, solved, stats = compacting_solve(
                solver, {}, jax.random.PRNGKey(seed), insts, 1000, chunk=50)
            r = {"eps": eps, "seed": seed, "solved": int(sum(solved)),
                 "wall_s": round(time.time() - t0, 1),
                 "ls_wall_s": stats["ls_wall_s"]}
            print(json.dumps(r))
            out.append(r)
    with open("/tmp/eps_study.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
