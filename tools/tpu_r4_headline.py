#!/usr/bin/env python
"""Round-4 headline bisect: END-TO-END wall + solved for the driver bench
protocol across simplify_rounds x message-init seeds.

Round 3 optimized the per-iteration slope (simplify_rounds=1) and the
driver-captured headline regressed 3.88 -> 2.58 verified solutions/s
(BENCH_r02/r03.json). Deferred propagation plausibly increases
iterations-to-termination; nobody measured end-to-end before changing the
default. This tool measures exactly the number the driver records — a
full compacting solve at the bench operating point — per configuration,
over multiple message-init seeds (measured basin spread is +-5pp,
tools/eps_study.py), so the round-4 default is chosen on the metric that
counts.

Usage: python tools/tpu_r4_headline.py [srounds_list] [n_seeds]
Writes docs/r4_headline_bisect.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdp_solver_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax  # noqa: E402

from pdp_solver_tpu.solvers import SolverConfig, PDPSolver  # noqa: E402
from pdp_solver_tpu.solvers.compact import compacting_solve  # noqa: E402
from pdp_solver_tpu.utils.benchdata import make_ksat_set  # noqa: E402


def main():
    srounds_list = [int(x) for x in
                    (sys.argv[1] if len(sys.argv) > 1 else "0,1,2").split(",")]
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    iters = int(os.environ.get("BENCH_ITERS", "1000"))
    ls_iters = int(os.environ.get("BENCH_LS_ITERS", "1000"))
    chunk = int(os.environ.get("BENCH_CHUNK", "50"))
    min_edges = int(os.environ.get("BENCH_MIN_EDGES", "131072"))
    mirror_every = int(os.environ.get("BENCH_MIRROR_EVERY", "8"))
    tol = float(os.environ.get("BENCH_TOL", "0.05"))
    sched_env = os.environ.get("BENCH_SCHEDULE", "0.5,0.5")
    fracs = [float(x) for x in sched_env.split(",") if x]
    schedule = [(max(int(iters * f), 1), max(int(ls_iters * f), 1))
                for f in fracs]

    insts = make_ksat_set()
    count = len(insts)
    results = []
    for sr in srounds_list:
        solver = PDPSolver(SolverConfig(
            model_type="p-d-p", tolerance=tol, t_max=100,
            local_search_iterations=ls_iters, epsilon=0.5,
            simplify_rounds=sr))

        def run(seed):
            r = jax.random.PRNGKey(seed)
            _, r_fwd = jax.random.split(r)
            t0 = time.time()
            _, solved_list, stats = compacting_solve(
                solver, {}, r_fwd, insts, iters,
                ls_iterations=ls_iters, chunk=chunk,
                min_edges=min_edges, schedule=schedule,
                mirror_every=mirror_every)
            return sum(solved_list), time.time() - t0, stats

        # warm (compile the ladder for this srounds value)
        t0 = time.time()
        run(0)
        warm_s = time.time() - t0
        rows = []
        for seed in range(n_seeds):
            solved, wall, stats = run(seed)
            rows.append({"seed": seed, "solved": solved,
                         "wall_s": round(wall, 2),
                         "sol_per_s": round(solved / wall, 3),
                         "ladder": stats["compactions"]})
            print(json.dumps({"srounds": sr, **rows[-1]}), flush=True)
        mean_rate = sum(r["sol_per_s"] for r in rows) / len(rows)
        results.append({
            "srounds": sr, "warm_s": round(warm_s, 1), "runs": rows,
            "solved_mean": sum(r["solved"] for r in rows) / len(rows),
            "solved_range": [min(r["solved"] for r in rows),
                             max(r["solved"] for r in rows)],
            "wall_mean_s": round(
                sum(r["wall_s"] for r in rows) / len(rows), 2),
            "sol_per_s_mean": round(mean_rate, 3),
        })
        print(json.dumps(results[-1]), flush=True)

    out = {"iters": iters, "ls_iters": ls_iters, "chunk": chunk,
           "tol": tol, "schedule": sched_env, "count": count,
           "backend": jax.default_backend(), "results": results}
    path = os.environ.get("R4_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "r4_headline_bisect.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
