#!/usr/bin/env python
"""Round-4 replica/schedule probe: end-to-end driver-protocol wall + solved
for candidate headline configurations, with per-harvest progress curves.

Configs (simplify_rounds x replicas x schedule) are run sequentially in ONE
process (one chip lease); results append to docs/r4_replica_probe.json
after every run so a timeout keeps partial data.

Usage: python tools/tpu_r4_replicas.py [config_ids] [n_seeds]
  config ids: comma-separated subset of the CONFIGS keys below.
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

CONFIGS = {
    "r3default": dict(srounds=1, replicas=1, sched=[(500, 500), (500, 500)]),
    "rep2":      dict(srounds=1, replicas=2, sched=None),
    "rep2sched": dict(srounds=1, replicas=2, sched=[(500, 500), (500, 500)]),
    "rep3":      dict(srounds=1, replicas=3, sched=None),
    "rep2sr0":   dict(srounds=0, replicas=2, sched=None),
    "rep2half":  dict(srounds=1, replicas=2, sched=None, iters=500),
    # decimation value saturates by iter ~300 while the LS phases deliver
    # solves at ~10x less wall per solve (docs/r4_replica_probe.json
    # r3default progress curves): shorter attempts, more LS phases
    "sched3":     dict(srounds=1, replicas=1,
                       sched=[(350, 350), (350, 350), (300, 300)]),
    "rep2sched3": dict(srounds=1, replicas=2,
                       sched=[(350, 350), (350, 350), (300, 300)]),
    "sched4":     dict(srounds=1, replicas=1,
                       sched=[(250, 250)] * 4),
    "rep2sched4": dict(srounds=1, replicas=2,
                       sched=[(250, 250)] * 4),
    # LS-heavy: decimation saturates by ~300; give WalkSAT the tail
    "lsheavy":    dict(srounds=1, replicas=1,
                       sched=[(300, 400), (300, 300), (400, 300)]),
    # faster decimation cadence on the sched3 winner
    "tol008":     dict(srounds=1, replicas=1, tol=0.08,
                       sched=[(350, 350), (350, 350), (300, 300)]),
    "tmax50":     dict(srounds=1, replicas=1, t_max=50,
                       sched=[(350, 350), (350, 350), (300, 300)]),
    "tol008tm50": dict(srounds=1, replicas=1, tol=0.08, t_max=50,
                       sched=[(350, 350), (350, 350), (300, 300)]),
}

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "r4_replica_probe.json")


def main():
    which = (sys.argv[1] if len(sys.argv) > 1
             else "r3default,rep2,rep2sched").split(",")
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    base_iters = int(os.environ.get("BENCH_ITERS", "1000"))
    ls_iters = int(os.environ.get("BENCH_LS_ITERS", "1000"))
    chunk = int(os.environ.get("BENCH_CHUNK", "50"))
    min_edges = int(os.environ.get("BENCH_MIN_EDGES", "131072"))
    mirror_every = int(os.environ.get("BENCH_MIRROR_EVERY", "8"))
    tol = float(os.environ.get("BENCH_TOL", "0.05"))

    insts = make_ksat_set()
    count = len(insts)
    results = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f).get("results", [])

    def flush():
        with open(OUT, "w") as f:
            json.dump({"count": count, "tol": tol, "chunk": chunk,
                       "backend": jax.default_backend(),
                       "results": results}, f, indent=1)

    for name in which:
        c = CONFIGS[name]
        iters = c.get("iters", base_iters)
        solver = PDPSolver(SolverConfig(
            model_type="p-d-p", tolerance=c.get("tol", tol),
            t_max=c.get("t_max", 100),
            local_search_iterations=ls_iters, epsilon=0.5,
            simplify_rounds=c["srounds"]))

        def run(seed):
            r = jax.random.split(jax.random.PRNGKey(seed))[1]
            t0 = time.time()
            _, solved_list, stats = compacting_solve(
                solver, {}, r, insts, iters,
                ls_iterations=ls_iters, chunk=chunk,
                min_edges=min_edges, schedule=c["sched"],
                mirror_every=mirror_every, replicas=c["replicas"])
            return sum(solved_list), time.time() - t0, stats

        t0 = time.time()
        run(0)   # warm: compile this config's ladder
        warm_s = time.time() - t0
        print(json.dumps({"config": name, "warm_s": round(warm_s, 1)}),
              flush=True)
        rows = []
        for seed in range(n_seeds):
            solved, wall, stats = run(seed)
            rows.append({
                "seed": seed, "solved": solved, "wall_s": round(wall, 2),
                "sol_per_s": round(solved / wall, 3),
                "pdp_wall_s": stats["pdp_wall_s"],
                "ls_wall_s": stats["ls_wall_s"],
                "ladder": stats["compactions"],
                "progress": [p for a in stats["attempts"]
                             for p in a["progress"]],
            })
            print(json.dumps({"config": name, **rows[-1]}), flush=True)
        results.append({
            "config": name, "iters": iters, **{k: v for k, v in c.items()
                                               if k != "iters"},
            "warm_s": round(warm_s, 1), "runs": rows,
            "solved_mean": sum(r["solved"] for r in rows) / len(rows),
            "wall_mean_s": round(sum(r["wall_s"] for r in rows) / len(rows),
                                 2),
            "sol_per_s_mean": round(sum(r["sol_per_s"] for r in rows)
                                    / len(rows), 3),
        })
        flush()
        print(json.dumps({k: results[-1][k] for k in
                          ("config", "solved_mean", "wall_mean_s",
                           "sol_per_s_mean")}), flush=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
