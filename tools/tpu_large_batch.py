#!/usr/bin/env python
"""Large-batch operating-point probe (VERDICT r3 #3).

The driver bench packs 128 instances / ~460k real edges — a dispatch-bound
point that leaves the chip ~idle (18.7M edge-updates/s is single-digit
GFLOP/s). The reference's own operating point is batch_size=5000 with
test_batch_limit=4e7 (config/Train/*.yaml, src/satyr.py:51-53) — thousands
of instances packed per program. This tool measures the TPU at that scale:

  * SP-sweep slope (edge-updates/s) at E in {0.5M, 2M, 8M} real edges
  * a full compacting p-d-p solve at >=2048 instances (verified
    solutions/s at the reference scale)

Writes docs/r4_large_batch.json; bench.py embeds the measured numbers as
the `large_batch` block.

Usage: python tools/tpu_large_batch.py [n_instances] [solve|nosolve]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdp_solver_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

from pdp_solver_tpu.fg.batch import pack_instances  # noqa: E402
from pdp_solver_tpu.modules import propagate as PR  # noqa: E402
from pdp_solver_tpu.problem.state import (  # noqa: E402
    init_problem_state, compute_edge_mask)
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver  # noqa: E402
from pdp_solver_tpu.utils.benchdata import make_ksat_set  # noqa: E402


def sweep_slope(solver, batch, lo=5, hi=25, reps=3):
    """Min-wall slope of the raw SP sweep, seconds per sweep."""
    problem0 = init_problem_state(batch)
    em0 = compute_edge_mask(batch, problem0)
    ae0 = jnp.ones((batch.num_edges,), jnp.float32)
    state = solver.get_init_state(jax.random.PRNGKey(0), batch,
                                  randomized=True)

    @partial(jax.jit, static_argnums=0)
    def sweep_n(n, ps):
        def body(i, ps):
            return PR.survey_propagator_apply(
                {}, solver.prop_cfg, batch, ps, ps, em0, ae0)
        return jax.lax.fori_loop(0, n, body, ps)

    def timed(n):
        t0 = time.time()
        out = sweep_n(n, state.prop)
        float(jnp.sum(out[0]))
        return time.time() - t0

    sweep_n(lo, state.prop), sweep_n(hi, state.prop)  # compile
    timed(lo)
    lo_w = [timed(lo) for _ in range(reps)]
    hi_w = [timed(hi) for _ in range(reps)]
    return max((min(hi_w) - min(lo_w)) / (hi - lo), 1e-9)


def main():
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    do_solve = (sys.argv[2] if len(sys.argv) > 2 else "solve") == "solve"
    iters = int(os.environ.get("BENCH_ITERS", "1000"))
    ls_iters = int(os.environ.get("BENCH_LS_ITERS", "1000"))

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]), "sweep_points": []}

    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.05, t_max=100,
        local_search_iterations=ls_iters, epsilon=0.5,
        simplify_rounds=1))

    # edge-updates/s scaling curve: 128 -> 512 -> 2048 instances
    for cnt in (128, 512, n_inst):
        insts = make_ksat_set(count=cnt)
        real_e = sum(i[2].shape[1] for i in insts)
        batch = jax.device_put(pack_instances(insts))
        sec = sweep_slope(solver, batch)
        row = {"instances": cnt, "real_edges": real_e,
               "padded_edges": int(batch.num_edges),
               "sweep_ms": round(sec * 1e3, 3),
               "edge_updates_per_sec": round(real_e / sec)}
        out["sweep_points"].append(row)
        print(json.dumps(row), flush=True)

    # full solve at the large operating point
    if do_solve:
        from pdp_solver_tpu.solvers.compact import compacting_solve
        insts = make_ksat_set(count=n_inst)
        schedule = [(iters // 2, ls_iters // 2), (iters // 2, ls_iters // 2)]
        r_fwd = jax.random.split(jax.random.PRNGKey(0))[1]

        def run():
            t0 = time.time()
            _, solved_list, stats = compacting_solve(
                solver, {}, r_fwd, insts, iters,
                ls_iterations=ls_iters, chunk=50,
                min_edges=int(os.environ.get("BENCH_MIN_EDGES", "131072")),
                schedule=schedule, mirror_every=8)
            return sum(solved_list), time.time() - t0, stats

        solved, warm_wall, _ = run()   # warm/compile
        solved, wall, stats = run()
        out["solve"] = {
            "instances": n_inst, "solved": solved,
            "solved_fraction": round(solved / n_inst, 4),
            "wall_s": round(wall, 2), "warm_wall_s": round(warm_wall, 2),
            "verified_solutions_per_sec": round(solved / wall, 3),
            "ladder": stats["compactions"],
        }
        print(json.dumps(out["solve"]), flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "r4_large_batch.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
