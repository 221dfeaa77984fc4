#!/usr/bin/env python
"""Measure the community-major reorder fast path on chip (VERDICT r4 #6).

Round 4 shipped fg/reorder.py (community recovery + community-major
renumbering so large modular CNFs regain the windowed-kernel locality
invariant) with formula-preservation tests but no recorded on-chip
number. This probe produces that number: SP-sweep and full p-d-p
iteration slopes on large Community-Attachment instances
(reference generator band: src/pdp/generator.py:163-264, q in [0.8,0.9],
c in [10,20]) packed twice — verbatim vs reordered — same formulas,
same budgets, same kernels.

Usage (chip otherwise idle): python tools/tpu_reorder_probe.py
Env: PROBE_N (10000), PROBE_COUNT (4), PROBE_OUT
     (docs/eval_modular_r5_reorder.json)
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from pdp_solver_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.fg.generators import ModularCNFGenerator
from pdp_solver_tpu.fg.reorder import reorder_instances
from pdp_solver_tpu.modules import propagate as PR
from pdp_solver_tpu.problem.state import (init_problem_state,
                                          compute_edge_mask)
from pdp_solver_tpu.solvers.base import PDPSolver, SolverConfig


def measure(tag, insts, solver, results):
    batch = jax.device_put(pack_instances(insts))
    state = solver.get_init_state(jax.random.PRNGKey(0), batch,
                                  randomized=True)
    p0 = init_problem_state(batch)
    em = compute_edge_mask(batch, p0)
    ae = jnp.ones((batch.num_edges,), jnp.float32)

    @partial(jax.jit, static_argnums=0)
    def sweep(n, ps):
        def body(i, ps):
            return PR.survey_propagator_apply(
                {}, solver.prop_cfg, batch, ps, ps, em, ae)
        return jax.lax.fori_loop(0, n, body, ps)

    def t_sweep(n):
        t0 = time.time()
        out = sweep(n, state.prop)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        return time.time() - t0

    sweep(2, state.prop), sweep(10, state.prop)   # compile both
    t_sweep(2)
    lo = [t_sweep(2) for _ in range(3)]
    hi = [t_sweep(10) for _ in range(3)]
    slope = max((min(hi) - min(lo)) / 8, 1e-9)

    # full p-d-p iteration slope (chunked forward, same protocol as bench)
    r = jax.random.split(jax.random.PRNGKey(0))[1]
    first = jax.jit(lambda rr, b, s, n: solver.forward(
        {}, rr, b, s, n, is_training=False, check_termination=True,
        carry=None, finalize=False)[1:], static_argnames="n")
    nxt = jax.jit(lambda rr, b, s, c, n: solver.forward(
        {}, rr, b, s, n, is_training=False, check_termination=True,
        carry=c, finalize=False)[1:], static_argnames="n")

    def run_iters(n_chunks, chunk=25):
        t0 = time.time()
        st, carry = first(r, batch, state, chunk)
        for c in range(1, n_chunks):
            st, carry = nxt(jax.random.fold_in(r, c), batch, st, carry,
                            chunk)
        float(jnp.sum(carry[0].solution))
        return time.time() - t0

    run_iters(3)
    l1 = [run_iters(1) for _ in range(2)]
    l3 = [run_iters(3) for _ in range(2)]
    it_slope = max((min(l3) - min(l1)) / 50, 1e-9)

    real_e = sum(i[2].shape[1] for i in insts)
    results[tag] = {
        "instances": len(insts),
        "real_edges": real_e,
        "padded_edges": int(batch.num_edges),
        "var_window": int(batch.var_window),
        "sp_sweep_ms": round(slope * 1e3, 2),
        "sweep_edge_updates_per_sec": round(real_e / slope),
        "pdp_iteration_ms": round(it_slope * 1e3, 2),
    }
    print(json.dumps({tag: results[tag]}), flush=True)


def main():
    n = int(os.environ.get("PROBE_N", 10000))
    count = int(os.environ.get("PROBE_COUNT", 4))
    out_path = os.environ.get("PROBE_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "docs", "eval_modular_r5_reorder.json")
    gen = ModularCNFGenerator(3, n, n, 0.8, 0.9, 10, 20, 3.0, 3.0,
                              seed=101)
    insts = [gen.generate() for _ in range(count)]
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=0, epsilon=0.5))

    results = {"n": n, "count": count,
               "backend": jax.default_backend(),
               "device": str(jax.devices()[0])}
    t0 = time.time()
    ro_insts, _ = reorder_instances(insts)
    results["reorder_pass_s"] = round(time.time() - t0, 2)
    measure("verbatim", insts, solver, results)
    measure("reordered", ro_insts, solver, results)
    v, r_ = results["verbatim"], results["reordered"]
    results["sweep_speedup"] = round(
        v["sp_sweep_ms"] / r_["sp_sweep_ms"], 2)
    results["iteration_speedup"] = round(
        v["pdp_iteration_ms"] / r_["pdp_iteration_ms"], 2)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("FINAL " + json.dumps(results))


if __name__ == "__main__":
    main()
