#!/usr/bin/env python
"""Flagship-budget evaluation on large modular (industrial-style) CNFs.

The reference's flagship eval set is sat-race-2015-style industrial CNFs at
test_recurrence_num 8800 (config/Train/p-prodec2-gcnf-10-100-pytorch.yaml);
the data ships with neither repo, so this approximates it with large
Community-Attachment instances from the reference's own generators
(src/pdp/generator.py:163-377; ours fg/generators.py): modular 3-SAT and
variable-modular k-SAT with >= 10k variables, q in [0.8, 0.9], c in
[10, 20] — the reference's modular training band.

Runs the classical p-d-p + WalkSAT pipeline at the full 8800-iteration /
1000-LS reference budget via the compacting chunked solve, and (optionally,
EVAL_NEURAL=1) the trained np-nd-np flagship at a documented reduced budget
on a smaller modular set. Writes docs/eval_modular_r3.json.

Usage (TPU, chip otherwise idle):
  PDP_COMPILE_CACHE=... python tools/eval_modular.py
Env: EVAL_ITERS (8800), EVAL_LS (4*EVAL_N), EVAL_CHUNK (100),
     EVAL_COUNT (8), EVAL_N (10000/12000), EVAL_NEURAL (0),
     EVAL_NEURAL_LS (8000)
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
import numpy as np

from pdp_solver_tpu.fg.generators import (
    ModularCNFGenerator, VariableModularCNFGenerator)
from pdp_solver_tpu.solvers.base import PDPSolver, SolverConfig
from pdp_solver_tpu.solvers.compact import compacting_solve


def main():
    iters = int(os.environ.get("EVAL_ITERS", 8800))
    chunk = int(os.environ.get("EVAL_CHUNK", 100))
    count = int(os.environ.get("EVAL_COUNT", 8))
    n_mod = int(os.environ.get("EVAL_N", 10000))
    # WalkSAT budget scales with instance size (one flip per instance per
    # iteration; the reference's 1000 at n<=100 is 10n-40n flips — at
    # n=10k the size-equivalent budget is ~4n). CPU-validated at n=1000/2000
    # (tools notes in docs/ROUND3.md); override with EVAL_LS.
    ls = int(os.environ.get("EVAL_LS", 4 * n_mod))

    gens = {
        # alpha 3.0: large modular instances at alpha >= 3.5 are often
        # UNSAT outright (each ~n/c-var community is itself a
        # near-threshold random sub-instance, and ALL c of them must be
        # satisfiable); at 3.0 SP goes paramagnetic (the classical
        # prescription: hand the instance to local search) and the solve
        # rides decimation's simplification + the scaled WalkSAT budget.
        # q/c from the reference's modular training band.
        "modular_3sat_n%d" % n_mod: ModularCNFGenerator(
            3, n_mod, n_mod, 0.8, 0.9, 10, 20, 3.0, 3.0, seed=11),
        "vmodular_k25_n%d" % (n_mod + 2000,): VariableModularCNFGenerator(
            2, 5, n_mod + 2000, n_mod + 2000, 0.8, 0.9, 10, 20, 2.0, 2.0,
            seed=13),
    }

    wanted = [f for f in os.environ.get("EVAL_FAMILIES", "").split(",")
              if f]
    if wanted:
        gens = {k: v for k, v in gens.items()
                if any(k.startswith(w) for w in wanted)}

    out = {"iters": iters, "ls": ls, "count": count,
           "backend": jax.default_backend(), "solver": "p-d-p classical",
           "tolerance": 0.02, "t_max": 100}
    path = os.environ.get("EVAL_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "docs", "eval_modular_r4.json")
    # merge into an existing report so family-targeted reruns keep rows
    if os.path.exists(path) and os.environ.get("EVAL_MERGE", "1") == "1":
        with open(path) as f:
            prev = json.load(f)
        for k, v in prev.items():
            if isinstance(v, dict):
                out.setdefault(k, v)
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.02, t_max=100,
        local_search_iterations=ls, epsilon=0.5))

    # community-major reordering (fg/reorder.py): recovers the planted
    # communities and renumbers variables so the hybrid based-window
    # reduce replaces the XLA-scatter fallback these packs otherwise ride
    # (round-3 cost: ~9 min per n=10k instance). Semantically a variable
    # renaming; solutions are mapped back and re-verified on the ORIGINAL
    # formula below.
    use_reorder = os.environ.get("EVAL_REORDER", "1") == "1"
    from pdp_solver_tpu.fg.reorder import reorder_instances, restore_solution
    from pdp_solver_tpu.fg.batch import pack_instances as _pack

    def _host_verify(inst, sol):
        n, m, gmap, signs = inst[0], int(inst[1]), inst[2], inst[3]
        val = np.asarray(sol)[gmap[0]]
        lit = np.where(np.asarray(signs) > 0, val, 1.0 - val)
        sat_c = np.zeros(m, bool)
        np.logical_or.at(sat_c, gmap[1], lit > 0.5)
        return bool(sat_c.all())

    for name, gen in gens.items():
        insts = [gen.generate() for _ in range(count)]
        dims = {"vars": [int(i[0]) for i in insts],
                "clauses": [int(i[1]) for i in insts],
                "edges": [int(i[2].shape[1]) for i in insts]}
        t0 = time.time()
        run_insts, orders = (reorder_instances(insts) if use_reorder
                             else (insts, None))
        reorder_s = round(time.time() - t0, 2)
        probe = _pack(run_insts[:1])
        sols, solved, stats = compacting_solve(
            solver, {}, jax.random.PRNGKey(0), run_insts, iters,
            ls_iterations=ls, chunk=chunk, verbose=True)
        if use_reorder:
            # map back to original variable ids and re-verify on the host
            # against the ORIGINAL formula (end-to-end check of the
            # renaming + the on-device verifier)
            for i, (sol, ok) in enumerate(zip(sols, solved)):
                if ok:
                    rs = restore_solution(sol, orders[i])
                    assert _host_verify(insts[i], rs), \
                        f"{name}[{i}]: restored solution fails verification"
        out[name] = {
            "solved": int(sum(solved)),
            "count": count,
            "solved_fraction": sum(solved) / count,
            "wall_s": round(time.time() - t0, 1),
            "reorder_s": reorder_s,
            "reordered": use_reorder,
            "fast_var": bool(probe.fast_var),
            "hybrid_var": bool(probe.hybrid_var),
            "mean_vars": int(np.mean(dims["vars"])),
            "mean_edges": int(np.mean(dims["edges"])),
            "compactions": stats["compactions"],
        }
        print(json.dumps({name: out[name]}), flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)

    if os.environ.get("EVAL_NEURAL", "0") == "1":
        # trained flagship on a smaller modular set at a documented reduced
        # budget (neural iterations at 10k-var scale are ~20x the classical
        # sweep cost; the full 8800 would take hours on one chip)
        import dataclasses
        from pdp_solver_tpu.fg.batch import pack_instances
        from pdp_solver_tpu.train.loss import cnf_evaluate
        from pdp_solver_tpu.train.trainer import SatTrainer
        from pdp_solver_tpu.utils.resilient import resilient_solve
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from train_flagship import CFG
        n_iters = int(os.environ.get("EVAL_NEURAL_ITERS", 1000))
        # the neural probe runs at n=2000: its own 4-flips-per-var budget,
        # NOT the 4*EVAL_N default sized for the 10k classical sets
        ls = int(os.environ.get("EVAL_NEURAL_LS", 8000))
        gen = ModularCNFGenerator(3, 2000, 2000, 0.8, 0.9, 10, 20,
                                  2.5, 2.5, seed=17)
        batch = pack_instances([gen.generate() for _ in range(count)])
        trainer = SatTrainer(CFG, seed=0)
        trainer._load_params(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            "trained-models", "np-nd-np-r3", "best"))
        solver = type(trainer.solver)(dataclasses.replace(
            trainer.solver.cfg, local_search_iterations=ls))
        r_s, r_f = jax.random.split(jax.random.PRNGKey(1))
        state = solver.get_init_state(r_s, batch, randomized=True)
        t0 = time.time()
        pred, _ = resilient_solve(solver, trainer.params, r_f, batch,
                                  state, n_iters, chunk=chunk)
        solved = jax.jit(lambda b, p: cnf_evaluate(b, p)[0])(batch, pred)
        mask = np.asarray(batch.instance_mask)
        out["neural_modular_n2000"] = {
            "iters": n_iters,
            "solved_fraction": float(
                (np.asarray(solved) * mask).sum() / mask.sum()),
            "wall_s": round(time.time() - t0, 1),
        }
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
