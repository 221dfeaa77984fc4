#!/usr/bin/env python
"""On-chip evaluation of the round-3 trained np-nd-np flagship.

Reference flagship budgets: test_recurrence_num 8800
(config/Train/p-prodec2-gcnf-10-100-pytorch.yaml), WalkSAT 1000. Runs
trained (trained-models/np-nd-np-r3/EVAL_DIR) vs untrained at EVAL_ITERS
iterations, with and without local search, on:

  - a sub-threshold 3-SAT set (n=100, alpha=3.5) — the round-3 done
    criterion asks for >0% solves with NO local search here;
  - the shared 4-SAT headline set (n=100, alpha=9) — criterion: trained
    beats untrained by >= 10pp with LS.

Chunked via the fault-tolerant resumable solve; run on the TPU with
nothing else on the chip.

Usage: PDP_COMPILE_CACHE=... python tools/eval_flagship_r3.py
Env: EVAL_ITERS (8800), EVAL_LS (1000), EVAL_CHUNK (100), EVAL_DIR (best),
     EVAL_COUNT (64), EVAL_SKIP_UNTRAINED, EVAL_SETS (comma list)
"""

import dataclasses
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

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.train.loss import cnf_evaluate
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.utils.benchdata import make_ksat_set
from pdp_solver_tpu.utils.resilient import resilient_solve

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_flagship import CFG  # noqa: E402


def solved_fraction_chunked(solver, params, batch, iters, ls_iters,
                            chunk, seed=7):
    if ls_iters:
        solver = type(solver)(dataclasses.replace(
            solver.cfg, local_search_iterations=ls_iters))
    r_s, r_f = jax.random.split(jax.random.PRNGKey(seed))
    state = solver.get_init_state(r_s, batch, randomized=True)
    t0 = time.time()
    pred, _ = resilient_solve(solver, {} if params is None else params,
                              r_f, batch, state, iters, chunk=chunk)
    solved = jax.jit(lambda b, p: cnf_evaluate(b, p)[0])(batch, pred)
    mask = np.asarray(batch.instance_mask)
    frac = float((np.asarray(solved) * mask).sum() / mask.sum())
    return frac, time.time() - t0


def main():
    iters = int(os.environ.get("EVAL_ITERS", 8800))
    ls = int(os.environ.get("EVAL_LS", 1000))
    chunk = int(os.environ.get("EVAL_CHUNK", 100))
    count = int(os.environ.get("EVAL_COUNT", 64))
    which = os.environ.get("EVAL_DIR", "best")
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                          "trained-models", "np-nd-np-r3")
    ckpt = os.path.join(outdir, which)

    all_sets = {
        "3sat_n100_a3.5": lambda: pack_instances(make_ksat_set(
            seed=21, count=count, n=100, alpha=3.5, k=3)),
        "4sat_headline": lambda: pack_instances(make_ksat_set()),
    }
    wanted = os.environ.get("EVAL_SETS", "")
    names = [s for s in wanted.split(",") if s] or list(all_sets)
    sets = {n: all_sets[n]() for n in names}

    out = {"iters": iters, "ls": ls, "ckpt": which,
           "backend": jax.default_backend()}
    path = os.path.join(outdir, "eval_r3_report.json")
    for tag in ("trained", "untrained"):
        if os.environ.get("EVAL_SKIP_UNTRAINED") and tag == "untrained":
            continue
        trainer = SatTrainer(CFG, seed=0)
        if tag == "trained":
            trainer._load_params(ckpt)
        for name, batch in sets.items():
            for mode, ls_it in (("no_ls", 0), (f"ls{ls}", ls)):
                frac, wall = solved_fraction_chunked(
                    trainer.solver, trainer.params, batch, iters, ls_it,
                    chunk)
                out[f"{tag}_{name}_{mode}"] = round(frac, 4)
                out[f"{tag}_{name}_{mode}_wall_s"] = round(wall, 1)
                print(json.dumps(out), flush=True)
                with open(path, "w") as f:
                    json.dump(out, f, indent=2)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
