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

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from pdp_solver_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax

from pdp_solver_tpu.solvers.compact import compacting_solve
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.utils.benchdata import make_ksat_set

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_flagship import CFG  # noqa: E402


def solved_fraction_chunked(solver, params, insts, iters, ls_iters,
                            chunk, seed=7):
    """Verified solved fraction through the compacting chunked solve:
    solved instances are harvested and the survivors repacked, so an 8800
    iteration budget only pays full cost while instances remain active."""
    t0 = time.time()
    _, solved, _ = compacting_solve(
        solver, {} if params is None else params, jax.random.PRNGKey(seed),
        insts, iters, ls_iterations=ls_iters, chunk=chunk, mirror_every=8)
    return sum(solved) / len(insts), time.time() - t0


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
        "3sat_n100_a3.5": lambda: make_ksat_set(
            seed=21, count=count, n=100, alpha=3.5, k=3),
        "4sat_headline": lambda: make_ksat_set(),
    }
    wanted = os.environ.get("EVAL_SETS", "")
    names = [s for s in wanted.split(",") if s] or list(all_sets)
    sets = {n: all_sets[n]() for n in names}

    out = {"iters": iters, "ls": ls, "ckpt": which,
           "backend": jax.default_backend()}
    path = os.environ.get("EVAL_REPORT") or os.path.join(
        outdir, "eval_r3_report.json")
    # merge: targeted reruns (EVAL_SETS/EVAL_MODES/EVAL_SKIP_*) must keep
    # the rows they did not recompute
    if os.path.exists(path) and os.environ.get("EVAL_MERGE", "1") == "1":
        with open(path) as f:
            prev = json.load(f)
        for k, v in prev.items():
            out.setdefault(k, v)
    for tag in ("trained", "untrained"):
        if os.environ.get("EVAL_SKIP_UNTRAINED") and tag == "untrained":
            continue
        if os.environ.get("EVAL_SKIP_TRAINED") and tag == "trained":
            continue
        trainer = SatTrainer(CFG, seed=0)
        if tag == "trained":
            trainer._load_params(ckpt)
        for name, insts in sets.items():
            mode_filter = [m for m in
                           os.environ.get("EVAL_MODES", "").split(",") if m]
            for mode, ls_it in (("no_ls", 0), (f"ls{ls}", ls)):
                if mode_filter and not any(
                        mode.startswith(m) for m in mode_filter):
                    continue
                frac, wall = solved_fraction_chunked(
                    trainer.solver, trainer.params, insts, iters, ls_it,
                    chunk)
                out[f"{tag}_{name}_{mode}"] = round(frac, 4)
                out[f"{tag}_{name}_{mode}_wall_s"] = round(wall, 1)
                print(json.dumps(out), flush=True)
                with open(path, "w") as f:
                    json.dump(out, f, indent=2)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
