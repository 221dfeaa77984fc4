#!/usr/bin/env python
"""On-chip evaluation of the trained np-nd-np flagship at reference budgets.

The reference evaluates its shipped checkpoint at test_recurrence_num 8800
(config/Predict/PDP-prop-decimate-pytorch.yaml); round-1 feedback asked for
the trained model exercised at reference dims AND budgets on the target
hardware. This runs trained vs untrained at EVAL_ITERS (default 2000)
iterations, with and without EVAL_LS WalkSAT iterations, on:

  - the shared 4-SAT headline set (n=100, alpha=9, fingerprint-checked)
  - a sub-threshold 3-SAT set (n=100, alpha=3.5)

Solve loops are chunked (EVAL_CHUNK, default 100) via the resumable
forward(carry=..., finalize=False) API - single long programs crash the
tunneled worker. Run on the TPU (default platform); nothing else may be
using the chip.

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/eval_flagship_tpu.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.train.loss import cnf_evaluate
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.utils.benchdata import make_ksat_set
from pdp_solver_tpu.utils.resilient import resilient_solve

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_full import CFG  # noqa: E402


def solved_fraction_chunked(solver, params, batch, iters, ls_iters,
                            chunk, seed=7):
    """Fraction solved via the fault-tolerant chunked solve
    (utils/resilient.py) + verified prediction."""
    if ls_iters:
        solver = type(solver)(dataclasses.replace(
            solver.cfg, local_search_iterations=ls_iters))
    r_s, r_f = jax.random.split(jax.random.PRNGKey(seed))
    state = solver.get_init_state(r_s, batch, randomized=True)
    t0 = time.time()
    pred, _ = resilient_solve(solver, {} if params is None else params,
                              r_f, batch, state, iters, chunk=chunk)
    # verify INSIDE jit - eager op-by-op execution faults on this backend
    solved = jax.jit(lambda b, p: cnf_evaluate(b, p)[0])(batch, pred)
    mask = np.asarray(batch.instance_mask)
    frac = float((np.asarray(solved) * mask).sum() / mask.sum())
    return frac, time.time() - t0


def main():
    iters = int(os.environ.get("EVAL_ITERS", 2000))
    ls = int(os.environ.get("EVAL_LS", 1000))
    chunk = int(os.environ.get("EVAL_CHUNK", 100))
    which = os.environ.get("EVAL_DIR", "best")
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "trained-models", "np-nd-np-full", which)

    sets = {
        "3sat_n100_a3.5": pack_instances(make_ksat_set(
            seed=21, count=64, n=100, alpha=3.5, k=3)),
        "4sat_headline": pack_instances(make_ksat_set()),
    }

    out = {"iters": iters, "ls": ls, "ckpt": which,
           "backend": jax.default_backend()}
    for tag in ("untrained", "trained"):
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
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "trained-models", "np-nd-np-full",
                        "eval_tpu_report.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
