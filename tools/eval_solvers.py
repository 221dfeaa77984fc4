#!/usr/bin/env python
"""Solver-family quality table: every reference solver assembly at the
1000-iteration budget on the shared 4-SAT headline set (verified solved
fraction), VERDICT r3 #6.

Rows: p-d-p (classical SP decimation), walk-sat (local search only),
reinforce (distributed decimation), np-nd-np (trained r3 flagship),
p-nd-np / np-d-np (trained r4 family checkpoints when present, else
untrained-init rows marked as such).

Reference assemblies: src/pdp/nn/solver.py:517-637; classical predict
settings from config/Predict/*.yaml (tolerance 0.02, t_max 100, pi 0.01,
decimation_probability 0.5, local_search_iteration 1000, epsilon 0.5).

Usage (TPU): python tools/eval_solvers.py [rows]
Writes docs/r4_solver_table.json (merging over existing rows).
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

from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from pdp_solver_tpu.solvers.compact import compacting_solve
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.utils.benchdata import make_ksat_set

HERE = os.path.dirname(os.path.abspath(__file__))
MODELS = os.path.join(HERE, "..", "trained-models")
# round-5 default: 3 seeds per row (the ±5pp basin spread makes
# single-seed family orderings noise, VERDICT r4 #8)
OUT = os.environ.get("EVAL_OUT") or os.path.join(
    HERE, "..", "docs", "r5_solver_table.json")

NEURAL_DIMS = dict(
    prediction_dim=1, dropout=0.2, randomized=True, epsilon=0.5)

ROWS = {
    "p-d-p": dict(kind="classical", cfg=dict(
        model_type="p-d-p", tolerance=0.02, t_max=100, epsilon=0.5)),
    "walk-sat": dict(kind="classical", cfg=dict(
        model_type="walk-sat", epsilon=0.5)),
    "reinforce": dict(kind="classical", cfg=dict(
        model_type="reinforce", pi=0.01, decimation_probability=0.5,
        epsilon=0.5)),
    "np-nd-np": dict(kind="neural", ckpt="np-nd-np-r3", train_cfg=dict(
        model_type="np-nd-np", model_name="np-nd-np-r3",
        hidden_dim=150, mem_hidden_dim=100, agg_hidden_dim=100,
        mem_agg_hidden_dim=50, classifier_dim=50, **NEURAL_DIMS)),
    "p-nd-np": dict(kind="neural", ckpt="p-nd-np-r4", train_cfg=dict(
        model_type="p-nd-np", model_name="p-nd-np-r4",
        hidden_dim=150, mem_hidden_dim=50, agg_hidden_dim=50,
        mem_agg_hidden_dim=50, classifier_dim=50, has_meta_data=True,
        **NEURAL_DIMS)),
    "np-d-np": dict(kind="neural", ckpt="np-d-np-r4", train_cfg=dict(
        model_type="np-d-np", model_name="np-d-np-r4",
        hidden_dim=150, mem_hidden_dim=100, agg_hidden_dim=100,
        mem_agg_hidden_dim=50, classifier_dim=50, tolerance=0.02, t_max=10,
        **NEURAL_DIMS)),
    # control row: the same assembly at its random init (ckpt dir that
    # never exists), so "trained beats untrained self" is evidenced in
    # the same table (VERDICT r4 next-step #2)
    "np-d-np-untrained": dict(kind="neural", ckpt="np-d-np-none",
                              train_cfg=dict(
        model_type="np-d-np", model_name="np-d-np-none",
        hidden_dim=150, mem_hidden_dim=100, agg_hidden_dim=100,
        mem_agg_hidden_dim=50, classifier_dim=50, tolerance=0.02, t_max=10,
        **NEURAL_DIMS)),
}


def main():
    which = (sys.argv[1].split(",") if len(sys.argv) > 1 else list(ROWS))
    iters = int(os.environ.get("EVAL_ITERS", "1000"))
    ls = int(os.environ.get("EVAL_LS", "1000"))
    chunk = int(os.environ.get("EVAL_CHUNK", "50"))
    seeds = int(os.environ.get("EVAL_SEEDS", "3"))
    insts = make_ksat_set()
    count = len(insts)

    out = {"iters": iters, "ls": ls, "count": count,
           "backend": jax.default_backend(), "rows": {}}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out["rows"] = json.load(f).get("rows", {})

    for name in which:
        spec = ROWS[name]
        params = {}
        trained = None
        if spec["kind"] == "classical":
            solver = PDPSolver(SolverConfig(
                local_search_iterations=ls, **spec["cfg"]))
        else:
            trainer = SatTrainer(dict(spec["train_cfg"],
                                      local_search_iteration=ls,
                                      test_recurrence_num=iters), seed=0)
            ckpt = os.path.join(MODELS, spec["ckpt"], "best")
            # the trainer creates the directory at launch; only a .npz
            # means a checkpoint was actually written
            trained = os.path.exists(os.path.join(
                ckpt, spec["ckpt"] + ".npz"))
            if trained:
                trainer._load_params(ckpt)
            else:
                print(f"[{name}] no checkpoint at {ckpt}: untrained row",
                      flush=True)
            import dataclasses
            solver = type(trainer.solver)(dataclasses.replace(
                trainer.solver.cfg, local_search_iterations=ls))
            params = trainer.params

        rows = []
        for seed in range(seeds):
            r = jax.random.split(jax.random.PRNGKey(seed))[1]
            t0 = time.time()
            _, solved, stats = compacting_solve(
                solver, params, r, insts, iters,
                ls_iterations=ls, chunk=chunk,
                min_edges=131072, mirror_every=8)
            rows.append({"seed": seed, "solved": int(sum(solved)),
                         "wall_s": round(time.time() - t0, 1)})
            print(json.dumps({"row": name, **rows[-1]}), flush=True)
        out["rows"][name] = {
            "kind": spec["kind"],
            "trained": trained,
            "solved_fraction": round(
                float(np.mean([r["solved"] for r in rows])) / count, 4),
            "solved_seeds": [r["solved"] for r in rows],
            "wall_s": [r["wall_s"] for r in rows],
        }
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({name: out["rows"][name]}), flush=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
