#!/usr/bin/env python
"""np-d-np at its reference operating point: easy/medium 3-SAT bands.

The reference ships np-d-np evaluated on easy 3-SAT sets (cnf-10..80)
at test_recurrence_num 20 (config/Train/p-prodec2-ndec-cnf-3-10-pytorch
.yaml) — NOT the hard 4-SAT headline where greedy decimation mistakes
conflict instances out. This records the trained-vs-untrained comparison
on those bands (decimation only, no local search — the pure scorer
signal), appended to docs/r5_solver_table.json as `np_d_np_3sat`.

Usage (chip otherwise idle): python tools/eval_npdnp_3sat.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pdp_solver_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import numpy as np

from train_family import BASE, FAMILY, solved_fraction
from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.fg.generators import UniformCNFGenerator
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.utils.benchdata import make_ksat_set

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "docs", "r5_solver_table.json")


def main():
    cfg = dict(BASE, model_type="np-d-np", model_name="np-d-np-r4",
               **FAMILY["np-d-np"])
    easy_gen = UniformCNFGenerator(6, 20, 3, 3, 2.0, 3.0, seed=123)
    easy = jax.device_put(pack_instances(
        [easy_gen.generate() for _ in range(64)]))
    med = jax.device_put(pack_instances(make_ksat_set(
        seed=29, count=48, n=60, alpha=3.5, k=3)))

    block = {"protocol": "decimation only (no local search), iters "
                         "100 easy / 300 medium, seed 7",
             "easy_band": "uniform 3-SAT n in [6,20], alpha in [2,3]",
             "med_band": "uniform 3-SAT n=60, alpha=3.5"}
    for tag, load in (("trained", True), ("untrained", False)):
        t = SatTrainer(cfg, seed=0)
        if load:
            t._load_params(os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "..",
                "trained-models", "np-d-np-r4", "best"))
        block[tag] = {
            "easy_solved": round(solved_fraction(t, easy, iters=100), 4),
            "med_solved": round(solved_fraction(t, med, iters=300), 4),
        }
        print(json.dumps({tag: block[tag]}), flush=True)

    with open(OUT) as f:
        out = json.load(f)
    out["np_d_np_3sat"] = block
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
