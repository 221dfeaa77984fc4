#!/usr/bin/env python
"""Evaluate the shipped np-nd-np checkpoint at chosen budgets.

Loads trained-models/np-nd-np-full/<best|last> (or EVAL_DIR) and reports
solved fractions on the shared 4-SAT headline set and a sub-threshold
3-SAT set, with and without WalkSAT, plus the untrained baseline.

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      EVAL_ITERS=300 EVAL_LS=300 python tools/eval_trained.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.utils.benchdata import make_ksat_set

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_full import CFG, solved_fraction  # noqa: E402


def main():
    iters = int(os.environ.get("EVAL_ITERS", 300))
    ls = int(os.environ.get("EVAL_LS", 300))
    which = os.environ.get("EVAL_DIR", "best")
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "trained-models", "np-nd-np-full", which)

    sets = {
        "3sat_n100_a3.5": pack_instances(make_ksat_set(
            seed=21, count=64, n=100, alpha=3.5, k=3)),
        "4sat_headline": pack_instances(make_ksat_set()),
    }

    out = {"iters": iters, "ls": ls, "ckpt": which}
    for tag, load in (("untrained", False), ("trained", True)):
        if tag == "untrained" and os.environ.get("EVAL_SKIP_UNTRAINED"):
            continue
        trainer = SatTrainer(CFG, seed=0)
        if load:
            trainer._load_params(ckpt)
        for name, batch in sets.items():
            out[f"{tag}_{name}_no_ls"] = solved_fraction(
                trainer, batch, iters=iters)
            out[f"{tag}_{name}_ls"] = solved_fraction(
                trainer, batch, iters=iters, ls_iters=ls)
            print(json.dumps(out), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
