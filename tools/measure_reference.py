#!/usr/bin/env python
"""Measure the reference PDP-Solver (torch CPU) on the shared benchmark set.

The reference repo publishes no numbers (SURVEY.md section 6), so the
baseline is measured here once and stored in baselines/reference_measured.json
for bench.py's vs_baseline ratio.

Run:  env -u PALLAS_AXON_POOL_IPS python tools/measure_reference.py [iters]

Notes: runs the reference in-place from /root/reference/src (no code copied);
one method is monkeypatched because torch>=2 rejects the aliased index-write
in its termination check (trainer.py:150-162) - semantics identical.
"""

import json
import logging
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, "/root/reference/src")

import numpy as np
import torch

from pdp_solver_tpu.utils.benchdata import (
    make_ksat_set, dataset_fingerprint, write_json)


def patched_termination(self, active, prediction, sat_problem):
    output, _ = self._cnf_evaluator(
        variable_prediction=prediction[0], graph_map=sat_problem._graph_map,
        batch_variable_map=sat_problem._batch_variable_map,
        batch_function_map=sat_problem._batch_function_map,
        edge_feature=sat_problem._edge_feature,
        meta_data=sat_problem._meta_data)
    idx = active[:, 0].clone().bool()
    if sat_problem._batch_replication > 1:
        real = torch.mm(sat_problem._replication_mask_tuple[1],
                        (output > 0.5).float())
        dup = torch.mm(sat_problem._replication_mask_tuple[0],
                       (real == 0).float())
        active[idx, 0] = (dup[idx, 0] > 0).to(active.dtype)
    else:
        active[idx, 0] = (output[idx, 0] <= 0.5).to(active.dtype)


def run_reference(json_path, iters, ls_iters, out_path):
    from pdp.trainer import SatFactorGraphTrainer
    torch.manual_seed(0)
    np.random.seed(0)
    config = {
        "model_type": "p-d-p", "model_name": "sp-ref", "tolerance": 0.02,
        "t_max": 100, "model_path": None, "hidden_dim": 3,
        "local_search_iteration": ls_iters, "epsilon": 0.5, "verbose": False,
        "error_dim": 1, "exploration": 0, "dropout": 0,
        "test_recurrence_num": iters, "batch_size": 5000,
        "test_batch_limit": 40000000, "max_cache_size": 100000,
        "batch_replication": 1, "random_seed": 0, "loss_sharpness": 5,
    }
    logging.basicConfig(level=logging.ERROR)
    t = SatFactorGraphTrainer(config=config, use_cuda=False,
                              logger=logging.getLogger("ref"))
    t._check_recurrence_termination = types.MethodType(patched_termination, t)
    with open(out_path, "w") as out:
        t0 = time.time()
        t.predict(test_list=json_path, out_file=out, import_path_base=None,
                  post_processor=t._post_process_predictions,
                  batch_replication=1)
        wall = time.time() - t0
    rows = [json.loads(l) for l in open(out_path) if l.strip()]
    solved = sum(r["solved"] for r in rows)
    return wall, solved, len(rows)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    ls_iters = 1000
    insts = make_ksat_set()
    total_edges = sum(i[2].shape[1] for i in insts)
    fp = dataset_fingerprint(insts)

    os.makedirs("/tmp/refbench", exist_ok=True)
    json_path = "/tmp/refbench/bench_4sat.json"
    write_json(insts, json_path)

    # headline: the full budget with walksat post-processing
    w_hi, solved, n = run_reference(json_path, iters, ls_iters,
                                    "/tmp/refbench/out_hi.json")
    # per-iteration slope with walksat off and budgets small enough that
    # instances stay active (isolates the PDP iteration cost)
    w_a, _, _ = run_reference(json_path, 50, 0, "/tmp/refbench/out_a.json")
    w_b, _, _ = run_reference(json_path, 150, 0, "/tmp/refbench/out_b.json")
    per_iter = max((w_b - w_a) / 100.0, 1e-9)
    result = {
        "dataset": {"seed": 0, "count": n, "n": 100, "alpha": 9.0, "k": 4,
                    "fingerprint": fp, "total_edges": int(total_edges)},
        "iters": iters,
        "local_search_iters": ls_iters,
        "wall_s": w_hi,
        "instances_per_sec": n / w_hi,
        "per_iteration_s": per_iter,
        "edge_updates_per_sec": total_edges / per_iter,
        "solved": int(solved),
        "solved_fraction": solved / n,
        "hardware": "cpu (torch %s)" % torch.__version__,
    }
    base_dir = os.path.join(os.path.dirname(__file__), "..", "baselines")
    os.makedirs(base_dir, exist_ok=True)
    with open(os.path.join(base_dir, "reference_measured.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
