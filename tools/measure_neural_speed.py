#!/usr/bin/env python
"""Neural-solver (np-nd-np) inference speed: reference torch vs this framework.

Uses untrained weights at the reference's published dims (hidden 150,
config/Train/p-prodec2-gcnf-10-100-pytorch.yaml) - identical compute to a
trained model, so wall time is comparable without training first. Shares the
deterministic 4-SAT set with bench.py.

Run ours:      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                   python tools/measure_neural_speed.py ours [iters]
Run reference: env -u PALLAS_AXON_POOL_IPS \
                   python tools/measure_neural_speed.py reference [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from pdp_solver_tpu.utils.benchdata import make_ksat_set, write_json

DIMS = dict(hidden=150, mem_hidden=100, agg_hidden=100, mem_agg=50,
            classifier=50)


def run_ours(iters):
    import jax
    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.train.loss import cnf_evaluate
    import jax.numpy as jnp

    insts = make_ksat_set()
    batch = jax.device_put(pack_instances(insts))
    solver = PDPSolver(SolverConfig(
        model_type="np-nd-np", hidden_dim=DIMS["hidden"],
        mem_hidden_dim=DIMS["mem_hidden"], agg_hidden_dim=DIMS["agg_hidden"],
        mem_agg_hidden_dim=DIMS["mem_agg"], classifier_dim=DIMS["classifier"],
        local_search_iterations=100, epsilon=0.5))
    params = solver.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    state = solver.get_init_state(key, batch, True)

    def f(p, r, b, s):
        (pred, _), _ = solver.forward(p, r, b, s, iters, is_training=False,
                                      check_termination=True)
        sv, _ = cnf_evaluate(b, pred)
        return jnp.sum(sv * b.instance_mask)

    jf = jax.jit(f)
    int(jf(params, key, batch, state))            # compile
    t0 = time.time()
    solved = int(jf(params, key, batch, state))
    wall = time.time() - t0
    return wall, solved, len(insts)


def run_reference(iters):
    sys.path.insert(0, "/root/reference/src")
    import logging
    import types
    import torch
    from pdp.trainer import SatFactorGraphTrainer
    from measure_reference import patched_termination

    torch.manual_seed(0)
    np.random.seed(0)
    insts = make_ksat_set()
    os.makedirs("/tmp/refbench", exist_ok=True)
    write_json(insts, "/tmp/refbench/bench_4sat.json")
    config = {
        "model_type": "np-nd-np", "model_name": "np-ref",
        "edge_feature_dim": 1, "meta_feature_dim": 0, "prediction_dim": 1,
        "hidden_dim": DIMS["hidden"], "mem_hidden_dim": DIMS["mem_hidden"],
        "agg_hidden_dim": DIMS["agg_hidden"],
        "mem_agg_hidden_dim": DIMS["mem_agg"],
        "classifier_dim": DIMS["classifier"], "model_path": None,
        "local_search_iteration": 100, "epsilon": 0.5, "verbose": False,
        "error_dim": 1, "exploration": 0, "dropout": 0,
        "test_recurrence_num": iters, "batch_size": 5000,
        "test_batch_limit": 40000000, "max_cache_size": 100000,
        "batch_replication": 1, "random_seed": 0, "loss_sharpness": 5,
    }
    logging.basicConfig(level=logging.ERROR)
    t = SatFactorGraphTrainer(config=config, use_cuda=False,
                              logger=logging.getLogger("ref"))
    t._check_recurrence_termination = types.MethodType(patched_termination, t)
    with open("/tmp/refbench/np_out.json", "w") as out:
        t0 = time.time()
        t.predict(test_list="/tmp/refbench/bench_4sat.json", out_file=out,
                  import_path_base=None,
                  post_processor=t._post_process_predictions,
                  batch_replication=1)
        wall = time.time() - t0
    rows = [json.loads(l) for l in open("/tmp/refbench/np_out.json")
            if l.strip()]
    return wall, sum(r["solved"] for r in rows), len(rows)


if __name__ == "__main__":
    which = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    wall, solved, n = (run_ours if which == "ours" else run_reference)(iters)
    print(json.dumps({"impl": which, "iters": iters, "wall_s": round(wall, 2),
                      "instances": n, "solved": solved,
                      "instances_per_sec": round(n / wall, 3)}))
