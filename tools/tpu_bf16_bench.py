#!/usr/bin/env python
"""On-chip f32 vs bf16 comparison for the neural np-nd-np solver.

Measures the per-iteration cost of the fully-neural forward pass (the
aggregator/GRU/classifier compute is where the MXU time is) at reference
dims (hidden 150) on a realistic packed batch, under compute_dtype float32
vs bfloat16, plus output agreement. Prints one JSON line and appends the
row to docs/profile_phases.json-style output on stdout only.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn):
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    out = fn()
    leaves = jax.tree_util.tree_leaves(out)
    s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves
            if hasattr(x, "astype"))
    float(s)
    return time.time() - t0


def slope(fn, lo, hi):
    fn(lo), fn(hi)
    timed(lambda: fn(lo))
    ds = []
    for _ in range(3):
        t1 = timed(lambda: fn(lo))
        t2 = timed(lambda: fn(hi))
        ds.append(max((t2 - t1) / (hi - lo), 0.0))
    ds.sort()
    return ds[1]


def main():
    import jax
    import jax.numpy as jnp

    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    # moderate batch: 32 x 4-SAT n=100 (E = 115k real / 131k padded)
    insts = make_ksat_set(seed=5, count=32, n=100, alpha=9.0, k=4)
    batch = jax.device_put(pack_instances(insts))
    key = jax.random.PRNGKey(0)
    res = {"backend": jax.default_backend(),
           "shapes": {"E": batch.num_edges, "V": batch.num_vars}}

    preds = {}
    for dtype in ("float32", "bfloat16"):
        solver = PDPSolver(SolverConfig(
            model_type="np-nd-np", hidden_dim=150, mem_hidden_dim=100,
            agg_hidden_dim=100, mem_agg_hidden_dim=50, classifier_dim=50,
            compute_dtype=dtype))
        params = solver.init_params(jax.random.PRNGKey(0))
        state = solver.get_init_state(jax.random.PRNGKey(1), batch,
                                      randomized=True)

        @partial(jax.jit, static_argnums=0)
        def fwd_n(n, params, state):
            (pred, _), st = solver.forward(
                params, key, batch, state, n,
                is_training=False, check_termination=False)
            return pred, st

        per_iter = slope(lambda n: fwd_n(n, params, state), 2, 10)
        preds[dtype] = np.asarray(fwd_n(4, params, state)[0])
        res[f"{dtype}_iter_ms"] = round(per_iter * 1e3, 3)

    res["speedup_bf16"] = round(
        res["float32_iter_ms"] / max(res["bfloat16_iter_ms"], 1e-9), 2)
    res["pred_max_abs_diff"] = round(
        float(np.abs(preds["float32"] - preds["bfloat16"]).max()), 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
