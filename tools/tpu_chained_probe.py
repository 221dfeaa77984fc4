#!/usr/bin/env python
"""Isolated on-chip compile check for the chained edge-pass kernel."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
    import jax
    import jax.numpy as jnp

    from pdp_solver_tpu.fg.batch import pack_instances
    import importlib
    S = importlib.import_module("pdp_solver_tpu.problem.simplify")
    from pdp_solver_tpu.problem.state import init_problem_state
    from tests.helpers import cnf_instance, random_ksat

    k = int(os.environ.get("PROBE_K", "4"))
    rng = np.random.default_rng(0)
    insts = [cnf_instance(256, random_ksat(rng, 256, 512, k=k))
             for _ in range(2)]
    batch = jax.device_put(pack_instances(insts))
    print(json.dumps({"E": batch.num_edges, "k": batch.clause_width,
                      "fast": [bool(batch.fast_var),
                               bool(batch.fast_clause)]}), flush=True)
    what = os.environ.get("PROBE_WHAT", "round")
    if what == "round":
        p0 = init_problem_state(batch)
        st, ch = jax.jit(lambda p: S._fused_round(batch, p))(p0)
        print("round ok", float(jnp.sum(st.active_vars)), bool(ch),
              flush=True)
    elif what == "sweep":
        from pdp_solver_tpu.modules.propagate import (
            SurveyPropagatorConfig, survey_propagator_apply,
            survey_propagator_init_state)
        cfg = SurveyPropagatorConfig()
        ps = survey_propagator_init_state(jax.random.PRNGKey(1),
                                          batch.num_edges, True)
        ones = jnp.ones(batch.num_edges)
        out = jax.jit(lambda s: survey_propagator_apply(
            {}, cfg, batch, s, s, ones * batch.edge_mask, ones))(ps)
        print("sweep ok", float(jnp.sum(out.fn[0])), flush=True)
    elif what == "walksat":
        from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
        solver = PDPSolver(SolverConfig(model_type="walk-sat",
                                        local_search_iterations=5,
                                        epsilon=0.5))
        p0 = init_problem_state(batch)
        pred0 = 0.5 * jnp.ones((batch.num_vars, 1))
        out = jax.jit(lambda p: solver._local_search(
            jax.random.PRNGKey(2), batch, p, pred0, 1, 5))(p0)
        print("walksat ok", float(jnp.sum(out)), flush=True)


if __name__ == "__main__":
    main()
