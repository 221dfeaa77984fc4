#!/usr/bin/env python
"""Micro-benchmark the segment-reduce backends and the SP iteration on the
current default JAX device. Guides backend selection / Pallas investment.

Usage: python tools/microbench_ops.py [width ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))   # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.modules import common
    from pdp_solver_tpu.modules.propagate import (
        SurveyPropagatorConfig, survey_propagator_apply,
        survey_propagator_init_state)
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    insts = make_ksat_set()
    batch = pack_instances(insts)
    batch = jax.device_put(batch)
    E, V = batch.num_edges, batch.num_vars
    print(f"device={jax.devices()[0]} V={V} F={batch.num_clauses} E={E} "
          f"DV={batch.var_edges.shape[1]} DC={batch.clause_edges.shape[1]}")

    widths = [int(w) for w in sys.argv[1:]] or [1, 3, 150]
    rng = np.random.default_rng(0)
    for w in widths:
        x = jnp.asarray(rng.normal(size=(E, w)).astype(np.float32))
        for mode in ("scatter", "ell"):
            os.environ["PDP_SEGMENT_BACKEND"] = mode
            f = jax.jit(lambda x: common.scatter_to_vars(batch, x))
            t = timeit(f, x)
            gb = E * w * 4 / t / 1e9
            print(f"scatter_to_vars  w={w:4d} {mode:8s} {t*1e6:9.1f} us "
                  f"({gb:6.1f} GB/s read)")

    # one full SP sweep
    cfg = SurveyPropagatorConfig()
    state = survey_propagator_init_state(jax.random.PRNGKey(0), E, True)
    ones = jnp.ones(E)
    for mode in ("scatter", "ell"):
        os.environ["PDP_SEGMENT_BACKEND"] = mode
        f = jax.jit(lambda s: survey_propagator_apply({}, cfg, batch, s, s,
                                                      ones, ones))
        t = timeit(f, state)
        print(f"SP full sweep    {mode:8s} {t*1e6:9.1f} us "
              f"({E/t/1e6:8.1f} M edge-updates/s)")
    os.environ["PDP_SEGMENT_BACKEND"] = "auto"


if __name__ == "__main__":
    main()
