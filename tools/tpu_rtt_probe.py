#!/usr/bin/env python
"""Measure tunnel D2H costs that bound the chunked solve's per-chunk
overhead: small flag reads (per chunk), full state pulls (mirror /
compaction), and whether batching/flat-packing helps.

Run on the chip when otherwise idle:  python tools/tpu_rtt_probe.py
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
import jax.numpy as jnp
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from pdp_solver_tpu.solvers.compact import _compact_fns
from pdp_solver_tpu.utils.benchdata import make_ksat_set


def t_min(f, reps=8):
    f()
    walls = []
    for _ in range(reps):
        t0 = time.time()
        f()
        walls.append(time.time() - t0)
    return min(walls)


def main():
    out = {"backend": jax.default_backend()}
    insts = make_ksat_set()
    batch = jax.device_put(pack_instances(insts))
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=0.08, t_max=50,
        local_search_iterations=0, epsilon=0.5, simplify_rounds=1))
    state = solver.get_init_state(jax.random.PRNGKey(0), batch,
                                  randomized=True)
    first_fn, step_fn, _ = _compact_fns(solver)
    r = jax.random.PRNGKey(1)
    state2, carry, sv = first_fn({}, r, batch, state, 5)
    jax.block_until_ready(sv)

    small = carry[1]            # [B] active flags
    out["read_small_ms"] = round(t_min(
        lambda: np.asarray(small)) * 1e3, 2)
    out["read_two_small_ms"] = round(t_min(
        lambda: (np.asarray(carry[1]), np.asarray(sv))) * 1e3, 2)
    stacked = jax.jit(lambda a, b: jnp.stack([a, b]))
    st = stacked(carry[1], sv)
    jax.block_until_ready(st)
    out["read_stacked_pair_ms"] = round(t_min(
        lambda: np.asarray(stacked(carry[1], sv))) * 1e3, 2)

    # full carry pull (the mirror / compaction path)
    n_leaves = len(jax.tree_util.tree_leaves((state2, carry)))
    total_bytes = sum(x.nbytes for x in
                      jax.tree_util.tree_leaves((state2, carry)))
    out["state_leaves"] = n_leaves
    out["state_mbytes"] = round(total_bytes / 2**20, 1)
    out["pull_tree_ms"] = round(t_min(
        lambda: jax.tree_util.tree_map(np.asarray, (state2, carry)),
        reps=4) * 1e3, 1)
    out["pull_device_get_ms"] = round(t_min(
        lambda: jax.device_get((state2, carry)), reps=4) * 1e3, 1)

    # flat-packed pull: one device concat + one transfer
    leaves = jax.tree_util.tree_flatten((state2, carry))[0]
    f32 = [x for x in leaves if x.dtype == jnp.float32]
    pack = jax.jit(lambda *ls: jnp.concatenate(
        [jnp.ravel(x) for x in ls]))
    packed = pack(*f32)
    jax.block_until_ready(packed)
    out["pull_flatpack_ms"] = round(t_min(
        lambda: np.asarray(pack(*f32)), reps=4) * 1e3, 1)

    # dispatch-only cost of one 5-iteration chunk (warm)
    def chunk():
        _, c2, s2 = step_fn({}, r, batch, state2, carry, 5)
        np.asarray(s2)
    out["chunk5_plus_read_ms"] = round(t_min(chunk, reps=4) * 1e3, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
