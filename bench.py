#!/usr/bin/env python
"""Headline benchmark: classical SP-guided decimation on uniform random 4-SAT.

Runs the full p-d-p solve (SP propagation + sequential decimation +
simplification + termination + WalkSAT) on the shared deterministic 4-SAT set
(BASELINE.json config #1/#5 operating point) on whatever accelerator JAX
reports, and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline compares against the measured reference implementation (torch,
CPU - the repo ships no GPU and publishes no numbers; see
tools/measure_reference.py and baselines/reference_measured.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    # persistent compilation cache: the bench's program ladder is
    # deterministic, so every run after the first starts warm (the cold
    # warm-up was 178s of pure recompilation, BENCH_r02.json)
    from pdp_solver_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.train.loss import cnf_evaluate
    from pdp_solver_tpu.utils.benchdata import (
        make_ksat_set, dataset_fingerprint)

    iters = int(os.environ.get("BENCH_ITERS", "1000"))
    ls_iters = int(os.environ.get("BENCH_LS_ITERS", "1000"))
    # chunk very long budgets into bounded program executions (resumable
    # solve); 0 = single program. Defaults to 100-iteration chunks on TPU
    # where extremely long-running single programs can trip device limits.
    default_chunk = "50" if jax.default_backend() == "tpu" else "0"
    chunk = int(os.environ.get("BENCH_CHUNK", default_chunk))

    insts = make_ksat_set()
    total_edges = sum(i[2].shape[1] for i in insts)
    count = len(insts)
    batch = pack_instances(insts)

    # solver operating point, validated on three disjoint instance seeds
    # (docs/PERFORMANCE.md): the reference's argmax decimation rule, a
    # looser convergence tolerance (0.05 solves 79-88/128 across seeds vs
    # 74-81 at the reference's 0.02, at equal-or-less wall), plus the
    # restart schedule and compaction below. The banded multi-variable
    # decimation (BENCH_DEC_THETA < 1) is faster per solve but lost
    # held-out validation on solved count and is off by default.
    theta = float(os.environ.get("BENCH_DEC_THETA", "1.0"))
    guard = float(os.environ.get("BENCH_DEC_GUARD", "0"))
    tol = float(os.environ.get("BENCH_TOL", "0.05"))
    # lazy simplification: cap post-decimation simplify rounds per
    # iteration (deferred propagation, problem/simplify.py). Default 1,
    # validated at the full protocol on-chip: solved 77/128 vs 78 at the
    # exact fixed point (within the measured seed-basin variance) with the
    # per-iteration slope cut 53.5 -> 24.6 ms (docs/tpu_r3_probe.json,
    # docs/PERFORMANCE.md). The reference_settings row below keeps the
    # reference's exact fixed-point semantics (srounds=0).
    srounds = int(os.environ.get("BENCH_SIMPLIFY_ROUNDS", "1"))
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=tol, t_max=100,
        local_search_iterations=ls_iters, epsilon=0.5,
        decimation_threshold=theta, decimation_guard=guard,
        simplify_rounds=srounds))

    def solve(rng, batch, state, n_iters):
        (pred, _), _ = solver.forward(
            {}, rng, batch, state, n_iters,
            is_training=False, check_termination=True)
        # evaluate INSIDE jit: some PJRT backends fault on eager op-by-op
        # execution, and the verifier belongs in the compiled program anyway
        solved_v, _ = cnf_evaluate(batch, pred)
        return pred, jnp.sum(solved_v * batch.instance_mask)

    def solve_step(rng, batch, state, carry, n_iters):
        _, state, carry = solver.forward(
            {}, rng, batch, state, n_iters,
            is_training=False, check_termination=True,
            carry=carry, finalize=False)
        return state, carry

    def solve_final(rng, batch, state, carry):
        (pred, _), _ = solver.forward(
            {}, rng, batch, state, 0,
            is_training=False, check_termination=True,
            carry=carry, finalize=True)
        solved_v, _ = cnf_evaluate(batch, pred)
        return pred, jnp.sum(solved_v * batch.instance_mask)

    def solve_chunked(rng, batch, state, n_iters, chunk_size):
        carry = None
        done = 0
        while done < n_iters:
            rng, r = jax.random.split(rng)
            state, carry = step_fn(r, batch, state, carry,
                                   min(chunk_size, n_iters - done)) \
                if carry is not None else first_fn(
                    r, batch, state, min(chunk_size, n_iters - done))
            done += chunk_size
        rng, r = jax.random.split(rng)
        return final_fn(r, batch, state, carry)

    key = jax.random.PRNGKey(0)
    r_state, r_fwd = jax.random.split(key)
    state = solver.get_init_state(r_state, batch, randomized=True)

    batch = jax.device_put(batch)
    # the chunked programs are defined unconditionally (jit compiles
    # lazily, so this is free): the mid-run retry path falls back to
    # solve_chunked even when the original run was unchunked
    first_fn = jax.jit(
        lambda r, b, s, n: solve_step(r, b, s, None, n),
        static_argnames="n")
    step_fn = jax.jit(solve_step, static_argnames="n_iters")
    final_fn = jax.jit(solve_final)
    if chunk > 0:
        fwd = lambda r, b, s, n: solve_chunked(r, b, s, n, chunk)
    else:
        fwd = jax.jit(solve, static_argnames="n_iters")

    # progressive batch compaction (solvers/compact.py): solved instances
    # are harvested and the live set repacked into smaller static buckets
    # at chunk boundaries, so the late solve stops paying for finished
    # instances. Deterministic given the rng key, so repeated runs hit the
    # same bucket ladder (compiled once in the warm-up run).
    use_compact = os.environ.get("BENCH_COMPACT", "1") != "0"
    if use_compact:
        from pdp_solver_tpu.solvers.compact import compacting_solve

        # restart schedule: the budgets of the attempts sum to exactly the
        # protocol budgets (iters, ls_iters); unsolved instances re-enter
        # with a fresh message init (solve quality depends strongly on the
        # init basin - see tools/eps_study.py / docs/PERFORMANCE.md)
        sched_env = os.environ.get("BENCH_SCHEDULE", "0.5,0.5")
        fracs = [float(x) for x in sched_env.split(",") if x]
        schedule = [(max(int(iters * f), 1), max(int(ls_iters * f), 1))
                    for f in fracs]
        # rounding must never exceed the protocol budgets
        over_i = sum(s[0] for s in schedule) - iters
        over_l = sum(s[1] for s in schedule) - ls_iters
        if over_i > 0 or over_l > 0:
            schedule[-1] = (schedule[-1][0] - max(over_i, 0),
                            schedule[-1][1] - max(over_l, 0))
        # splitting a small budget starves every attempt (decimation needs
        # ~150+ iterations to engage at the bench operating point)
        if min(s[0] for s in schedule) < 200:
            schedule = None

        # deeper ladders help more but each bucket shape is a remote
        # compile on the tunneled TPU; stop earlier there
        min_edges = int(os.environ.get(
            "BENCH_MIN_EDGES",
            "131072" if jax.default_backend() == "tpu" else "32768"))
        # the fault-tolerance mirror copies the full solver state+carry
        # device->host; over the tunneled TPU link that is a multi-second
        # tax when taken every 50-iteration chunk, so mirror sparsely there
        # (a fault then re-runs at most mirror_every chunks - still cheap)
        mirror_every = int(os.environ.get(
            "BENCH_MIRROR_EVERY",
            "8" if jax.default_backend() == "tpu" else "1"))

        def compact_run():
            _, solved_list, stats = compacting_solve(
                solver, {}, r_fwd, insts, iters,
                ls_iterations=ls_iters, chunk=chunk or 50,
                min_edges=min_edges, schedule=schedule,
                mirror_every=mirror_every)
            return sum(solved_list), stats

    # warm-up: compile every distinct program the timed run will execute,
    # including the remainder-sized chunk when iters % chunk != 0 and the
    # compaction bucket ladder (a compile inside the timed region would
    # inflate the wall time)
    t0 = time.time()
    if use_compact:
        try:
            warm_solved, warm_stats = compact_run()
        except Exception:
            # never let the compaction path take the whole benchmark down:
            # revert to the plain chunked solve (compiled below)
            use_compact = False
    if use_compact:
        pass
    elif chunk > 0:
        st_w, carry_w = first_fn(r_fwd, batch, state, min(chunk, iters))
        if iters > chunk:
            st_w, carry_w = step_fn(r_fwd, batch, st_w, carry_w, chunk)
            rem = iters % chunk
            if rem:
                step_fn(r_fwd, batch, st_w, carry_w, rem)
        jax.block_until_ready(final_fn(r_fwd, batch, st_w, carry_w)[0])
    else:
        jax.block_until_ready(fwd(r_fwd, batch, state, iters)[0])
    compile_and_first = time.time() - t0

    # timed full solve, repeated BENCH_REPEATS times (median wall) to defend
    # the headline against tunnel wall-clock variance; the sync point is the
    # device->host transfer of the solved count (block_until_ready has
    # unreliable semantics on some PJRT tunnels). One retry with half-size
    # chunks if the device objects mid-run.
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    walls = []
    solved = 0
    compact_stats = None
    for rep in range(max(repeats, 1)):
        try:
            t0 = time.time()
            if use_compact:
                solved, compact_stats = compact_run()
            else:
                pred, solved_dev = fwd(r_fwd, batch, state, iters)
                solved = int(solved_dev)
            walls.append(time.time() - t0)
        except Exception:
            chunk = max(chunk // 2, 10) if chunk else 25
            use_compact = False
            fwd = lambda r, b, s, n: solve_chunked(r, b, s, n, chunk)
            t0 = time.time()
            pred, solved_dev = fwd(r_fwd, batch, state, iters)
            solved = int(solved_dev)
            walls.append(time.time() - t0)
        # do not blow the benchmark budget when the device is having a slow
        # day - one honest sample beats three that hit the driver timeout
        if walls[-1] > 300:
            break
    walls.sort()
    wall = walls[len(walls) // 2]

    # reference-settings row: the SAME protocol at the reference's own
    # algorithm settings (tolerance 0.02, single attempt — no restart
    # schedule; compaction stays on, it is pure infrastructure), so the
    # bench JSON records a vs_baseline ratio at algorithm-identical
    # hyperparameters next to the tuned headline
    ref_settings = None
    if os.environ.get("BENCH_REF_SETTINGS", "1") != "0" and use_compact:
        from pdp_solver_tpu.solvers.compact import compacting_solve

        solver_rs = PDPSolver(SolverConfig(
            model_type="p-d-p", tolerance=0.02, t_max=100,
            local_search_iterations=ls_iters, epsilon=0.5))

        def ref_settings_run():
            _, solved_list, _ = compacting_solve(
                solver_rs, {}, r_fwd, insts, iters,
                ls_iterations=ls_iters, chunk=chunk or 50,
                min_edges=min_edges, schedule=None,
                mirror_every=mirror_every)
            return sum(solved_list)

        try:
            ref_settings_run()  # warm-up (compiles its own tol-0.02 ladder)
            t0 = time.time()
            rs_solved = ref_settings_run()
            rs_wall = time.time() - t0
            ref_settings = {
                "tolerance": 0.02, "attempts": 1,
                "solved_fraction": rs_solved / count,
                "wall_s": round(rs_wall, 3),
                "verified_solutions_per_sec": round(rs_solved / rs_wall, 4),
            }
        except Exception:
            ref_settings = None

    # per-iteration slope between 50 and 150 iterations with walksat off,
    # the identical protocol to tools/measure_reference.py (termination
    # active, budgets small enough that instances stay in the active solve
    # regime - disabling termination would instead measure the worst case
    # where every simplify fixed point runs to full depth on all instances).
    # Runs in chunks - single very long programs crash the tunneled TPU
    # worker - and degrades gracefully if the device objects.
    def fixed_step(rng, batch, state, carry, n_iters):
        _, state, carry = solver.forward(
            {}, rng, batch, state, n_iters,
            is_training=False, check_termination=True,
            carry=carry, finalize=False)
        return state, carry

    step_chunk = chunk if chunk > 0 else 50
    first_fixed = jax.jit(
        lambda r, b, s, n: fixed_step(r, b, s, None, n), static_argnames="n")
    next_fixed = jax.jit(fixed_step, static_argnames="n_iters")

    def run_fixed(n_chunks):
        t0 = time.time()
        st, carry = first_fixed(r_fwd, batch, state, step_chunk)
        for c in range(1, n_chunks):
            st, carry = next_fixed(jax.random.fold_in(r_fwd, c), batch, st,
                                   carry, step_chunk)
        float(jnp.sum(carry[0].solution))      # real sync via D2H
        return time.time() - t0

    # slope via minimum walls: tunnel throttling is strictly additive noise,
    # so min(wall) over repeats is the consistent estimator of the true
    # program cost and the min-wall difference is the per-iteration cost
    # (a median of noisy differences can triple under a throttled regime)
    per_iter = None
    try:
        lo_c, hi_c = 1, 3  # 50 vs 150 iterations, as measure_reference.py
        run_fixed(hi_c)  # compile both programs
        lo_w, hi_w = [], []
        for _ in range(3):
            lo_w.append(run_fixed(lo_c))
            hi_w.append(run_fixed(hi_c))
        per_iter = max((min(hi_w) - min(lo_w))
                       / ((hi_c - lo_c) * step_chunk), 1e-9)
    except Exception:
        per_iter = None

    # per-phase slopes (median of 3) so the headline decomposes into the
    # SP-sweep and WalkSAT costs it is built from
    phases = {}
    if os.environ.get("BENCH_PHASES", "1") != "0":
        try:
            from functools import partial

            from pdp_solver_tpu.modules import propagate as PR
            from pdp_solver_tpu.problem.state import (
                init_problem_state, compute_edge_mask)

            problem0 = init_problem_state(batch)
            em0 = compute_edge_mask(batch, problem0)
            ae0 = jnp.ones((batch.num_edges,), jnp.float32)

            @partial(jax.jit, static_argnums=0)
            def sweep_n(n, ps):
                def body(i, ps):
                    return PR.survey_propagator_apply(
                        {}, solver.prop_cfg, batch, ps, ps, em0, ae0)
                return jax.lax.fori_loop(0, n, body, ps)

            @partial(jax.jit, static_argnums=3)
            def ls_n(rng, problem, pred, n):
                return solver._local_search(rng, batch, problem, pred, 1, n)

            def mslope(f, lo, hi):
                f(lo), f(hi)

                def t(k):
                    t0 = time.time()
                    out = f(k)
                    float(sum(jnp.sum(x) for x in
                              jax.tree_util.tree_leaves(out)))
                    return time.time() - t0

                t(lo)
                lo_w = [t(lo) for _ in range(3)]
                hi_w = [t(hi) for _ in range(3)]
                return max((min(hi_w) - min(lo_w)) / (hi - lo), 0.0)

            phases["sp_sweep_ms"] = round(
                mslope(lambda n: sweep_n(n, state.prop), 5, 25) * 1e3, 2)
            pred0 = 0.5 * jnp.ones((batch.num_vars, 1))
            phases["walksat_iter_ms"] = round(
                mslope(lambda n: ls_n(r_fwd, problem0, pred0, n),
                       10, 50) * 1e3, 2)
            phases["pdp_iteration_ms"] = (round(per_iter * 1e3, 2)
                                          if per_iter else None)
        except Exception:
            phases = {}

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "baselines", "reference_measured.json")
    ref = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)

    # headline: verified solutions produced per second - the product of
    # throughput and solved fraction, since processing unsolved instances
    # quickly has no value. Components reported alongside.
    value = solved / wall
    ref_rate = (ref["solved"] / ref["wall_s"]) if ref else None
    vs = (value / ref_rate) if ref_rate else None  # None for absent OR 0.0
    if ref_settings is not None and ref_rate:
        ref_settings["vs_baseline"] = round(
            ref_settings["verified_solutions_per_sec"] / ref_rate, 2)

    print(json.dumps({
        "metric": "pdp_4sat_verified_solutions_per_sec",
        "value": round(value, 4),
        "unit": "verified solutions/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "instances_per_sec": round(count / wall, 3),
        "ref_instances_per_sec": (round(ref["instances_per_sec"], 3)
                                  if ref else None),
        "solved_fraction": solved / count,
        "ref_solved_fraction": ref["solved_fraction"] if ref else None,
        "edge_updates_per_sec": (round(total_edges / per_iter)
                                 if per_iter else None),
        "ref_edge_updates_per_sec": (round(ref["edge_updates_per_sec"])
                                     if ref else None),
        "iters": iters,
        "wall_s": round(wall, 3),
        "wall_samples_s": [round(w, 3) for w in walls],
        "phases": phases,
        "reference_settings": ref_settings,
        "compaction": (None if compact_stats is None else {
            "ladder": compact_stats["compactions"],
            "pdp_wall_s": compact_stats["pdp_wall_s"],
            "ls_wall_s": compact_stats["ls_wall_s"]}),
        "warmup_s": round(compile_and_first, 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "dataset_fingerprint": dataset_fingerprint(insts),
    }))


if __name__ == "__main__":
    main()
