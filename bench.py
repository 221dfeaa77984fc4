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

Round-4 protocol (VERDICT r3 #1/#2/#3/#7):
  * the repeated timed solves use DIFFERENT message-init seeds - wall is
    the median, solved-fraction is reported as mean over seeds plus the
    per-seed list (the measured basin spread is +-5pp, so single-seed
    solved counts are inside noise);
  * the solver settings (simplify_rounds, tolerance, schedule, replicas)
    ride in the JSON next to the numbers;
  * persistent-compilation-cache hit/miss counts are reported so warm-up
    is auditable;
  * a `large_batch` block measures the chip at the reference's own
    operating point (batch_size 5000-class packing: 2048 instances /
    7.4M real edges) where the TPU is bandwidth- not dispatch-bound.
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
    from pdp_solver_tpu.utils.cache import (
        enable_compilation_cache, cache_stats)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
    from pdp_solver_tpu.solvers.compact import compacting_solve
    from pdp_solver_tpu.train.loss import cnf_evaluate
    from pdp_solver_tpu.utils.benchdata import (
        make_ksat_set, dataset_fingerprint)

    iters = int(os.environ.get("BENCH_ITERS", "1000"))
    ls_iters = int(os.environ.get("BENCH_LS_ITERS", "1000"))
    # chunk long budgets into bounded program executions (resumable solve);
    # single very long programs crash the tunneled TPU worker
    default_chunk = "50" if jax.default_backend() == "tpu" else "0"
    chunk = int(os.environ.get("BENCH_CHUNK", default_chunk))

    insts = make_ksat_set()
    total_edges = sum(i[2].shape[1] for i in insts)
    count = len(insts)
    batch = pack_instances(insts)

    # solver operating point (validated end-to-end across message-init
    # seeds, docs/r4_headline_bisect.json): reference argmax decimation, a
    # looser convergence tolerance than the reference's 0.02, and the
    # restart schedule below. In-batch replication (the reference's own
    # batch_replication feature, src/pdp/nn/solver.py:56-99) is an
    # available lever via BENCH_REPLICAS but is NOT part of the default
    # headline settings (replicas=1). The reference_settings row keeps the
    # reference's exact semantics (tolerance 0.02, single attempt, no
    # replication, srounds=0).
    tol = float(os.environ.get("BENCH_TOL", "0.08"))
    t_max = int(os.environ.get("BENCH_TMAX", "50"))
    srounds = int(os.environ.get("BENCH_SIMPLIFY_ROUNDS", "1"))
    replicas = int(os.environ.get("BENCH_REPLICAS", "1"))
    solver = PDPSolver(SolverConfig(
        model_type="p-d-p", tolerance=tol, t_max=t_max,
        local_search_iterations=ls_iters, epsilon=0.5,
        decimation_threshold=float(os.environ.get("BENCH_DEC_THETA", "1.0")),
        decimation_guard=float(os.environ.get("BENCH_DEC_GUARD", "0")),
        simplify_rounds=srounds))

    # restart schedule: attempt budgets sum to exactly the protocol budgets
    # (iters, ls_iters); unsolved instances re-enter with a fresh message
    # init (solve quality depends strongly on the init basin). Default
    # 3 attempts (0.35/0.35/0.30): the measured progress curves show
    # decimation value saturates by iteration ~300 of an attempt, so a
    # third basin+LS phase beats burning iterations 500-1000 in one
    # (docs/r4_replica_probe.json: 85.0 solved vs 76.0 at 2x500, equal
    # clean-run wall)
    sched_env = os.environ.get("BENCH_SCHEDULE", "0.35,0.35,0.3")
    fracs = [float(x) for x in sched_env.split(",") if x]
    schedule = [(max(int(iters * f), 1), max(int(ls_iters * f), 1))
                for f in fracs]
    over_i = sum(s[0] for s in schedule) - iters
    over_l = sum(s[1] for s in schedule) - ls_iters
    if over_i > 0 or over_l > 0:
        schedule[-1] = (schedule[-1][0] - max(over_i, 0),
                        schedule[-1][1] - max(over_l, 0))
    # splitting a small budget starves every attempt (decimation needs
    # ~150+ iterations to engage at the bench operating point)
    if min(s[0] for s in schedule) < 200:
        schedule = None

    # deeper compaction ladders help more but each bucket shape is a
    # remote compile on the tunneled TPU; stop earlier there
    min_edges = int(os.environ.get(
        "BENCH_MIN_EDGES",
        "65536" if jax.default_backend() == "tpu" else "32768"))
    # the fault-tolerance mirror copies solver state+carry device->host;
    # over the tunneled TPU link that is a multi-second tax per chunk,
    # so mirror sparsely there
    mirror_every = int(os.environ.get(
        "BENCH_MIRROR_EVERY",
        "8" if jax.default_backend() == "tpu" else "1"))

    def make_run(sched, reps):
        def run(seed):
            r = jax.random.split(jax.random.PRNGKey(seed))[1]
            _, solved_list, stats = compacting_solve(
                solver, {}, r, insts, iters,
                ls_iterations=ls_iters, chunk=chunk or 50,
                min_edges=min_edges, schedule=sched,
                mirror_every=mirror_every, replicas=reps)
            return sum(solved_list), stats
        return run

    def degrade():
        """Fall back to the plain single-attempt solve: never let the
        tuned configuration (or an exhausted resilience budget) take the
        whole benchmark down."""
        nonlocal replicas, schedule
        replicas, schedule = 1, None
        return make_run(None, 1)

    compact_run = make_run(schedule, replicas)

    # warm-up: compile every distinct program the timed runs will execute
    # (the compaction bucket ladder is deterministic given the seed; other
    # seeds may touch one extra bucket rung mid-run - acceptable, the
    # persistent cache still absorbs repeat runs). If the tuned
    # configuration fails outright, degrade to the plain single-attempt
    # solve rather than taking the benchmark down.
    t0 = time.time()
    try:
        warm_solved, _ = compact_run(0)
    except Exception:
        import traceback
        print("[bench] tuned configuration failed at warm-up, degrading "
              "to the plain solve:", file=sys.stderr)
        traceback.print_exc()
        compact_run = degrade()
        warm_solved, _ = compact_run(0)
    compile_and_first = time.time() - t0

    # timed solves at DIFFERENT message-init seeds: wall = median, solved
    # = mean over seeds (basin spread is +-5pp; n=1 solved counts are
    # noise). The sync point is the D2H of the solved count. A rep that
    # faults terminally (resilience exhausted / tunnel disconnect)
    # degrades to the plain solve for the remaining reps; partial wall
    # samples beat no JSON line at all.
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    walls, solved_seeds = [], []
    compact_stats = None
    for rep in range(max(repeats, 1)):
        t0 = time.time()
        try:
            solved_r, compact_stats = compact_run(rep)
        except Exception:
            import traceback
            print(f"[bench] timed rep {rep} failed:", file=sys.stderr)
            traceback.print_exc()
            if schedule is None and replicas == 1:
                break               # already plain: keep partial samples
            compact_run = degrade()
            try:
                t0 = time.time()
                solved_r, compact_stats = compact_run(rep)
            except Exception:
                traceback.print_exc()
                break
        walls.append(time.time() - t0)
        solved_seeds.append(int(solved_r))
        # do not blow the benchmark budget when the device is having a
        # slow day - honest partial data beats hitting the driver timeout
        if walls[-1] > 300:
            break
    if not walls:
        # every timed rep failed: report the warm-up run (its wall
        # includes compilation, so this understates - but it is honest
        # data and keeps the one-JSON-line contract)
        walls = [compile_and_first]
        solved_seeds = [int(warm_solved)]
    wall = sorted(walls)[len(walls) // 2]
    solved_mean = float(np.mean(solved_seeds))

    # reference-settings row: the SAME protocol at the reference's own
    # algorithm settings (tolerance 0.02, single attempt, no replication,
    # exact simplify fixed point; compaction stays on - pure
    # infrastructure), so the bench JSON records a vs_baseline ratio at
    # algorithm-identical hyperparameters next to the tuned headline
    ref_settings = None
    if os.environ.get("BENCH_REF_SETTINGS", "1") != "0":
        solver_rs = PDPSolver(SolverConfig(
            model_type="p-d-p", tolerance=0.02, t_max=100,
            local_search_iterations=ls_iters, epsilon=0.5))

        def ref_settings_run(seed=0):
            r = jax.random.split(jax.random.PRNGKey(seed))[1]
            _, solved_list, _ = compacting_solve(
                solver_rs, {}, r, insts, iters,
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
                "tolerance": 0.02, "attempts": 1, "replicas": 1,
                "simplify_rounds": 0,
                "solved_fraction": rs_solved / count,
                "wall_s": round(rs_wall, 3),
                "verified_solutions_per_sec": round(rs_solved / rs_wall, 4),
            }
        except Exception:
            ref_settings = None

    # per-iteration slope between 50 and 150 iterations with walksat off,
    # the identical protocol to tools/measure_reference.py (termination
    # active, budgets small enough that instances stay in the active solve
    # regime). Runs in chunks; degrades gracefully if the device objects.
    state = solver.get_init_state(
        jax.random.PRNGKey(0), batch, randomized=True)
    batch = jax.device_put(batch)
    r_fwd = jax.random.split(jax.random.PRNGKey(0))[1]

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

    # slope via minimum walls: tunnel throttling is strictly additive
    # noise, so min(wall) is the consistent estimator of program cost
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

    # per-phase slopes (min-wall of 3) so the headline decomposes into the
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

    # large-batch block: the reference's real operating point. SP-sweep
    # and full-iteration slopes at 2048 instances / 7.37M real edges -
    # where the chip is bandwidth-bound instead of dispatch-bound - plus
    # HBM in use (headroom documentation).
    large = None
    if os.environ.get("BENCH_LARGE", "1") != "0":
        try:
            from functools import partial

            from pdp_solver_tpu.modules import propagate as PR
            from pdp_solver_tpu.problem.state import (
                init_problem_state, compute_edge_mask)

            lb_n = int(os.environ.get("BENCH_LARGE_N", "2048"))
            lb_insts = make_ksat_set(count=lb_n)
            lb_real_e = sum(i[2].shape[1] for i in lb_insts)
            lb = jax.device_put(pack_instances(lb_insts))
            lb_state = solver.get_init_state(
                jax.random.PRNGKey(0), lb, randomized=True)
            lp0 = init_problem_state(lb)
            lem = compute_edge_mask(lb, lp0)
            lae = jnp.ones((lb.num_edges,), jnp.float32)

            @partial(jax.jit, static_argnums=0)
            def lb_sweep(n, ps):
                def body(i, ps):
                    return PR.survey_propagator_apply(
                        {}, solver.prop_cfg, lb, ps, ps, lem, lae)
                return jax.lax.fori_loop(0, n, body, ps)

            def lb_timed(n):
                t0 = time.time()
                out = lb_sweep(n, lb_state.prop)
                float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
                return time.time() - t0

            lb_sweep(2, lb_state.prop), lb_sweep(10, lb_state.prop)
            lb_timed(2)
            lo_w = [lb_timed(2) for _ in range(3)]
            hi_w = [lb_timed(10) for _ in range(3)]
            lb_slope = max((min(hi_w) - min(lo_w)) / 8, 1e-9)

            mem = {}
            try:
                ms = jax.devices()[0].memory_stats() or {}
                mem = {"hbm_bytes_in_use": ms.get("bytes_in_use"),
                       "hbm_bytes_limit": ms.get("bytes_limit")}
            except Exception:
                pass
            if not mem.get("hbm_bytes_in_use"):
                # the tunneled backend exposes no allocator stats; account
                # the live device arrays client-side instead (real bytes
                # for the persistent buffers; XLA scratch not included,
                # labeled accordingly)
                try:
                    live = sum(
                        x.nbytes for x in jax.live_arrays()
                        if getattr(x, "nbytes", None) is not None)
                    mem["hbm_bytes_live_arrays"] = int(live)
                except Exception:
                    pass

            large = {
                "instances": lb_n,
                "real_edges": lb_real_e,
                "padded_edges": int(lb.num_edges),
                "sp_sweep_ms": round(lb_slope * 1e3, 2),
                "sweep_edge_updates_per_sec": round(lb_real_e / lb_slope),
                **mem,
            }
        except Exception:
            import traceback
            print("[bench] large_batch sweep block failed:", file=sys.stderr)
            traceback.print_exc()
            large = None

        # full pdp iteration slope at a medium-large batch (the full
        # iteration program at 8.4M padded edges is a very large remote
        # compile; 1024 instances / 4.2M padded edges carries the same
        # bandwidth-bound regime) - independent of the sweep block above
        try:
            mb_n = int(os.environ.get("BENCH_LARGE_ITER_N", "1024"))
            mb_insts = make_ksat_set(count=mb_n)
            mb_real_e = sum(i[2].shape[1] for i in mb_insts)
            mb = jax.device_put(pack_instances(mb_insts))
            mb_state = solver.get_init_state(
                jax.random.PRNGKey(0), mb, randomized=True)

            mb_first = jax.jit(
                lambda r, b, s, n: fixed_step(r, b, s, None, n),
                static_argnames="n")
            mb_next = jax.jit(fixed_step, static_argnames="n_iters")

            def mb_run_fixed(n_chunks):
                t0 = time.time()
                st, carry = mb_first(r_fwd, mb, mb_state, step_chunk)
                for c in range(1, n_chunks):
                    st, carry = mb_next(jax.random.fold_in(r_fwd, c), mb,
                                        st, carry, step_chunk)
                float(jnp.sum(carry[0].solution))
                return time.time() - t0

            mb_run_fixed(3)
            l1 = [mb_run_fixed(1) for _ in range(2)]
            l3 = [mb_run_fixed(3) for _ in range(2)]
            mb_iter = max((min(l3) - min(l1)) / (2 * step_chunk), 1e-9)
            if large is None:
                large = {}
            large.update({
                "iter_instances": mb_n,
                "iter_real_edges": mb_real_e,
                "pdp_iteration_ms": round(mb_iter * 1e3, 2),
                "edge_updates_per_sec": round(mb_real_e / mb_iter),
            })
        except Exception:
            import traceback
            print("[bench] large_batch iteration block failed:",
                  file=sys.stderr)
            traceback.print_exc()

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "baselines", "reference_measured.json")
    ref = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)

    # headline: verified solutions produced per second - the product of
    # throughput and solved fraction, since processing unsolved instances
    # quickly has no value. Components reported alongside.
    value = solved_mean / wall
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
        "solved_fraction": solved_mean / count,
        "solved_fraction_seeds": [s / count for s in solved_seeds],
        "ref_solved_fraction": ref["solved_fraction"] if ref else None,
        "edge_updates_per_sec": (round(total_edges / per_iter)
                                 if per_iter else None),
        "ref_edge_updates_per_sec": (round(ref["edge_updates_per_sec"])
                                     if ref else None),
        "iters": iters,
        "wall_s": round(wall, 3),
        "wall_samples_s": [round(w, 3) for w in walls],
        "settings": {"tolerance": tol, "t_max": t_max,
                     "simplify_rounds": srounds,
                     "replicas": replicas,
                     "schedule": sched_env if schedule else None,
                     "chunk": chunk, "min_edges": min_edges},
        "phases": phases,
        "reference_settings": ref_settings,
        "large_batch": large,
        "compaction": (None if compact_stats is None else {
            "ladder": compact_stats["compactions"],
            "pdp_wall_s": compact_stats["pdp_wall_s"],
            "ls_wall_s": compact_stats["ls_wall_s"]}),
        "warmup_s": round(compile_and_first, 1),
        "compile_cache": cache_stats(),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "dataset_fingerprint": dataset_fingerprint(insts),
    }))


if __name__ == "__main__":
    main()
