"""Progressive batch compaction for long-budget solves.

The solver's hot loop is shape-static: once an instance is solved (or its
messages go paramagnetic) it stops contributing progress but keeps paying
full per-iteration cost — at the benchmark operating point ~3/4 of all
instance-iterations are spent on instances that are already finished.
The reference has the same property (its mega-batch never shrinks,
src/pdp/nn/solver.py:355-386); on a TPU the fix is TPU-shaped: at chunk
boundaries, *repack* the still-active instances into a smaller static
bucket (fg/batch.py bucket_dims) and remap the carried state into the new
layout. Each bucket shape compiles once; the geometric bucket ladder
bounds the number of distinct programs at O(log E).

Pipeline (compacting_solve):
  1. run the decimation loop in bounded chunks (the resumable
     forward(carry=, finalize=False) API);
  2. after each chunk, read the per-instance active/solved flags (one
     small D2H transfer); harvest solutions of solved instances; park
     instances that terminated unsolved (they get local search later);
  3. when the surviving instances fit a strictly smaller edge bucket,
     repack them and remap every E/V/F/B-indexed state array;
  4. after the iteration budget: pack ALL unsolved instances (parked +
     leftover active) and run the WalkSAT budget on that compact batch,
     then harvest.

State remapping is generic: every array leaf of the (state, carry) pytree
is classified by its leading dimension against the batch's padded
E/V/F/B dims (which bucket_dims keeps distinct in practice; remapping
refuses ambiguous batches) and gathered slice-by-slice into the new
layout, zero-filled on padding (every consumer masks padding).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch, pack_instances
from pdp_solver_tpu.problem.state import ProblemState
from pdp_solver_tpu.train.loss import cnf_evaluate


def instance_slices(instances):
    """Per-instance (v_off, f_off, e_off, n, m, e) in the packed layout.

    pack_instances lays instances out back-to-back in order, each with a
    deterministic clause-major edge order, so slices are recomputable from
    the instance tuples alone."""
    out = []
    v = f = e = 0
    for inst in instances:
        n, m, ei = int(inst[0]), int(inst[1]), int(inst[2].shape[1])
        out.append((v, f, e, n, m, ei))
        v += n
        f += m
        e += ei
    return out


def _dim_maps(old_slices, keep, new_slices):
    """(src_idx, dst_idx) gather maps for each of the four dims."""
    maps = {}
    for dim, (off_i, cnt_i) in {"V": (0, 3), "F": (1, 4), "E": (2, 5)}.items():
        src, dst = [], []
        for j, i in enumerate(keep):
            o, c = old_slices[i][off_i], old_slices[i][cnt_i]
            n_ = new_slices[j][off_i]
            src.append(np.arange(o, o + c))
            dst.append(np.arange(n_, n_ + c))
        maps[dim] = (np.concatenate(src) if src else np.zeros(0, np.int64),
                     np.concatenate(dst) if dst else np.zeros(0, np.int64))
    maps["B"] = (np.asarray(keep, np.int64),
                 np.arange(len(keep), dtype=np.int64))
    return maps


def remap_state(tree, keep, old_batch: FGBatch, new_batch: FGBatch,
                old_slices, new_slices):
    """Remap every array leaf of a state pytree from the old packed layout
    to the new one (host-side numpy). Leaves are classified by leading
    dimension; scalars pass through unchanged."""
    old_dims = {"E": old_batch.num_edges, "V": old_batch.num_vars,
                "F": old_batch.num_clauses, "B": old_batch.batch_size}
    if len(set(old_dims.values())) != 4:
        raise ValueError(
            f"ambiguous packed dims {old_dims}: cannot classify state "
            "arrays by leading dimension")
    new_dims = {"E": new_batch.num_edges, "V": new_batch.num_vars,
                "F": new_batch.num_clauses, "B": new_batch.batch_size}
    by_old = {v: k for k, v in old_dims.items()}
    maps = _dim_maps(old_slices, keep, new_slices)

    def leaf(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] not in by_old:
            return x
        dim = by_old[x.shape[0]]
        src, dst = maps[dim]
        out = np.zeros((new_dims[dim],) + x.shape[1:], x.dtype)
        out[dst] = x[src]
        return out

    return jax.tree_util.tree_map(leaf, tree)


def _park(store, orig, problem_host, slices, slot):
    """Record an instance's final problem state for the local-search phase."""
    v, f, _, n, m, _ = slices[slot]
    store[orig] = {
        "active_vars": np.asarray(problem_host.active_vars[v:v + n]),
        "active_clauses": np.asarray(problem_host.active_clauses[f:f + m]),
        "solution": np.asarray(problem_host.solution[v:v + n]),
        "is_sat": float(np.asarray(problem_host.is_sat)[slot]),
    }


def _unpark(store, todo, batch: FGBatch, slices):
    """Rebuild a packed ProblemState from parked per-instance records."""
    V, F, B = batch.num_vars, batch.num_clauses, batch.batch_size
    av = np.zeros(V, np.float32)
    ac = np.zeros(F, np.float32)
    sol = 0.5 * np.ones(V, np.float32)
    iss = 0.5 * np.ones(B, np.float32)
    for slot, orig in enumerate(todo):
        v, f, _, n, m, _ = slices[slot]
        rec = store[orig]
        av[v:v + n] = rec["active_vars"]
        ac[f:f + m] = rec["active_clauses"]
        sol[v:v + n] = rec["solution"]
        iss[slot] = rec["is_sat"]
    return ProblemState(active_vars=jnp.asarray(av),
                        active_clauses=jnp.asarray(ac),
                        solution=jnp.asarray(sol),
                        is_sat=jnp.asarray(iss))


def _compact_fns(solver):
    """Jitted step/local-search programs, cached ON the solver object so
    repeated solves (bench repeats, restart attempts) reuse the compiled
    programs instead of re-tracing fresh closures (the utils/resilient.py
    discipline)."""
    fns = getattr(solver, "_compact_jit_fns", None)
    if fns is not None:
        return fns

    def step(params, r, b, s, carry, n):
        _, s2, c2 = solver.forward(
            params, r, b, s, n, is_training=False,
            check_termination=True, carry=carry, finalize=False)
        # solved flags ride the same program (solution is merged in-loop)
        sv, _ = cnf_evaluate(b, c2[0].solution[:, None])
        return s2, c2, sv

    def ls_step(r, b, prob, pred, n):
        new = solver.local_search(r, b, prob, pred, n)
        # local_search returns 0.5 on non-active vars; merge the decided
        # values back in (the finalize path's _update_solution does the
        # same, solvers/base.py)
        av = prob.active_vars[:, None]
        merged = av * new + (1.0 - av) * prob.solution[:, None]
        sv, _ = cnf_evaluate(b, merged)
        return merged, sv

    fns = (jax.jit(lambda p, r, b, s, n: step(p, r, b, s, None, n),
                   static_argnames="n"),
           jax.jit(step, static_argnames="n"),
           jax.jit(ls_step, static_argnames="n"))
    solver._compact_jit_fns = fns
    return fns


def compacting_solve(solver, params, rng, instances, iterations, *,
                     ls_iterations=None, chunk=50, ls_chunk=None,
                     min_edges=32768, min_chunk=10, resilient=True,
                     mirror_every=1, schedule=None, replicas=1,
                     verbose=False):
    """Full solve over `instances` with progressive batch compaction and an
    optional restart schedule.

    Returns (solutions, solved, stats): solutions is a list of f32[n_i]
    assignments in {0,1}, solved a bool list (verified against the formula
    by cnf_evaluate on-device), stats a dict with compaction/timing
    telemetry.

    schedule: optional list of (iterations, ls_iterations) attempts whose
    budgets SUM to at most the full budgets; still-unsolved instances
    re-enter the next attempt with a fresh random message init. The solve
    trajectory depends strongly on the init basin (measured: 55-57 vs 69
    of 128 solved across seeds at identical settings, tools/eps_study.py),
    so splitting the budget across two basins solves strictly more than
    one long run at the same per-instance compute. Later attempts run on
    already-compacted (smaller) batches, so they are also cheaper.

    replicas: in-batch search replication (the reference's
    batch_replication, src/pdp/nn/solver.py:56-99, redesigned for the
    compaction pipeline): every instance enters each attempt as R
    independent slots whose random message inits differ (distinct packed
    offsets consume distinct PRNG draws). An instance counts as solved as
    soon as ANY replica's assignment verifies — the de-dup is
    first-verified-wins rather than the reference's min-energy argmin —
    and all sibling replicas are dropped at the next compaction. On a
    dispatch-bound batch the extra replicas ride in the same kernel
    launches, so the union-of-basins quality gain costs far less than R x
    wall.
    """
    ls_total = (solver.cfg.local_search_iterations
                if ls_iterations is None else ls_iterations)
    if schedule is None:
        schedule = [(iterations, ls_total)]
    count = len(instances)
    solutions = [None] * count
    solved = [False] * count
    remaining = list(range(count))
    all_stats = {"attempts": [], "compactions": [], "chunks": 0,
                 "faults": 0, "ls_wall_s": 0.0, "pdp_wall_s": 0.0}
    t0 = time.time()
    for att, (it_k, ls_k) in enumerate(schedule):
        rng, r = jax.random.split(rng)
        subset, owners = [], []
        for j, orig in enumerate(remaining):
            for _ in range(max(replicas, 1)):
                subset.append(instances[orig])
                owners.append(j)
        sols_k, solved_k, st_k = _solve_attempt(
            solver, params, r, subset, it_k, ls_iterations=ls_k,
            chunk=chunk, ls_chunk=ls_chunk, min_edges=min_edges,
            min_chunk=min_chunk, resilient=resilient,
            mirror_every=mirror_every,
            owners=owners if replicas > 1 else None, verbose=verbose)
        for j, orig in enumerate(remaining):
            solutions[orig] = sols_k[j]
            solved[orig] = solved_k[j]
        all_stats["attempts"].append(
            {"iterations": it_k, "ls": ls_k, "instances": len(remaining),
             "solved": int(sum(solved_k)), "wall_s": st_k["wall_s"],
             "ls_wall_s": st_k["ls_wall_s"],
             "progress": st_k.get("progress", [])})
        all_stats["compactions"].extend(st_k["compactions"])
        for k in ("chunks", "faults", "ls_wall_s", "pdp_wall_s"):
            all_stats[k] += st_k[k]
        remaining = [i for i in remaining if not solved[i]]
        if not remaining:
            break
    all_stats["wall_s"] = round(time.time() - t0, 3)
    all_stats["solved"] = int(sum(solved))
    return solutions, solved, all_stats


def _solve_attempt(solver, params, rng, instances, iterations, *,
                   ls_iterations, chunk=50, ls_chunk=None,
                   min_edges=32768, min_chunk=10, resilient=True,
                   mirror_every=1, owners=None, verbose=False):
    """One compacting solve pass (see compacting_solve).

    owners: optional per-slot owner index (consecutive, 0-based) mapping
    replica slots onto logical instances; the returned lists are per OWNER
    and an owner is solved when any of its slots verifies. None = the
    identity (one slot per instance)."""
    n_slots = len(instances)
    owner_of = list(range(n_slots)) if owners is None else list(owners)
    count = (max(owner_of) + 1) if owner_of else 0
    ls_replicas = max(n_slots // max(count, 1), 1)
    ls_iterations = (solver.cfg.local_search_iterations
                     if ls_iterations is None else ls_iterations)
    ls_chunk = ls_chunk or max(chunk * 4, 200)

    solutions = [None] * count
    solved = [False] * count
    parked = {}

    # --- phase 1: decimation loop with compaction -----------------------
    live = list(range(n_slots))        # original slot index per batch slot
    batch = pack_instances([instances[i] for i in live])
    slices = instance_slices([instances[i] for i in live])
    rng, r_init = jax.random.split(rng)
    state = solver.get_init_state(r_init, batch, randomized=True)
    carry = None

    # pre-split the per-chunk PRNG keys ONCE and land them on the host:
    # an eager jax.random.split per chunk is a full tunnel round-trip
    # (~0.1-0.3 s each, ~25 chunks per solve); a host-resident pool rides
    # the H2D of the next jitted call instead. Sized from the SMALLEST
    # chunk any path can issue (a caller may pass chunk < min_chunk, and
    # faults shrink toward min_chunk) so `ki` never wraps and reuses keys
    # within one solve; the assert below guards the invariant.
    denom = max(min(chunk, min_chunk), 1)
    ls_denom = max(min(ls_chunk, min_chunk), 1)
    n_pool = (iterations // denom + ls_iterations // ls_denom + 16)
    key_pool = np.asarray(jax.random.split(rng, n_pool))
    ki = 0

    first_fn, step_fn, ls_fn = _compact_fns(solver)

    # progress: (iteration, owners solved so far, wall) per harvest — the
    # measured p(solved by iter k) curve that schedule/replica decisions
    # are made on (free: appended only when a harvest already happened)
    stats = {"compactions": [], "chunks": 0, "faults": 0, "progress": []}
    done = 0
    # per-iteration cost scales with the edge bucket, so growing the chunk
    # inversely keeps the per-program execution time constant while cutting
    # dispatch + mirror overhead on compacted buckets (deterministic per
    # bucket, so repeated runs hit the same compiled programs)
    chunk0, e0 = chunk, batch.num_edges
    sv_aligned = True   # does `sv` index the current live list?
    # LAZY initial mirror: get_init_state is deterministic in r_init, so a
    # fault before the first real mirror re-creates the init state on
    # device instead of paying an upfront full-state D2H pull per attempt
    # (measured ~0.5-1 s over the tunnel; the bench runs 3 attempts)
    mirror = (None, None) if resilient else None
    mirror_done = 0
    # key-pool index + chunk counter snapshot at the mirror point: a fault
    # must replay the lost chunks with the SAME keys and keep the mirror
    # cadence aligned with the restored state
    mirror_ki = ki
    mirror_chunks = 0
    n_finished_prev = 0
    t0 = time.time()
    while done < iterations and live:
        r = key_pool[ki]   # IndexError = pool-sizing bug, fail loud
        ki += 1
        n = min(chunk, iterations - done)
        try:
            if carry is None:
                state, carry, sv = first_fn(params, r, batch, state, n)
            else:
                state, carry, sv = step_fn(params, r, batch, state, carry, n)
            if resilient and (stats["chunks"] + 1) % mirror_every == 0:
                # force completion so a fault surfaces HERE while the last
                # good carry still exists on the host. mirror_every > 1
                # trades fault-recovery granularity for less device->host
                # traffic (the full carry is ~25 MB at bench shapes; the
                # small per-chunk active/solved reads below stay). The
                # cadence fires at chunks mirror_every-1, 2*mirror_every-1,
                # ... so the FIRST chunk does not pay the full pull (the
                # lazy initial mirror covers faults before then).
                mirror = (jax.tree_util.tree_map(np.asarray, state),
                          jax.tree_util.tree_map(np.asarray, carry))
                mirror_done = done + n
                mirror_ki = ki
                mirror_chunks = stats["chunks"] + 1
            # blocking per-chunk reads INSIDE the try: the jitted chunk is
            # async, so on non-mirrored chunks (mirror_every > 1) a device
            # fault first surfaces at this host sync — it must hit the same
            # handler that restores from the mirror
            active_b = np.asarray(carry[1])[:len(live)]
            solved_b = np.asarray(sv)[:len(live)]
        except Exception as e:
            if not resilient or chunk <= min_chunk:
                raise
            chunk = max(chunk // 2, min_chunk)
            stats["faults"] += 1
            print(f"[compact] device fault at iter {done} "
                  f"({type(e).__name__}): rewind to {mirror_done}, "
                  f"chunk -> {chunk}", file=sys.stderr, flush=True)
            if mirror[0] is None:
                # lazy initial mirror: re-create the deterministic init
                # state on device (same r_init => same state)
                state = solver.get_init_state(r_init, batch,
                                              randomized=True)
                carry = None
            else:
                state = jax.device_put(mirror[0])
                carry = (None if mirror[1] is None
                         else jax.device_put(mirror[1]))
            # `done`/key-index/chunk-counter track the mirror: chunks
            # since the last mirror are lost and replayed with identical
            # keys (only matters when mirror_every > 1)
            done = mirror_done
            ki = mirror_ki
            stats["chunks"] = mirror_chunks
            # the finished set rolls back with the mirror; a stale high
            # count would mask post-restore finishes from the harvest
            n_finished_prev = 0
            continue
        done += n
        sv_aligned = True
        stats["chunks"] += 1
        finished = [s for s in range(len(live)) if active_b[s] <= 0]
        if len(finished) == n_finished_prev:
            # no NEW finishes since the last harvest: skip the full
            # problem-state D2H pull (finished slots are sticky, so a
            # naive check would re-pull every chunk after the first
            # finish — measured multi-second tunnel tax per solve)
            continue
        n_finished_prev = len(finished)
        problem_host = jax.tree_util.tree_map(np.asarray, carry[0])
        # pass 1: harvest newly solved slots (any replica wins its owner)
        for slot, orig in enumerate(live):
            if solved_b[slot] > 0 and not solved[owner_of[orig]]:
                sol = problem_host.solution[
                    slices[slot][0]:slices[slot][0] + slices[slot][3]]
                solutions[owner_of[orig]] = (sol > 0.5).astype(np.float32)
                solved[owner_of[orig]] = True
        stats["progress"].append(
            (done, int(sum(solved)), int((active_b > 0).sum()),
             round(time.time() - t0, 3)))
        # pass 2: keep live slots of unsolved owners; park terminated ones
        keep = []
        for slot, orig in enumerate(live):
            ow = owner_of[orig]
            if solved[ow]:
                continue        # solved (this slot or a sibling): drop
            if active_b[slot] > 0:
                keep.append(slot)
            else:
                _park(parked, ow, problem_host, slices, slot)
        if not keep:
            live = []
            break
        # compact only when it strictly shrinks the edge bucket and the
        # batch is still big enough for the repack to matter
        if batch.num_edges > min_edges and len(keep) < len(live):
            new_insts = [instances[live[s]] for s in keep]
            tentative = pack_instances(new_insts)
            if tentative.num_edges < batch.num_edges:
                new_slices = instance_slices(new_insts)
                host_state = jax.tree_util.tree_map(np.asarray, state)
                host_carry = jax.tree_util.tree_map(np.asarray, carry)
                new_state_h = remap_state(
                    host_state, keep, batch, tentative, slices, new_slices)
                new_carry_h = remap_state(
                    host_carry, keep, batch, tentative, slices, new_slices)
                state = jax.device_put(new_state_h)
                carry = jax.device_put(new_carry_h)
                if resilient:
                    # the mirror must match the new layout, or a fault in
                    # the next chunk would restore stale-shaped arrays
                    mirror = (new_state_h, new_carry_h)
                    mirror_done = done
                    mirror_ki = ki
                    mirror_chunks = stats["chunks"]
                live = [live[s] for s in keep]
                batch, slices = tentative, new_slices
                n_finished_prev = 0  # all kept slots are active again
                # cap at 4x: oversized chunks delay the all-done exit by up
                # to a full chunk of wasted iterations
                chunk = min(chunk0 * (e0 // batch.num_edges), chunk0 * 4)
                # kept instances were all active & unsolved as of `sv`,
                # but `sv` itself still indexes the pre-compaction slots
                sv_aligned = False
                stats["compactions"].append(
                    {"iter": done, "instances": len(live),
                     "edges": batch.num_edges})
                if verbose:
                    print(f"[compact] iter {done}: {len(live)} live, "
                          f"E={batch.num_edges}")
    stats["pdp_wall_s"] = round(time.time() - t0, 3)

    # leftover live instances (budget exhausted): park for local search
    if live and carry is not None:
        problem_host = jax.tree_util.tree_map(np.asarray, carry[0])
        solved_b = (np.asarray(sv)[:len(live)] if sv_aligned
                    else np.zeros(len(live)))
        for slot, orig in enumerate(live):
            if solved_b[slot] > 0 and not solved[owner_of[orig]]:
                sol = problem_host.solution[
                    slices[slot][0]:slices[slot][0] + slices[slot][3]]
                solutions[owner_of[orig]] = (sol > 0.5).astype(np.float32)
                solved[owner_of[orig]] = True
        for slot, orig in enumerate(live):
            if not solved[owner_of[orig]]:
                _park(parked, owner_of[orig], problem_host, slices, slot)

    # --- phase 2: local search on the unsolved set -----------------------
    t1 = time.time()
    todo = [i for i in range(count) if not solved[i] and i in parked]
    if ls_iterations > 0 and todo:
        # replicate owners here too: WalkSAT is strongly init-dependent and
        # the replicas again share kernel launches. slot_of_owner[k] lists
        # the packed slots carrying owner todo[k].
        ls_owner = [o for o in todo for _ in range(ls_replicas)]
        # an owner's first slot per replica group indexes instances by ANY
        # slot of that owner (replicas are the same formula)
        inst_of_owner = {}
        for slot_idx, orig in enumerate(owner_of):
            inst_of_owner.setdefault(orig, instances[slot_idx])
        ls_insts = [inst_of_owner[o] for o in ls_owner]
        ls_batch = pack_instances(ls_insts)
        ls_slices = instance_slices(ls_insts)
        problem = jax.device_put(
            _unpark(parked, ls_owner, ls_batch, ls_slices))

        r_fill = key_pool[ki]
        ki += 1
        noise = (jax.random.uniform(r_fill, (ls_batch.num_vars, 1))
                 > 0.5).astype(jnp.float32)
        pred = jnp.where(problem.active_vars[:, None] > 0, noise,
                         problem.solution[:, None])
        done_ls = 0
        sv = jnp.zeros((ls_batch.batch_size,), jnp.float32)
        ls_mirror = (np.asarray(pred), np.asarray(sv))
        ls_mirror_done = 0
        ls_chunks = 0
        ls_ki = ki
        # key-index + chunk-counter snapshots at the mirror, like the main
        # loop's mirror_ki/mirror_chunks: replayed LS chunks must use the
        # SAME keys and keep the mirror cadence aligned, or fault recovery
        # is non-deterministic
        ls_mirror_ki = ls_ki
        ls_mirror_chunks = 0
        while done_ls < ls_iterations:
            r = key_pool[ls_ki]
            ls_ki += 1
            n = min(ls_chunk, ls_iterations - done_ls)
            try:
                pred, sv = ls_fn(r, ls_batch, problem, pred, n)
                ls_chunks += 1
                if resilient and ls_chunks % mirror_every == 0:
                    ls_mirror = (np.asarray(pred), np.asarray(sv))
                    ls_mirror_done = done_ls + n
                    ls_mirror_ki = ls_ki
                    ls_mirror_chunks = ls_chunks
            except Exception as e:
                if not resilient or ls_chunk <= min_chunk:
                    raise
                ls_chunk = max(ls_chunk // 2, min_chunk)
                stats["faults"] += 1
                print(f"[compact] device fault in local search at "
                      f"{done_ls} ({type(e).__name__}): rewind to "
                      f"{ls_mirror_done}, ls_chunk -> {ls_chunk}",
                      file=sys.stderr, flush=True)
                pred = jnp.asarray(ls_mirror[0])
                sv = jnp.asarray(ls_mirror[1])
                # rewind to the mirror point: with sparse mirrors the lost
                # chunks must be replayed with identical keys, not skipped
                done_ls = ls_mirror_done
                ls_ki = ls_mirror_ki
                ls_chunks = ls_mirror_chunks
                continue
            done_ls += n
            sv_h = np.asarray(sv)[:len(ls_owner)]
            owner_hit = {}
            for slot, o in enumerate(ls_owner):
                owner_hit[o] = owner_hit.get(o, False) or sv_h[slot] > 0
            if all(owner_hit.values()):
                break
        pred_host = np.asarray(pred)[:, 0]
        sv_host = np.asarray(sv)
        for slot, o in enumerate(ls_owner):
            hit = bool(sv_host[slot] > 0)
            if solved[o]:
                continue    # a sibling replica already delivered
            if hit or solutions[o] is None:
                v, _, _, n_, _, _ = ls_slices[slot]
                solutions[o] = (pred_host[v:v + n_] > 0.5).astype(np.float32)
                solved[o] = hit
    else:
        for i in todo:
            solutions[i] = (parked[i]["solution"] > 0.5).astype(np.float32)
    stats["ls_wall_s"] = round(time.time() - t1, 3)
    stats["wall_s"] = round(time.time() - t0, 3)
    stats["solved"] = int(sum(solved))

    n_of_owner = {}
    for slot_idx, ow in enumerate(owner_of):
        n_of_owner.setdefault(ow, int(instances[slot_idx][0]))
    for i in range(count):
        if solutions[i] is None:
            solutions[i] = np.zeros(n_of_owner[i], np.float32)
    return solutions, solved, stats
