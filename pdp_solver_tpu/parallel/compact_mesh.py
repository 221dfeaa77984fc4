"""Progressive batch compaction composed with a data-parallel device mesh.

Round 2 shipped two wins that did not compose: `compacting_solve`
(solvers/compact.py) harvests solved instances and repacks survivors into
smaller static buckets, but drives a single device; the mesh paths
(parallel/mesh.py) run fixed shapes with no harvest. Here the two meet:

  * instances are partitioned across the mesh's data axis (greedy
    edge-count balancing);
  * every shard runs the resumable chunked solve as ONE shard_map program
    (same compiled bucket shape on every device — the ladder is global,
    driven by the worst shard, so the mesh stays single-program);
  * at chunk boundaries each shard harvests its solved instances on host;
    when every shard's survivors fit a strictly smaller common bucket, all
    shards repack and remap their carried state (solvers/compact.py
    remap_state reused per shard);
  * the WalkSAT phase runs the same way on the unsolved set.

The reference has no analog (its mega-batch never shrinks and its only
multi-GPU mode is DataParallel scatter, src/pdp/factorgraph/base.py:93-97).
Fault-tolerance mirrors are not wired here (use solvers/compact.py for the
single-device fault-tolerant path); this path is validated on CPU meshes
and designed for multi-chip slices.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from pdp_solver_tpu.fg.batch import bucket_dims, pack_instances
from pdp_solver_tpu.solvers.compact import (
    instance_slices, remap_state, _park, _unpark)
from pdp_solver_tpu.train.loss import cnf_evaluate

# placeholder instance for shards that run out of live instances before the
# others: 1 var, 1 clause, 1 edge, inert under solve (instantly satisfiable)
_DUMMY = (1, 1, np.array([[0], [0]], np.int64), np.ones(1, np.float32), 0.0)


def partition_instances(instances, n_shards):
    """Greedy balanced partition by edge count; returns index lists."""
    order = sorted(range(len(instances)), reverse=True,
                   key=lambda i: instances[i][2].shape[1])
    groups = [[] for _ in range(n_shards)]
    loads = [0] * n_shards
    for i in order:
        d = int(np.argmin(loads))
        groups[d].append(i)
        loads[d] += instances[i][2].shape[1]
    return groups


def _common_dims(shard_insts, granularity=2.0):
    """Elementwise max of each shard's bucketed dims -> one program shape.

    The four padded dims are forced pairwise DISTINCT: remap_state
    classifies state arrays by leading dimension, and per-shard workloads
    routinely floor several dims at bucket_dims' 128 minimum (e.g. V == B
    == 128 for a few small instances per shard), which would make the
    repack raise 'ambiguous packed dims' mid-solve. Bumping a dim up by a
    few slots only adds padding — every consumer masks it."""
    dims = []
    for insts in shard_insts:
        tot_v = sum(int(i[0]) for i in insts)
        tot_f = sum(int(i[1]) for i in insts)
        tot_e = sum(int(i[2].shape[1]) for i in insts)
        dims.append(bucket_dims(tot_v, tot_f, tot_e, len(insts),
                                granularity))
    out = [max(d[k] for d in dims) for k in range(4)]
    seen = set()
    for i in (2, 1, 0, 3):        # E canonical, then F, V, B bump upward
        while out[i] in seen:
            out[i] += 8
        seen.add(out[i])
    return tuple(out)


def _mesh_fns(solver, mesh, axis):
    """shard_map'd first/step/local-search programs, cached on the solver."""
    cache = getattr(solver, "_mesh_compact_fns", None)
    if cache is None:
        cache = solver._mesh_compact_fns = {}
    key = (mesh, axis)
    if key in cache:
        return cache[key]

    def device_step(params, rng, batch, state, carry, n):
        rng = rng[0]
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        state = jax.tree_util.tree_map(lambda x: x[0], state)
        if carry is not None:
            carry = jax.tree_util.tree_map(lambda x: x[0], carry)
        _, s2, c2 = solver.forward(
            params, rng, batch, state, n, is_training=False,
            check_termination=True, carry=carry, finalize=False)
        sv, _ = cnf_evaluate(batch, c2[0].solution[:, None])
        lift = lambda t: jax.tree_util.tree_map(lambda x: x[None], t)
        return lift(s2), lift(c2), sv[None]

    def device_ls(rng, batch, prob, pred, n):
        rng = rng[0]
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        prob = jax.tree_util.tree_map(lambda x: x[0], prob)
        pred = pred[0]
        new = solver.local_search(rng, batch, prob, pred, n)
        av = prob.active_vars[:, None]
        merged = av * new + (1.0 - av) * prob.solution[:, None]
        sv, _ = cnf_evaluate(batch, merged)
        return merged[None], sv[None]

    A = P(axis)
    first = shard_map(
        lambda p, r, b, s, n: device_step(p, r, b, s, None, n),
        mesh=mesh, in_specs=(P(), A, A, A, None), out_specs=(A, A, A),
        check_vma=False)
    step = shard_map(
        device_step, mesh=mesh, in_specs=(P(), A, A, A, A, None),
        out_specs=(A, A, A), check_vma=False)
    ls = shard_map(
        device_ls, mesh=mesh, in_specs=(A, A, A, A, None),
        out_specs=(A, A), check_vma=False)
    fns = (jax.jit(first, static_argnames="n"),
           jax.jit(step, static_argnames="n"),
           jax.jit(ls, static_argnames="n"))
    cache[key] = fns
    return fns


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def _align_batches(batches):
    """Equal pad dims still leave per-shard differences: the ELL adjacency
    tables (var_edges [V, DV] / clause_edges [F, DC]) are max-degree wide,
    and the static fast-path aux can differ. Pad tables to the common width
    (-1 fill) and meet the aux flags so the stacked pytree is uniform."""
    import dataclasses as dc
    dv = max(b.var_edges.shape[1] for b in batches)
    dc_ = max(b.clause_edges.shape[1] for b in batches)
    cw0 = batches[0].clause_width
    same_cw = all(b.clause_width == cw0 for b in batches)
    fv = all(b.fast_var for b in batches)
    fc = same_cw and all(b.fast_clause for b in batches)
    # meet the verified windows: weakest wins (0 = only 2048 verified)
    vw = 0 if any(b.var_window == 0 for b in batches) else max(
        b.var_window for b in batches)

    def pad(tbl, width):
        tbl = np.asarray(tbl)
        if tbl.shape[1] >= width:
            return tbl
        fill = -np.ones((tbl.shape[0], width - tbl.shape[1]), tbl.dtype)
        return np.concatenate([tbl, fill], axis=1)

    return [dc.replace(b, var_edges=pad(b.var_edges, dv),
                       clause_edges=pad(b.clause_edges, dc_),
                       clause_width=cw0 if same_cw else 0,
                       fast_var=fv, fast_clause=fc, var_window=vw)
            for b in batches]


def parallel_compacting_solve(solver, params, rng, instances, iterations, *,
                              mesh, axis_name="dp", ls_iterations=None,
                              chunk=50, ls_chunk=None, min_edges=32768,
                              granularity=2.0, verbose=False):
    """Full solve over `instances` on a data-parallel mesh with progressive
    per-shard batch compaction. Returns (solutions, solved, stats) with the
    same contract as solvers/compact.py compacting_solve."""
    D = int(np.prod(mesh.devices.shape))
    ls_total = (solver.cfg.local_search_iterations
                if ls_iterations is None else ls_iterations)
    ls_chunk = ls_chunk or max(chunk * 4, 200)
    count = len(instances)
    solutions = [None] * count
    solved = [False] * count
    parked = {}

    groups = partition_instances(instances, D)
    live = [list(g) for g in groups]       # original index per shard slot

    def shard_insts():
        return [[instances[i] for i in live[d]] if live[d] else [_DUMMY]
                for d in range(D)]

    insts_d = shard_insts()
    dims = _common_dims(insts_d, granularity)
    batches = _align_batches([pack_instances(ins, *dims)
                              for ins in insts_d])
    slices = [instance_slices(ins) for ins in insts_d]
    rng, *r_init = jax.random.split(rng, D + 1)
    states = [solver.get_init_state(r_init[d], batches[d], randomized=True)
              for d in range(D)]
    batch_st = _stack([jax.tree_util.tree_map(jnp.asarray, b)
                       for b in batches])
    state_st = _stack(states)
    carry_st = None

    first_fn, step_fn, ls_fn = _mesh_fns(solver, mesh, axis_name)

    stats = {"compactions": [], "chunks": 0, "shards": D}
    done = 0
    t0 = time.time()
    while done < iterations and any(live):
        rng, r = jax.random.split(rng)
        rngs = jax.random.split(r, D)
        n = min(chunk, iterations - done)
        if carry_st is None:
            state_st, carry_st, sv = first_fn(params, rngs, batch_st,
                                              state_st, n)
        else:
            state_st, carry_st, sv = step_fn(params, rngs, batch_st,
                                             state_st, carry_st, n)
        done += n
        stats["chunks"] += 1

        active = np.asarray(carry_st[1])       # [D, B]
        solved_b = np.asarray(sv)              # [D, B]
        problem_host = None
        keep = [None] * D
        any_finished = False
        for d in range(D):
            if not live[d]:
                keep[d] = []
                continue
            fin = [s for s in range(len(live[d])) if active[d, s] <= 0]
            if not fin:
                keep[d] = list(range(len(live[d])))
                continue
            any_finished = True
            if problem_host is None:
                problem_host = jax.tree_util.tree_map(np.asarray,
                                                      carry_st[0])
            ph_d = jax.tree_util.tree_map(lambda x: x[d], problem_host)
            keep_d = []
            for slot, orig in enumerate(live[d]):
                if solved_b[d, slot] > 0:
                    v, _, _, n_, _, _ = slices[d][slot]
                    sol = ph_d.solution[v:v + n_]
                    solutions[orig] = (sol > 0.5).astype(np.float32)
                    solved[orig] = True
                elif active[d, slot] > 0:
                    keep_d.append(slot)
                else:
                    _park(parked, orig, ph_d, slices[d], slot)
            keep[d] = keep_d
        if not any_finished:
            continue
        if all(not keep[d] for d in range(D)):
            live = [[] for _ in range(D)]
            break

        # global repack decision: the common bucket must strictly shrink
        new_live = [[live[d][s] for s in keep[d]] for d in range(D)]
        tentative = [[instances[i] for i in new_live[d]]
                     if new_live[d] else [_DUMMY] for d in range(D)]
        new_dims = _common_dims(tentative, granularity)
        if (dims[2] > min_edges and new_dims[2] < dims[2]
                and any(len(new_live[d]) < len(live[d]) for d in range(D))):
            host_state = jax.tree_util.tree_map(np.asarray, state_st)
            host_carry = jax.tree_util.tree_map(np.asarray, carry_st)
            new_batches = _align_batches(
                [pack_instances(tentative[d], *new_dims) for d in range(D)])
            new_slices_all = []
            new_states, new_carries = [], []
            for d in range(D):
                nb = new_batches[d]
                ns = instance_slices(tentative[d])
                sl = lambda t: jax.tree_util.tree_map(lambda x: x[d], t)
                keep_d = keep[d] if new_live[d] else []
                new_states.append(remap_state(
                    sl(host_state), keep_d, batches[d], nb, slices[d], ns))
                new_carries.append(remap_state(
                    sl(host_carry), keep_d, batches[d], nb, slices[d], ns))
                new_slices_all.append(ns)
            live = new_live
            batches, slices = new_batches, new_slices_all
            dims = new_dims
            batch_st = _stack([jax.tree_util.tree_map(jnp.asarray, b)
                               for b in batches])
            state_st = jax.device_put(_stack(new_states))
            carry_st = jax.device_put(_stack(new_carries))
            stats["compactions"].append(
                {"iter": done, "instances": sum(map(len, live)),
                 "edges": dims[2], "per_shard": [len(l) for l in live]})
            if verbose:
                print(f"[compact-mesh] iter {done}: "
                      f"{[len(l) for l in live]} live, E={dims[2]}")
    stats["pdp_wall_s"] = round(time.time() - t0, 3)

    # leftover live instances: park for local search
    if any(live) and carry_st is not None:
        problem_host = jax.tree_util.tree_map(np.asarray, carry_st[0])
        for d in range(D):
            ph_d = jax.tree_util.tree_map(lambda x: x[d], problem_host)
            for slot, orig in enumerate(live[d]):
                _park(parked, orig, ph_d, slices[d], slot)

    # --- local-search phase on the unsolved set, sharded the same way ----
    t1 = time.time()
    todo = [i for i in range(count) if not solved[i] and i in parked]
    if ls_total > 0 and todo:
        ls_groups = partition_instances([instances[i] for i in todo], D)
        # map back to original ids
        ls_live = [[todo[j] for j in g] for g in ls_groups]
        ls_insts = [[instances[i] for i in ls_live[d]] if ls_live[d]
                    else [_DUMMY] for d in range(D)]
        ls_dims = _common_dims(ls_insts, granularity)
        ls_batches = _align_batches(
            [pack_instances(ins, *ls_dims) for ins in ls_insts])
        ls_slices = [instance_slices(ins) for ins in ls_insts]
        probs = [_unpark(parked, ls_live[d], ls_batches[d], ls_slices[d])
                 for d in range(D)]
        prob_st = _stack(probs)
        lb_st = _stack([jax.tree_util.tree_map(jnp.asarray, b)
                        for b in ls_batches])
        rng, r_fill = jax.random.split(rng)
        noise = (jax.random.uniform(
            r_fill, (D, ls_dims[0], 1)) > 0.5).astype(jnp.float32)
        pred = jnp.where(prob_st.active_vars[..., None] > 0, noise,
                         prob_st.solution[..., None])
        done_ls = 0
        sv = np.zeros((D, ls_dims[3]), np.float32)
        # explicit real-slot mask: _DUMMY placeholder instances are packed
        # with instance_mask=1 on shards with no live work, and the exit
        # check must never count a dummy as solved (previously this relied
        # on the dummy's solution staying at 0.5 under cnf_evaluate's
        # strict '> 0.5' literal threshold)
        real_mask = np.zeros((D, ls_dims[3]), np.float32)
        for d in range(D):
            real_mask[d, :len(ls_live[d])] = 1.0
        real_mask = jnp.asarray(real_mask)
        while done_ls < ls_total:
            rng, r = jax.random.split(rng)
            rngs = jax.random.split(r, D)
            n = min(ls_chunk, ls_total - done_ls)
            pred, sv = ls_fn(rngs, lb_st, prob_st, pred, n)
            done_ls += n
            if float(jnp.sum(sv * real_mask)) >= len(todo):
                break
        pred_host = np.asarray(pred)[..., 0]
        sv_host = np.asarray(sv)
        for d in range(D):
            for slot, orig in enumerate(ls_live[d]):
                v, _, _, n_, _, _ = ls_slices[d][slot]
                solutions[orig] = (pred_host[d, v:v + n_]
                                   > 0.5).astype(np.float32)
                solved[orig] = bool(sv_host[d, slot] > 0)
    else:
        for i in todo:
            solutions[i] = (parked[i]["solution"] > 0.5).astype(np.float32)
    stats["ls_wall_s"] = round(time.time() - t1, 3)
    stats["wall_s"] = round(time.time() - t0, 3)
    stats["solved"] = int(sum(solved))

    for i in range(count):
        if solutions[i] is None:
            solutions[i] = np.zeros(int(instances[i][0]), np.float32)
    return solutions, solved, stats
