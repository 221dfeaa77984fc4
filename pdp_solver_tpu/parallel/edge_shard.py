"""Edge-sharded Survey Propagation: context parallelism for giant CNFs.

The reference cannot split a single CNF across devices at all (SURVEY.md
section 2.9: a formula larger than one device's memory is unsupported). Here
a single giant factor graph is sharded BY EDGES across a mesh axis while the
(much smaller) variable/clause node tables stay replicated: every
edges->nodes reduction becomes a local segment-sum followed by a `psum` over
the interconnect, and nodes->edges gathers stay local. This is the
factor-graph analog of ring-attention-style sequence sharding: ICI traffic
per sweep is O(V + F) instead of O(E).

Provided:
  * make_edge_sharded_sp     - SP sweeps + marginal scorer (marginals only)
  * make_edge_sharded_solver - the FULL p-d-p solve on a sharded batch
    (B >= 1 packed instances): SP sweeps, convergence-gated greedy
    decimation, unit-prop + peel simplification, per-instance termination,
    AND the epsilon-greedy WalkSAT local-search phase (reference
    solver.py:433-467) with psum-reduced break counts — all with
    replicated [V]/[F]/[B] node state and sharded edge arrays. Decimation
    and flip argmaxes run on replicated data so every shard stays in
    lockstep.
  * shard_batch              - shard a packed FGBatch's edge list
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pdp_solver_tpu.ops import segment_sum, safe_log, safe_exp
from pdp_solver_tpu.modules.propagate import q_triplet_stable
from pdp_solver_tpu.ops.segment import LOG_EPS_PROP, LOG_EPS_SCORE


class EdgeShardedGraph(NamedTuple):
    """One giant CNF, edge-sharded: edge arrays carry a leading [n_shards]
    axis; num_vars / num_clauses are global (replicated node space)."""
    edge_var: jnp.ndarray     # i32[S, Es]
    edge_clause: jnp.ndarray  # i32[S, Es]
    edge_sign: jnp.ndarray    # f32[S, Es]
    edge_mask: jnp.ndarray    # f32[S, Es]
    num_vars: int
    num_clauses: int


class EdgeShardedBatch(NamedTuple):
    """B >= 1 packed instances (fg/batch.py layout), edge-sharded. Node
    space ([V]/[F]/[B] arrays) stays replicated across shards."""
    edge_var: jnp.ndarray      # i32[S, Es]
    edge_clause: jnp.ndarray   # i32[S, Es]
    edge_sign: jnp.ndarray     # f32[S, Es]
    edge_mask: jnp.ndarray     # f32[S, Es]
    var_batch: jnp.ndarray     # i32[V] instance id per variable
    clause_batch: jnp.ndarray  # i32[F]
    var_mask: jnp.ndarray      # f32[V]
    clause_mask: jnp.ndarray   # f32[F]
    instance_mask: jnp.ndarray  # f32[B]
    num_vars: int
    num_clauses: int
    batch_size: int


def _shard_edge_arrays(ev, ec, es, E, n_shards, pad_multiple):
    per = -(-E // n_shards)
    per = -(-per // pad_multiple) * pad_multiple
    sv = np.zeros((n_shards, per), np.int32)
    sc = np.zeros((n_shards, per), np.int32)
    ss = np.zeros((n_shards, per), np.float32)
    sm = np.zeros((n_shards, per), np.float32)
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, E)
        k = max(hi - lo, 0)
        if k > 0:
            sv[s, :k] = ev[lo:hi]
            sc[s, :k] = ec[lo:hi]
            ss[s, :k] = es[lo:hi]
            sm[s, :k] = 1.0
    return sv, sc, ss, sm


def shard_batch(batch, n_shards, pad_multiple=128) -> EdgeShardedBatch:
    """Shard a packed FGBatch's edge list into n_shards contiguous padded
    shards; node-space arrays are carried replicated."""
    ev = np.asarray(batch.edge_var)
    ec = np.asarray(batch.edge_clause)
    es = np.asarray(batch.edge_sign)
    em = np.asarray(batch.edge_mask)
    real = em > 0
    sv, sc, ss, sm = _shard_edge_arrays(
        ev[real], ec[real], es[real], int(real.sum()), n_shards,
        pad_multiple)
    return EdgeShardedBatch(
        edge_var=jnp.asarray(sv), edge_clause=jnp.asarray(sc),
        edge_sign=jnp.asarray(ss), edge_mask=jnp.asarray(sm),
        var_batch=jnp.asarray(np.asarray(batch.var_batch, np.int32)),
        clause_batch=jnp.asarray(np.asarray(batch.clause_batch, np.int32)),
        var_mask=jnp.asarray(np.asarray(batch.var_mask, np.float32)),
        clause_mask=jnp.asarray(np.asarray(batch.clause_mask, np.float32)),
        instance_mask=jnp.asarray(
            np.asarray(batch.instance_mask, np.float32)),
        num_vars=int(batch.num_vars), num_clauses=int(batch.num_clauses),
        batch_size=int(batch.batch_size))


def shard_instance(n, m, gmap, signs, n_shards, pad_multiple=128):
    """Split one instance's edges into n_shards contiguous, padded shards."""
    ev, ec, es, em = _shard_edge_arrays(
        gmap[0], gmap[1], signs, gmap.shape[1], n_shards, pad_multiple)
    return EdgeShardedGraph(edge_var=jnp.asarray(ev),
                            edge_clause=jnp.asarray(ec),
                            edge_sign=jnp.asarray(es),
                            edge_mask=jnp.asarray(em),
                            num_vars=int(n), num_clauses=int(m))


def _as_batch(graph) -> EdgeShardedBatch:
    """Promote a single-instance EdgeShardedGraph to a B=1 batch."""
    if isinstance(graph, EdgeShardedBatch):
        return graph
    V, F = graph.num_vars, graph.num_clauses
    return EdgeShardedBatch(
        edge_var=graph.edge_var, edge_clause=graph.edge_clause,
        edge_sign=graph.edge_sign, edge_mask=graph.edge_mask,
        var_batch=jnp.zeros((V,), jnp.int32),
        clause_batch=jnp.zeros((F,), jnp.int32),
        var_mask=jnp.ones((V,), jnp.float32),
        clause_mask=jnp.ones((F,), jnp.float32),
        instance_mask=jnp.ones((1,), jnp.float32),
        num_vars=V, num_clauses=F, batch_size=1)


def make_edge_sharded_sp(graph_template: EdgeShardedGraph, n_iters, *,
                         mesh: Mesh, axis="es"):
    """Jitted (sharded_graph, var_state [S,Es,3], fn_state [S,Es,2]) ->
    (marginal score [V], final eta [S,Es]) running n_iters SP sweeps with
    psum-reduced node aggregations."""
    V = graph_template.num_vars
    F = graph_template.num_clauses

    def device_fn(ev, ec, es, em, var_state, fn_state):
        ev, ec, es, em = ev[0], ec[0], es[0], em[0]
        var_state, fn_state = var_state[0], fn_state[0]

        def vsum(x_e):
            return jax.lax.psum(segment_sum(x_e * em, ev, V), axis)

        def csum(x_e):
            return jax.lax.psum(segment_sum(x_e * em, ec, F), axis)

        pos_w = (es == 1).astype(jnp.float32)
        neg_w = (es == -1).astype(jnp.float32)

        def sweep(carry, _):
            var_state, fn_state = carry
            # clause -> var (from the previous var->clause triplet)
            log_u = safe_log(var_state[:, 0], LOG_EPS_PROP) * em
            eta = safe_exp(csum(log_u)[ec] - log_u)
            # var -> clause, fed by the PREVIOUS sweep's survey exactly like
            # the reference's two-stream update (pdp_propagate.py:161-218)
            log1m = safe_log(1.0 - fn_state[:, 0], LOG_EPS_PROP) * em
            pos = vsum(log1m * pos_w)[ev]
            neg = vsum(log1m * neg_w)[ev]
            same = 0.5 * (1 + es) * pos + 0.5 * (1 - es) * neg - log1m
            opp = 0.5 * (1 - es) * pos + 0.5 * (1 + es) * neg
            q_u, q_s, d_, total = q_triplet_stable(same, opp)
            new_var = jnp.stack([q_u, q_s, d_], axis=1) / total[:, None]
            new_fn = jnp.stack([eta, fn_state[:, 1]], axis=1)
            return (new_var, new_fn), None

        (var_state, fn_state), _ = jax.lax.scan(
            sweep, (var_state, fn_state), None, length=n_iters)

        # SP marginal bias per variable (scorer, psum-reduced)
        eta = fn_state[:, 0]
        fm = safe_log(1.0 - eta, LOG_EPS_SCORE) * em
        pos = vsum(fm * pos_w)
        neg = vsum(fm * neg_w)
        pns = pos + neg
        dc = vsum(fm)
        bias = (2.0 * pns + dc) / 4.0
        q0 = safe_exp(pos - bias) - safe_exp(pns - bias)
        q1 = safe_exp(neg - bias) - safe_exp(pns - bias)
        total = safe_log(q0 + q1 + safe_exp(dc - bias), LOG_EPS_SCORE)
        score = (safe_exp(safe_log(q1, LOG_EPS_SCORE) - total)
                 - safe_exp(safe_log(q0, LOG_EPS_SCORE) - total))
        return score, (var_state[None], fn_state[None])

    sharded = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), (P(axis), P(axis))), check_vma=False)

    @jax.jit
    def run(graph: EdgeShardedGraph, var_state, fn_state):
        return sharded(graph.edge_var, graph.edge_clause, graph.edge_sign,
                       graph.edge_mask, var_state, fn_state)

    return run


def init_states(graph: EdgeShardedGraph, rng, randomized=True):
    S, Es = graph.edge_var.shape
    if randomized:
        r1, r2 = jax.random.split(rng)
        v = jax.random.uniform(r1, (S, Es, 3))
        v = v / jnp.sum(v, axis=-1, keepdims=True)
        f = jax.random.uniform(r2, (S, Es, 2))
        f = f.at[..., 1].set(0.0)
    else:
        v = jnp.ones((S, Es, 3), jnp.float32) / 3.0
        f = 0.5 * jnp.ones((S, Es, 2), jnp.float32)
        f = f.at[..., 1].set(0.0)
    return v, f


def make_edge_sharded_solver(graph_template, *,
                             mesh: Mesh, axis="es", iteration_num=200,
                             tolerance=0.02, t_max=100.0,
                             ls_iterations=0, epsilon=0.5):
    """Full SP-guided decimation (p-d-p) on an edge-sharded batch.

    Port of the solver loop (solvers/base.py:_forward_core + the sequential
    decimator modules/decimate.py + problem/simplify.py fused round + the
    WalkSAT post-processor solvers/base.py:_local_search, matching reference
    src/pdp/nn/solver.py:324-496) with every edges->nodes reduce replaced by
    a shard-local segment_sum + psum. Node state (active_vars [V],
    active_clauses [F], solution [V], per-instance flags [B]) is replicated;
    decimation and flip decisions are computed from replicated data, so all
    shards stay in lockstep.

    `graph_template` is an EdgeShardedBatch (B >= 1) or a single-instance
    EdgeShardedGraph (promoted to B=1). With ls_iterations > 0, instances
    whose decimation stalls get the epsilon-greedy WalkSAT phase on the
    still-active subgraph — sharded break counts via the same psum pattern.

    Returns jitted run(graph, var_state, fn_state, rng) ->
    (solution01 [V], solved f32[B], iterations_used f32[], states).
    """
    tmpl = _as_batch(graph_template)
    V = tmpl.num_vars
    F = tmpl.num_clauses
    B = tmpl.batch_size
    # node-space structure is part of the compiled program (it defines the
    # packing layout, like the shapes themselves)
    vb = jnp.asarray(tmpl.var_batch)
    cb = jnp.asarray(tmpl.clause_batch)
    var_mask_c = jnp.asarray(tmpl.var_mask)
    clause_mask_c = jnp.asarray(tmpl.clause_mask)
    imask_c = jnp.asarray(tmpl.instance_mask)

    def device_fn(rng, ev, ec, es, em, var_state, fn_state):
        ev, ec, es, em = ev[0], ec[0], es[0], em[0]
        var_state, fn_state = var_state[0], fn_state[0]

        def vsum(x_e):
            return jax.lax.psum(segment_sum(x_e, ev, V), axis)

        def csum(x_e):
            return jax.lax.psum(segment_sum(x_e, ec, F), axis)

        # replicated node space -> per-instance reductions are local ops
        def bsum_v(x_v):
            return segment_sum(x_v, vb, B, indices_are_sorted=True)

        def bsum_f(x_f):
            return segment_sum(x_f, cb, B, indices_are_sorted=True)

        def argmax_first_v(x_v, valid):
            """Per-instance argmax with first-index tie-break (parity with
            ops/segment.py segment_argmax_first). Returns (idx [B], max [B]);
            idx == V for instances with no valid entry."""
            neg = jnp.float32(-3.0e38)
            xm = jnp.where(valid > 0, x_v, neg)
            m = jax.ops.segment_max(xm, vb, B, indices_are_sorted=True)
            is_max = (valid > 0) & (xm >= m[vb])
            idx = jax.ops.segment_min(
                jnp.where(is_max, jnp.arange(V, dtype=jnp.int32), V),
                vb, B, indices_are_sorted=True)
            return idx, m

        pos_w = (es == 1).astype(jnp.float32)
        neg_w = (es == -1).astype(jnp.float32)

        def sweep(var_state, fn_state, e_mask):
            log_u = safe_log(var_state[:, 0], LOG_EPS_PROP) * e_mask
            eta = safe_exp(csum(log_u)[ec] - log_u)
            log1m = safe_log(1.0 - fn_state[:, 0], LOG_EPS_PROP) * e_mask
            pos = vsum(log1m * pos_w)[ev]
            neg = vsum(log1m * neg_w)[ev]
            same = 0.5 * (1 + es) * pos + 0.5 * (1 - es) * neg - log1m
            opp = 0.5 * (1 - es) * pos + 0.5 * (1 + es) * neg
            q_u, q_s, d_, total = q_triplet_stable(same, opp)
            new_var = jnp.stack([q_u, q_s, d_], axis=1) / total[:, None]
            return new_var, jnp.stack([eta, fn_state[:, 1]], axis=1)

        def score_fn(eta, active_clauses, e_mask):
            fm = safe_log(1.0 - eta, LOG_EPS_SCORE)
            fm = fm * active_clauses[ec] * e_mask
            pos = vsum(fm * pos_w)
            neg = vsum(fm * neg_w)
            dc = vsum(fm)
            pns = pos + neg
            bias = (2.0 * pns + dc) / 4.0
            q0 = safe_exp(pos - bias) - safe_exp(pns - bias)
            q1 = safe_exp(neg - bias) - safe_exp(pns - bias)
            total = safe_log(q0 + q1 + safe_exp(dc - bias), LOG_EPS_SCORE)
            return (safe_exp(safe_log(q1, LOG_EPS_SCORE) - total)
                    - safe_exp(safe_log(q0, LOG_EPS_SCORE) - total))

        def simplify_round(carry):
            av, af, sol, unsat_b, changed = carry
            av_e = av[ev]
            sol_e = sol[ev]
            lit_true = jnp.where(es > 0, sol_e >= 1.0, sol_e <= 0.0)
            assigned_true = (lit_true & (av_e <= 0)).astype(jnp.float32)
            degree_f = csum(av_e * em)
            sat_f = csum(assigned_true * em)
            af_new = jnp.where(sat_f > 0, 0.0, af)
            removed = jnp.sum(af - af_new)
            single_f = (degree_f == 1).astype(jnp.float32) * af_new

            s_e = single_f[ec] * em
            c_e = af_new[ec] * em
            input_num = vsum(s_e)
            var_eval = vsum(es * s_e)
            degree_v = vsum(c_e)
            signed_degree_v = vsum(es * c_e)

            # a unit conflict makes ITS instance UNSAT: deactivate that
            # instance's nodes only (mirrors the batched fused round)
            conflict_v = ((jnp.abs(var_eval) != input_num)
                          .astype(jnp.float32)) * av
            conflict_b = (bsum_v(conflict_v) >= 1).astype(jnp.float32)
            unsat_b = jnp.maximum(unsat_b, conflict_b)
            av = av * (1.0 - conflict_b[vb])
            af_new = af_new * (1.0 - conflict_b[cb])

            forced = ((input_num > 0)
                      & (jnp.abs(var_eval) == input_num)).astype(jnp.float32) * av
            pure = ((degree_v == jnp.abs(signed_degree_v))
                    .astype(jnp.float32) * av * (1.0 - forced))
            value = (forced * jnp.sign(var_eval)
                     + pure * jnp.sign(signed_degree_v))
            fixed = jnp.maximum(forced, pure * (degree_v > 0)) \
                * (jnp.abs(value) > 0)
            deact = jnp.maximum(forced * (jnp.abs(value) > 0), pure)
            sol = jnp.where(fixed > 0, (value + 1.0) / 2.0, sol)
            av = jnp.where(deact > 0, 0.0, av)
            changed = (removed + jnp.sum(deact)
                       + jnp.sum(conflict_b)) > 0
            return av, af_new, sol, unsat_b, changed

        def simplify(av, af, sol, unsat_b):
            def cond(c):
                return c[4]

            carry = jax.lax.while_loop(
                cond, simplify_round, (av, af, sol, unsat_b,
                                       jnp.sum(em) >= 0))
            return carry[0], carry[1], carry[2], carry[3]

        def iteration(carry):
            (var_state, fn_state, av, af, sol, unsat_b, prev_eta, counter_b,
             has_prev, it, rng) = carry
            e_mask = av[ev] * af[ec] * em
            new_var, new_fn = sweep(var_state, fn_state, e_mask)
            eta = new_fn[:, 0]

            # convergence: smooth-max of |prev - eta| per var, then max
            # over each instance's vars (modules/decimate.py _smax_scorer)
            diff = jnp.abs(prev_eta - eta) * e_mask
            coeff = safe_exp(30.0 * diff) * em
            nd_n = vsum(diff * coeff)
            nd_d = vsum(coeff)
            diff_v = nd_n / jnp.maximum(nd_d, 1.0) * av
            diff_b = jax.ops.segment_max(diff_v, vb, B,
                                         indices_are_sorted=True)

            gate_b = has_prev * (bsum_v(av) > 0).astype(jnp.float32)
            converged_b = (diff_b < tolerance).astype(jnp.float32)
            old_counter = counter_b
            counter_b = jnp.where(converged_b > 0, 0.0, counter_b)
            timeout_b = (counter_b >= t_max).astype(jnp.float32)
            flag_b = jnp.maximum(converged_b, timeout_b) * gate_b
            counter_b = jnp.where(timeout_b > 0, 0.0, counter_b) + 1.0
            # counter effects only apply behind the gate (first iteration
            # keeps its original value, like the batched decimator)
            counter_b = gate_b * counter_b + (1.0 - gate_b) * old_counter

            score = score_fn(eta, af, e_mask)
            coeff_v = jnp.abs(score) * av
            best_idx, _ = argmax_first_v(coeff_v, av)
            decimate_b = flag_b * (bsum_v(coeff_v) != 0)
            sel_v = ((jnp.arange(V, dtype=jnp.int32) == best_idx[vb])
                     & (decimate_b[vb] > 0))

            def do_decimate(args):
                av, af, sol, unsat_b = args
                av2 = jnp.where(sel_v, 0.0, av)
                sol2 = jnp.where(sel_v, (jnp.sign(score) + 1.0) / 2.0, sol)
                return simplify(av2, af, sol2, unsat_b)

            av, af, sol, unsat_b = jax.lax.cond(
                jnp.sum(decimate_b) > 0, do_decimate, lambda a: a,
                (av, af, sol, unsat_b))

            return (new_var, new_fn, av, af, sol, unsat_b, eta, counter_b,
                    jnp.ones_like(has_prev), it + 1.0, rng)

        def cond(carry):
            af, it = carry[3], carry[9]
            return jnp.logical_and(it < iteration_num, jnp.sum(af) > 0)

        def walksat(rng, av, af, sol):
            """Epsilon-greedy WalkSAT on the still-active subgraph, sharded
            break counts (reference solver.py:433-467 / the unsharded
            solvers/base.py:_local_search). Returns (sol01 [V],
            energy [B])."""
            rng, r_init = jax.random.split(rng)
            noise01 = (jax.random.uniform(r_init, (V,))
                       > 0.5).astype(jnp.float32)
            assign = av * (2.0 * noise01 - 1.0)
            e_mask = av[ev] * af[ec] * em
            arange_v = jnp.arange(V, dtype=jnp.int32)

            def energies(assign):
                dist = es * assign[ev] * em
                deg_e = av[ev] * em
                agg_f = csum(dist)
                degree_f = csum(deg_e)
                unsat_f = ((agg_f == -degree_f).astype(jnp.float32) * af)
                return dist, agg_f, degree_f, unsat_f, bsum_f(unsat_f)

            def body(carry):
                assign, rng, it, _ = carry
                rng, r_coin, r_rand = jax.random.split(rng, 3)
                dist, agg_f, degree_f, unsat_f, energy_b = energies(assign)
                unsat_b = ((energy_b > 0).astype(jnp.float32) * imask_c)
                done = jnp.sum(unsat_b) <= 0

                # critical edges: clause decided solely by this literal
                critical = (((agg_f[ec] - dist) == (1.0 - degree_f[ec]))
                            .astype(jnp.float32) * e_mask)
                delta = vsum(critical * dist)
                unsat_v = ((vsum(unsat_f[ec] * em) * av)
                           > 0).astype(jnp.float32)

                best_idx, _ = argmax_first_v(-delta, var_mask_c)
                noise = unsat_v * jax.random.uniform(r_rand, (V,))
                rand_idx, _ = argmax_first_v(noise, var_mask_c)
                coin = jax.random.uniform(r_coin, (B,)) > epsilon
                chosen = jnp.where(coin, best_idx, rand_idx)
                sel = ((arange_v == chosen[vb]) & (unsat_b[vb] > 0))
                assign = jnp.where(sel, -assign, assign)
                return assign, rng, it + 1.0, done

            def ws_cond(carry):
                it, done = carry[2], carry[3]
                return jnp.logical_and(it < ls_iterations,
                                       jnp.logical_not(done))

            zero_it = jnp.sum(em) * 0.0
            assign, _, _, _ = jax.lax.while_loop(
                ws_cond, body, (assign, rng, zero_it, zero_it > 1.0))
            _, _, _, _, energy_b = energies(assign)
            sol_ws = jnp.where(av > 0, (assign + 1.0) / 2.0, sol)
            return sol_ws, energy_b

        # node state rides the while_loop carry next to the (sharded,
        # varying) edge state, so it must enter with matching varying type;
        # replicas stay numerically identical throughout
        def varying(x):
            return jax.lax.pcast(x, axis, to="varying")

        av0 = varying(var_mask_c)
        af0 = varying(clause_mask_c)
        sol0 = varying(0.5 * jnp.ones((V,), jnp.float32))
        zero = jnp.sum(em) * 0.0
        unsat0 = jnp.zeros((B,), jnp.float32) + zero
        counter0 = jnp.zeros((B,), jnp.float32) + zero
        # pre-solve simplification (simplify_first, solvers/base.py:289-290)
        av0, af0, sol0, unsat0 = simplify(av0, af0, sol0, unsat0)
        carry = (var_state, fn_state, av0, af0, sol0, unsat0,
                 jnp.zeros_like(em), counter0, zero, zero, varying(rng))
        carry = jax.lax.while_loop(cond, iteration, carry)
        var_state, fn_state = carry[0], carry[1]
        av, af, sol, unsat_b, it = (carry[2], carry[3], carry[4], carry[5],
                                    carry[9])

        if ls_iterations > 0:
            # local-search phase rescues instances whose decimation stalled
            sol, energy_b = walksat(carry[10], av, af, sol)
            solved = ((energy_b <= 0).astype(jnp.float32)
                      * (1.0 - unsat_b) * imask_c)
        else:
            # still-active variables get uniform random fill (identity
            # predictor last call, pdp_predict.py:118-128)
            noise = (jax.random.uniform(rng, (V,)) > 0.5).astype(jnp.float32)
            sol = jnp.where(av > 0, noise, sol)
            # a conflict empties the graph too; must never read as solved
            solved = ((bsum_f(af) == 0).astype(jnp.float32)
                      * (1.0 - unsat_b) * imask_c)
        # collapse the identical replicas back to an invariant output
        sol = jax.lax.pmax(sol, axis)
        solved = jax.lax.pmax(solved, axis)
        it = jax.lax.pmax(it, axis)
        return sol, solved, it, (var_state[None], fn_state[None])

    sharded = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), (P(axis), P(axis))), check_vma=False)

    @jax.jit
    def run(graph: EdgeShardedGraph, var_state, fn_state, rng):
        return sharded(rng, graph.edge_var, graph.edge_clause,
                       graph.edge_sign, graph.edge_mask, var_state, fn_state)

    return run
