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
  * make_edge_sharded_solver - the FULL p-d-p solve on one sharded CNF:
    SP sweeps, convergence-gated greedy decimation, unit-prop + peel
    simplification, and termination, all with psum-reduced node state
    (replicated [V]/[F] arrays, edge arrays sharded). The decimation
    argmax runs on replicated data so every shard picks the same variable.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pdp_solver_tpu.ops import segment_sum, safe_log, safe_exp
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


def shard_instance(n, m, gmap, signs, n_shards, pad_multiple=128):
    """Split one instance's edges into n_shards contiguous, padded shards."""
    E = gmap.shape[1]
    per = -(-E // n_shards)
    per = -(-per // pad_multiple) * pad_multiple
    ev = np.zeros((n_shards, per), np.int32)
    ec = np.zeros((n_shards, per), np.int32)
    es = np.zeros((n_shards, per), np.float32)
    em = np.zeros((n_shards, per), np.float32)
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, E)
        k = max(hi - lo, 0)
        if k > 0:
            ev[s, :k] = gmap[0, lo:hi]
            ec[s, :k] = gmap[1, lo:hi]
            es[s, :k] = signs[lo:hi]
            em[s, :k] = 1.0
    return EdgeShardedGraph(edge_var=jnp.asarray(ev),
                            edge_clause=jnp.asarray(ec),
                            edge_sign=jnp.asarray(es),
                            edge_mask=jnp.asarray(em),
                            num_vars=int(n), num_clauses=int(m))


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
            dc = same + opp
            s_ = safe_exp(same)
            o_ = safe_exp(opp)
            d_ = safe_exp(dc)
            q_u = s_ * (1 - o_)
            q_s = o_ * (1 - s_)
            total = q_u + q_s + d_
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


def make_edge_sharded_solver(graph_template: EdgeShardedGraph, *,
                             mesh: Mesh, axis="es", iteration_num=200,
                             tolerance=0.02, t_max=100.0):
    """Full SP-guided decimation (p-d-p, B=1) on one edge-sharded CNF.

    Single-instance port of the solver loop (solvers/base.py:_forward_core +
    modules/decimate.py sequential decimator + problem/simplify.py fused
    round), with every edges->nodes reduce replaced by a shard-local
    segment_sum + psum. Node state (active_vars [V], active_clauses [F],
    solution [V]) is replicated; decimation decisions are computed from
    replicated data, so all shards stay in lockstep.

    Returns jitted run(graph, var_state, fn_state, rng) ->
    (solution01 [V], solved f32[], iterations_used f32[]).
    """
    V = graph_template.num_vars
    F = graph_template.num_clauses

    def device_fn(rng, ev, ec, es, em, var_state, fn_state):
        ev, ec, es, em = ev[0], ec[0], es[0], em[0]
        var_state, fn_state = var_state[0], fn_state[0]

        def vsum(x_e):
            return jax.lax.psum(segment_sum(x_e, ev, V), axis)

        def csum(x_e):
            return jax.lax.psum(segment_sum(x_e, ec, F), axis)

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
            dc = same + opp
            s_, o_, d_ = safe_exp(same), safe_exp(opp), safe_exp(dc)
            q_u = s_ * (1 - o_)
            q_s = o_ * (1 - s_)
            total = q_u + q_s + d_
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
            av, af, sol, unsat, changed = carry
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

            # single instance: a unit conflict makes the formula UNSAT -
            # deactivate everything (mirrors the batched fused round)
            conflict = jnp.sum(((jnp.abs(var_eval) != input_num)
                                .astype(jnp.float32)) * av) >= 1
            unsat = jnp.maximum(unsat, conflict.astype(jnp.float32))
            av = jnp.where(conflict, 0.0, av)
            af_new = jnp.where(conflict, 0.0, af_new)

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
                       + conflict.astype(jnp.float32)) > 0
            return av, af_new, sol, unsat, changed

        def simplify(av, af, sol, unsat):
            def cond(c):
                return c[4]

            carry = jax.lax.while_loop(
                cond, simplify_round, (av, af, sol, unsat,
                                       jnp.sum(em) >= 0))
            return carry[0], carry[1], carry[2], carry[3]

        def iteration(carry):
            (var_state, fn_state, av, af, sol, unsat, prev_eta, counter,
             has_prev, it, rng) = carry
            e_mask = av[ev] * af[ec] * em
            new_var, new_fn = sweep(var_state, fn_state, e_mask)
            eta = new_fn[:, 0]

            # convergence: smooth-max of |prev - eta| per var, max over vars
            diff = jnp.abs(prev_eta - eta) * e_mask
            coeff = safe_exp(30.0 * diff) * em
            nd_n = vsum(diff * coeff)
            nd_d = vsum(coeff)
            diff_v = nd_n / jnp.maximum(nd_d, 1.0) * av
            diff_max = jnp.max(diff_v)

            gate = has_prev * (jnp.sum(av) > 0)
            converged = (diff_max < tolerance).astype(jnp.float32)
            old_counter = counter
            counter = jnp.where(converged > 0, 0.0, counter)
            timeout = (counter >= t_max).astype(jnp.float32)
            flag = jnp.maximum(converged, timeout) * gate
            counter = jnp.where(timeout > 0, 0.0, counter) + 1.0
            # counter effects only apply behind the gate (first iteration
            # keeps its original value, like the batched decimator)
            counter = gate * counter + (1.0 - gate) * old_counter

            score = score_fn(eta, af, e_mask)
            coeff_v = jnp.abs(score) * av
            decimate = flag * (jnp.sum(coeff_v) != 0)
            best = jnp.argmax(coeff_v)
            assignment = jnp.zeros((V,)).at[best].set(
                jnp.sign(score[best]) * decimate)

            def do_decimate(args):
                av, af, sol, unsat = args
                assigned = jnp.abs(assignment) == 1
                av2 = jnp.where(assigned, 0.0, av)
                sol2 = jnp.where(assigned, (assignment + 1.0) / 2.0, sol)
                return simplify(av2, af, sol2, unsat)

            av, af, sol, unsat = jax.lax.cond(
                decimate > 0, do_decimate, lambda a: a,
                (av, af, sol, unsat))

            return (new_var, new_fn, av, af, sol, unsat, eta, counter,
                    jnp.ones_like(has_prev), it + 1.0, rng)

        def cond(carry):
            af, it = carry[3], carry[9]
            return jnp.logical_and(it < iteration_num, jnp.sum(af) > 0)

        # node state rides the while_loop carry next to the (sharded,
        # varying) edge state, so it must enter with matching varying type;
        # replicas stay numerically identical throughout
        def varying(x):
            return jax.lax.pcast(x, axis, to="varying")

        av0 = varying(jnp.ones((V,), jnp.float32))
        af0 = varying(jnp.ones((F,), jnp.float32))
        sol0 = varying(0.5 * jnp.ones((V,), jnp.float32))
        zero = jnp.sum(em) * 0.0
        # pre-solve simplification (simplify_first, solvers/base.py:289-290)
        av0, af0, sol0, unsat0 = simplify(av0, af0, sol0, zero)
        carry = (var_state, fn_state, av0, af0, sol0, unsat0,
                 jnp.zeros_like(em), zero, zero, zero, varying(rng))
        carry = jax.lax.while_loop(cond, iteration, carry)
        var_state, fn_state = carry[0], carry[1]
        av, af, sol, unsat, it = (carry[2], carry[3], carry[4], carry[5],
                                  carry[9])

        # still-active variables get uniform random fill (identity predictor
        # last call, pdp_predict.py:118-128)
        noise = (jax.random.uniform(rng, (V,)) > 0.5).astype(jnp.float32)
        sol = jnp.where(av > 0, noise, sol)
        # a conflict empties the graph too; it must never read as solved
        solved = ((jnp.sum(af) == 0).astype(jnp.float32) * (1.0 - unsat))
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
