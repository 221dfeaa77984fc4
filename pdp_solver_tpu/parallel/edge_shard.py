"""Edge-sharded Survey Propagation: context parallelism for giant CNFs.

The reference cannot split a single CNF across devices at all (SURVEY.md
section 2.9: a formula larger than one device's memory is unsupported). Here
a single giant factor graph is sharded BY EDGES across a mesh axis while the
(much smaller) variable/clause node tables stay replicated: every
edges->nodes reduction becomes a local segment-sum followed by a `psum` over
the interconnect, and nodes->edges gathers stay local. This is the
factor-graph analog of ring-attention-style sequence sharding: ICI traffic
per sweep is O(V + F) instead of O(E).

Provided: the SP message sweep and the SP marginal scorer - the compute
core for survey-inspired decimation on industrial-scale formulas.
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
        out_specs=(P(), (P(axis), P(axis))))

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
