"""Decimators (reference src/pdp/nn/pdp_decimate.py).

Three flavours:
  NeuralDecimator     - per-edge GRU cells over the propagator messages
  SequentialDecimator - greedy: per instance, once messages converge (or time
                        out), fix the max-|score| variable and re-simplify
  ReinforceDecimator  - concurrent: stochastically overwrite the external
                        force with the sign of each variable's score

The sequential/reinforce decimators are stateful across iterations; their
state is an explicit pytree threaded through the solver loop (no Python-side
mutation, no host syncs - everything the reference did with `.sum() > 0`
branches becomes masked updates / `lax.cond`).
"""

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch
from pdp_solver_tpu.modules import common, mlp
from pdp_solver_tpu.modules.common import col
from pdp_solver_tpu.ops.segment import (
    segment_argmax_first, segment_max, segment_max_shifted)
from pdp_solver_tpu.ops import safe_exp, safe_log, segment_sum
from pdp_solver_tpu.ops.segment import LOG_EPS_SCORE
from pdp_solver_tpu.problem.simplify import fused_set_variables
from pdp_solver_tpu.problem.state import ProblemState


# --------------------------------------------------------------------------
# Neural decimator
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class NeuralDecimatorConfig:
    var_message_dim: int
    fn_message_dim: int
    meta_dim: int
    hidden_dim: int
    edge_dim: int
    dropout: float
    compute_dtype: str = "float32"


def neural_decimator_init(rng, cfg: NeuralDecimatorConfig):
    r1, r2 = jax.random.split(rng)
    return {
        "var_gru": mlp.gru_cell_init(
            r1, cfg.var_message_dim + cfg.edge_dim + cfg.meta_dim,
            cfg.hidden_dim),
        "fn_gru": mlp.gru_cell_init(
            r2, cfg.fn_message_dim + cfg.edge_dim + cfg.meta_dim,
            cfg.hidden_dim),
    }


def neural_decimator_apply(params, cfg: NeuralDecimatorConfig, batch: FGBatch,
                           dec_state, message_state, active_edge,
                           meta_e=None):
    """Reference pdp_decimate.py:51-87: two GRU cells over persistent edge
    states, frozen for instances that have terminated."""
    old_var, old_fn = dec_state
    msg_var, msg_fn = message_state
    if isinstance(msg_var, tuple):
        # SP messages arrive as 1-D columns (p-nd-np); the GRU input wants
        # an [E, k] feature block
        msg_var = jnp.stack(msg_var, axis=1)
        msg_fn = jnp.stack(msg_fn, axis=1)
    feat = col(batch.edge_sign)
    mask = col(active_edge)

    def with_meta(x):
        return x if meta_e is None else jnp.concatenate([x, meta_e], axis=1)

    if cfg.compute_dtype == "bfloat16":
        def gru(p, x, h):
            out = mlp.gru_cell_apply(mlp.cast_tree(p, jnp.bfloat16),
                                     x.astype(jnp.bfloat16),
                                     h.astype(jnp.bfloat16))
            return out.astype(h.dtype)
    else:
        gru = mlp.gru_cell_apply

    v_in = with_meta(jnp.concatenate([msg_var, feat], axis=1))
    var_state = (mask * gru(params["var_gru"], v_in, old_var)
                 + (1.0 - mask) * old_var)

    f_in = with_meta(jnp.concatenate([msg_fn, feat], axis=1))
    fn_state = (mask * gru(params["fn_gru"], f_in, old_fn)
                + (1.0 - mask) * old_fn)

    return var_state, fn_state


def neural_decimator_init_state(rng, cfg: NeuralDecimatorConfig, num_edges,
                                randomized):
    if randomized:
        r1, r2 = jax.random.split(rng)
        v = 2.0 * jax.random.uniform(r1, (num_edges, cfg.hidden_dim)) - 1.0
        f = 2.0 * jax.random.uniform(r2, (num_edges, cfg.hidden_dim)) - 1.0
    else:
        v = jnp.zeros((num_edges, cfg.hidden_dim), jnp.float32)
        f = jnp.zeros((num_edges, cfg.hidden_dim), jnp.float32)
    return v, f


# --------------------------------------------------------------------------
# Sequential (greedy) decimator
# --------------------------------------------------------------------------

def _smax_pass2(gathered, edge_vals):
    """Smooth-max numerator/denominator for the convergence diff."""
    prev_eta, eta, em, bmask = edge_vals
    diff = jnp.abs(prev_eta - eta) * em
    c = safe_exp(30.0 * diff) * bmask
    return (diff * c, c), ()


def _smax_pass4(gathered, edge_vals):
    """Smooth-max columns for the convergence diff AND the paramagnetic
    survey max, in one reduce."""
    prev_eta, eta, em, bmask = edge_vals
    diff = jnp.abs(prev_eta - eta) * em
    cd = safe_exp(30.0 * diff) * bmask
    ce = safe_exp(30.0 * eta) * bmask
    return (diff * cd, cd, eta * ce, ce), ()


def _smax_scorer_pass(gathered, edge_vals):
    """_smax_pass4 PLUS the survey scorer's four aggregation columns
    (predict.py _scorer_pass), one edge->var reduce: the scorer reads the
    same surveys the convergence test just streamed, so fusing them saves
    a full pass over the messages per decimation iteration."""
    (ac_e,) = gathered
    prev_eta, eta, em, bmask, force, sign = edge_vals
    diff = jnp.abs(prev_eta - eta) * em
    cd = safe_exp(30.0 * diff) * bmask
    ce = safe_exp(30.0 * eta) * bmask
    em_s = ac_e * bmask
    fm1 = safe_log(1.0 - eta, LOG_EPS_SCORE) * em_s
    pos_w = jnp.where(sign == 1, 1.0, 0.0)
    neg_w = jnp.where(sign == -1, 1.0, 0.0)
    return (diff * cd, cd, eta * ce, ce,
            force * bmask, fm1 * pos_w, fm1 * neg_w, fm1), ()


class SeqDecimatorState(NamedTuple):
    prev_eta: jnp.ndarray   # f32[E] - previous clause->var survey
    counters: jnp.ndarray   # f32[B] - iterations since last decimation
    has_prev: jnp.ndarray   # f32[]  - 0 on the first iteration


def seq_decimator_init_state(batch, replication=1):
    # derive the zeros from batch arrays (not jnp.zeros) so the state
    # inherits the batch's sharding/varying axes under shard_map
    return SeqDecimatorState(
        prev_eta=jnp.tile(batch.edge_mask * 0.0, replication),
        counters=jnp.tile(batch.instance_mask * 0.0, replication),
        has_prev=jnp.sum(batch.instance_mask) * 0.0)


@dataclass(frozen=True)
class SeqDecimatorConfig:
    tolerance: float
    t_max: float
    # Multi-variable decimation: when < 1, every converged instance fixes ALL
    # active variables whose |score| >= decimation_threshold * its max
    # |score| (classical SP decimates a top fraction per convergence round);
    # at the default 1.0 only the single argmax variable is fixed, exactly
    # the reference's greedy rule (pdp_decimate.py:152-171).
    decimation_threshold: float = 1.0
    # end-game guard: instances whose active-variable count has dropped to
    # <= decimation_guard fall back to the argmax-only rule, where single
    # careful steps matter most (0 = multi-variable all the way down)
    decimation_guard: float = 0.0
    # cap on post-decimation simplify rounds per iteration (lazy
    # simplification — see problem/simplify.py fused_simplify); 0 = run to
    # the fixed point, the reference semantics
    simplify_rounds: int = 0


def sequential_decimator_apply(cfg: SeqDecimatorConfig,
                               scorer_fn: Callable,
                               batch: FGBatch,
                               seq_state: SeqDecimatorState,
                               message_state,
                               problem: ProblemState,
                               edge_mask,
                               active_instances,
                               scorer_tail_fn: Callable = None,
                               precomputed_agg=None):
    """Reference pdp_decimate.py:122-177, fully on-device.

    Per iteration: (1) paramagnetic early-stop - zero the instance's active
    flag when its max survey vanishes; (2) per-instance message-convergence
    test (smooth-max over edges, max over vars) with a t_max timeout counter;
    (3) converged instances fix their max-|score| variable to sign(score) and
    the problem is re-simplified.

    active_instances may be None (no termination tracking); returns
    (new_seq_state, new_problem, new_active_instances).
    """
    V, B = batch.num_vars, batch.batch_size
    # message_state is SPMessages (classical: fn = 1-D columns) or the
    # neural propagator's ([E,h], [E,h]) pair (np-d-np)
    fn_part = message_state[1]
    eta = fn_part[0] if isinstance(fn_part, tuple) else fn_part[:, 0]

    # (1)+(2) paramagnetic survey max (pdp_decimate.py:127-133) and message
    # convergence (pdp_decimate.py:136-150): both are per-variable
    # smooth-maxes followed by per-instance maxes. All four smooth-max
    # columns ride ONE edge->var reduce and both instance maxes ride one
    # [V,2] segment_max (the chip is reduce-bound; see docs/PERFORMANCE.md).
    from pdp_solver_tpu.problem.simplify import _use_fused_kernel
    scorer_agg = None
    use_kernel = _use_fused_kernel(batch)
    classical = isinstance(fn_part, tuple)
    if precomputed_agg is not None:
        # the propagator already reduced these columns inside its chained
        # sweep kernel (propagate.survey_propagate_with_decimator_agg)
        nd, scorer_agg = precomputed_agg
    elif (use_kernel and classical and scorer_tail_fn is not None
            and active_instances is not None):
        # combined reduce: convergence smooth-max + paramagnetic columns
        # AND the survey scorer's aggregation, one pass over the surveys
        from pdp_solver_tpu.ops.pallas_fused import (
            batch_var_window, fused_edge_pass)
        nd8, _ = fused_edge_pass(
            _smax_scorer_pass, node_cols=(problem.active_clauses,),
            gather_ids=batch.edge_clause,
            gather_uniform=batch.clause_width,
            edge_cols=(seq_state.prev_eta, eta, edge_mask,
                       batch.edge_mask, fn_part[1], batch.edge_sign),
            reduce_ids=batch.edge_var, num_segments=batch.num_vars,
            n_red=8, window=batch_var_window(batch),
            interpret=jax.default_backend() != "tpu")
        nd = nd8[:4]
        scorer_agg = nd8[4:]
    elif use_kernel:
        from pdp_solver_tpu.ops.pallas_fused import (
            batch_var_window, fused_edge_pass)
        f = (_smax_pass4 if active_instances is not None else _smax_pass2)
        nd, _ = fused_edge_pass(
            f, edge_cols=(seq_state.prev_eta, eta, edge_mask,
                          batch.edge_mask),
            reduce_ids=batch.edge_var, num_segments=batch.num_vars,
            n_red=(4 if active_instances is not None else 2),
            window=batch_var_window(batch),
            interpret=jax.default_backend() != "tpu")
    else:
        diff = jnp.abs(seq_state.prev_eta - eta) * edge_mask
        cols = [diff]
        if active_instances is not None:
            cols.append(eta)
        stacked = []
        for x in cols:
            c = safe_exp(30.0 * x) * batch.edge_mask
            stacked.extend([x * c, c])
        nd = common.scatter_to_vars_cols(batch, tuple(stacked))  # [2C, V]
    sm = nd[0::2] / jnp.maximum(nd[1::2], 1.0)                # [C, V]
    sm = sm * problem.active_vars[None, :]
    mx = segment_max(jnp.where(batch.var_mask[None, :] > 0, sm, -jnp.inf).T,
                     batch.var_batch, B, indices_are_sorted=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    diff_b = mx[:, 0]

    if active_instances is not None and classical:
        # Paramagnetic early-stop (reference pdp_decimate.py:127-130).
        # CLASSICAL message states only: vanishing survey magnitude is an
        # SP concept. The reference applies the same test to the neural
        # propagator's hidden column 0 (np-d-np assembly,
        # solver.py:616-637), whose activations sit <= 0 routinely — every
        # instance is then deactivated after its first decimation and the
        # solver degenerates to random fill (measured: 6.2% on easy 3-SAT
        # regardless of training). Documented behavioral deviation: the
        # stop is skipped for neural message states.
        survey_b = mx[:, 1]
        active_instances = jnp.where(survey_b <= 1e-10, 0.0, active_instances)

    # gate: skip decimation on the first iteration or when nothing is active
    # (reference pdp_decimate.py:135 `if previous is not None and sum > 0`)
    gate = seq_state.has_prev * (jnp.sum(problem.active_vars) > 0)

    converged = (diff_b < cfg.tolerance).astype(jnp.float32)
    counters = jnp.where(converged > 0, 0.0, seq_state.counters)
    timeout = (counters >= cfg.t_max).astype(jnp.float32)
    flag_b = jnp.maximum(converged, timeout)
    counters = jnp.where(timeout > 0, 0.0, counters)
    counters = counters + 1.0
    # all counter/flag effects only apply behind the gate
    counters = gate * counters + (1.0 - gate) * seq_state.counters
    flag_b = flag_b * gate

    # (3) greedy decimation (pdp_decimate.py:152-171)
    if scorer_agg is not None:
        score = scorer_tail_fn(scorer_agg)[:, 0]             # [V]
    else:
        score = scorer_fn(message_state, problem)[:, 0]      # [V]
    coeff = jnp.abs(score) * problem.active_vars * flag_b[batch.var_batch]
    if cfg.decimation_threshold < 1.0:
        # fix every active variable within the threshold band of the
        # instance max (one reduce replaces the argmax + sum pair)
        max_b = segment_max_shifted(coeff, batch.var_batch, B,
                                    valid=batch.var_mask,
                                    indices_are_sorted=True)
        theta_b = jnp.full((B,), cfg.decimation_threshold, jnp.float32)
        if cfg.decimation_guard > 0:
            # argmax-only end-game: band threshold 1.0 once few active vars
            # remain (float scores make exact band ties vanishingly rare,
            # so >= max_b selects the single max like the argmax rule)
            active_n = segment_sum(problem.active_vars * batch.var_mask,
                                   batch.var_batch, B,
                                   indices_are_sorted=True)
            theta_b = jnp.where(active_n > cfg.decimation_guard, theta_b,
                                1.0)
        decimate_b = flag_b * (max_b > 0).astype(jnp.float32)
        if active_instances is not None:
            decimate_b = decimate_b * active_instances
        sel = jnp.logical_and(
            coeff >= theta_b[batch.var_batch] * max_b[batch.var_batch],
            jnp.logical_and(coeff > 0, decimate_b[batch.var_batch] > 0))
        assignment = jnp.where(sel, jnp.sign(score), 0.0)
    else:
        max_ind = segment_argmax_first(coeff, batch.var_batch, B,
                                       valid=batch.var_mask,
                                       indices_are_sorted=True)
        norm_b = segment_sum(coeff, batch.var_batch, B,
                             indices_are_sorted=True)

        decimate_b = flag_b * (norm_b != 0).astype(jnp.float32)
        if active_instances is not None:
            decimate_b = decimate_b * active_instances

        sel = jnp.logical_and(
            jnp.arange(V, dtype=jnp.int32) == max_ind[batch.var_batch],
            decimate_b[batch.var_batch] > 0)
        assignment = jnp.where(sel, jnp.sign(score), 0.0)

    problem = jax.lax.cond(
        jnp.sum(decimate_b) > 0,
        lambda p: fused_set_variables(batch, p, assignment,
                                      max_rounds=cfg.simplify_rounds),
        lambda p: p,
        problem)

    new_state = SeqDecimatorState(prev_eta=eta, counters=counters,
                                  has_prev=jnp.ones_like(seq_state.has_prev))
    return new_state, problem, active_instances


# --------------------------------------------------------------------------
# REINFORCE (concurrent) decimator
# --------------------------------------------------------------------------

class ReinforceDecimatorState(NamedTuple):
    prev_eta: jnp.ndarray  # f32[E]
    has_prev: jnp.ndarray  # f32[]


def reinforce_decimator_init_state(batch, replication=1):
    return ReinforceDecimatorState(
        prev_eta=jnp.tile(batch.edge_mask * 0.0, replication),
        has_prev=jnp.sum(batch.instance_mask) * 0.0)


@dataclass(frozen=True)
class ReinforceDecimatorConfig:
    decimation_probability: float = 0.5


def reinforce_decimator_apply(cfg: ReinforceDecimatorConfig,
                              scorer_fn: Callable,
                              rng,
                              batch: FGBatch,
                              rf_state: ReinforceDecimatorState,
                              message_state,
                              problem: ProblemState,
                              edge_mask,
                              active_instances,
                              active_edge):
    """Reference pdp_decimate.py:202-234: with probability p, overwrite the
    per-edge external force with the sign of the variable's SP bias;
    convergence (delta <= 0.01) deactivates instances."""
    V, B = batch.num_vars, batch.batch_size
    var_msg, fn_msg = message_state
    eta = fn_msg[0]

    if active_instances is not None:
        gate = rf_state.has_prev * (jnp.sum(problem.active_vars) > 0)
        diff = jnp.abs(rf_state.prev_eta - eta) * edge_mask
        diff_v = common.var_smooth_max(batch, diff)
        diff_v = diff_v * problem.active_vars
        diff_b = segment_max_shifted(diff_v, batch.var_batch, B,
                                     valid=batch.var_mask,
                                     indices_are_sorted=True)
        deactivate = jnp.logical_and(diff_b <= 0.01, gate > 0)
        active_instances = jnp.where(deactivate, 0.0, active_instances)

    coin = jax.random.uniform(rng) < cfg.decimation_probability
    score = scorer_fn(message_state, problem)               # [V,1]
    score_e = jnp.sign(score[:, 0])[batch.edge_var]
    mask_e = active_edge
    new_force = mask_e * score_e + (1.0 - mask_e) * fn_msg[1]
    force = jnp.where(coin, new_force, fn_msg[1])

    new_state = ReinforceDecimatorState(prev_eta=eta,
                                        has_prev=jnp.ones_like(rf_state.has_prev))
    from pdp_solver_tpu.modules.propagate import SPMessages
    return (new_state, SPMessages(var=var_msg, fn=(fn_msg[0], force)),
            active_instances)
