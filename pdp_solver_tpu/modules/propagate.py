"""Propagators: neural message passing and classical Survey Propagation.

Pure-function ports of reference src/pdp/nn/pdp_propagate.py. State layout
matches the reference exactly so trained behaviour is comparable:

  NeuralMessagePasser: (var_state [E,h], fn_state [E,h])
  SurveyPropagator:    (var_state [E,3] = (q_u, q_s, q_dc) simplex,
                        fn_state  [E,2] = (eta survey, external force))

`active_edge` is the per-edge freeze mask derived from per-instance
termination (1 = keep updating); `edge_mask` is the decimation liveness mask
(active var x active clause x not-padding). Both are f32[E].
"""

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch
from pdp_solver_tpu.modules import common
from pdp_solver_tpu.modules.common import col
from pdp_solver_tpu.modules import mlp
from pdp_solver_tpu.ops import safe_log, safe_exp
from pdp_solver_tpu.ops.segment import LOG_EPS_PROP


@dataclass(frozen=True)
class NeuralPropagatorConfig:
    edge_dim: int
    decimator_dim: int
    meta_dim: int
    hidden_dim: int
    mem_hidden_dim: int
    mem_agg_hidden_dim: int
    agg_hidden_dim: int
    dropout: float
    compute_dtype: str = "float32"   # 'bfloat16' for MXU mixed precision

    def aggregator_cfg(self):
        return mlp.AggregatorConfig(
            input_dim=self.decimator_dim + self.edge_dim + self.meta_dim,
            output_dim=self.hidden_dim,
            mem_hidden_dim=self.mem_hidden_dim,
            mem_agg_hidden_dim=self.mem_agg_hidden_dim,
            agg_hidden_dim=self.agg_hidden_dim,
            feature_dim=self.edge_dim,
            include_self=False)


def neural_propagator_init(rng, cfg: NeuralPropagatorConfig):
    r1, r2 = jax.random.split(rng)
    acfg = cfg.aggregator_cfg()
    return {"var_agg": mlp.aggregator_init(r1, acfg),
            "fn_agg": mlp.aggregator_init(r2, acfg)}


def neural_propagator_apply(params, cfg: NeuralPropagatorConfig, rng,
                            batch: FGBatch, prop_state, dec_state,
                            edge_mask, active_edge, is_training,
                            meta_e=None):
    """Reference pdp_propagate.py:47-95 (NeuralMessagePasser.forward).
    meta_e: optional [E, meta_dim] per-edge graph features (the reference's
    meta_data broadcast through b_variable_mask, pdp_propagate.py:59-61)."""
    var_state, fn_state = prop_state
    dec_var, dec_fn = dec_state
    acfg = cfg.aggregator_cfg()
    feat = col(batch.edge_sign)
    mask = col(active_edge)
    r1, r2 = jax.random.split(rng)

    def with_meta(x):
        return x if meta_e is None else jnp.concatenate([x, meta_e], axis=1)

    cdtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None)

    # variables -> functions
    dv_in = with_meta(jnp.concatenate([dec_var, feat], axis=1))
    fn_new = mlp.aggregator_apply(params["var_agg"], acfg, batch, dv_in,
                                  feat, "var", edge_mask, dtype=cdtype)
    fn_state = mask * fn_new + (1.0 - mask) * fn_state
    fn_state = common.dropout(r1, fn_state, cfg.dropout, is_training)

    # functions -> variables
    df_in = with_meta(jnp.concatenate([dec_fn, feat], axis=1))
    var_new = mlp.aggregator_apply(params["fn_agg"], acfg, batch, df_in,
                                   feat, "clause", edge_mask, dtype=cdtype)
    var_state = mask * var_new + (1.0 - mask) * var_state
    var_state = common.dropout(r2, var_state, cfg.dropout, is_training)

    return var_state, fn_state


def neural_propagator_init_state(rng, cfg: NeuralPropagatorConfig, num_edges,
                                 randomized):
    """Reference pdp_propagate.py:97-108."""
    if randomized:
        r1, r2 = jax.random.split(rng)
        v = 2.0 * jax.random.uniform(r1, (num_edges, cfg.hidden_dim)) - 1.0
        f = 2.0 * jax.random.uniform(r2, (num_edges, cfg.hidden_dim)) - 1.0
    else:
        v = jnp.zeros((num_edges, cfg.hidden_dim), jnp.float32)
        f = jnp.zeros((num_edges, cfg.hidden_dim), jnp.float32)
    return v, f


class SPMessages(NamedTuple):
    """Survey-propagation message state as 1-D edge columns.

    Layout note (TPU-first): the reference holds these as [E, 3] / [E, 2]
    tensors (pdp_propagate.py:223-237); a minor dim of 2-3 is a pathological
    TPU layout and every column slice/concat around it is a measured ~1 ms
    relayout at E=524k, so the rebuild carries five separate f32[E] arrays.
    var = (q_u, q_s, q_dc) simplex, fn = (eta survey, external force).
    """
    var: tuple   # (q_u, q_s, q_dc)
    fn: tuple    # (eta, force)


@dataclass(frozen=True)
class SurveyPropagatorConfig:
    decimator_dim: int = 1
    include_adaptors: bool = False
    pi: float = 0.0


def survey_propagator_init(rng, cfg: SurveyPropagatorConfig):
    if not cfg.include_adaptors:
        return {}
    r1, r2 = jax.random.split(rng)
    return {
        # learned projections of neural decimator state into SP message space
        # (reference pdp_propagate.py:128-131)
        "var_proj": mlp.linear_init(r1, cfg.decimator_dim, 2, bias=False),
        "fn_proj": mlp.linear_init(r2, cfg.decimator_dim, 1, bias=False),
    }


def _sp_pass_a(gathered, edge_vals):
    """log u per edge + its per-clause sum (sweep pass A)."""
    u_in, em = edge_vals
    log_u = safe_log(u_in, LOG_EPS_PROP) * em
    return (log_u,), (log_u,)


def _sp_pass_a_login(gathered, edge_vals):
    """Pass A variant for inputs already in log space (adaptor path)."""
    lu, em = edge_vals
    log_u = lu * em
    return (log_u,), (log_u,)


def _sp_pass_b(gathered, edge_vals):
    """eta survey from the clause sums + the polarity-split log(1 - eta_in)
    reduction toward variables (sweep pass B)."""
    (cl_sum,) = gathered
    log_u, eta_in, em, mask, eta_state, sign = edge_vals
    eta = safe_exp(cl_sum - log_u)
    new_eta = mask * eta + (1.0 - mask) * eta_state
    lm = safe_log(1.0 - eta_in, LOG_EPS_PROP) * em
    pos_w = jnp.where(sign == 1, 1.0, 0.0)
    neg_w = jnp.where(sign == -1, 1.0, 0.0)
    return (lm * pos_w, lm * neg_w), (new_eta,)


def q_triplet_stable(same, opp):
    """(q_u, q_s, q_dc, total) from the log-domain same/opp aggregations.

    Algebraically q_u = e^same(1-e^opp) = e^same - e^{same+opp}, q_s
    symmetric, q_dc = e^{same+opp}, total = e^same + e^opp - e^{same+opp}.
    The reference normalises WITHOUT a bias shift (pdp_propagate.py:205
    even carries a commented-out `bias = 0` placeholder), so at variable
    degrees beyond ~10 the exponentials of the summed logs underflow to
    zero and q/total divides 0/0 — NaN surveys for every instance with
    n >~ 1000 (crash-class reference limitation, fixed here rather than
    copied; SURVEY.md section 7). Shifting by b = max(same, opp) pins the
    largest exponential at exactly 1, making total == 1 up to rounding:
    the division can never produce NaN, and the shift cancels exactly in
    the ratios."""
    b = jnp.maximum(same, opp)
    s = safe_exp(same - b)
    o = safe_exp(opp - b)
    d = safe_exp(same + opp - b)
    q_u = jnp.maximum(s - d, 0.0)
    q_s = jnp.maximum(o - d, 0.0)
    total = jnp.maximum(q_u + q_s + d, 1e-20)
    return q_u, q_s, d, total


@functools.lru_cache(maxsize=None)
def _sp_pass_c(pi):
    def f(gathered, edge_vals):
        """q-triplet from the variable aggregations (sweep pass C)."""
        pos, neg = gathered
        eta_in, em, mask, sign, force, v0, v1, v2 = edge_vals
        lm = safe_log(1.0 - eta_in, LOG_EPS_PROP) * em
        same = 0.5 * (1 + sign) * pos + 0.5 * (1 - sign) * neg - lm
        same = same + safe_log(
            1.0 - pi * jnp.where(force == sign, 1.0, 0.0), LOG_EPS_PROP)
        # opposite-polarity aggregation never contains the current edge, so
        # no self-subtraction (reference pdp_propagate.py:199-201)
        opp = 0.5 * (1 - sign) * pos + 0.5 * (1 + sign) * neg
        opp = opp + safe_log(
            1.0 - pi * jnp.where(force == -sign, 1.0, 0.0), LOG_EPS_PROP)
        q_u, q_s, d, total = q_triplet_stable(same, opp)
        nv0 = mask * (q_u / total) + (1.0 - mask) * v0
        nv1 = mask * (q_s / total) + (1.0 - mask) * v1
        nv2 = mask * (d / total) + (1.0 - mask) * v2
        return (), (nv0, nv1, nv2)
    return f


@functools.lru_cache(maxsize=None)
def _sp_pass_c_lean(pi):
    def f(gathered, edge_vals):
        """q_u only (sweep pass C, folded p-d-p path): the classical
        sequential-decimation loop consumes only q_u (the next sweep's
        u_like) and eta (the scorer/convergence input), so q_s/q_dc are
        dead state there - dropping them saves four edge streams."""
        pos, neg = gathered
        eta_in, em, mask, sign, force, v0 = edge_vals
        lm = safe_log(1.0 - eta_in, LOG_EPS_PROP) * em
        same = 0.5 * (1 + sign) * pos + 0.5 * (1 - sign) * neg - lm
        same = same + safe_log(
            1.0 - pi * jnp.where(force == sign, 1.0, 0.0), LOG_EPS_PROP)
        opp = 0.5 * (1 - sign) * pos + 0.5 * (1 + sign) * neg
        opp = opp + safe_log(
            1.0 - pi * jnp.where(force == -sign, 1.0, 0.0), LOG_EPS_PROP)
        q_u, q_s, d, total = q_triplet_stable(same, opp)
        nv0 = mask * (q_u / total) + (1.0 - mask) * v0
        return (), (nv0,)
    return f


def _use_fused_pass(batch: FGBatch) -> bool:
    from pdp_solver_tpu.ops.pallas_fused import use_fused_pass
    return use_fused_pass(batch)


# chained A+B: the clause-direction log-u sum is tile-local under a uniform
# clause width, so the eta survey and the polarity-split var reduction run
# in the SAME kernel launch as the clause sum (sweep: 3 launches -> 2)
def _sp_chain_f1(gathered, edge_vals):
    u_in, eta_in, em, mask, eta_state, sign = edge_vals
    return (safe_log(u_in, LOG_EPS_PROP) * em,)


def _sp_chain_f1_login(gathered, edge_vals):
    lu, eta_in, em, mask, eta_state, sign = edge_vals
    return (lu * em,)


def _sp_chain_f2(cred, clause_vals):
    return (), cred


@functools.lru_cache(maxsize=None)
def _sp_chain_f3(login):
    def f(bcast, gathered, edge_vals):
        (cl_sum,) = bcast
        u_in, eta_in, em, mask, eta_state, sign = edge_vals
        log_u = (u_in if login else safe_log(u_in, LOG_EPS_PROP)) * em
        eta = safe_exp(cl_sum - log_u)
        new_eta = mask * eta + (1.0 - mask) * eta_state
        lm = safe_log(1.0 - eta_in, LOG_EPS_PROP) * em
        pos_w = jnp.where(sign == 1, 1.0, 0.0)
        neg_w = jnp.where(sign == -1, 1.0, 0.0)
        return (lm * pos_w, lm * neg_w), (new_eta,)
    return f


# chained A+B with the sequential decimator's combined convergence/scorer
# reduce folded in: in the classical p-d-p loop the decimator compares the
# sweep's NEW eta against the previous one (seq prev_eta == the sweep's
# eta_state input, see solvers/base.py), so its eight edge->var reduce
# columns (modules/decimate._smax_scorer_pass) can ride the SAME windowed
# one-hot and reduce matmul this kernel already builds for the polarity
# aggregation - one whole edge pass per solver iteration disappears.
def _sp_chain_f1_dec(gathered, edge_vals):
    u_in, em = edge_vals[0], edge_vals[2]
    return (safe_log(u_in, LOG_EPS_PROP) * em,)


def _sp_chain_f2_dec(cred, clause_vals):
    # broadcast the clause log-u sum AND the clause activity to the edges
    return (), (cred[0], clause_vals[0])


def _sp_chain_f3_dec(bcast, gathered, edge_vals):
    from pdp_solver_tpu.ops.segment import LOG_EPS_SCORE
    cl_sum, ac_e = bcast
    u_in, eta_in, em, mask, eta_state, sign, force, bmask = edge_vals
    log_u = safe_log(u_in, LOG_EPS_PROP) * em
    eta = safe_exp(cl_sum - log_u)
    new_eta = mask * eta + (1.0 - mask) * eta_state
    lm = safe_log(1.0 - eta_in, LOG_EPS_PROP) * em
    pos_w = jnp.where(sign == 1, 1.0, 0.0)
    neg_w = jnp.where(sign == -1, 1.0, 0.0)
    # decimator columns (decimate._smax_scorer_pass) on the new surveys;
    # prev_eta == eta_state in the p-d-p loop (only consumed behind the
    # decimator's has_prev gate, which is 0 on the one iteration where the
    # two could differ)
    diff = jnp.abs(eta_state - new_eta) * em
    cd = safe_exp(30.0 * diff) * bmask
    ce = safe_exp(30.0 * new_eta) * bmask
    em_s = ac_e * bmask
    fm1 = safe_log(1.0 - new_eta, LOG_EPS_SCORE) * em_s
    return (lm * pos_w, lm * neg_w,
            diff * cd, cd, new_eta * ce, ce,
            force * bmask, fm1 * pos_w, fm1 * neg_w, fm1), (new_eta,)


# chained A+B with the decimator reduce AND the next-iteration edge masks
# folded in: em = active_var * active_clause * pad factorizes per edge, with
# the 0/1 clause factor applied exactly at the clause stage (f2), so the
# sweep needs no em/ae edge streams at all - active_vars and the per-var
# instance flag ride the kernel's existing one-hot as node columns, and the
# separate edge_masks_pair launch per iteration disappears. em/ae are
# emitted as edge outputs for the C pass.
def _sp_chain_f1_mask(gathered, edge_vals):
    av_e = gathered[0]
    u_in, bm = edge_vals[0], edge_vals[5]
    # partial log_u: the clause activity factor lands at f2/f3 (exact -
    # active_clauses is 0/1)
    return (safe_log(u_in, LOG_EPS_PROP) * av_e * bm,)


def _sp_chain_f2_mask(cred, clause_vals):
    ac = clause_vals[0]
    return (), (cred[0] * ac, ac)


def _sp_chain_f3_mask(bcast, gathered, edge_vals):
    from pdp_solver_tpu.ops.segment import LOG_EPS_SCORE
    cl_sum, ac_e = bcast
    av_e, ai_e = gathered[0], gathered[1]   # [2] = solution (verify fold)
    u_in, eta_in, eta_state, sign, force, bm = edge_vals
    em = av_e * ac_e * bm
    ae = ai_e
    log_u = safe_log(u_in, LOG_EPS_PROP) * em
    eta = safe_exp(cl_sum - log_u)
    new_eta = ae * eta + (1.0 - ae) * eta_state
    lm = safe_log(1.0 - eta_in, LOG_EPS_PROP) * em
    pos_w = jnp.where(sign == 1, 1.0, 0.0)
    neg_w = jnp.where(sign == -1, 1.0, 0.0)
    diff = jnp.abs(eta_state - new_eta) * em
    cd = safe_exp(30.0 * diff) * bm
    ce = safe_exp(30.0 * new_eta) * bm
    em_s = ac_e * bm
    fm1 = safe_log(1.0 - new_eta, LOG_EPS_SCORE) * em_s
    return (lm * pos_w, lm * neg_w,
            diff * cd, cd, new_eta * ce, ce,
            force * bm, fm1 * pos_w, fm1 * neg_w, fm1), (new_eta, em, ae)


def use_sweep_mask_fold(batch: FGBatch) -> bool:
    import os
    if os.environ.get("PDP_SWEEP_MASK_FOLD", "auto") == "off":
        return False
    return use_sweep_decimator_fold(batch)


# mask fold + the CNF verification of the current (pre-decimation) solution:
# the solution rides the kernel's one-hot as a third node column, literal
# satisfaction is a second clause-reduce column, and the per-instance
# (max_sat, got_sat) counts ride the in-kernel instance reduce - the
# separate cnf_evaluate launch per solver iteration disappears. The solver
# applies the result BEFORE this iteration's decimation, which sees exactly
# the active_b trajectory of the split path (the in-loop identity predictor
# is solution-preserving, so verifying sol_{i-1} here equals the split
# path's end-of-iteration-(i-1) verification).
def _sp_chain_f1_maskv(gathered, edge_vals):
    av_e, _, sol_e = gathered
    u_in, sign, bm = edge_vals[0], edge_vals[3], edge_vals[5]
    lit = sign * sol_e + (1.0 - sign) / 2.0
    sat = jnp.where(lit > 0.5, 1.0, 0.0) * bm
    return (safe_log(u_in, LOG_EPS_PROP) * av_e * bm, sat)


def _sp_chain_f2_maskv(cred, clause_vals):
    ac, cm = clause_vals
    clause_sat = jnp.where(cred[1] > 0, 1.0, 0.0) * cm
    return (), (cred[0] * ac, ac), (cm, clause_sat)


def use_sweep_verify_fold(batch: FGBatch) -> bool:
    import os
    from pdp_solver_tpu.ops.pallas_fused import IWIN
    if os.environ.get("PDP_SWEEP_VERIFY_FOLD", "auto") == "off":
        return False
    return use_sweep_mask_fold(batch) and batch.batch_size <= IWIN


def survey_propagate_folded_masks(cfg: SurveyPropagatorConfig,
                                  batch: FGBatch, prop_state, dec_state,
                                  problem, active_instances, verify=False):
    """One classical SP sweep computing its OWN edge masks in-kernel from
    the problem/termination state (use_sweep_mask_fold must hold), plus the
    decimator aggregation of survey_propagate_with_decimator_agg.

    Returns (SPMessages, (nd, scorer_agg), em, ae) where em/ae match
    problem.state.edge_masks_pair(batch, problem, active_instances) exactly.
    With verify=True (use_sweep_verify_fold must hold) additionally returns
    (max_sat, got_sat) per instance - train.loss.cnf_evaluate of
    problem.solution in the same launch.
    """
    assert not cfg.include_adaptors
    from pdp_solver_tpu.ops.pallas_fused import (
        batch_var_window, chained_edge_pass, fused_edge_pass)
    win = batch_var_window(batch)
    v0, v1, v2 = prop_state.var
    eta_state = prop_state.fn[0]
    sign = batch.edge_sign
    u_like = dec_state.var[0]
    eta_in = dec_state.fn[0]
    force = dec_state.fn[1]
    interp = jax.default_backend() != "tpu"

    node_cols = (problem.active_vars, active_instances[batch.var_batch])
    clause_cols = (problem.active_clauses,)
    kw = {}
    if verify:
        node_cols += (problem.solution,)
        clause_cols += (batch.clause_mask,)
        kw = dict(n_ired=2, clause_batch=batch.clause_batch,
                  num_instances=batch.batch_size)
    outs = chained_edge_pass(
        (_sp_chain_f1_maskv if verify else _sp_chain_f1_mask),
        (_sp_chain_f2_maskv if verify else _sp_chain_f2_mask),
        _sp_chain_f3_mask,
        node_cols=node_cols,
        gather_ids=batch.edge_var,
        clause_cols=clause_cols,
        edge_cols=(u_like, eta_in, eta_state, sign, force,
                   batch.edge_mask),
        clause_width=batch.clause_width,
        num_clauses=batch.num_clauses,
        num_segments=batch.num_vars,
        n_cred=(2 if verify else 1), n_cout=0, n_bcast=2, n_vred=10,
        n_eout=3, window=win, interpret=interp, **kw)
    if verify:
        _, vred, (new_eta, em, ae), iout = outs
        counts = (iout[0], iout[1])
    else:
        _, vred, (new_eta, em, ae) = outs
    pn = vred[0:2]
    nd = vred[2:6]
    scorer_agg = vred[6:10]

    _, (nv0,) = fused_edge_pass(
        _sp_pass_c_lean(float(cfg.pi)),
        node_cols=(pn[0], pn[1]), gather_ids=batch.edge_var,
        edge_cols=(eta_in, em, ae, sign, force, v0),
        n_eout=1, window=win, interpret=interp)
    # q_s/q_dc are dead in this loop (docstring); v1/v2 pass through stale
    msgs = SPMessages(var=(nv0, v1, v2), fn=(new_eta, force))
    if verify:
        return msgs, (nd, scorer_agg), em, ae, counts
    return msgs, (nd, scorer_agg), em, ae


def use_sweep_decimator_fold(batch: FGBatch) -> bool:
    """The folded sweep applies on the chained fast path for classical
    (adaptor-free) SP; PDP_SWEEP_DEC_FOLD=off reverts to separate passes."""
    import os
    from pdp_solver_tpu.ops.pallas_fused import use_chained_pass
    if os.environ.get("PDP_SWEEP_DEC_FOLD", "auto") == "off":
        return False
    return use_chained_pass(batch)


def survey_propagate_with_decimator_agg(cfg: SurveyPropagatorConfig,
                                        batch: FGBatch, prop_state,
                                        dec_state, edge_mask, active_edge,
                                        active_clauses):
    """One classical SP sweep that ALSO returns the sequential decimator's
    combined convergence+scorer aggregation ([8, V]), computed inside the
    chained A+B kernel launch (use_sweep_decimator_fold must hold).

    Returns (SPMessages, (nd [4, V], scorer_agg [4, V])) matching what
    decimate.sequential_decimator_apply's own fused reduce would produce
    for these messages - pass it as precomputed_agg.
    """
    assert not cfg.include_adaptors
    from pdp_solver_tpu.ops.pallas_fused import (
        batch_var_window, chained_edge_pass)
    win = batch_var_window(batch)
    v0, v1, v2 = prop_state.var
    eta_state = prop_state.fn[0]
    mask = active_edge
    em = edge_mask
    sign = batch.edge_sign
    u_like = dec_state.var[0]
    eta_in = dec_state.fn[0]
    force = dec_state.fn[1]
    interp = jax.default_backend() != "tpu"

    _, vred, (new_eta,) = chained_edge_pass(
        _sp_chain_f1_dec, _sp_chain_f2_dec, _sp_chain_f3_dec,
        node_cols=(), gather_ids=batch.edge_var,
        clause_cols=(active_clauses,),
        edge_cols=(u_like, eta_in, em, mask, eta_state, sign, force,
                   batch.edge_mask),
        clause_width=batch.clause_width,
        num_clauses=batch.num_clauses,
        num_segments=batch.num_vars,
        n_cred=1, n_cout=0, n_bcast=2, n_vred=10, n_eout=1,
        window=win, interpret=interp)
    pn = vred[0:2]
    nd = vred[2:6]
    scorer_agg = vred[6:10]

    from pdp_solver_tpu.ops.pallas_fused import fused_edge_pass
    _, (nv0,) = fused_edge_pass(
        _sp_pass_c_lean(float(cfg.pi)),
        node_cols=(pn[0], pn[1]), gather_ids=batch.edge_var,
        edge_cols=(eta_in, em, mask, sign, force, v0),
        n_eout=1, window=win, interpret=interp)
    # q_s/q_dc are dead in this loop (docstring); v1/v2 pass through stale
    return (SPMessages(var=(nv0, v1, v2), fn=(new_eta, force)),
            (nd, scorer_agg))


def survey_propagator_apply(params, cfg: SurveyPropagatorConfig,
                            batch: FGBatch, prop_state, dec_state,
                            edge_mask, active_edge):
    """One SP sweep in log space (reference pdp_propagate.py:139-221).

    clause->var survey:  eta_e = exp( sum_{e' in clause(e), e' != e} log u_e' )
    var->clause triplet: (q_u, q_s, q_dc) from polarity-split aggregations of
    log(1 - eta), with the REINFORCE external-force factor pi.

    States are SPMessages (1-D edge columns). On the TPU fast path the sweep
    runs as three fused edge passes (ops/pallas_fused.py) - one kernel per
    gather+elementwise+reduce group - instead of ~10 separate XLA ops.
    """
    v0, v1, v2 = prop_state.var
    eta_state = prop_state.fn[0]
    mask = active_edge
    em = edge_mask
    sign = batch.edge_sign

    if cfg.include_adaptors:
        # learned projections of the neural decimator state ([E, h] 2-D)
        dec_var, dec_fn = dec_state
        u_like = jax.nn.log_sigmoid(
            mlp.linear_apply(params["fn_proj"], dec_var))[:, 0]
        pass_a = _sp_pass_a_login
        proj = mlp.linear_apply(params["var_proj"], dec_fn)
        eta_in = jax.nn.sigmoid(proj[:, 0])
        force = jnp.sign(proj[:, 1])
    else:
        u_like = dec_state.var[0]
        pass_a = _sp_pass_a
        eta_in = dec_state.fn[0]
        force = dec_state.fn[1]

    if _use_fused_pass(batch):
        from pdp_solver_tpu.ops.pallas_fused import fused_edge_pass
        interp = jax.default_backend() != "tpu"
        from pdp_solver_tpu.ops.pallas_fused import (
            batch_var_window, chained_edge_pass, use_chained_pass)
        win = batch_var_window(batch)
        from pdp_solver_tpu.ops.pallas_sp import sp_full_sweep, use_sp_sweep
        import os
        if (use_sp_sweep(batch)
                and os.environ.get("PDP_SP_SWEEP", "off") == "on"):
            # the COMPLETE sweep (clause sums, eta, polarity aggregation,
            # q-triplet) in ONE kernel launch. Opt-in only: measured on
            # chip, the two-phase single launch re-streams every edge
            # block and rebuilds the one-hots twice per sweep, and LOSES
            # to the two-launch path at every size (0.51 vs 0.40 ms at
            # E=33k, 8.2 vs 7.3 ms at E=524k) - kernel launches inside a
            # compiled loop are cheap; the per-program dispatch floor is
            # what costs milliseconds. Kept as the base for folding the
            # decimator's convergence/scorer reductions into the sweep.
            new_eta, nv0, nv1, nv2 = sp_full_sweep(
                gather_ids=batch.edge_var,
                clause_width=batch.clause_width,
                num_vars=batch.num_vars,
                u_like=u_like, eta_in=eta_in, em=em, mask=mask,
                eta_state=eta_state, sign=sign, force=force,
                v0=v0, v1=v1, v2=v2, pi=float(cfg.pi),
                login=bool(cfg.include_adaptors), window=win,
                interpret=interp)
            return SPMessages(var=(nv0, nv1, nv2), fn=(new_eta, force))
        if use_chained_pass(batch):
            # clause sum + eta + var reduction in one launch, then pass C
            pn, (new_eta,) = chained_edge_pass(
                (_sp_chain_f1_login if cfg.include_adaptors
                 else _sp_chain_f1),
                _sp_chain_f2, _sp_chain_f3(bool(cfg.include_adaptors)),
                node_cols=(), gather_ids=batch.edge_var,
                edge_cols=(u_like, eta_in, em, mask, eta_state, sign),
                clause_width=batch.clause_width,
                num_clauses=batch.num_clauses,
                num_segments=batch.num_vars,
                n_cred=1, n_cout=0, n_bcast=1, n_vred=2, n_eout=1,
                window=win, interpret=interp)[1:]
        else:
            cl, (log_u,) = fused_edge_pass(
                pass_a, edge_cols=(u_like, em),
                reduce_ids=batch.edge_clause,
                reduce_uniform=batch.clause_width,
                num_segments=batch.num_clauses,
                n_red=1, n_eout=1, interpret=interp)
            pn, (new_eta,) = fused_edge_pass(
                _sp_pass_b, node_cols=(cl[0],),
                gather_ids=batch.edge_clause,
                gather_uniform=batch.clause_width,
                edge_cols=(log_u, eta_in, em, mask, eta_state, sign),
                reduce_ids=batch.edge_var, num_segments=batch.num_vars,
                n_red=2, n_eout=1, interpret=interp)
        _, (nv0, nv1, nv2) = fused_edge_pass(
            _sp_pass_c(float(cfg.pi)),
            node_cols=(pn[0], pn[1]), gather_ids=batch.edge_var,
            edge_cols=(eta_in, em, mask, sign, force, v0, v1, v2),
            n_eout=3, window=win, interpret=interp)
        return SPMessages(var=(nv0, nv1, nv2), fn=(new_eta, force))

    # ---- XLA fallback (same math, segment ops) ------------------------
    log_u = (u_like if cfg.include_adaptors
             else safe_log(u_like, LOG_EPS_PROP)) * em
    agg = common.scatter_to_clauses_cols(batch, (log_u,))[0]
    eta = safe_exp(agg[batch.edge_clause] - log_u)
    new_eta = mask * eta + (1.0 - mask) * eta_state

    lm = safe_log(1.0 - eta_in, LOG_EPS_PROP) * em
    pos_w = (sign == 1).astype(jnp.float32)
    neg_w = (sign == -1).astype(jnp.float32)
    pn = common.scatter_to_vars_cols(batch, (lm * pos_w, lm * neg_w))
    pos = pn[0][batch.edge_var]
    neg = pn[1][batch.edge_var]

    same = 0.5 * (1 + sign) * pos + 0.5 * (1 - sign) * neg - lm
    same = same + safe_log(
        1.0 - cfg.pi * (force == sign).astype(jnp.float32), LOG_EPS_PROP)
    # opposite-polarity aggregation never contains the current edge, so no
    # self-subtraction (reference pdp_propagate.py:199-201)
    opp = 0.5 * (1 - sign) * pos + 0.5 * (1 + sign) * neg
    opp = opp + safe_log(
        1.0 - cfg.pi * (force == -sign).astype(jnp.float32), LOG_EPS_PROP)

    q_u, q_s, d, total = q_triplet_stable(same, opp)
    nv = tuple(mask * q + (1.0 - mask) * v
               for q, v in zip((q_u / total, q_s / total, d / total),
                               (v0, v1, v2)))
    return SPMessages(var=nv, fn=(new_eta, force))


def survey_propagator_init_state(rng, num_edges, randomized):
    """Reference pdp_propagate.py:223-237 (column layout)."""
    if randomized:
        r1, r2 = jax.random.split(rng)
        v = jax.random.uniform(r1, (num_edges, 3))
        v = v / jnp.sum(v, axis=1, keepdims=True)
        f = jax.random.uniform(r2, (num_edges,))
        var = (v[:, 0], v[:, 1], v[:, 2])
        fn = (f, jnp.zeros((num_edges,), jnp.float32))
    else:
        third = jnp.full((num_edges,), 1.0 / 3.0, jnp.float32)
        var = (third, third, third)
        fn = (0.5 * jnp.ones((num_edges,), jnp.float32),
              jnp.zeros((num_edges,), jnp.float32))
    return SPMessages(var=var, fn=fn)
