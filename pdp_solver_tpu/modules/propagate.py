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

from dataclasses import dataclass

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


def survey_propagator_apply(params, cfg: SurveyPropagatorConfig,
                            batch: FGBatch, prop_state, dec_state,
                            edge_mask, active_edge):
    """One SP sweep in log space (reference pdp_propagate.py:139-221).

    clause->var survey:  eta_e = exp( sum_{e' in clause(e), e' != e} log u_e' )
    var->clause triplet: (q_u, q_s, q_dc) from polarity-split aggregations of
    log(1 - eta), with the REINFORCE external-force factor pi.
    """
    var_state, fn_state = prop_state
    dec_var, dec_fn = dec_state
    mask = col(active_edge)
    em = col(edge_mask)
    ef = col(batch.edge_sign)

    # clause -> var: aggregate log u over the clause minus self
    if cfg.include_adaptors:
        log_u = jax.nn.log_sigmoid(mlp.linear_apply(params["fn_proj"], dec_var))
    else:
        log_u = safe_log(dec_var[:, 0:1], LOG_EPS_PROP)
    log_u = log_u * em
    agg = common.aggregate_minus_self_clause(batch, log_u)
    eta = safe_exp(agg)
    new_fn_col0 = mask * eta + (1.0 - mask) * fn_state[:, 0:1]

    # var -> clause
    if cfg.include_adaptors:
        proj = mlp.linear_apply(params["var_proj"], dec_fn)
        eta_in = jax.nn.sigmoid(proj[:, 0:1])
        external_force = jnp.sign(proj[:, 1:2])
    else:
        eta_in = dec_fn[:, 0:1]
        external_force = dec_fn[:, 1:2]

    log1m = safe_log(1.0 - eta_in, LOG_EPS_PROP) * em

    pos_w = (batch.edge_sign == 1).astype(jnp.float32)
    neg_w = (batch.edge_sign == -1).astype(jnp.float32)
    # both polarity aggregations ride one stacked two-column reduction
    # (1-D columns - no [E,2] relayout)
    lm = log1m[:, 0]
    pn = common.scatter_to_vars_cols(batch, (lm * pos_w, lm * neg_w))
    pos = pn[0][batch.edge_var][:, None]
    neg = pn[1][batch.edge_var][:, None]

    same_sign = 0.5 * (1 + ef) * pos + 0.5 * (1 - ef) * neg - log1m
    same_sign = same_sign + safe_log(
        1.0 - cfg.pi * (external_force == ef).astype(jnp.float32), LOG_EPS_PROP)
    # opposite-polarity aggregation never contains the current edge, so no
    # self-subtraction (reference pdp_propagate.py:199-201)
    opposite_sign = 0.5 * (1 - ef) * pos + 0.5 * (1 + ef) * neg
    opposite_sign = opposite_sign + safe_log(
        1.0 - cfg.pi * (external_force == -ef).astype(jnp.float32),
        LOG_EPS_PROP)

    dont_care = same_sign + opposite_sign

    s = safe_exp(same_sign)
    o = safe_exp(opposite_sign)
    d = safe_exp(dont_care)
    q_u = s * (1.0 - o)
    q_s = o * (1.0 - s)
    total = q_u + q_s + d
    triplet = jnp.concatenate([q_u, q_s, d], axis=1) / total

    new_var = mask * triplet + (1.0 - mask) * var_state
    return new_var, jnp.concatenate([new_fn_col0, external_force], axis=1)


def survey_propagator_init_state(rng, num_edges, randomized):
    """Reference pdp_propagate.py:223-237."""
    if randomized:
        r1, r2 = jax.random.split(rng)
        v = jax.random.uniform(r1, (num_edges, 3))
        v = v / jnp.sum(v, axis=1, keepdims=True)
        f = jax.random.uniform(r2, (num_edges, 2))
        f = f.at[:, 1].set(0.0)
    else:
        v = jnp.ones((num_edges, 3), jnp.float32) / 3.0
        f = 0.5 * jnp.ones((num_edges, 2), jnp.float32)
        f = f.at[:, 1].set(0.0)
    return v, f
