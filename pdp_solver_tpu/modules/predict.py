"""Predictors and scorers (reference src/pdp/nn/pdp_predict.py).

Every predictor returns (variable_prediction [V,1] | None, function_prediction
| None). Scorers return a per-variable bias in [-1, 1].
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch
from pdp_solver_tpu.modules import common, mlp
from pdp_solver_tpu.modules.common import col
from pdp_solver_tpu.ops import safe_log, safe_exp
from pdp_solver_tpu.ops.segment import LOG_EPS_SCORE


@dataclass(frozen=True)
class NeuralPredictorConfig:
    decimator_dim: int
    prediction_dim: int
    edge_dim: int
    meta_dim: int
    mem_hidden_dim: int
    agg_hidden_dim: int
    mem_agg_hidden_dim: int
    classifier_dim: int
    classifier_kind: str = "sigmoid"  # 'sigmoid' (Perceptron) | 'tanh'
    compute_dtype: str = "float32"

    def aggregator_cfg(self):
        return mlp.AggregatorConfig(
            input_dim=self.decimator_dim + self.edge_dim + self.meta_dim,
            output_dim=self.decimator_dim,
            mem_hidden_dim=self.mem_hidden_dim,
            mem_agg_hidden_dim=self.mem_agg_hidden_dim,
            agg_hidden_dim=self.agg_hidden_dim,
            feature_dim=0,
            include_self=True)


def neural_predictor_init(rng, cfg: NeuralPredictorConfig):
    r1, r2 = jax.random.split(rng)
    return {
        "var_agg": mlp.aggregator_init(r1, cfg.aggregator_cfg()),
        "classifier": mlp.perceptron_init(
            r2, cfg.decimator_dim, cfg.classifier_dim, cfg.prediction_dim),
    }


def neural_predictor_apply(params, cfg: NeuralPredictorConfig, batch: FGBatch,
                           dec_state, edge_mask, meta_e=None):
    """Aggregate-with-self over decimator var states -> per-variable classifier
    (reference pdp_predict.py:49-91; the function-classifier path is unused by
    every reference config and solver, so only the variable path exists)."""
    dec_var, _ = dec_state
    feat = col(batch.edge_sign)
    agg_in = jnp.concatenate([dec_var, feat], axis=1)
    if meta_e is not None:
        agg_in = jnp.concatenate([agg_in, meta_e], axis=1)
    cdtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None)
    agg_v = mlp.aggregator_apply(params["var_agg"], cfg.aggregator_cfg(),
                                 batch, agg_in, None, "var", edge_mask,
                                 dtype=cdtype)
    if cfg.classifier_kind == "tanh":
        pred = mlp.perceptron_tanh_apply(params["classifier"], agg_v)
    else:
        pred = mlp.perceptron_apply(params["classifier"], agg_v)
    return pred, None


def identity_predictor_apply(rng, problem, random_fill, last_call):
    """Reads the decimated solution; optionally fills still-active variables
    with uniform noise on the last call (reference pdp_predict.py:110-128)."""
    pred = problem.solution[:, None]
    if random_fill and last_call:
        noise = jax.random.uniform(rng, pred.shape)
        pred = jnp.where(col(problem.active_vars) > 0, noise, pred)
    return pred, None


@dataclass(frozen=True)
class SurveyScorerConfig:
    message_dim: int = 1
    include_adaptors: bool = False
    pi: float = 0.0


def survey_scorer_init(rng, cfg: SurveyScorerConfig):
    if not cfg.include_adaptors:
        return {}
    return {"proj": mlp.linear_init(rng, cfg.message_dim, 2, bias=False)}


def _scorer_pass(gathered, edge_vals):
    """Fused gather+elementwise+reduce for the classical survey scorer."""
    (ac_e,) = gathered
    eta, force_e, sign, mask = edge_vals
    em = ac_e * mask
    fm1 = safe_log(1.0 - eta, LOG_EPS_SCORE) * em
    pos_w = jnp.where(sign == 1, 1.0, 0.0)
    neg_w = jnp.where(sign == -1, 1.0, 0.0)
    return (force_e * mask, fm1 * pos_w, fm1 * neg_w, fm1), ()


def survey_scorer_apply(params, cfg: SurveyScorerConfig, batch: FGBatch,
                        message_state, problem):
    """SP marginal bias q1 - q0 per variable (reference pdp_predict.py:155-192),
    with the numeric bias-shift trick and the 1e-10 log clamp."""
    if cfg.include_adaptors:
        fn_msg = message_state[1]
        proj = mlp.linear_apply(params["proj"], fn_msg)
        eta1 = jax.nn.sigmoid(proj[:, 0])
        force1 = jnp.sign(proj[:, 1])
    else:
        eta1 = message_state.fn[0]
        force1 = message_state.fn[1]

    from pdp_solver_tpu.modules.propagate import _use_fused_pass
    if _use_fused_pass(batch):
        from pdp_solver_tpu.ops.pallas_fused import (
            batch_var_window, fused_edge_pass)
        agg, _ = fused_edge_pass(
            _scorer_pass, node_cols=(problem.active_clauses,),
            gather_ids=batch.edge_clause,
            gather_uniform=batch.clause_width,
            edge_cols=(eta1, force1, batch.edge_sign, batch.edge_mask),
            reduce_ids=batch.edge_var, num_segments=batch.num_vars,
            n_red=4, window=batch_var_window(batch),
            interpret=jax.default_backend() != "tpu")
    else:
        # messages from deactivated clauses are excluded
        # (pdp_predict.py:171-172)
        edge_mask = (common.gather_from_clauses(batch, problem.active_clauses)
                     * batch.edge_mask)
        fm1 = safe_log(1.0 - eta1, LOG_EPS_SCORE) * edge_mask
        pos_w = (batch.edge_sign == 1).astype(jnp.float32)
        neg_w = (batch.edge_sign == -1).astype(jnp.float32)
        # force / positive / negative / don't-care aggregations all ride one
        # stacked four-column reduction (1-D columns - no [E,4] relayout)
        agg = common.scatter_to_vars_cols(
            batch, (force1, fm1 * pos_w, fm1 * neg_w, fm1))
    return survey_scorer_tail(cfg, agg), None


def survey_scorer_tail(cfg: SurveyScorerConfig, agg):
    """Variable-level conclusion of the survey scorer from its 4
    aggregation columns [4, V] (force / positive / negative / don't-care).
    Shared by survey_scorer_apply and the decimator's combined
    convergence+scorer reduce (modules/decimate.py)."""
    external_force = jnp.sign(agg[0])[:, None]
    pos = agg[1][:, None] + safe_log(
        1.0 - cfg.pi * (external_force == 1).astype(jnp.float32),
        LOG_EPS_SCORE)
    neg = agg[2][:, None] + safe_log(
        1.0 - cfg.pi * (external_force == -1).astype(jnp.float32),
        LOG_EPS_SCORE)

    pns = pos + neg
    dont_care = agg[3][:, None] + safe_log(
        jnp.asarray(1.0 - cfg.pi, jnp.float32), LOG_EPS_SCORE)

    bias = (2.0 * pns + dont_care) / 4.0
    pos = pos - bias
    neg = neg - bias
    pns = pns - bias
    dont_care = safe_exp(dont_care - bias)

    q_0 = safe_exp(pos) - safe_exp(pns)
    q_1 = safe_exp(neg) - safe_exp(pns)
    total = safe_log(q_0 + q_1 + dont_care, LOG_EPS_SCORE)

    return (safe_exp(safe_log(q_1, LOG_EPS_SCORE) - total)
            - safe_exp(safe_log(q_0, LOG_EPS_SCORE) - total))


def reinforce_predictor_apply(batch: FGBatch, dec_state):
    """sign of the per-variable sum of external forces
    (reference pdp_predict.py:214-226)."""
    force = dec_state.fn[1]
    pred = (common.scatter_to_vars_cols(batch, (force,))[0]
            > 0).astype(jnp.float32)
    return pred[:, None], None


def scorer_message_init_state(rng, num_edges, randomized):
    """SurveyScorer.get_init_state (pdp_predict.py:194-208): the message-shaped
    state the sequential decimator hands back to the SP propagator. Note the
    randomized variable state is NOT normalised here, unlike the propagator's
    own init (the reference keeps that line commented out)."""
    from pdp_solver_tpu.modules.propagate import SPMessages
    if randomized:
        r1, r2 = jax.random.split(rng)
        v = jax.random.uniform(r1, (num_edges, 3))
        f = jax.random.uniform(r2, (num_edges,))
        var = (v[:, 0], v[:, 1], v[:, 2])
        fn = (f, jnp.zeros((num_edges,), jnp.float32))
    else:
        third = jnp.full((num_edges,), 1.0 / 3.0, jnp.float32)
        var = (third, third, third)
        fn = (0.5 * jnp.ones((num_edges,), jnp.float32),
              jnp.zeros((num_edges,), jnp.float32))
    return SPMessages(var=var, fn=fn)
