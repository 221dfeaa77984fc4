"""PDP solver assemblies: propagator x decimator x predictor.

Port of reference `PropagatorDecimatorSolverBase` and its six concrete
subclasses (src/pdp/nn/solver.py:293-637), re-architected as one pure
`forward` function per solver:

  * the T-iteration hot loop is a single `lax.while_loop` with per-instance
    termination checks evaluated on-device every iteration (the reference
    syncs `active_mask.sum()` to the host each step, base.py:381-384);
  * WalkSAT post-processing (solver.py:433-467) is a second while_loop;
  * batch replication de-dup (solver.py:401-431) is an argmin over a replica
    axis by reshape - no replication masks needed.

Solver types ('model_type' in reference configs, trainer.py:48-99):
  np-nd-np   neural propagator + neural decimator + neural predictor
  p-nd-np    SP propagator (learned adaptors) + neural decimator + neural pred
  np-d-np    neural propagator + sequential decimator(neural scorer) + identity
  p-d-p      SP propagator + sequential decimator(SP scorer) + identity
  walk-sat   local search only
  reinforce  SP propagator(pi) + REINFORCE decimator + reinforce predictor
"""

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch, replicate_batch
from pdp_solver_tpu.modules import common
from pdp_solver_tpu.modules.common import col
from pdp_solver_tpu.modules import decimate as D
from pdp_solver_tpu.modules import predict as P
from pdp_solver_tpu.modules import propagate as PR
from pdp_solver_tpu.ops import segment_sum
from pdp_solver_tpu.ops.segment import segment_argmax_first
from pdp_solver_tpu.problem.simplify import fused_simplify as simplify_problem
from pdp_solver_tpu.problem.state import (
    ProblemState, compute_edge_mask, edge_active_instance_mask,
    edge_masks_pair, init_problem_state)
from pdp_solver_tpu.train.loss import cnf_evaluate


@dataclass(frozen=True)
class SolverConfig:
    model_type: str
    name: str = "pdp-solver"
    edge_dim: int = 1
    meta_dim: int = 0
    hidden_dim: int = 150
    prediction_dim: int = 1
    mem_hidden_dim: int = 100
    agg_hidden_dim: int = 100
    mem_agg_hidden_dim: int = 50
    classifier_dim: int = 50
    dropout: float = 0.0
    tolerance: float = 0.02
    t_max: float = 100.0
    pi: float = 0.0
    decimation_probability: float = 0.5
    # sequential decimator: fix all vars within this fraction of the
    # per-instance max |score| per convergence event (1.0 = argmax only,
    # the reference rule); see modules/decimate.py SeqDecimatorConfig
    decimation_threshold: float = 1.0
    # argmax-only end-game once an instance's active-var count <= guard
    decimation_guard: float = 0.0
    # lazy-simplification cap (problem/simplify.py fused_simplify);
    # 0 = reference fixed-point semantics
    simplify_rounds: int = 0
    local_search_iterations: int = 0
    epsilon: float = 0.05
    # 'bfloat16' runs the neural aggregator/GRU/classifier compute in bf16
    # (MXU fast path); message/state storage and all classical SP math stay
    # f32 (the log-space clamps are not bf16-safe)
    compute_dtype: str = "float32"


class SolverState(NamedTuple):
    prop: Any   # propagator message state
    dec: Any    # decimator state (neural hidden or message passthrough)
    aux: Any    # sequential / reinforce decimator bookkeeping, or ()


def _ws_pass_a(gathered, edge_vals):
    """WalkSAT clause pass: signed distance + live degree per clause."""
    sa_e, av_e = gathered
    sign, mask = edge_vals
    dist = sign * sa_e * mask
    return (dist, av_e * mask), (dist,)


def _ws_pass_b(gathered, edge_vals):
    """WalkSAT variable pass: flip deltas on critical edges + unsat flags."""
    agg_f, degree_f, unsat_f = gathered
    dist, em, mask = edge_vals
    agg_e = agg_f - dist
    critical = jnp.where(agg_e == (1.0 - degree_f), 1.0, 0.0) * em
    return (critical * dist, unsat_f * mask), ()


# chained single-launch WalkSAT iteration (uniform clause width): clause
# energy + break counts + flip deltas in one kernel
def _ws_cf1(gathered, edge_vals):
    sa_e, av_e = gathered
    sign, mask, em = edge_vals
    return (sign * sa_e * mask, av_e * mask)


def _ws_cf2(cred, clause_vals):
    agg_f, degree_f = cred
    (ac,) = clause_vals
    unsat_f = jnp.where(agg_f == -degree_f, 1.0, 0.0) * ac
    return (unsat_f,), (agg_f, degree_f, unsat_f)


def _ws_cf2_ired(cred, clause_vals):
    """_ws_cf2 + the per-instance energy reduce in the same launch (the
    reference's F-level torch.sum, solver.py:494, is a separate kernel);
    unsat_f is already 0 on padded clauses via ac."""
    agg_f, degree_f = cred
    (ac,) = clause_vals
    unsat_f = jnp.where(agg_f == -degree_f, 1.0, 0.0) * ac
    return (), (agg_f, degree_f, unsat_f), (unsat_f,)


def _ws_cf3(bcast, gathered, edge_vals):
    agg_c, degree_c, unsat_c = bcast
    sa_e, av_e = gathered
    sign, mask, em = edge_vals
    dist = sign * sa_e * mask
    agg_e = agg_c - dist
    critical = jnp.where(agg_e == (1.0 - degree_c), 1.0, 0.0) * em
    return (critical * dist, unsat_c * mask), ()


class PDPSolver:
    """Config-driven assembly; all public methods are pure and jittable."""

    def __init__(self, config: SolverConfig):
        self.cfg = config
        t = config.model_type
        if t not in ("np-nd-np", "p-nd-np", "np-d-np", "p-d-p", "walk-sat",
                     "reinforce"):
            raise ValueError(f"unknown model_type {t!r}")
        self._t = t

        c = config
        if t in ("np-nd-np", "np-d-np"):
            self.prop_cfg = PR.NeuralPropagatorConfig(
                edge_dim=c.edge_dim, decimator_dim=c.hidden_dim,
                meta_dim=c.meta_dim, hidden_dim=c.hidden_dim,
                mem_hidden_dim=c.mem_hidden_dim,
                mem_agg_hidden_dim=c.mem_agg_hidden_dim,
                agg_hidden_dim=c.agg_hidden_dim, dropout=c.dropout,
                compute_dtype=c.compute_dtype)
        elif t in ("p-nd-np", "p-d-p", "reinforce"):
            self.prop_cfg = PR.SurveyPropagatorConfig(
                decimator_dim=c.hidden_dim,
                include_adaptors=(t == "p-nd-np"),
                pi=c.pi if t == "reinforce" else 0.0)
        else:
            self.prop_cfg = None

        if t == "np-nd-np":
            self.dec_cfg = D.NeuralDecimatorConfig(
                var_message_dim=c.hidden_dim, fn_message_dim=c.hidden_dim,
                meta_dim=c.meta_dim, hidden_dim=c.hidden_dim,
                edge_dim=c.edge_dim, dropout=c.dropout,
                compute_dtype=c.compute_dtype)
        elif t == "p-nd-np":
            # SP messages are [E,3] var / [E,2] fn; the reference declares
            # (3, 1) here (solver.py:555) which cannot consume the [E,2]
            # message and would crash - fixed to the true dims.
            self.dec_cfg = D.NeuralDecimatorConfig(
                var_message_dim=3, fn_message_dim=2, meta_dim=c.meta_dim,
                hidden_dim=c.hidden_dim, edge_dim=c.edge_dim,
                dropout=c.dropout, compute_dtype=c.compute_dtype)
        elif t in ("np-d-np", "p-d-p"):
            self.dec_cfg = D.SeqDecimatorConfig(
                tolerance=c.tolerance, t_max=c.t_max,
                decimation_threshold=c.decimation_threshold,
                decimation_guard=c.decimation_guard,
                simplify_rounds=c.simplify_rounds)
        elif t == "reinforce":
            self.dec_cfg = D.ReinforceDecimatorConfig(
                decimation_probability=c.decimation_probability)
        else:
            self.dec_cfg = None

        if t in ("np-nd-np", "p-nd-np"):
            self.pred_cfg = P.NeuralPredictorConfig(
                decimator_dim=c.hidden_dim, prediction_dim=c.prediction_dim,
                edge_dim=c.edge_dim, meta_dim=c.meta_dim,
                mem_hidden_dim=c.mem_hidden_dim,
                agg_hidden_dim=c.agg_hidden_dim,
                mem_agg_hidden_dim=c.mem_agg_hidden_dim,
                classifier_dim=c.classifier_dim, classifier_kind="sigmoid",
                compute_dtype=c.compute_dtype)
        elif t == "np-d-np":
            # scorer = neural predictor with tanh head (solver.py:630-634)
            self.scorer_cfg = P.NeuralPredictorConfig(
                decimator_dim=c.hidden_dim, prediction_dim=1,
                edge_dim=c.edge_dim, meta_dim=c.meta_dim,
                mem_hidden_dim=c.mem_hidden_dim,
                agg_hidden_dim=c.agg_hidden_dim,
                mem_agg_hidden_dim=c.mem_agg_hidden_dim,
                classifier_dim=c.classifier_dim, classifier_kind="tanh")
            self.pred_cfg = None
        else:
            self.pred_cfg = None

        if t in ("p-d-p", "reinforce"):
            self.scorer_cfg = P.SurveyScorerConfig(
                message_dim=1, include_adaptors=False,
                pi=c.pi if t == "reinforce" else 0.0)
        elif t != "np-d-np":
            self.scorer_cfg = None

    # -- parameters -----------------------------------------------------

    def init_params(self, rng):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        params = {}
        t = self._t
        if t in ("np-nd-np", "np-d-np"):
            params["prop"] = PR.neural_propagator_init(r1, self.prop_cfg)
        elif t == "p-nd-np":
            params["prop"] = PR.survey_propagator_init(r1, self.prop_cfg)
        if t in ("np-nd-np", "p-nd-np"):
            params["dec"] = D.neural_decimator_init(r2, self.dec_cfg)
            params["predictor"] = P.neural_predictor_init(r3, self.pred_cfg)
        if t == "np-d-np":
            params["scorer"] = P.neural_predictor_init(r4, self.scorer_cfg)
        return params

    def parameter_count(self, params):
        return sum(x.size for x in jax.tree_util.tree_leaves(params))

    # -- init state -----------------------------------------------------

    def get_init_state(self, rng, batch: FGBatch, randomized: bool,
                       replication: int = 1) -> SolverState:
        """Reference get_init_state (solver.py:498-511) for both directions."""
        E = batch.num_edges * replication
        B = batch.batch_size * replication
        r1, r2 = jax.random.split(rng)
        t = self._t
        if t in ("np-nd-np", "np-d-np"):
            prop = PR.neural_propagator_init_state(r1, self.prop_cfg, E,
                                                   randomized)
        elif t in ("p-nd-np", "p-d-p", "reinforce"):
            prop = PR.survey_propagator_init_state(r1, E, randomized)
        else:
            prop = ()

        if t in ("np-nd-np", "p-nd-np"):
            dec = D.neural_decimator_init_state(r2, self.dec_cfg, E,
                                                randomized)
            aux = ()
        elif t == "np-d-np":
            # the sequential decimator's init state comes from its scorer
            # (pdp_decimate.py:179-183); for the neural scorer that is an
            # [E, hidden] pair (pdp_predict.py:93-104)
            dec = PR.neural_propagator_init_state(
                r2, self.prop_cfg, E, randomized)
            aux = D.seq_decimator_init_state(batch, replication)
        elif t == "p-d-p":
            dec = P.scorer_message_init_state(r2, E, randomized)
            aux = D.seq_decimator_init_state(batch, replication)
        elif t == "reinforce":
            dec = P.scorer_message_init_state(r2, E, randomized)
            aux = D.reinforce_decimator_init_state(batch, replication)
        else:
            dec = ()
            aux = ()
        return SolverState(prop=prop, dec=dec, aux=aux)

    # -- building blocks ------------------------------------------------

    def _scorer_fn(self, params, batch):
        t = self._t
        if t in ("p-d-p", "reinforce"):
            def fn(message_state, problem):
                return P.survey_scorer_apply({}, self.scorer_cfg, batch,
                                             message_state, problem)[0]
        elif t == "np-d-np":
            def fn(message_state, problem):
                # message_state here is the neural propagator output; the
                # scorer aggregates its var-side messages (solver.py:630-634)
                em = compute_edge_mask(batch, problem)
                return P.neural_predictor_apply(
                    params["scorer"], self.scorer_cfg, batch,
                    message_state, em)[0]
        else:
            fn = None
        return fn

    def _scorer_tail_fn(self):
        """V-level scorer conclusion for the decimator's combined
        convergence+scorer reduce (classical survey scorer only)."""
        if self._t == "p-d-p" and not self.scorer_cfg.include_adaptors:
            cfg = self.scorer_cfg
            return lambda agg: P.survey_scorer_tail(cfg, agg)  # [V, 1]
        return None

    def _propagate(self, params, rng, batch, prop, dec, em, ae, is_training,
                   meta_e=None):
        t = self._t
        if t in ("np-nd-np", "np-d-np"):
            return PR.neural_propagator_apply(
                params["prop"], self.prop_cfg, rng, batch, prop, dec, em, ae,
                is_training, meta_e)
        else:
            return PR.survey_propagator_apply(
                params.get("prop", {}), self.prop_cfg, batch, prop, dec,
                em, ae)

    def _predict(self, params, rng, batch, problem, dec, em, last_call,
                 meta_e=None):
        t = self._t
        if t in ("np-nd-np", "p-nd-np"):
            return P.neural_predictor_apply(params["predictor"],
                                            self.pred_cfg, batch, dec, em,
                                            meta_e)
        if t == "reinforce":
            return P.reinforce_predictor_apply(batch, dec)
        return P.identity_predictor_apply(rng, problem, random_fill=True,
                                          last_call=last_call)

    # -- forward --------------------------------------------------------

    def forward(self, params, rng, batch: FGBatch, init_state: SolverState,
                iteration_num: int, *, is_training: bool,
                check_termination: bool = False, replication: int = 1,
                simplify_first: bool = True, graph_feat=None,
                carry=None, finalize=True):
        """See _forward. Training traces run under training_mode() so the
        no-VJP fused kernels stand down for differentiable fallbacks
        (is_training is static, so this bakes per-trace)."""
        kw = dict(is_training=is_training,
                  check_termination=check_termination,
                  replication=replication, simplify_first=simplify_first,
                  graph_feat=graph_feat, carry=carry, finalize=finalize)
        if is_training:
            from pdp_solver_tpu.ops.pallas_fused import training_mode
            with training_mode():
                return self._forward(params, rng, batch, init_state,
                                     iteration_num, **kw)
        return self._forward(params, rng, batch, init_state,
                             iteration_num, **kw)

    def _forward(self, params, rng, batch: FGBatch, init_state: SolverState,
                 iteration_num: int, *, is_training: bool,
                 check_termination: bool = False, replication: int = 1,
                 simplify_first: bool = True, graph_feat=None,
                 carry=None, finalize=True):
        """One full solve (reference solver.py:324-353).

        graph_feat: optional [B, meta_dim] per-instance features (reference
        meta_data); broadcast to edges once and threaded through the neural
        modules. Returns ((variable_prediction [V0,1], None), final
        SolverState) where V0 is the un-replicated variable count.

        Resumable solving: pass finalize=False to skip the final prediction /
        local search / de-dup and instead get ((None, None), state, carry)
        back, where `carry` = (problem, active, edge_mask); feed it to the
        next call's `carry=` to continue the same solve (decimation progress
        and termination flags persist). Chunks a very long iteration budget
        into several bounded program executions. carry composes with
        replication only if the caller replicates the batch itself.
        """
        t = self._t
        if replication > 1 and not is_training and carry is None:
            batch = replicate_batch(batch, replication)
            if graph_feat is not None:
                graph_feat = jnp.tile(graph_feat, (replication, 1))
        if graph_feat is None and batch.graph_feat.shape[1] > 0:
            # dataset-supplied per-instance meta features (batch.graph_feat
            # is already replicated by replicate_batch). Only injected when
            # the model actually declares a meta width: a meta-carrying
            # dataset must remain usable with non-meta configs (the
            # reference gates on has_meta_data the same way), and a width
            # mismatch would otherwise surface as an opaque matmul shape
            # error inside the aggregator
            md = batch.graph_feat.shape[1]
            if self.cfg.meta_dim > 0:
                if md != self.cfg.meta_dim:
                    raise ValueError(
                        f"dataset meta feature width {md} != configured "
                        f"meta_feature_dim {self.cfg.meta_dim}")
                graph_feat = batch.graph_feat
        if graph_feat is None and self.cfg.meta_dim > 0:
            # configs may declare meta_feature_dim > 0 against datasets with
            # no meta column (several reference YAMLs do); zero features keep
            # the module shapes consistent instead of crashing
            graph_feat = jnp.zeros((batch.batch_size, self.cfg.meta_dim),
                                   jnp.float32)
        meta_e = (None if graph_feat is None
                  else common.instances_to_edges(batch, graph_feat))

        if carry is None:
            problem = init_problem_state(batch)
            if simplify_first and not is_training:
                problem = simplify_problem(batch, problem)
            resume = None
        else:
            problem, active_b0, em0 = carry
            resume = (active_b0, em0)

        has_pd = t != "walk-sat"
        if has_pd:
            problem, state, active_b, rng = self._forward_core(
                params, rng, batch, problem, init_state, iteration_num,
                is_training, check_termination, replication, meta_e,
                resume=resume)
        else:
            state = init_state
            active_b = batch.instance_mask

        if not finalize:
            em = compute_edge_mask(batch, problem)
            return (None, None), state, (problem, active_b, em)

        em = compute_edge_mask(batch, problem)
        rng, r_pred, r_ls = jax.random.split(rng, 3)
        if t == "np-d-np" and is_training:
            # Training-objective fix (documented deviation): the reference
            # trains this assembly through its IdentityPredictor
            # (solver.py:616-637), whose output is _solution = sign(score)
            # writes + random fill — piecewise-CONSTANT in the parameters,
            # so the energy loss has zero gradient and the reference's
            # train config (p-prodec2-ndec-*.yaml) cannot actually train
            # the scorer. Here the training-time prediction is the neural
            # scorer's own soft assignment ((tanh score + 1)/2), the same
            # way the sibling assemblies train their predictors; the
            # inference path (greedy decimation + identity predictor) is
            # unchanged.
            score = self._scorer_fn(params, batch)(state.dec, problem)
            pred = ((score + 1.0) * 0.5, None)
        else:
            pred = self._predict(params, r_pred, batch, problem, state.dec,
                                 em, last_call=True, meta_e=meta_e)

        if not is_training and self.cfg.local_search_iterations > 0:
            var_pred = self._local_search(r_ls, batch, problem, pred[0],
                                          replication)
            pred = (var_pred, pred[1])

        var_pred, problem = _update_solution(problem, pred[0])

        if replication > 1 and not is_training:
            var_pred = _deduplicate(batch, problem, var_pred, replication)

        return (var_pred, pred[1]), state

    def _forward_core(self, params, rng, batch, problem, state,
                      iteration_num, is_training, check_termination,
                      replication, meta_e=None, resume=None):
        """The hot loop (reference solver.py:355-386)."""
        t = self._t
        scorer_fn = self._scorer_fn(params, batch)
        scorer_tail = self._scorer_tail_fn()
        from pdp_solver_tpu.ops.pallas_verify import (
            use_verify_masks, verify_and_masks)
        import os
        # opt-in: measured a WASH on chip (bench 12.6 -> 12.8 s wall) - the
        # two-phase kernel re-streams the edge blocks, cancelling the
        # saved launch; see the cost-model note in docs/PERFORMANCE.md
        use_vm = (check_termination and replication == 1
                  and use_verify_masks(batch)
                  and os.environ.get("PDP_VERIFY_MASKS", "off") == "on")
        if resume is not None:
            active0, em0 = resume
        else:
            active0 = batch.instance_mask
            em0 = jnp.ones_like(batch.edge_mask) * batch.edge_mask

        # classical p-d-p on the chained fast path: the decimator's combined
        # convergence+scorer reduce rides the sweep kernel itself - one whole
        # edge pass per iteration disappears (propagate.py fold)
        fold_dec = (t == "p-d-p" and check_termination
                    and scorer_tail is not None and not is_training
                    and PR.use_sweep_decimator_fold(batch))
        # the mask fold additionally computes em/ae inside the sweep kernel,
        # so the per-iteration edge_masks_pair launch disappears and the
        # loop-carried masks become dead pass-throughs
        fold_masks = fold_dec and PR.use_sweep_mask_fold(batch)
        # the verify fold additionally rides the CNF check of the current
        # solution on the sweep's instance reduce; applied before this
        # iteration's decimation it reproduces the split path's active_b
        # trajectory exactly (the in-loop identity predictor is
        # solution-preserving), except that the sweep's own freeze mask and
        # the loop-exit test lag the final verification by one iteration
        fold_verify = fold_masks and PR.use_sweep_verify_fold(batch)

        def iteration(carry, it):
            problem, state, active_b, em, ae, rng = carry
            rng, r_p, r_d, r_pr = jax.random.split(rng, 4)

            prop_agg = None
            if fold_verify:
                prop, prop_agg, em, ae, (max_sat, got_sat) = \
                    PR.survey_propagate_folded_masks(
                        self.prop_cfg, batch, state.prop, state.dec,
                        problem, active_b, verify=True)
                solved = (max_sat == got_sat).astype(jnp.float32)
                solved = _group_any(solved, replication)
                active_b = active_b * (solved <= 0.5).astype(jnp.float32)
            elif fold_masks:
                prop, prop_agg, em, ae = PR.survey_propagate_folded_masks(
                    self.prop_cfg, batch, state.prop, state.dec, problem,
                    active_b)
            elif fold_dec:
                prop, prop_agg = PR.survey_propagate_with_decimator_agg(
                    self.prop_cfg, batch, state.prop, state.dec, em, ae,
                    problem.active_clauses)
            else:
                prop = self._propagate(params, r_p, batch, state.prop,
                                       state.dec, em, ae, is_training,
                                       meta_e)

            if t in ("np-nd-np", "p-nd-np"):
                dec = D.neural_decimator_apply(params["dec"], self.dec_cfg,
                                               batch, state.dec, prop, ae,
                                               meta_e)
                aux = state.aux
            elif t in ("np-d-np", "p-d-p"):
                aux, problem, maybe_active = D.sequential_decimator_apply(
                    self.dec_cfg, scorer_fn, batch, state.aux, prop, problem,
                    em, active_b if check_termination else None,
                    scorer_tail_fn=scorer_tail, precomputed_agg=prop_agg)
                if check_termination:
                    active_b = maybe_active
                if is_training:
                    # decimation feeds the loss only through frozen solution
                    # values (sign/index ops have zero grad in the reference
                    # too); cut the tape so while_loop simplification does
                    # not need a transpose rule
                    problem = jax.tree_util.tree_map(
                        jax.lax.stop_gradient, problem)
                dec = prop
            else:  # reinforce
                aux, dec, maybe_active = D.reinforce_decimator_apply(
                    self.dec_cfg, scorer_fn, r_d, batch, state.aux, prop,
                    problem, em,
                    active_b if check_termination else None, ae)
                if check_termination:
                    active_b = maybe_active

            if check_termination and not fold_verify:
                # the predictors that read em (np-nd-np / p-nd-np) pair with
                # the neural decimator, which never mutates the problem, so
                # the carried (pre-decimation) em is identical for them;
                # identity/reinforce predictors ignore em entirely
                pred = self._predict(params, r_pr, batch, problem, dec, em,
                                     last_call=False, meta_e=meta_e)
                var_pred, problem = _update_solution(problem, pred[0])
                if use_vm:
                    # verification + next masks in ONE launch: the kernel
                    # freezes the instances this verification solved before
                    # emitting ae (ops/pallas_verify.py)
                    solved, _, em, ae = verify_and_masks(
                        batch, problem, active_b, var_pred,
                        interpret=jax.default_backend() != "tpu")
                    active_b = (active_b
                                * (solved <= 0.5).astype(jnp.float32))
                    return (problem, SolverState(prop, dec, aux), active_b,
                            em, ae, rng)
                solved, _ = cnf_evaluate(batch, var_pred)
                solved = _group_any(solved, replication)
                active_b = active_b * (solved <= 0.5).astype(jnp.float32)

            # next iteration's masks, fused into one dual-gather dispatch
            # (under the mask fold the next sweep computes them in-kernel,
            # so the carried values are dead pass-throughs)
            if not fold_masks:
                em, ae = edge_masks_pair(batch, problem, active_b)

            return (problem, SolverState(prop, dec, aux), active_b, em, ae,
                    rng)

        ae0 = edge_active_instance_mask(batch, active0)
        carry = (problem, state, active0, em0, ae0, rng)
        if is_training:
            # differentiable unrolled loop (train_inner_recurrence_num is 1
            # in every reference config)
            for it in range(iteration_num):
                carry = iteration(carry, it)
        else:
            def cond(c_it):
                (problem, state, active_b, em, ae, rng), it = c_it
                alive = jnp.sum(active_b) > 0 if check_termination else True
                return jnp.logical_and(it < iteration_num, alive)

            def body(c_it):
                c, it = c_it
                return iteration(c, it), it + 1

            it0 = jnp.sum(batch.instance_mask).astype(jnp.int32) * 0
            carry, _ = jax.lax.while_loop(cond, body, (carry, it0))

        problem, state, active_b, em, ae, rng = carry
        return problem, state, active_b, rng

    # -- WalkSAT local search -------------------------------------------

    def local_search(self, rng, batch, problem, var_pred, iterations,
                     replication=1):
        """Public continuation-friendly WalkSAT: runs `iterations` flips from
        the given prediction and returns the improved prediction. Feeding the
        output back in with a fresh rng continues the search (thresholding
        is idempotent on 0/1 assignments), which chunks very long local-search
        budgets into bounded program executions."""
        return self._local_search(rng, batch, problem, var_pred, replication,
                                  iterations)

    def _local_search(self, rng, batch, problem, var_pred, replication,
                      iterations=None):
        """Reference _local_search (solver.py:433-467): epsilon-greedy WalkSAT
        on the still-active subgraph, one flip per instance per iteration."""
        V, B = batch.num_vars, batch.batch_size
        eps = self.cfg.epsilon
        iters = (self.cfg.local_search_iterations
                 if iterations is None else iterations)

        assign = (var_pred[:, 0] > 0.5).astype(jnp.float32)
        assign = problem.active_vars * (2.0 * assign - 1.0)
        em = compute_edge_mask(batch, problem)

        from pdp_solver_tpu.problem.simplify import _use_fused_kernel
        from pdp_solver_tpu.ops.pallas_fused import use_chained_pass
        use_kernel = _use_fused_kernel(batch)
        use_chained = use_kernel and use_chained_pass(batch)

        # multi-iteration mega-kernel: K complete WalkSAT iterations
        # (energies, deltas, selection, flip) per launch, amortising the
        # device's per-launch floor. auto = TPU only; "on" forces the
        # interpret path (different RNG stream than the per-iteration loop,
        # so parity tests opt in explicitly).
        import os
        from pdp_solver_tpu.ops.pallas_walksat import (
            use_walksat_mega, walksat_block, walksat_edge_constants)
        mega_mode = os.environ.get("PDP_WALKSAT_MEGA", "auto")
        K = int(os.environ.get("PDP_WALKSAT_K", "8"))
        # isinstance check: a traced iteration count (public local_search
        # under jit with a dynamic budget) cannot take the mega path - the
        # block count must be static - but must keep working via the
        # while_loop below, whose cond accepts tracers
        use_mega = (use_chained and use_walksat_mega(batch)
                    and mega_mode != "off"
                    and (mega_mode == "on"
                         or jax.default_backend() == "tpu")
                    and isinstance(iters, int) and iters >= K > 1)

        not_done0 = jnp.sum(batch.instance_mask) < 0
        it0 = jnp.sum(batch.instance_mask).astype(jnp.int32) * 0

        def block_done(energy_b):
            """Done flag from per-instance unsat counts (shared by the
            mega-kernel block loop and the per-iteration loop)."""
            unsat_b = ((energy_b > 0).astype(jnp.float32)
                       * batch.instance_mask)
            if replication > 1:
                # an original instance is finished once ANY replica solves
                # it (reference solver.py:446-449)
                solved_any = _group_any(1.0 - unsat_b, replication)
                return jnp.sum((1.0 - solved_any)
                               * batch.instance_mask) <= 0.0
            return jnp.sum(unsat_b) <= 0.0

        if use_mega:
            n_blocks = iters // K
            econst = walksat_edge_constants(batch, problem.active_vars)

            def mcond(carry):
                assign, rng, blk, done = carry
                return jnp.logical_and(blk < n_blocks,
                                       jnp.logical_not(done))

            def mbody(carry):
                assign, rng, blk, _ = carry
                rng, r = jax.random.split(rng)
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(r, (1,), jnp.uint32), jnp.int32)
                assign, energy = walksat_block(
                    assign, batch=batch,
                    active_vars=problem.active_vars,
                    active_clauses=problem.active_clauses, em=em,
                    K=K, seed=seed, eps=eps, edge_constants=econst,
                    interpret=jax.default_backend() != "tpu")
                return assign, rng, blk + 1, block_done(energy)

            assign, rng, _, done0 = jax.lax.while_loop(
                mcond, mbody, (assign, rng, it0, not_done0))
            iters = iters % K    # remainder runs the per-iteration loop
            not_done0 = done0
            if iters == 0:
                return ((assign + 1.0) / 2.0)[:, None]

        def cond(carry):
            assign, rng, it, done = carry
            return jnp.logical_and(it < iters, jnp.logical_not(done))

        def body(carry):
            assign, rng, it, _ = carry
            rng, r_coin, r_rand = jax.random.split(rng, 3)

            # energy (solver.py:486-496) and flip-delta (solver.py:469-484)
            # share the same clause-direction columns; on the uniform fast
            # path BOTH graph directions run in one chained kernel launch
            if use_chained:
                from pdp_solver_tpu.ops.pallas_fused import (
                    IWIN, batch_var_window, chained_edge_pass)
                ls_win = batch_var_window(batch)
                if B <= IWIN:
                    # energy's F->B reduce rides the same launch
                    _, vd, _, iout = chained_edge_pass(
                        _ws_cf1, _ws_cf2_ired, _ws_cf3,
                        node_cols=(assign * problem.active_vars,
                                   problem.active_vars),
                        gather_ids=batch.edge_var,
                        clause_cols=(problem.active_clauses,),
                        edge_cols=(batch.edge_sign, batch.edge_mask, em),
                        clause_width=batch.clause_width,
                        num_clauses=batch.num_clauses,
                        num_segments=batch.num_vars,
                        n_cred=2, n_cout=0, n_bcast=3, n_vred=2,
                        n_ired=1, clause_batch=batch.clause_batch,
                        num_instances=B, window=ls_win,
                        interpret=jax.default_backend() != "tpu")
                    unsat_f = None
                    energy_b = iout[0]
                else:
                    cout, vd, _ = chained_edge_pass(
                        _ws_cf1, _ws_cf2, _ws_cf3,
                        node_cols=(assign * problem.active_vars,
                                   problem.active_vars),
                        gather_ids=batch.edge_var,
                        clause_cols=(problem.active_clauses,),
                        edge_cols=(batch.edge_sign, batch.edge_mask, em),
                        clause_width=batch.clause_width,
                        num_clauses=batch.num_clauses,
                        num_segments=batch.num_vars,
                        n_cred=2, n_cout=1, n_bcast=3, n_vred=2,
                        window=ls_win,
                        interpret=jax.default_backend() != "tpu")
                    unsat_f = cout[0]
            else:
                if use_kernel:
                    from pdp_solver_tpu.ops.pallas_fused import \
                        fused_edge_pass
                    cd, (dist,) = fused_edge_pass(
                        _ws_pass_a,
                        node_cols=(assign * problem.active_vars,
                                   problem.active_vars),
                        gather_ids=batch.edge_var,
                        edge_cols=(batch.edge_sign, batch.edge_mask),
                        reduce_ids=batch.edge_clause,
                        reduce_uniform=batch.clause_width,
                        num_segments=batch.num_clauses, n_red=2, n_eout=1,
                        interpret=jax.default_backend() != "tpu")
                else:
                    dist = (batch.edge_sign
                            * (assign * problem.active_vars)[batch.edge_var]
                            * batch.edge_mask)
                    deg_e = (problem.active_vars[batch.edge_var]
                             * batch.edge_mask)
                    cd = common.scatter_to_clauses_cols(batch, (dist, deg_e))
                agg_f = cd[0]
                degree_f = cd[1]
                unsat_f = ((agg_f == -degree_f).astype(jnp.float32)
                           * problem.active_clauses)

            if unsat_f is not None:
                energy_b = segment_sum(unsat_f, batch.clause_batch, B,
                                       indices_are_sorted=True)
            unsat_b = (energy_b > 0).astype(jnp.float32) * batch.instance_mask
            done = block_done(energy_b)

            # critical edges: the clause is decided solely by this literal
            if use_chained:
                pass        # vd already holds (flip delta, unsat per var)
            elif use_kernel:
                from pdp_solver_tpu.ops.pallas_fused import fused_edge_pass
                vd, _ = fused_edge_pass(
                    _ws_pass_b,
                    node_cols=(agg_f, degree_f, unsat_f),
                    gather_ids=batch.edge_clause,
                    gather_uniform=batch.clause_width,
                    edge_cols=(dist, em, batch.edge_mask),
                    reduce_ids=batch.edge_var,
                    num_segments=batch.num_vars, n_red=2,
                    interpret=jax.default_backend() != "tpu")
            else:
                agg_e = agg_f[batch.edge_clause] - dist
                degree_e = degree_f[batch.edge_clause]
                critical = ((agg_e == (1.0 - degree_e)).astype(jnp.float32)
                            * em)
                unsat_e = unsat_f[batch.edge_clause] * batch.edge_mask
                vd = common.scatter_to_vars_cols(
                    batch, (critical * dist, unsat_e))
            delta = vd[0]
            best_ind = segment_argmax_first(-delta, batch.var_batch, B,
                                            valid=batch.var_mask,
                                            indices_are_sorted=True)

            unsat_v = (vd[1] * problem.active_vars
                       > 0).astype(jnp.float32)
            noise = unsat_v * jax.random.uniform(r_rand, (V,))
            rand_ind = segment_argmax_first(noise, batch.var_batch, B,
                                            valid=batch.var_mask,
                                            indices_are_sorted=True)

            coin = (jax.random.uniform(r_coin, (B,)) > eps)
            chosen = jnp.where(coin, best_ind, rand_ind)

            sel = jnp.logical_and(
                jnp.arange(V, dtype=jnp.int32) == chosen[batch.var_batch],
                unsat_b[batch.var_batch] > 0)
            assign = jnp.where(sel, -assign, assign)
            return assign, rng, it + 1, done

        # (not_done0/it0 are derived from batch data above so their sharding
        # matches the loop body's outputs under shard_map)
        assign, _, _, _ = jax.lax.while_loop(
            cond, body, (assign, rng, it0, not_done0))
        return ((assign + 1.0) / 2.0)[:, None]


def build_solver(config) -> PDPSolver:
    """Build a PDPSolver from a flat config dict with reference key names
    (see reference trainer.py:48-99 _build_graph)."""
    if isinstance(config, SolverConfig):
        return PDPSolver(config)
    c = dict(config)
    return PDPSolver(SolverConfig(
        model_type=c["model_type"],
        name=c.get("model_name", "pdp-solver"),
        edge_dim=c.get("edge_feature_dim", 1),
        meta_dim=c.get("meta_feature_dim", 0),
        hidden_dim=c.get("hidden_dim", 150),
        prediction_dim=c.get("prediction_dim", 1),
        mem_hidden_dim=c.get("mem_hidden_dim", 100),
        agg_hidden_dim=c.get("agg_hidden_dim", 100),
        mem_agg_hidden_dim=c.get("mem_agg_hidden_dim", 50),
        classifier_dim=c.get("classifier_dim", 50),
        dropout=c.get("dropout", 0.0),
        tolerance=c.get("tolerance", 0.02),
        t_max=float(c.get("t_max", 100)),
        pi=c.get("pi", 0.0),
        decimation_probability=c.get("decimation_probability", 0.5),
        decimation_threshold=c.get("decimation_threshold", 1.0),
        decimation_guard=c.get("decimation_guard", 0.0),
        simplify_rounds=int(c.get("simplify_rounds", 0)),
        local_search_iterations=c.get("local_search_iteration", 0),
        epsilon=c.get("epsilon", 0.05),
        compute_dtype=c.get("compute_dtype", "float32"),
    ))


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------

def _update_solution(problem: ProblemState, var_pred):
    """Merge the prediction into the persistent solution on active variables
    (reference solver.py:388-399)."""
    if var_pred is None:
        return None, problem
    av = col(problem.active_vars)
    merged = av * var_pred + (1.0 - av) * problem.solution[:, None]
    problem = problem._replace(solution=merged[:, 0])
    return merged, problem


def _group_any(solved, replication):
    """Any-replica-solved, broadcast back to every replica
    (reference trainer.py:157-160)."""
    if replication <= 1:
        return solved
    g = solved.reshape(replication, -1)
    return jnp.tile(jnp.max(g, axis=0), (replication,))


def _compute_energy(batch: FGBatch, problem: ProblemState, assign):
    """#unsat active clauses per instance (reference solver.py:486-496).
    assign: f32[V] in {-1, 0, +1}. Returns (energy f32[B], unsat f32[F])."""
    F, B = batch.num_clauses, batch.batch_size
    av_e = (assign * problem.active_vars)[batch.edge_var] * batch.edge_mask
    deg_e = problem.active_vars[batch.edge_var] * batch.edge_mask
    ad = common.scatter_to_clauses_cols(
        batch, (batch.edge_sign * av_e, deg_e))
    agg = ad[0]
    degree = ad[1]
    unsat = (agg == -degree).astype(jnp.float32) * problem.active_clauses
    energy = segment_sum(unsat, batch.clause_batch, B,
                         indices_are_sorted=True)
    return energy, unsat


def _compute_energy_diff(batch: FGBatch, problem: ProblemState, assign, em):
    """Per-variable energy delta if flipped (reference solver.py:469-484):
    sum of signed assignments over 'critical' edges - edges whose clause is
    decided solely by that edge's literal."""
    V, F = batch.num_vars, batch.num_clauses
    dist = (batch.edge_sign * (assign * problem.active_vars)[batch.edge_var]
            * batch.edge_mask)
    deg_e = problem.active_vars[batch.edge_var] * batch.edge_mask
    ad = common.scatter_to_clauses_cols(batch, (dist, deg_e))
    agg = ad[0][batch.edge_clause] - dist
    degree = ad[1][batch.edge_clause]

    critical = (agg == (1.0 - degree)).astype(jnp.float32) * em
    return common.scatter_to_vars(batch, critical * dist)


def _deduplicate(rep_batch: FGBatch, problem: ProblemState, var_pred,
                 replication):
    """Pick the min-energy replica per original instance (solver.py:401-431).

    The replica layout is [R, V0] by construction (replicate_batch), so the
    reference's replication-mask argmax becomes a reshape + argmin; first
    minimal replica wins, matching the reference tie-break. Everything is
    derived from the replicated batch itself (B0 = B/R etc.), so this works
    both when forward() replicated internally and when the caller passed an
    already-replicated batch (the resumable-carry path).
    """
    R = replication
    B0 = rep_batch.batch_size // R
    V0 = rep_batch.num_vars // R
    assign = 2.0 * var_pred[:, 0] - 1.0
    energy, _ = _compute_energy(rep_batch, problem, assign)
    e = energy.reshape(R, B0)
    best_r = jnp.argmin(e, axis=0)                        # [B0]
    pred_r = var_pred[:, 0].reshape(R, V0)
    v0 = jnp.arange(V0, dtype=jnp.int32)
    chosen = pred_r[best_r[rep_batch.var_batch[:V0]], v0]
    return chosen[:, None]
