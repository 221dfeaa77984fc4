"""Unsupervised energy loss and hard CNF verification.

Ports of reference `SatLossEvaluator` (src/pdp/nn/util.py:113-197) and
`SatCNFEvaluator` (util.py:203-236) onto the packed edge list. The loss is the
temperature-annealed smooth-max relaxation of clause satisfaction: fully
differentiable, minimised without labels.
"""

import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch
from pdp_solver_tpu.modules import common
from pdp_solver_tpu.modules.common import col
from pdp_solver_tpu.ops import segment_sum

LOSS_EPS = 1e-8          # reference trainer.py:42
MAX_COEFF = 10.0         # reference trainer.py:46


def literal_values(batch: FGBatch, variable_prediction):
    """Per-edge satisfaction probability of each literal (util.py:187-188):
    sign * p + (1 - sign)/2 -> p for positive literals, 1-p for negated."""
    p_e = variable_prediction[batch.edge_var, 0]
    return batch.edge_sign * p_e + (1.0 - batch.edge_sign) / 2.0


def energy_loss(batch: FGBatch, variable_prediction, global_step,
                exploration_alpha, loss_sharpness,
                eps=LOSS_EPS, max_coeff=MAX_COEFF):
    """Annealed smooth-max energy (util.py:178-197).

    coeff = min(step^alpha, max_coeff) sharpens the per-clause soft-max of
    literal values as training progresses; kappa = loss_sharpness powers the
    clause deficit. Mean over real clauses only (padding is masked, which the
    ragged reference never needed).
    """
    F = batch.num_clauses
    coeff = jnp.minimum(jnp.power(global_step, exploration_alpha), max_coeff)

    ev = literal_values(batch, variable_prediction) * batch.edge_mask
    weights = jnp.exp(coeff * ev) * batch.edge_mask

    nom = common.scatter_to_clauses(batch, weights * ev)
    den = common.scatter_to_clauses(batch, weights)

    clause_value = den / jnp.maximum(nom, eps)
    # clamp before the sharpness power: a fully-violated clause can reach
    # den/eps ~ 1e9, and 1e9^kappa overflows f32 to inf (the reference has
    # the same latent overflow, util.py:195-197, which turns the loss - and
    # its gradients - into inf/NaN); 1e7^kappa stays finite and the clamp
    # only binds in that already-pathological regime
    clause_value = jnp.minimum(clause_value, 1e7)
    clause_value = 1.0 + jnp.power(clause_value - 1.0, loss_sharpness)
    log_v = jnp.log(jnp.maximum(clause_value, eps)) * batch.clause_mask
    return jnp.sum(log_v) / jnp.maximum(jnp.sum(batch.clause_mask), 1.0)


def _cnf_eval_pass(gathered, edge_vals):
    """Thresholded literal satisfaction, reduced per clause."""
    (p_e,) = gathered
    sign, mask = edge_vals
    lit = sign * p_e + (1.0 - sign) / 2.0
    return (jnp.where(lit > 0.5, 1.0, 0.0) * mask,), ()


def _cnf_chain_f1(gathered, edge_vals):
    (p_e,) = gathered
    sign, mask = edge_vals
    lit = sign * p_e + (1.0 - sign) / 2.0
    return (jnp.where(lit > 0.5, 1.0, 0.0) * mask,)


def _cnf_chain_f2(cred, clause_vals):
    """Clause satisfaction + BOTH instance counts (max-sat, got-sat) reduced
    in the same launch; cm is 0 on padded clauses so instance 0 stays clean."""
    (cs,) = cred
    (cm,) = clause_vals
    clause_sat = jnp.where(cs > 0, 1.0, 0.0) * cm
    return (), (), (cm, clause_sat)


def cnf_evaluate(batch: FGBatch, variable_prediction):
    """Hard verification (util.py:203-236): threshold the prediction, count
    satisfied clauses per instance. Returns (solved f32[B], unsat_count f32[B]).
    Padding instances report solved=1/unsat=0; gate with batch.instance_mask."""
    F, B = batch.num_clauses, batch.batch_size

    from pdp_solver_tpu.problem.state import _use_fused
    if _use_fused(batch):
        import jax
        from pdp_solver_tpu.ops.pallas_fused import (
            IWIN, batch_var_window, chained_edge_pass, fused_edge_pass,
            use_chained_pass)
        win = batch_var_window(batch)
        if use_chained_pass(batch) and B <= IWIN:
            # whole verification (edge pass + clause reduce + instance
            # reduces) in ONE launch
            _, _, _, iout = chained_edge_pass(
                _cnf_chain_f1, _cnf_chain_f2, None,
                node_cols=(variable_prediction[:, 0],),
                gather_ids=batch.edge_var,
                clause_cols=(batch.clause_mask,),
                edge_cols=(batch.edge_sign, batch.edge_mask),
                clause_width=batch.clause_width,
                num_clauses=F, num_segments=batch.num_vars,
                n_cred=1, n_cout=0, n_bcast=0, n_vred=0, n_eout=0,
                n_ired=2, clause_batch=batch.clause_batch,
                num_instances=B, window=win,
                interpret=jax.default_backend() != "tpu")
            max_sat, got_sat = iout[0], iout[1]
            solved = (max_sat == got_sat).astype(jnp.float32)
            return solved, max_sat - got_sat
        cs, _ = fused_edge_pass(
            _cnf_eval_pass, node_cols=(variable_prediction[:, 0],),
            gather_ids=batch.edge_var,
            edge_cols=(batch.edge_sign, batch.edge_mask),
            reduce_ids=batch.edge_clause,
            reduce_uniform=batch.clause_width, num_segments=F, n_red=1,
            window=win, interpret=jax.default_backend() != "tpu")
        clause_sat = (cs[0] > 0).astype(jnp.float32)
    else:
        ev = (literal_values(batch, variable_prediction)
              > 0.5).astype(jnp.float32)
        ev = ev * batch.edge_mask
        clause_sat = (common.scatter_to_clauses(batch, ev)
                      > 0).astype(jnp.float32)
    clause_sat = clause_sat * batch.clause_mask

    counts = segment_sum(
        jnp.stack([batch.clause_mask, clause_sat], axis=1),
        batch.clause_batch, B, indices_are_sorted=True)
    max_sat = counts[:, 0]
    got_sat = counts[:, 1]
    solved = (max_sat == got_sat).astype(jnp.float32)
    return solved, max_sat - got_sat
