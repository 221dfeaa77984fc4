"""Functional SATProblem state.

The reference's `SATProblem` (src/pdp/nn/solver.py:19-285) is a mutable object
holding six families of sparse masks plus live-node bookkeeping. Here the graph
constants live in an immutable `FGBatch` and the mutable part is this tiny
pytree, threaded explicitly through `lax.while_loop` bodies so the entire
solve (propagation, decimation, simplification, termination) stays on-device.

State fields (reference equivalents):
  active_vars     f32[V]  _active_variables  (solver.py:49)  0 also marks padding
  active_clauses  f32[F]  _active_functions  (solver.py:50)
  solution        f32[V]  _solution          (solver.py:51), init 0.5
  is_sat          f32[B]  _is_sat            (solver.py:54), 0.5 unknown / 0 UNSAT
"""

from typing import NamedTuple

import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch


class ProblemState(NamedTuple):
    active_vars: jnp.ndarray     # f32[V]
    active_clauses: jnp.ndarray  # f32[F]
    solution: jnp.ndarray        # f32[V]
    is_sat: jnp.ndarray          # f32[B]


def init_problem_state(batch: FGBatch) -> ProblemState:
    """Padding nodes start deactivated, so every masked op ignores them for free."""
    return ProblemState(
        active_vars=batch.var_mask,
        active_clauses=batch.clause_mask,
        solution=0.5 * jnp.ones_like(batch.var_mask),
        is_sat=0.5 * jnp.ones_like(batch.label),
    )


def _em_pass(gathered, edge_vals):
    av_e, ac_e = gathered
    (mask,) = edge_vals
    return (), (av_e * ac_e * mask,)


def _ae_pass(gathered, edge_vals):
    (abv_e,) = gathered
    return (), (abv_e,)


def _em_ae_pass(gathered, edge_vals):
    av_e, abv_e, ac_e = gathered
    (mask,) = edge_vals
    return (), (av_e * ac_e * mask, abv_e)


def _use_fused(batch: FGBatch) -> bool:
    from pdp_solver_tpu.ops.pallas_fused import use_fused_pass
    return use_fused_pass(batch)


def compute_edge_mask(batch: FGBatch, state: ProblemState) -> jnp.ndarray:
    """Per-edge liveness: both endpoints active (reference solver.py:370-371).

    Two unsorted node->edge gathers cost ~12ms at E=524k on chip; the fused
    dual-gather kernel does both windowed from VMEM in one dispatch."""
    if _use_fused(batch):
        import jax
        from pdp_solver_tpu.ops.pallas_fused import (
            batch_var_window, fused_edge_pass)
        _, (em,) = fused_edge_pass(
            _em_pass,
            node_cols=(state.active_vars,), gather_ids=batch.edge_var,
            node_cols2=(state.active_clauses,),
            gather_ids2=batch.edge_clause,
            gather2_uniform=batch.clause_width,
            edge_cols=(batch.edge_mask,), n_eout=1,
            window=batch_var_window(batch),
            interpret=jax.default_backend() != "tpu")
        return em
    return (state.active_vars[batch.edge_var]
            * state.active_clauses[batch.edge_clause]
            * batch.edge_mask)


def edge_active_instance_mask(batch: FGBatch, active_instances) -> jnp.ndarray:
    """Broadcast a per-instance activity flag to edges via the variable side.

    Reference pattern `mm(variable_mask_T, mm(b_variable_mask, active))`
    (pdp_propagate.py:52-54): edge e is frozen once the instance that owns its
    variable has terminated.
    """
    if _use_fused(batch):
        import jax
        from pdp_solver_tpu.ops.pallas_fused import (
            batch_var_window, fused_edge_pass)
        _, (ae,) = fused_edge_pass(
            _ae_pass,
            node_cols=(active_instances[batch.var_batch],),
            gather_ids=batch.edge_var, n_eout=1,
            window=batch_var_window(batch),
            interpret=jax.default_backend() != "tpu")
        return ae
    return active_instances[batch.var_batch[batch.edge_var]]


def edge_masks_pair(batch: FGBatch, state: ProblemState, active_instances):
    """(edge liveness mask, per-edge instance-active flag) - the solver's
    per-iteration edge masks, in ONE dual-gather kernel dispatch on the
    fast path (three node->edge gathers cost ~15ms at E=524k as XLA ops)."""
    if _use_fused(batch):
        import jax
        from pdp_solver_tpu.ops.pallas_fused import (
            batch_var_window, fused_edge_pass)
        _, (em, ae) = fused_edge_pass(
            _em_ae_pass,
            node_cols=(state.active_vars,
                       active_instances[batch.var_batch]),
            gather_ids=batch.edge_var,
            node_cols2=(state.active_clauses,),
            gather_ids2=batch.edge_clause,
            gather2_uniform=batch.clause_width,
            edge_cols=(batch.edge_mask,), n_eout=2,
            window=batch_var_window(batch),
            interpret=jax.default_backend() != "tpu")
        return em, ae
    return (compute_edge_mask(batch, state),
            edge_active_instance_mask(batch, active_instances))
