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


def compute_edge_mask(batch: FGBatch, state: ProblemState) -> jnp.ndarray:
    """Per-edge liveness: both endpoints active (reference solver.py:370-371)."""
    return (state.active_vars[batch.edge_var]
            * state.active_clauses[batch.edge_clause]
            * batch.edge_mask)


def edge_active_instance_mask(batch: FGBatch, active_instances) -> jnp.ndarray:
    """Broadcast a per-instance activity flag to edges via the variable side.

    Reference pattern `mm(variable_mask_T, mm(b_variable_mask, active))`
    (pdp_propagate.py:52-54): edge e is frozen once the instance that owns its
    variable has terminated.
    """
    return active_instances[batch.var_batch[batch.edge_var]]
