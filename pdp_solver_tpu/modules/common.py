"""Shared graph-op helpers for P/D/P modules.

Maps the reference's sparse-matrix products (src/pdp/nn/solver.py:151-178
graph masks) onto gathers + segment reductions over the packed edge list.
All module-level feature tensors are 2-D [N, d]; masks are 1-D [N] and are
broadcast with `col()`.
"""

import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch
from pdp_solver_tpu.ops import segment_sum


def col(mask_1d):
    return mask_1d[:, None]


def scatter_to_vars(batch: FGBatch, x_e):
    """mm(variable_mask [VxE], x): sum each variable's edge rows."""
    return segment_sum(x_e * col(batch.edge_mask), batch.edge_var,
                       batch.num_vars)


def scatter_to_clauses(batch: FGBatch, x_e):
    """mm(function_mask [FxE], x): sum each clause's edge rows (sorted ids)."""
    return segment_sum(x_e * col(batch.edge_mask), batch.edge_clause,
                       batch.num_clauses, indices_are_sorted=True)


def gather_from_vars(batch: FGBatch, x_v):
    """mm(variable_mask_T [ExV], x): broadcast variable rows to edges."""
    return x_v[batch.edge_var]


def gather_from_clauses(batch: FGBatch, x_f):
    return x_f[batch.edge_clause]


def aggregate_minus_self_var(batch: FGBatch, x_e):
    """Deep-set aggregation at variables excluding the self message
    (reference util.py:60-68 with include_self_message=False)."""
    return gather_from_vars(batch, scatter_to_vars(batch, x_e)) - x_e


def aggregate_minus_self_clause(batch: FGBatch, x_e):
    return gather_from_clauses(batch, scatter_to_clauses(batch, x_e)) - x_e


def instances_to_edges(batch: FGBatch, x_b):
    """mm(variable_mask_T, mm(b_variable_mask, x)): instance rows -> edges via
    the variable endpoint (reference pdp_propagate.py:52-54)."""
    return x_b[batch.var_batch[batch.edge_var]]


def dropout(rng, x, rate, is_training):
    if not is_training or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
