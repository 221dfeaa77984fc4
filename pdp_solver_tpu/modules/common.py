"""Shared graph-op helpers for P/D/P modules.

Maps the reference's sparse-matrix products (src/pdp/nn/solver.py:151-178
graph masks) onto the packed edge list. Two interchangeable backends:

  scatter  jax.ops.segment_sum (XLA scatter-add). Reliable everywhere;
           slow on TPU where scatter serialises.
  ell      gather + dense reduction over the batch's fixed-width adjacency
           tables (FGBatch.var_edges / clause_edges). No scatters at all -
           the TPU-native path.

Selection: env PDP_SEGMENT_BACKEND in {auto, ell, scatter}. Measured on the
available v5e, XLA's sorted-scatter path beats the ELL gather for these
widths (tools/microbench_ops.py: SP sweep 27ms vs 51ms at E=524k), so auto
currently resolves to scatter everywhere and ell stays opt-in for devices
where gathers win.

All module-level feature tensors are 2-D [N, d]; masks are 1-D [N] and are
broadcast with `col()`.
"""

import os

import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch
from pdp_solver_tpu.ops import segment_sum, safe_exp

# rough cap on the [N, chunk, d] gather intermediate in the ell backend
_ELL_CHUNK_BUDGET = 64 * 1024 * 1024  # elements


def col(mask_1d):
    return mask_1d[:, None]


def _backend():
    return os.environ.get("PDP_SEGMENT_BACKEND", "auto")


def _use_ell(table):
    mode = _backend()
    if mode == "scatter":
        return False
    if table.shape[1] == 0:
        return False
    return mode == "ell"


def ell_sum(x_e, table):
    """Sum edge rows into nodes via an ELL adjacency table.

    x_e: [E] or [E, d]; table: [N, D] edge ids with -1 padding.
    Chunked over D so the gathered intermediate stays bounded.
    """
    N, D = table.shape
    scalar = x_e.ndim == 1
    x2 = x_e[:, None] if scalar else x_e
    d = x2.shape[1]
    chunk = max(1, min(D, _ELL_CHUNK_BUDGET // max(N * d, 1)))

    out = jnp.zeros((N, d), x2.dtype)
    for start in range(0, D, chunk):
        t = table[:, start:start + chunk]                  # [N, c]
        vals = x2[jnp.maximum(t, 0)]                       # [N, c, d]
        vals = vals * (t >= 0)[..., None].astype(x2.dtype)
        out = out + vals.sum(axis=1)
    return out[:, 0] if scalar else out


# VMEM budget guard for the windowed kernel's resident [C, N_pad] output
_WINDOWED_MAX_ELEMS = 1_500_000

# VMEM budget for the 2-D kernels' resident [N_pad, d_pad] block (~10 MB)
_WINDOWED2D_MAX_ELEMS = 2_500_000


def _use_windowed_2d(fast_flag, num_rows, d):
    """2-D feature-block kernels (ops/pallas_reduce2d.py): the TPU path for
    [E, d] hidden states with d >= 8 - the column API would need d slice
    relayouts per reduce."""
    mode = _backend()
    if mode == "windowed":      # forced (tests drive interpret mode off-TPU)
        return fast_flag and d >= 8
    if mode not in ("auto", "pallas"):
        return False
    d_pad = -(-d // 128) * 128
    n_pad = -(-num_rows // 1024) * 1024 + 2048
    return (fast_flag and jax.default_backend() == "tpu" and d >= 8
            and n_pad * d_pad <= _WINDOWED2D_MAX_ELEMS)


def _use_windowed(fast_flag, num_segments, ncols):
    """Windowed one-hot MXU reduce: the TPU default wherever the pack-time
    invariant holds (profiled ~6x cheaper than XLA scatter per reduce)."""
    mode = _backend()
    if mode == "windowed":      # forced kernel, but the pack-time invariant
        return fast_flag        # is a correctness requirement, not a perf one
    if mode not in ("auto", "pallas"):
        return False
    return (fast_flag and jax.default_backend() == "tpu"
            and (num_segments + 2048) * ncols <= _WINDOWED_MAX_ELEMS)


def _windowed(x_e, ids, num_segments):
    from pdp_solver_tpu.ops.pallas_reduce import windowed_segment_sum
    interpret = jax.default_backend() != "tpu"
    return windowed_segment_sum(x_e, ids, num_segments, interpret=interpret)


def _use_hybrid(batch, ncols):
    """Based windowed kernel + residual scatter: the var-direction reduce
    for batches failing the global invariant (modular / ragged CNFs) but
    carrying the pack-time per-tile bases (FGBatch.hybrid_var)."""
    mode = _backend()
    if not batch.hybrid_var:
        return False
    if mode == "windowed":        # forced (tests in interpret mode off-TPU)
        return True
    if mode not in ("auto", "pallas"):
        return False
    return (jax.default_backend() == "tpu"
            and (batch.num_vars + 2048) * ncols <= _WINDOWED_MAX_ELEMS)


def _hybrid_to_vars_cols(batch, cols):
    """cols already edge-masked. Returns f32[C, V]: based windowed kernel
    over all edges (out-of-window edges drop) + one small scatter over the
    static residual list. Exact: the two sets partition by construction
    (fg/batch.py _hybrid_var_meta)."""
    from pdp_solver_tpu.ops.pallas_reduce import (
        windowed_segment_sum_cols_based)
    interpret = jax.default_backend() != "tpu"
    main = windowed_segment_sum_cols_based(
        cols, batch.edge_var, batch.var_bases, batch.num_vars,
        interpret=interpret)
    ridx = batch.var_resid
    rmask = batch.var_resid_mask
    tail_x = jnp.stack([c[ridx] * rmask for c in cols], axis=1)   # [R, C]
    tail = segment_sum(tail_x, batch.edge_var[ridx], batch.num_vars)
    return main + tail.T


def scatter_to_vars(batch: FGBatch, x_e):
    """mm(variable_mask [VxE], x): sum each variable's edge rows."""
    ncols = 1 if x_e.ndim == 1 else x_e.shape[1]
    if x_e.ndim == 2 and _use_windowed_2d(batch.fast_var, batch.num_vars,
                                          ncols):
        from pdp_solver_tpu.ops.pallas_reduce2d import windowed_segment_sum_2d
        return windowed_segment_sum_2d(
            x_e * col(batch.edge_mask), batch.edge_var, batch.num_vars,
            jax.default_backend() != "tpu")
    if _use_windowed(batch.fast_var, batch.num_vars, ncols):
        m = batch.edge_mask if x_e.ndim == 1 else col(batch.edge_mask)
        return _windowed(x_e * m, batch.edge_var, batch.num_vars)
    if _use_hybrid(batch, ncols):
        xm = x_e * (batch.edge_mask if x_e.ndim == 1
                    else col(batch.edge_mask))
        cols_t = ((xm,) if x_e.ndim == 1
                  else tuple(xm[:, i] for i in range(ncols)))
        out = _hybrid_to_vars_cols(batch, cols_t)
        return out[0] if x_e.ndim == 1 else out.T
    if _use_ell(batch.var_edges):
        return ell_sum(x_e, batch.var_edges)
    m = batch.edge_mask if x_e.ndim == 1 else col(batch.edge_mask)
    return segment_sum(x_e * m, batch.edge_var, batch.num_vars)


# ---- column-tuple reduce API -------------------------------------------
# Hot paths pass C separate 1-D [E] columns and get back [C, N] rows.
# On TPU an [E, C] array with tiny C is a pathological layout: the
# stack/transpose relayouts around it cost more than the reduce itself
# (measured in docs/profile_phases.json follow-ups), so the kernels take
# the columns separately and stack in VMEM.

def scatter_to_vars_cols(batch: FGBatch, cols):
    """Segment-sum each 1-D [E] column into variables -> f32[C, V]."""
    cols = tuple(c * batch.edge_mask for c in cols)
    if _use_windowed(batch.fast_var, batch.num_vars, len(cols)):
        from pdp_solver_tpu.ops.pallas_reduce import windowed_segment_sum_cols
        return windowed_segment_sum_cols(
            cols, batch.edge_var, batch.num_vars,
            interpret=jax.default_backend() != "tpu")
    if _use_hybrid(batch, len(cols)):
        return _hybrid_to_vars_cols(batch, cols)
    return segment_sum(jnp.stack(cols, axis=0).T, batch.edge_var,
                       batch.num_vars).T


def scatter_to_clauses_cols(batch: FGBatch, cols):
    """Segment-sum each 1-D [E] column into clauses -> f32[C, F]."""
    cols = tuple(c * batch.edge_mask for c in cols)
    mode = _backend()
    if batch.clause_width > 0 and mode in ("auto", "pallas", "windowed"):
        from pdp_solver_tpu.ops.pallas_reduce import uniform_clause_sum_cols
        return uniform_clause_sum_cols(cols, batch.clause_width,
                                       batch.num_clauses)
    if _use_windowed(batch.fast_clause, batch.num_clauses, len(cols)):
        from pdp_solver_tpu.ops.pallas_reduce import windowed_segment_sum_cols
        return windowed_segment_sum_cols(
            cols, batch.edge_clause, batch.num_clauses,
            interpret=jax.default_backend() != "tpu")
    return segment_sum(jnp.stack(cols, axis=0).T, batch.edge_clause,
                       batch.num_clauses,
                       indices_are_sorted=True).T


def scatter_to_clauses(batch: FGBatch, x_e):
    """mm(function_mask [FxE], x): sum each clause's edge rows.

    Uniform-k clause-major batches (every k-SAT set) reduce by reshape -
    no scatter, no custom kernel, differentiable natively. Otherwise the
    windowed kernel applies (clause ids are sorted and gap-free by
    construction, so the invariant virtually always holds); XLA scatter is
    the last resort. PDP_SEGMENT_BACKEND in {auto, windowed, ell, scatter}
    overrides."""
    mode = _backend()
    if batch.clause_width > 0 and mode in ("auto", "pallas", "windowed"):
        from pdp_solver_tpu.ops.pallas_reduce import uniform_clause_sum
        m = batch.edge_mask if x_e.ndim == 1 else col(batch.edge_mask)
        return uniform_clause_sum(x_e * m, batch.clause_width,
                                  batch.num_clauses)
    ncols = 1 if x_e.ndim == 1 else x_e.shape[1]
    if _use_windowed(batch.fast_clause, batch.num_clauses, ncols):
        m = batch.edge_mask if x_e.ndim == 1 else col(batch.edge_mask)
        return _windowed(x_e * m, batch.edge_clause, batch.num_clauses)
    if _use_ell(batch.clause_edges):
        return ell_sum(x_e, batch.clause_edges)
    m = batch.edge_mask if x_e.ndim == 1 else col(batch.edge_mask)
    return segment_sum(x_e * m, batch.edge_clause, batch.num_clauses,
                       indices_are_sorted=True)


def gather_from_vars(batch: FGBatch, x_v):
    """mm(variable_mask_T [ExV], x): broadcast variable rows to edges."""
    if x_v.ndim == 2 and _use_windowed_2d(batch.fast_var, batch.num_vars,
                                          x_v.shape[1]):
        from pdp_solver_tpu.ops.pallas_reduce2d import windowed_gather_2d
        return windowed_gather_2d(x_v, batch.edge_var, batch.num_edges,
                                  jax.default_backend() != "tpu")
    return x_v[batch.edge_var]


def gather_from_clauses(batch: FGBatch, x_f):
    return x_f[batch.edge_clause]


def aggregate_minus_self_var(batch: FGBatch, x_e):
    """Deep-set aggregation at variables excluding the self message
    (reference util.py:60-68 with include_self_message=False)."""
    return gather_from_vars(batch, scatter_to_vars(batch, x_e)) - x_e


def aggregate_minus_self_clause(batch: FGBatch, x_e):
    return gather_from_clauses(batch, scatter_to_clauses(batch, x_e)) - x_e


def var_smooth_max(batch: FGBatch, x_e, alpha=30.0):
    """Per-variable smooth-max over incident edges
    (reference sparse_smooth_max, util.py:282-286): x_e must already carry
    any liveness mask; padding edges are excluded from both sums.

    Numerator and denominator ride one stacked [E,2] reduction - on the
    kernel-count-bound TPU every fused column is a whole op saved."""
    coeff = safe_exp(alpha * x_e) * batch.edge_mask
    nd = scatter_to_vars(batch, jnp.stack([x_e * coeff, coeff], axis=1))
    return nd[:, 0] / jnp.maximum(nd[:, 1], 1.0)


def instances_to_edges(batch: FGBatch, x_b):
    """mm(variable_mask_T, mm(b_variable_mask, x)): instance rows -> edges via
    the variable endpoint (reference pdp_propagate.py:52-54)."""
    return x_b[batch.var_batch[batch.edge_var]]


def dropout(rng, x, rate, is_training):
    if not is_training or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
