"""Segment-reduce algebra: the TPU replacement for the reference's sparse-mm backend.

Every hot operation in the reference PDP solver is a sparse-matrix x dense
product over one of four index maps (reference src/pdp/nn/solver.py:101-178,
src/pdp/nn/util.py:257-286):

  scatter  edges -> nodes    torch.mm(mask,        x)   -> segment_sum(x, idx, N)
  gather   nodes -> edges    torch.mm(mask_T,      y)   -> y[idx]
  agg-minus-self             mm(mask_T, mm(mask, x)) - x
  segment max / argmax / smooth-max                      -> masked segment reductions

Here those become pure jnp/lax functions over a flat edge list. All inputs are
[N] or [N, d] arrays with int32 segment ids; invalid (padding) rows must be
pre-masked by the caller (multiplied by 0 for sums, or set to -inf for maxes).

Design notes (TPU):
  * `jax.ops.segment_sum` lowers to XLA scatter-add. With edges stored in
    segment-sorted (CSR) order we set `indices_are_sorted=True`, which lets
    XLA use a much faster path.
  * argmax uses the "value-max then first-index" construction to reproduce
    the reference's first-max-index tie-breaking (torch.argmax over a
    densified column, reference src/pdp/nn/util.py:257-265) without ever
    materialising an N x B dense matrix.
"""

import jax
import jax.numpy as jnp

# Matches the reference clamps: safe_exp logit clamp 30.0
# (src/pdp/nn/pdp_propagate.py:125, util.py:277-280) and safe_log eps
# (1e-40 in the propagator, 1e-10 in the scorer). The propagator eps is
# raised from the reference's 1e-40 (a float32 SUBNORMAL) to FLT_MIN:
# XLA flushes subnormals to zero, so max(x, 1e-40) -> log(0) = -inf -> NaN
# in aggregate-minus-self; torch keeps subnormals so the reference gets
# log(1e-40). Both clamp to "effectively zero probability" (exp of either
# underflows), verified by the parity tests.
MAX_LOGIT = 30.0
LOG_EPS_PROP = 1.1754944e-38  # smallest normal float32
LOG_EPS_SCORE = 1e-10


def safe_log(x, eps=LOG_EPS_PROP):
    return jnp.log(jnp.maximum(x, eps))


def safe_exp(x, max_logit=MAX_LOGIT):
    return jnp.exp(jnp.minimum(x, max_logit))


def segment_sum(x, segment_ids, num_segments, indices_are_sorted=False):
    """Sum rows of x into `num_segments` buckets. x: [N] or [N, d]."""
    return jax.ops.segment_sum(
        x,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_max(x, segment_ids, num_segments, indices_are_sorted=False):
    """Max-reduce rows of x per segment. Empty segments get -inf."""
    return jax.ops.segment_max(
        x,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_min_index(idx_vals, segment_ids, num_segments, indices_are_sorted=False):
    """Min-reduce integer values per segment (used for first-index tie-breaks)."""
    return jax.ops.segment_min(
        idx_vals,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_argmax_first(x, segment_ids, num_segments, valid=None,
                         indices_are_sorted=False):
    """Exact per-segment argmax with first-index tie-breaking.

    Replicates reference `sparse_argmax` (src/pdp/nn/util.py:257-265): the
    returned index is the global row index (into x) of the first maximal
    element of each segment. Rows with valid == 0 are excluded. Segments with
    no valid rows return index 0.
    """
    n = x.shape[0]
    if valid is not None:
        x = jnp.where(valid > 0, x, -jnp.inf)
    seg_max = segment_max(x, segment_ids, num_segments, indices_are_sorted)
    is_max = x == seg_max[segment_ids]
    if valid is not None:
        is_max = jnp.logical_and(is_max, valid > 0)
    row_idx = jnp.arange(n, dtype=jnp.int32)
    candidate = jnp.where(is_max, row_idx, n)
    first = segment_min_index(candidate, segment_ids, num_segments,
                              indices_are_sorted)
    return jnp.where(first >= n, 0, first).astype(jnp.int32)


def segment_smooth_max(x, segment_ids, num_segments, alpha=30.0, valid=None,
                       indices_are_sorted=False):
    """Smooth-max per segment: sum(x * e^{a x}) / max(sum(e^{a x}), 1).

    Exact port of reference `sparse_smooth_max` (src/pdp/nn/util.py:282-286)
    including the denominator clamp at 1 (so empty segments return 0).
    """
    coeff = safe_exp(alpha * x)
    if valid is not None:
        coeff = coeff * valid
    num = segment_sum(x * coeff, segment_ids, num_segments, indices_are_sorted)
    den = segment_sum(coeff, segment_ids, num_segments, indices_are_sorted)
    return num / jnp.maximum(den, 1.0)


def segment_max_shifted(x, segment_ids, num_segments, valid=None,
                        indices_are_sorted=False):
    """Per-segment max over valid rows; segments with no valid rows get 0.

    Mirrors reference `sparse_max` (src/pdp/nn/util.py:267-275) which shifts
    values so absent entries lose, then shifts back; absent-only columns come
    back as x.min() - 1 there, but every caller masks those out, so 0 here.
    """
    if valid is not None:
        x = jnp.where(valid > 0, x, -jnp.inf)
    m = segment_max(x, segment_ids, num_segments, indices_are_sorted)
    return jnp.where(jnp.isfinite(m), m, 0.0)
