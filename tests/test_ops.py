"""Unit tests for the segment-op algebra (ops/segment.py)."""

import jax.numpy as jnp
import numpy as np

from pdp_solver_tpu.ops import (
    segment_sum, segment_max, segment_argmax_first, segment_smooth_max,
)
from pdp_solver_tpu.ops.segment import segment_max_shifted


def test_segment_sum_2d():
    x = jnp.array([[1., 2.], [3., 4.], [5., 6.]])
    ids = jnp.array([0, 1, 0])
    out = segment_sum(x, ids, 2)
    np.testing.assert_allclose(out, [[6., 8.], [3., 4.]])


def test_segment_argmax_first_tie_break():
    # two maximal entries in segment 0 -> first index wins (reference
    # torch.argmax tie-break, util.py:257-265)
    x = jnp.array([3.0, 5.0, 5.0, 1.0, 7.0])
    ids = jnp.array([0, 0, 0, 1, 1])
    out = segment_argmax_first(x, ids, 2)
    np.testing.assert_array_equal(out, [1, 4])


def test_segment_argmax_respects_valid_mask():
    x = jnp.array([10.0, 5.0, 1.0])
    ids = jnp.array([0, 0, 0])
    valid = jnp.array([0.0, 1.0, 1.0])
    out = segment_argmax_first(x, ids, 1, valid=valid)
    np.testing.assert_array_equal(out, [1])


def test_segment_argmax_empty_segment_returns_zero():
    x = jnp.array([1.0, 2.0])
    ids = jnp.array([0, 0])
    out = segment_argmax_first(x, ids, 3)
    np.testing.assert_array_equal(out, [1, 0, 0])


def test_segment_smooth_max_matches_reference_formula():
    # sum(x e^{ax}) / max(sum(e^{ax}), 1) with exp clamp at 30
    x = np.array([0.1, 0.9, 0.5], dtype=np.float32)
    ids = jnp.array([0, 0, 1])
    a = 30.0
    coeff = np.exp(np.minimum(a * x, 30.0))
    exp0 = (x[:2] * coeff[:2]).sum() / max(coeff[:2].sum(), 1.0)
    exp1 = (x[2] * coeff[2]) / max(coeff[2], 1.0)
    out = segment_smooth_max(jnp.array(x), ids, 2, alpha=a)
    np.testing.assert_allclose(out, [exp0, exp1], rtol=1e-6)


def test_segment_smooth_max_empty_segment_is_zero():
    out = segment_smooth_max(jnp.array([0.5]), jnp.array([1]), 2)
    assert float(out[0]) == 0.0


def test_segment_max_shifted_masks_and_defaults():
    x = jnp.array([-5.0, -2.0, 3.0])
    ids = jnp.array([0, 0, 1])
    valid = jnp.array([1.0, 0.0, 1.0])
    out = segment_max_shifted(x, ids, 3, valid=valid)
    np.testing.assert_allclose(out, [-5.0, 3.0, 0.0])
