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


def test_q_triplet_stable_underflow_regime():
    """The reference's SP normalisation divides 0/0 once the summed logs
    underflow (variable degree >~ 10 with saturated surveys -> NaN for
    every instance with n >~ 1000). The shifted triplet must stay finite,
    non-negative, and sum to total in every regime."""
    import jax.numpy as jnp
    from pdp_solver_tpu.modules.propagate import q_triplet_stable

    for same, opp in ((-500.0, -499.0), (-1200.0, -1200.0), (0.0, 0.0),
                      (-0.5, -700.0), (-1e30, -1e30)):
        q_u, q_s, d, total = q_triplet_stable(jnp.float32(same),
                                              jnp.float32(opp))
        vals = [float(q_u), float(q_s), float(d), float(total)]
        assert all(np.isfinite(v) for v in vals), (same, opp, vals)
        assert all(v >= 0 for v in vals[:3])
        assert total > 0
        np.testing.assert_allclose(float(q_u + q_s + d), float(total),
                                   rtol=1e-6)
    # parity with the naive formula where it is well-conditioned
    same, opp = jnp.float32(-2.0), jnp.float32(-3.0)
    q_u, q_s, d, total = q_triplet_stable(same, opp)
    s, o = np.exp(-2.0), np.exp(-3.0)
    naive = np.array([s * (1 - o), o * (1 - s), s * o])
    naive_n = naive / naive.sum()
    got = np.array([float(q_u / total), float(q_s / total),
                    float(d / total)])
    np.testing.assert_allclose(got, naive_n, rtol=1e-5)


def test_sp_sweep_high_degree_no_nan(rng):
    """SP sweeps on a high-degree star variable (the underflow regime the
    reference NaNs in) must stay finite."""
    import jax
    import jax.numpy as jnp
    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.modules.propagate import (
        SPMessages, SurveyPropagatorConfig, survey_propagator_apply)
    from tests.helpers import cnf_instance

    # var 1 appears in 220 clauses (mixed polarity), 220 partner vars
    clauses = []
    for i in range(220):
        sign = 1 if i % 3 else -1
        clauses.append([sign * 1, (i + 2), -(i + 2) if i % 2 else (i + 2)])
    inst = cnf_instance(221, clauses)
    batch = pack_instances([inst], bucket=False)
    E = batch.num_edges
    v = jax.random.uniform(jax.random.PRNGKey(0), (E, 3))
    v = v / v.sum(1, keepdims=True)
    state = SPMessages(var=(v[:, 0], v[:, 1], v[:, 2]),
                       fn=(0.5 * jnp.ones(E), jnp.zeros(E)))
    cfg = SurveyPropagatorConfig()
    ones = jnp.ones(E)
    sweep = jax.jit(lambda s: survey_propagator_apply(
        {}, cfg, batch, s, s, ones, ones))
    for _ in range(60):
        state = sweep(state)
    for leaf in jax.tree_util.tree_leaves(state):
        assert np.isfinite(np.asarray(leaf)).all(), "NaN/inf in SP state"
