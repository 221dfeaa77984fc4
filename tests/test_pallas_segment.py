"""Pallas one-hot-matmul segmented sum: interpret-mode correctness."""

import numpy as np
import jax.numpy as jnp
import pytest

from pdp_solver_tpu.ops.pallas_segment import sorted_segment_sum, TILE


def _expect(ids, x, n):
    out = np.zeros(n, np.float32)
    np.add.at(out, ids, x)
    return out


def test_interpret_matches_numpy(rng):
    counts = rng.integers(2, 6, size=700)
    ids = np.repeat(np.arange(700), counts).astype(np.int32)
    x = rng.normal(size=len(ids)).astype(np.float32)
    got = np.asarray(sorted_segment_sum(
        jnp.asarray(x), jnp.asarray(ids), 700, interpret=True))
    np.testing.assert_allclose(got, _expect(ids, x, 700), rtol=1e-5,
                               atol=1e-5)


def test_interpret_exact_tile_boundary(rng):
    # ids straddling tile boundaries and an E that is an exact TILE multiple
    ids = np.sort(rng.integers(0, 600, size=2 * TILE)).astype(np.int32)
    x = rng.normal(size=2 * TILE).astype(np.float32)
    got = np.asarray(sorted_segment_sum(
        jnp.asarray(x), jnp.asarray(ids), 600, interpret=True))
    np.testing.assert_allclose(got, _expect(ids, x, 600), rtol=1e-5,
                               atol=1e-4)


def test_single_segment(rng):
    ids = np.zeros(100, np.int32)
    x = np.ones(100, np.float32)
    got = np.asarray(sorted_segment_sum(
        jnp.asarray(x), jnp.asarray(ids), 4, interpret=True))
    np.testing.assert_allclose(got, [100, 0, 0, 0])
