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


def test_pallas_backend_matches_scatter_in_solver_ops(rng, monkeypatch):
    """PDP_SEGMENT_BACKEND=pallas must agree with scatter on real batches.

    Off-TPU the dispatch falls back to XLA (same numbers); this guards the
    wiring. On-TPU the same env var exercises the MXU kernel."""
    import os
    import jax
    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.modules import common
    from tests.helpers import cnf_instance, random_ksat

    insts = [cnf_instance(10, random_ksat(rng, 10, 25)) for _ in range(3)]
    batch = pack_instances(insts)
    x = jnp.asarray(rng.normal(size=batch.num_edges).astype(np.float32))

    monkeypatch.setenv("PDP_SEGMENT_BACKEND", "scatter")
    a = np.asarray(common.scatter_to_clauses(batch, x))
    monkeypatch.setenv("PDP_SEGMENT_BACKEND", "pallas")
    b = np.asarray(common.scatter_to_clauses(batch, x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
