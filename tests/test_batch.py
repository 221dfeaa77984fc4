"""Tests for the factor-graph compiler (fg/batch.py)."""

import numpy as np
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import (
    FGBatch, pack_instances, bucket_dims, replicate_batch)
from tests.helpers import cnf_instance


def test_bucket_dims_geometric():
    v, f, e, b = bucket_dims(130, 100, 300, 3)
    assert v == 256 and f == 128 and e == 512 and b == 128
    # idempotent on bucket boundaries
    assert bucket_dims(256, 128, 512, 128) == (256, 128, 512, 128)


def test_pack_two_instances_offsets():
    i1 = cnf_instance(2, [[1, -2]], label=1.0)      # 2 vars, 1 clause, 2 edges
    i2 = cnf_instance(3, [[1, 2], [-3]], label=0.0)  # 3 vars, 2 clauses, 3 edges
    b = pack_instances([i1, i2], bucket=False)
    assert b.num_vars == 5 and b.num_clauses == 3 and b.num_edges == 5
    np.testing.assert_array_equal(b.edge_var, [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(b.edge_clause, [0, 0, 1, 1, 2])
    np.testing.assert_array_equal(b.edge_sign, [1, -1, 1, 1, -1])
    np.testing.assert_array_equal(b.var_batch, [0, 0, 1, 1, 1])
    np.testing.assert_array_equal(b.clause_batch, [0, 1, 1])
    np.testing.assert_array_equal(b.label, [1.0, 0.0])


def test_pack_padding_masks():
    i1 = cnf_instance(2, [[1, -2]])
    b = pack_instances([i1], pad_v=4, pad_f=3, pad_e=8, pad_b=2)
    assert b.num_vars == 4 and b.num_edges == 8 and b.batch_size == 2
    np.testing.assert_array_equal(b.var_mask, [1, 1, 0, 0])
    np.testing.assert_array_equal(b.edge_mask, [1, 1, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(b.instance_mask, [1, 0])
    # padding rows point in-bounds
    assert b.edge_var.max() < 4 and b.edge_clause.max() < 3


def test_pack_sorts_edges_by_clause():
    gmap = np.array([[0, 1, 2], [1, 0, 1]], dtype=np.int32)  # clause ids 1,0,1
    inst = (3, 2, gmap, np.array([1.0, -1.0, 1.0], dtype=np.float32), -1.0)
    b = pack_instances([inst], bucket=False)
    np.testing.assert_array_equal(b.edge_clause, [0, 1, 1])
    np.testing.assert_array_equal(b.edge_var, [1, 0, 2])
    np.testing.assert_array_equal(b.edge_sign, [-1, 1, 1])


def test_replicate_batch_layout():
    i1 = cnf_instance(2, [[1, -2]], label=1.0)
    i2 = cnf_instance(1, [[1]], label=0.0)
    b = pack_instances([i1, i2], bucket=False)
    r = replicate_batch(b, 2)
    assert r.num_vars == 6 and r.num_clauses == 4 and r.batch_size == 4
    np.testing.assert_array_equal(np.asarray(r.var_batch), [0, 0, 1, 2, 2, 3])
    np.testing.assert_array_equal(np.asarray(r.edge_var), [0, 1, 2, 3, 4, 5])
    np.testing.assert_array_equal(np.asarray(r.label), [1, 0, 1, 0])
