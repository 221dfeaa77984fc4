"""Meta-feature data path: JSON row extension -> FGBatch.graph_feat ->
per-edge meta features inside the neural modules (the reference's meta_data
slot, src/pdp/nn/pdp_propagate.py:59-61, whose JSON path always fed None)."""

import jax
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances, replicate_batch
from pdp_solver_tpu.fg.jsonfmt import parse_line
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from tests.helpers import cnf_instance, random_ksat


def _meta_instances():
    rng = np.random.default_rng(0)
    insts = []
    for i in range(3):
        inst = cnf_instance(8, random_ksat(rng, 8, 12, k=3))
        insts.append(inst + ((f"id{i}",), np.array([0.5 * i, 1.0 - i],
                                                   np.float32)))
    return insts


def test_json_row_meta_roundtrip():
    line = '[[2, 1], [1, -2], [1, 1], -1, ["name"], [0.25, 0.75]]'
    out = parse_line(line)
    assert len(out) == 7
    np.testing.assert_allclose(out[6], [0.25, 0.75])


def test_pack_collects_graph_feat():
    batch = pack_instances(_meta_instances())
    assert batch.graph_feat.shape == (batch.batch_size, 2)
    np.testing.assert_allclose(batch.graph_feat[1], [0.5, 0.0])
    np.testing.assert_allclose(batch.graph_feat[3:], 0.0)  # padding instances

    B = batch.batch_size
    rep = replicate_batch(batch, 2)
    assert rep.graph_feat.shape == (2 * B, 2)
    np.testing.assert_allclose(np.asarray(rep.graph_feat[B + 1]),
                               np.asarray(batch.graph_feat[1]))


def test_meta_features_flow_into_neural_solver():
    batch = pack_instances(_meta_instances())
    solver = PDPSolver(SolverConfig(model_type="np-nd-np", meta_dim=2,
                                    hidden_dim=16, mem_hidden_dim=8,
                                    agg_hidden_dim=8, mem_agg_hidden_dim=8,
                                    classifier_dim=8))
    key = jax.random.PRNGKey(0)
    params = solver.init_params(key)
    state = solver.get_init_state(key, batch, randomized=False)

    (pred, _), _ = solver.forward(params, key, batch, state, 2,
                                  is_training=False)
    assert np.all(np.isfinite(np.asarray(pred)))

    # different meta values must change the prediction (the path is live)
    batch2 = batch._replace(graph_feat=batch.graph_feat + 3.0)
    (pred2, _), _ = solver.forward(params, key, batch2, state, 2,
                                   is_training=False)
    assert not np.allclose(np.asarray(pred), np.asarray(pred2))


def test_meta_dim_without_dataset_meta_uses_zeros():
    # reference YAMLs declare meta_feature_dim: 1 against datasets with no
    # meta column; the solver must feed zeros instead of crashing
    rng = np.random.default_rng(1)
    batch = pack_instances([cnf_instance(6, random_ksat(rng, 6, 9, k=3))])
    solver = PDPSolver(SolverConfig(model_type="np-nd-np", meta_dim=1,
                                    hidden_dim=8, mem_hidden_dim=4,
                                    agg_hidden_dim=4, mem_agg_hidden_dim=4,
                                    classifier_dim=4))
    key = jax.random.PRNGKey(0)
    params = solver.init_params(key)
    state = solver.get_init_state(key, batch, randomized=False)
    (pred, _), _ = solver.forward(params, key, batch, state, 2,
                                  is_training=False)
    assert np.all(np.isfinite(np.asarray(pred)))


def test_meta_dataset_with_non_meta_config_is_ignored():
    # a meta-carrying dataset must stay usable with configs that declare no
    # meta width (previously crashed inside an aggregator matmul)
    batch = pack_instances(_meta_instances())
    assert batch.graph_feat.shape[1] == 2
    solver = PDPSolver(SolverConfig(model_type="np-nd-np", meta_dim=0,
                                    hidden_dim=8, mem_hidden_dim=4,
                                    agg_hidden_dim=4, mem_agg_hidden_dim=4,
                                    classifier_dim=4))
    key = jax.random.PRNGKey(0)
    params = solver.init_params(key)
    state = solver.get_init_state(key, batch, randomized=False)
    (pred, _), _ = solver.forward(params, key, batch, state, 2,
                                  is_training=False)
    assert np.all(np.isfinite(np.asarray(pred)))


def test_meta_width_mismatch_raises():
    import pytest
    batch = pack_instances(_meta_instances())    # width 2
    solver = PDPSolver(SolverConfig(model_type="np-nd-np", meta_dim=3,
                                    hidden_dim=8, mem_hidden_dim=4,
                                    agg_hidden_dim=4, mem_agg_hidden_dim=4,
                                    classifier_dim=4))
    key = jax.random.PRNGKey(0)
    params = solver.init_params(key)
    state = solver.get_init_state(key, batch, randomized=False)
    with pytest.raises(ValueError, match="meta feature width"):
        solver.forward(params, key, batch, state, 1, is_training=False)
