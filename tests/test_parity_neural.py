"""Neural building-block parity: transplant weights into torch modules and
compare outputs. Independent of the reference checkout (uses plain torch)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pdp_solver_tpu.modules import mlp


def test_gru_cell_matches_torch(rng):
    in_dim, hid, n = 7, 5, 11
    p = mlp.gru_cell_init(jax.random.PRNGKey(0), in_dim, hid)

    cell = torch.nn.GRUCell(in_dim, hid, bias=True)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(np.asarray(p["w_ih"]).T))
        cell.weight_hh.copy_(torch.from_numpy(np.asarray(p["w_hh"]).T))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(p["b_ih"])))
        cell.bias_hh.copy_(torch.from_numpy(np.asarray(p["b_hh"])))

    x = rng.normal(size=(n, in_dim)).astype(np.float32)
    h = rng.normal(size=(n, hid)).astype(np.float32)
    with torch.no_grad():
        expect = cell(torch.from_numpy(x), torch.from_numpy(h)).numpy()
    got = np.asarray(mlp.gru_cell_apply(p, jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_perceptron_matches_torch(rng):
    p = mlp.perceptron_init(jax.random.PRNGKey(1), 6, 4, 1)
    l1 = torch.nn.Linear(6, 4)
    l2 = torch.nn.Linear(4, 1, bias=False)
    with torch.no_grad():
        l1.weight.copy_(torch.from_numpy(np.asarray(p["l1"]["w"]).T))
        l1.bias.copy_(torch.from_numpy(np.asarray(p["l1"]["b"])))
        l2.weight.copy_(torch.from_numpy(np.asarray(p["l2"]["w"]).T))
    x = rng.normal(size=(9, 6)).astype(np.float32)
    with torch.no_grad():
        expect = torch.sigmoid(
            l2(torch.relu(l1(torch.from_numpy(x))))).numpy()
    got = np.asarray(mlp.perceptron_apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_init_ranges_match_torch_defaults():
    # torch Linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    p = mlp.linear_init(jax.random.PRNGKey(2), 100, 50)
    bound = 1.0 / np.sqrt(100)
    w = np.asarray(p["w"])
    assert w.min() >= -bound and w.max() <= bound
    assert w.std() == pytest.approx(bound / np.sqrt(3), rel=0.1)
    # GRUCell init: U(-1/sqrt(hidden), 1/sqrt(hidden))
    g = mlp.gru_cell_init(jax.random.PRNGKey(3), 10, 64)
    gb = 1.0 / np.sqrt(64)
    assert np.asarray(g["w_ih"]).min() >= -gb
    assert np.asarray(g["w_hh"]).max() <= gb


def test_multilayer_perceptron_api(rng):
    """MultiLayerPerceptron parity surface (reference util.py:83-107):
    relu inner layers, bias-free sigmoid output layer."""
    import jax
    p = mlp.mlp_init(jax.random.PRNGKey(4), [6, 5, 4, 2])
    x = jnp.asarray(rng.normal(size=(7, 6)).astype(np.float32))
    out = np.asarray(mlp.mlp_apply(p, x))
    assert out.shape == (7, 2)
    assert ((out > 0) & (out < 1)).all()
    assert len(p["inner"]) == 2 and "b" not in p["out"]


def test_survey_scorer_adaptor_params(rng):
    """SurveyScorer's learned-adaptor variant (reference pdp_predict.py:
    145-147) initialises and projects message states."""
    import jax
    from pdp_solver_tpu.modules.predict import (
        SurveyScorerConfig, survey_scorer_init, survey_scorer_apply)
    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.problem import init_problem_state
    from tests.helpers import cnf_instance, random_ksat

    cfg = SurveyScorerConfig(message_dim=8, include_adaptors=True)
    params = survey_scorer_init(jax.random.PRNGKey(0), cfg)
    assert params["proj"]["w"].shape == (8, 2)

    insts = [cnf_instance(6, random_ksat(rng, 6, 12))]
    batch = pack_instances(insts, bucket=False)
    E = batch.num_edges
    msg = (jnp.asarray(rng.normal(size=(E, 8)).astype(np.float32)),
           jnp.asarray(rng.normal(size=(E, 8)).astype(np.float32)))
    score, _ = survey_scorer_apply(params, cfg, batch, msg,
                                   init_problem_state(batch))
    assert score.shape == (batch.num_vars, 1)
    assert np.isfinite(np.asarray(score)).all()
