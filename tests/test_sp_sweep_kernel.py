"""Single-launch SP sweep kernel (ops/pallas_sp.py).

The kernel must be numerically identical to the XLA fallback path of
survey_propagator_apply (same safe_log clamps, f32 everywhere), so the
parity bound is tight. Both uniform widths and the adaptor (log-input)
and REINFORCE (pi > 0) variants are covered.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import cnf_instance, random_ksat
from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.modules.propagate import (
    SPMessages, SurveyPropagatorConfig, survey_propagator_apply,
    survey_propagator_init_state)


@pytest.fixture
def fused_env(monkeypatch):
    monkeypatch.setenv("PDP_FUSED_PASS", "on")


def _mk(rng, n_inst=5, n=24, alpha=3.0, k=3):
    cls = [random_ksat(rng, n, int(n * alpha), k) for _ in range(n_inst)]
    return pack_instances([cnf_instance(n, c) for c in cls])


def _sweep(batch, cfg, state, em, ae, mode):
    os.environ["PDP_SP_SWEEP"] = mode
    try:
        f = jax.jit(lambda s: survey_propagator_apply(
            {}, cfg, batch, s, s, em, ae))
        return f(state)
    finally:
        os.environ.pop("PDP_SP_SWEEP", None)


@pytest.mark.parametrize("k,pi", [(3, 0.0), (4, 0.0), (3, 0.2)])
def test_sp_sweep_kernel_matches_fallback(fused_env, k, pi):
    rng = np.random.default_rng(10 + k)
    batch = _mk(rng, k=k)
    cfg = SurveyPropagatorConfig(pi=pi)
    state = survey_propagator_init_state(
        jax.random.PRNGKey(0), batch.num_edges, randomized=True)
    if pi:
        force = jnp.sign(
            jax.random.normal(jax.random.PRNGKey(5), (batch.num_edges,)))
        state = SPMessages(var=state.var, fn=(state.fn[0], force))
    em = batch.edge_mask
    ae = jnp.ones((batch.num_edges,), jnp.float32)

    # several sweeps so divergence would compound and be caught
    a = state
    b = state
    for _ in range(4):
        a = _sweep(batch, cfg, a, em, ae, "on")
        b = _sweep(batch, cfg, b, em, ae, "off")
    for xa, xb in zip(a.var + a.fn, b.var + b.fn):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-6, atol=1e-6)


def test_sp_sweep_kernel_respects_frozen_edges(fused_env):
    rng = np.random.default_rng(42)
    batch = _mk(rng, k=3)
    cfg = SurveyPropagatorConfig()
    state = survey_propagator_init_state(
        jax.random.PRNGKey(1), batch.num_edges, randomized=True)
    em = batch.edge_mask
    ae = jnp.zeros((batch.num_edges,), jnp.float32)  # everything frozen
    out = _sweep(batch, cfg, state, em, ae, "on")
    for xo, xs in zip(out.var + out.fn, state.var + state.fn):
        np.testing.assert_allclose(np.asarray(xo), np.asarray(xs),
                                   rtol=0, atol=0)
