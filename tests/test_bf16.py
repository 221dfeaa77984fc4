"""Mixed-precision (bfloat16) neural compute."""

import jax
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from tests.helpers import cnf_instance, random_ksat


def _forward(solver, batch, key):
    params = solver.init_params(jax.random.PRNGKey(0))
    state = solver.get_init_state(jax.random.PRNGKey(1), batch, True)
    (pred, _), _ = jax.jit(lambda p, r, b, s: solver.forward(
        p, r, b, s, 5, is_training=False, check_termination=True))(
        params, key, batch, state)
    return np.asarray(pred)


def test_bf16_forward_close_to_f32(rng):
    insts = [cnf_instance(10, random_ksat(rng, 10, 25)) for _ in range(3)]
    batch = pack_instances(insts)
    kw = dict(hidden_dim=16, mem_hidden_dim=8, agg_hidden_dim=8,
              mem_agg_hidden_dim=8, classifier_dim=8)
    key = jax.random.PRNGKey(2)
    a = _forward(PDPSolver(SolverConfig(model_type="np-nd-np", **kw)),
                 batch, key)
    b = _forward(PDPSolver(SolverConfig(model_type="np-nd-np",
                                        compute_dtype="bfloat16", **kw)),
                 batch, key)
    assert a.dtype == b.dtype == np.float32
    assert np.isfinite(b).all()
    # bf16 has ~3 decimal digits; predictions are post-sigmoid in [0,1]
    np.testing.assert_allclose(a, b, atol=0.05)


def test_bf16_training_step(rng):
    from pdp_solver_tpu.train.trainer import SatTrainer
    cfg = dict(model_type="np-nd-np", model_name="b", hidden_dim=16,
               mem_hidden_dim=8, agg_hidden_dim=8, mem_agg_hidden_dim=8,
               classifier_dim=8, prediction_dim=1, dropout=0.0,
               compute_dtype="bfloat16", train_outer_recurrence_num=2,
               train_inner_recurrence_num=1, learning_rate=1e-3,
               weight_decay=0.0, clip_norm=0.65, exploration=0.1,
               loss_sharpness=5, randomized=True, **{"lambda": 1.0})
    tr = SatTrainer(cfg, seed=0)
    ts = tr.init_train_state()
    step = tr._train_step_fn()
    insts = [cnf_instance(8, random_ksat(rng, 8, 20)) for _ in range(4)]
    batch = pack_instances(insts)
    ts, loss = step(ts, jax.random.PRNGKey(0), batch)
    assert np.isfinite(float(loss))
    # params stay f32 masters
    for leaf in jax.tree_util.tree_leaves(ts.params):
        assert leaf.dtype == np.float32
