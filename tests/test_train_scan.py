"""Scanned BPTT (train_scan): lax.scan over the T outer steps compiles the
step body once instead of unrolling it T times — the np-d-np train-step
compile unblock (docs/ROUND4.md section 5). The scanned loss must equal the
unrolled loss exactly (same rng stream, same discounting)."""

import jax
import numpy as np

from pdp_solver_tpu.fg.generators import UniformCNFGenerator
from pdp_solver_tpu.fg.loader import BatchLoader
from pdp_solver_tpu.train.trainer import SatTrainer

CFG = dict(
    model_type="np-nd-np", model_name="sc", hidden_dim=10, mem_hidden_dim=8,
    agg_hidden_dim=8, mem_agg_hidden_dim=8, classifier_dim=8,
    prediction_dim=1, dropout=0.0, train_outer_recurrence_num=4,
    train_inner_recurrence_num=1, learning_rate=1e-3, weight_decay=1e-10,
    clip_norm=0.65, exploration=0.1, loss_sharpness=5, randomized=True,
    batch_size=4, train_batch_limit=10 ** 6, test_batch_limit=10 ** 6,
    test_recurrence_num=10, local_search_iteration=0, epsilon=0.5,
    **{"lambda": 0.8})


def _batch():
    g = UniformCNFGenerator(6, 10, 3, 3, 2.5, 3.5, seed=4)
    loader = BatchLoader(generator=g, epoch_size=4, batch_size=4,
                         limit=10 ** 6, hidden_dim=10, fixed_shape=True)
    for batch, _ in loader:
        return batch


def test_scan_loss_equals_unrolled():
    batch = _batch()
    rng = jax.random.PRNGKey(3)
    gs = np.float32(2.0)
    losses = {}
    for scan in (False, True):
        tr = SatTrainer(dict(CFG, train_scan=scan), seed=0)
        loss_fn = tr._loss_fn()
        losses[scan] = float(loss_fn(tr.params, rng, batch, gs))
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-6, atol=1e-7)


def test_np_d_np_scan_train_step_runs():
    """The np-d-np assembly (sequential decimator inside BPTT) trains
    under the scanned loss — grads flow, loss finite."""
    cfg = dict(CFG, model_type="np-d-np", tolerance=0.05, t_max=3,
               train_scan=True, train_outer_recurrence_num=3)
    tr = SatTrainer(cfg, seed=0)
    tr._make_optimizer()
    ts = tr.init_train_state()
    step = tr._train_step_seeded_fn(base_seed=0)
    batch = _batch()
    for i in range(2):
        ts, loss = step(ts, np.int32(i), batch)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(ts.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_np_d_np_training_gradient_is_nonzero():
    """The reference's np-d-np training objective is degenerate (identity
    predictor -> piecewise-constant loss, zero gradient); the scorer-as-
    prediction training path must produce real gradients for BOTH the
    scorer and the propagator."""
    cfg = dict(CFG, model_type="np-d-np", tolerance=0.05, t_max=3,
               train_scan=True, train_outer_recurrence_num=3,
               weight_decay=0.0)
    tr = SatTrainer(cfg, seed=0)
    loss_fn = tr._loss_fn()
    batch = _batch()
    grads = jax.grad(loss_fn)(tr.params, jax.random.PRNGKey(0), batch,
                              np.float32(1.0))
    import jax.numpy as jnp
    for part in ("scorer", "prop"):
        n = float(sum(jnp.sum(x ** 2)
                      for x in jax.tree_util.tree_leaves(grads[part])))
        assert n > 1e-12, f"{part} gradient is zero"
