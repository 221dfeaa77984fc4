"""Restart continuity: checkpoints carry the optimizer state, so a
kill-and-resume run is bit-identical to the unbroken one.

The reference only persists the model state_dict (src/pdp/nn/solver.py:
318-322), silently resetting Adam moments at every resume; the supervisor
(tools/train_supervisor.py) restarts long runs dozens of times, so here the
full TrainState (params + optax state + global_step) round-trips.
"""

import jax
import numpy as np

from pdp_solver_tpu.fg.generators import UniformCNFGenerator
from pdp_solver_tpu.fg.loader import BatchLoader
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.train import checkpoint as ckpt

CFG = dict(
    model_type="np-nd-np", model_name="cc", hidden_dim=10, mem_hidden_dim=8,
    agg_hidden_dim=8, mem_agg_hidden_dim=8, classifier_dim=8,
    prediction_dim=1, dropout=0.0, train_outer_recurrence_num=2,
    train_inner_recurrence_num=1, learning_rate=1e-3, weight_decay=1e-10,
    clip_norm=0.65, exploration=0.1, loss_sharpness=5, randomized=True,
    batch_size=4, train_batch_limit=10 ** 6, test_batch_limit=10 ** 6,
    test_recurrence_num=10, local_search_iteration=0, epsilon=0.5,
    **{"lambda": 1.0})


def _batches(count=6):
    g = UniformCNFGenerator(5, 10, 2, 3, 2.0, 3.5, seed=3)
    loader = BatchLoader(generator=g, epoch_size=4 * count, batch_size=4,
                         limit=10 ** 6, hidden_dim=10, fixed_shape=True)
    out = []
    while len(out) < count:
        for batch, _ in loader:
            out.append(batch)
            if len(out) >= count:
                break
    return out


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_resume_is_bit_continuous(tmp_path):
    batches = _batches()

    def run(break_at=None):
        tr = SatTrainer(CFG, seed=0)
        tr._make_optimizer()
        ts = tr.init_train_state()
        step = tr._train_step_seeded_fn(base_seed=0)
        for i, b in enumerate(batches):
            if break_at is not None and i == break_at:
                tr._save_train_state(ts, str(tmp_path))
                # simulate a kill + fresh process: new trainer, restore
                tr = SatTrainer(CFG, seed=0)
                tr._make_optimizer()
                ts = tr.init_train_state()
                ts = tr._load_train_state(ts, str(tmp_path))
                step = tr._train_step_seeded_fn(base_seed=0)
            ts, _ = step(ts, np.int32(i), b)
        return ts

    ts_unbroken = run(break_at=None)
    ts_resumed = run(break_at=3)

    for a, b in zip(_leaves(ts_unbroken.params), _leaves(ts_resumed.params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(_leaves(ts_unbroken.opt_state),
                    _leaves(ts_resumed.opt_state)):
        np.testing.assert_array_equal(a, b)


def test_old_checkpoint_without_opt_state_loads(tmp_path):
    """Pre-round-5 checkpoints (params + global_step only) still load; the
    optimizer state stays freshly initialised."""
    tr = SatTrainer(CFG, seed=0)
    tr._make_optimizer()
    ts = tr.init_train_state()
    # write an old-layout checkpoint
    ckpt.save_params(str(tmp_path), {
        "params": ts.params, "global_step": ts.global_step}, "cc")
    ts2 = tr._load_train_state(ts, str(tmp_path))
    for a, b in zip(_leaves(ts.params), _leaves(ts2.params)):
        np.testing.assert_array_equal(a, b)
