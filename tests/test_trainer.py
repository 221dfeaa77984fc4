"""Trainer: training step, metrics, prediction formatting, checkpointing."""

import json
import os

import jax
import numpy as np
import pytest

from pdp_solver_tpu.fg.generators import UniformCNFGenerator
from pdp_solver_tpu.fg.loader import BatchLoader
from pdp_solver_tpu.fg.jsonfmt import clauses_to_line
from pdp_solver_tpu.train.trainer import SatTrainer
from pdp_solver_tpu.train import checkpoint as ckpt
from tests.helpers import random_ksat


TRAIN_CFG = dict(
    model_type="np-nd-np", model_name="t", hidden_dim=12, mem_hidden_dim=8,
    agg_hidden_dim=8, mem_agg_hidden_dim=8, classifier_dim=8,
    prediction_dim=1, dropout=0.1, train_outer_recurrence_num=2,
    train_inner_recurrence_num=1, learning_rate=1e-3, weight_decay=1e-10,
    clip_norm=0.65, exploration=0.1, loss_sharpness=5, randomized=True,
    batch_size=6, train_batch_limit=10 ** 6, test_batch_limit=10 ** 6,
    test_recurrence_num=20, local_search_iteration=10, epsilon=0.5,
    **{"lambda": 1.0})


def _dataset_file(tmp_path, rng, count=5, n=10, m=25):
    lines = [clauses_to_line(n, random_ksat(rng, n, m), -1.0, [f"id{i}"])
             for i in range(count)]
    p = tmp_path / "ds.json"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_train_step_reduces_loss(rng):
    tr = SatTrainer(TRAIN_CFG, seed=0)
    ts = tr.init_train_state()
    step = tr._train_step_fn()
    g = UniformCNFGenerator(5, 12, 2, 4, 2.0, 4.0, seed=0)
    loader = BatchLoader(generator=g, epoch_size=12, batch_size=6,
                         limit=10 ** 6, hidden_dim=12, fixed_shape=True)
    losses = []
    for epoch in range(3):
        for batch, _ in loader:
            ts, loss = step(ts, jax.random.PRNGKey(epoch), batch)
            losses.append(float(loss))
        ts = ts._replace(global_step=ts.global_step + 1)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_predict_json_format(tmp_path, rng):
    path = _dataset_file(tmp_path, rng)
    cfg = dict(TRAIN_CFG, model_type="p-d-p", hidden_dim=3, tolerance=0.02,
               t_max=10, test_recurrence_num=50)
    tr = SatTrainer(cfg, seed=0)
    out = tmp_path / "out.json"
    with open(out, "w") as f:
        tr.predict(path, f)
    lines = [l for l in out.read_text().splitlines() if l.strip()]
    assert len(lines) == 5
    for i, line in enumerate(lines):
        row = json.loads(line)
        assert set(row) == {"ID", "label", "solved", "unsat_clauses",
                            "solution"}
        assert row["ID"] == f"id{i}"
        assert len(row["solution"]) == 10
        # self-verification invariant: solved == (unsat_clauses == 0)
        assert (row["solved"] == 1) == (row["unsat_clauses"] == 0)


def test_test_metrics_shape(tmp_path, rng):
    path = _dataset_file(tmp_path, rng, count=4)
    cfg = dict(TRAIN_CFG, model_type="walk-sat", hidden_dim=3,
               test_recurrence_num=0, local_search_iteration=100)
    tr = SatTrainer(cfg, seed=0)
    res = tr.test(path)
    assert len(res) == 1
    fname, err, duration = res[0]
    assert err.shape == (3, 1)
    # labels are -1 (unlabeled), so the L1 "accuracy" error lands in [1, 2]
    # exactly as in the reference's unlabeled runs
    assert 0.0 <= err[0, 0] <= 2.0


def test_checkpoint_roundtrip(tmp_path):
    tr = SatTrainer(TRAIN_CFG, seed=0)
    ts = tr.init_train_state()
    ts = ts._replace(global_step=ts.global_step + 7)
    tr._save_train_state(ts, str(tmp_path))
    ts2 = tr.init_train_state()
    ts2 = tr._load_train_state(ts2, str(tmp_path))
    assert float(ts2.global_step) == 7.0
    l1 = jax.tree_util.tree_leaves(ts.params)
    l2 = jax.tree_util.tree_leaves(ts2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    tr = SatTrainer(TRAIN_CFG, seed=0)
    ckpt.save_params(str(tmp_path), {"w": np.zeros((2, 2))}, "t")
    with pytest.raises((ValueError, KeyError)):
        ckpt.load_params(str(tmp_path), {"w": np.zeros((3, 3))}, "t")
