"""Automatic multi-device execution in the user-facing trainer surfaces.

The reference wraps every model in nn.DataParallel automatically
(src/pdp/factorgraph/base.py:93-97); here SatTrainer.train/test/predict
shard the instance stream over the visible devices (the 8-device CPU mesh
in tests, conftest.py). Checks: all devices are actually used (the
trainer's telemetry counters) and predictions are identical to the
single-device path (per-batch PRNG draws and init states match, so the
sharded solve computes the same thing).
"""

import json

import jax
import numpy as np

from pdp_solver_tpu.fg.generators import UniformCNFGenerator
from pdp_solver_tpu.fg.jsonfmt import clauses_to_line
from pdp_solver_tpu.train.trainer import SatTrainer
from tests.helpers import random_ksat

BASE_CFG = dict(
    model_type="np-nd-np", model_name="dp", hidden_dim=10, mem_hidden_dim=8,
    agg_hidden_dim=8, mem_agg_hidden_dim=8, classifier_dim=8,
    prediction_dim=1, dropout=0.0, train_outer_recurrence_num=2,
    train_inner_recurrence_num=1, learning_rate=1e-3, weight_decay=1e-10,
    clip_norm=0.65, exploration=0.1, loss_sharpness=5, randomized=True,
    batch_size=8, train_batch_limit=10 ** 6, test_batch_limit=10 ** 6,
    test_recurrence_num=15, local_search_iteration=0, epsilon=0.5,
    **{"lambda": 1.0})


def _dataset_file(tmp_path, rng, count=8, n=12, m=30):
    lines = [clauses_to_line(n, random_ksat(rng, n, m), -1.0, [f"id{i}"])
             for i in range(count)]
    p = tmp_path / "ds.json"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_train_uses_all_devices(tmp_path):
    assert jax.device_count() == 8, "conftest must provide the 8-CPU mesh"
    gen = UniformCNFGenerator(6, 12, 3, 3, 2.0, 3.5, seed=1)
    # cap segments at ~2 instances so each 16-instance macro batch splits
    # into 8 segments = one full device group
    cfg = dict(BASE_CFG, epoch_num=1, repetition_num=1, batch_size=16,
               train_batch_limit=2 * 130 * BASE_CFG["hidden_dim"])
    tr = SatTrainer(cfg, seed=0)
    # validation set on disk
    rng = np.random.default_rng(0)
    val = _dataset_file(tmp_path, rng, count=4)
    ts, errors, losses = tr.train(
        [None], [val], generator=gen, train_epoch_size=32)
    assert tr._parallel_steps > 0, "data-parallel train step never ran"
    assert np.isfinite(losses).all()
    assert np.isfinite(errors).all()


def test_predict_parallel_matches_serial(tmp_path):
    rng = np.random.default_rng(1)
    # 8 same-shape instances with batch_size=2 -> 4 same-bucket batches
    path = _dataset_file(tmp_path, rng, count=8, n=12, m=30)
    cfg = dict(BASE_CFG, model_type="p-d-p", hidden_dim=3, tolerance=0.05,
               t_max=5, test_recurrence_num=15, batch_size=2,
               local_search_iteration=10)

    def run(n_dev, fname):
        tr = SatTrainer(dict(cfg, data_parallel=n_dev), seed=0)
        out = tmp_path / fname
        with open(out, "w") as f:
            tr.predict(path, f)
        return tr, out.read_text()

    tr_par, text_par = run(8, "par.json")
    tr_ser, text_ser = run(1, "ser.json")
    assert tr_par._parallel_groups > 0, "sharded solve never ran"
    assert tr_ser._parallel_groups == 0
    # identical predictions, byte for byte (same per-batch rng draws)
    assert text_par == text_ser
    rows = [json.loads(l) for l in text_par.splitlines() if l.strip()]
    assert len(rows) == 8
    assert [r["ID"] for r in rows] == [f"id{i}" for i in range(8)]


def test_test_metrics_parallel_matches_serial(tmp_path):
    rng = np.random.default_rng(2)
    path = _dataset_file(tmp_path, rng, count=8, n=10, m=24)
    cfg = dict(BASE_CFG, model_type="walk-sat", hidden_dim=3,
               test_recurrence_num=0, local_search_iteration=40,
               batch_size=2)
    res_par = SatTrainer(dict(cfg, data_parallel=8), seed=0).test(path)
    res_ser = SatTrainer(dict(cfg, data_parallel=1), seed=0).test(path)
    np.testing.assert_allclose(res_par[0][1], res_ser[0][1],
                               rtol=1e-6, atol=1e-6)
