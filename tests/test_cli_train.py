"""End-to-end coverage for the generate and satyr-train-test CLIs."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pdp_solver_tpu.cli import generate as gen_cli
from pdp_solver_tpu.fg.jsonfmt import read_json_dataset, clauses_to_line
from tests.helpers import random_ksat


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    return env


def test_generate_cli(tmp_path):
    out_d = tmp_path / "dimacs"
    out_j = tmp_path / "json"
    gen_cli.main([str(out_d), str(out_j), "toy", "3", "uniform",
                  "--min_n", "5", "--max_n", "8", "--min_k", "2",
                  "--max_k", "3", "--min_a", "2", "--max_a", "3",
                  "--res", "2", "--seed", "0"])
    bands = sorted(os.listdir(out_j))
    assert len(bands) == 2
    rows = read_json_dataset(str(out_j / bands[0]))
    assert len(rows) == 3
    # DIMACS twins exist
    dimacs_bands = sorted(os.listdir(out_d))
    assert len(dimacs_bands) == 2
    assert len(os.listdir(out_d / dimacs_bands[0])) == 3


def test_satyr_train_test_cli(tmp_path, rng):
    """One tiny generator-backed training epoch + test phase, through the
    real CLI process."""
    val = tmp_path / "val.json"
    lines = [clauses_to_line(8, random_ksat(rng, 8, 18), -1.0)
             for _ in range(4)]
    val.write_text("\n".join(lines) + "\n")
    test = tmp_path / "test.json"
    test.write_text("\n".join(lines[:2]) + "\n")

    cfg = {
        "model_name": "tiny", "model_type": "np-nd-np", "version": "t",
        "has_meta_data": False,
        "train_path": [str(val)], "validation_path": [str(val)],
        "test_path": [str(test)],
        "model_path": str(tmp_path / "models"),
        "repetition_num": 1, "train_epoch_size": 4, "epoch_num": 1,
        "label_dim": 1, "edge_feature_dim": 1, "meta_feature_dim": 0,
        "error_dim": 3, "metric_index": 0, "prediction_dim": 1,
        "hidden_dim": 8, "mem_hidden_dim": 8, "agg_hidden_dim": 8,
        "mem_agg_hidden_dim": 8, "classifier_dim": 8,
        "batch_size": 4, "learning_rate": 0.001, "exploration": 0.1,
        "verbose": True, "randomized": True,
        "train_inner_recurrence_num": 1, "train_outer_recurrence_num": 2,
        "test_recurrence_num": 5, "max_cache_size": 100000,
        "dropout": 0.1, "clip_norm": 0.65, "weight_decay": 1e-10,
        "loss_sharpness": 5, "train_batch_limit": 1000000,
        "test_batch_limit": 1000000,
        "generator": "uniform", "min_n": 5, "max_n": 10, "min_alpha": 2,
        "max_alpha": 3, "min_k": 2, "max_k": 3,
        "local_search_iteration": 5, "epsilon": 0.5, "lambda": 1,
    }
    import yaml
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))

    repo = _env()["PYTHONPATH"]
    res = subprocess.run(
        [sys.executable, "-m", "pdp_solver_tpu.cli.satyr_train_test",
         str(cfg_file), "-c", "-g"],
        capture_output=True, text=True, env=_env(), timeout=560, cwd=repo)
    assert res.returncode == 0, res.stderr[-3000:]

    # best/last checkpoints written with the reference directory contract
    best = tmp_path / "models" / "tiny" / "t" / "best"
    last = tmp_path / "models" / "tiny" / "t" / "last"
    assert (best / "tiny.npz").exists()
    assert (last / "tiny.npz").exists()
    assert (best / "losses.npy").exists()
    assert "Accuracy" in res.stdout
