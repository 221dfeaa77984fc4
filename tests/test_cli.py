"""CLI surface tests: dimacs2json converter and the satyr inference CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pdp_solver_tpu.cli import dimacs2json as d2j
from pdp_solver_tpu.fg.dimacs import write_dimacs
from pdp_solver_tpu.fg.jsonfmt import parse_line
from tests.helpers import random_ksat, check_assignment


def test_convert_directory(tmp_path, rng):
    d = tmp_path / "dimacs"
    d.mkdir()
    write_dimacs(str(d / "a_sat=1.cnf"), 4, [[1, -2], [3, 4]])
    write_dimacs(str(d / "b_sat=0.DIMACS"), 2, [[1], [-1]])
    (d / "ignored.txt").write_text("nope")
    out = tmp_path / "out.json"
    d2j.convert_directory(str(d), str(out), propagate=False)
    rows = [parse_line(l) for l in out.read_text().splitlines() if l.strip()]
    assert len(rows) == 2
    assert rows[0][4] == 1.0 and rows[1][4] == 0.0
    assert rows[0][5] == ["a_sat=1.cnf"]


def test_satyr_cli_end_to_end(tmp_path, rng):
    """Full inference CLI run on DIMACS input, p-d-p solver, CPU."""
    d = tmp_path / "cnfs"
    d.mkdir()
    clause_sets = []
    for i in range(3):
        clauses = random_ksat(rng, 12, 30)
        clause_sets.append(clauses)
        write_dimacs(str(d / f"inst{i}.cnf"), 12, clauses)

    cfg = tmp_path / "model.yaml"
    cfg.write_text('model_type: "p-d-p"\nmodel_name: "sp"\n'
                   "tolerance: 0.02\nt_max: 10\n")
    out = tmp_path / "out.json"

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo

    res = subprocess.run(
        [sys.executable, "-m", "pdp_solver_tpu.cli.satyr", str(cfg),
         str(d), "60", "-c", "-d", "-w", "50", "-s", "0",
         "-o", str(out)],
        capture_output=True, text=True, env=env, timeout=560, cwd=repo)
    assert res.returncode == 0, res.stderr[-2000:]

    lines = [l for l in out.read_text().splitlines() if l.strip()]
    assert len(lines) == 3
    solved_count = 0
    for line in lines:
        row = json.loads(line)
        idx = int(row["ID"].replace("inst", "").split(".")[0])
        if row["solved"] == 1:
            solved_count += 1
            assert check_assignment(clause_sets[idx], row["solution"])
    assert solved_count >= 2  # easy instances
    # temp conversion file cleaned up
    assert not (d / "temp_problem_file.json").exists()


def test_satyr_on_committed_sample_dataset(tmp_path):
    """The repo's datasets/sample_3sat.json quickstart works end to end."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sample = os.path.join(repo, "datasets", "sample_3sat.json")
    if not os.path.exists(sample):
        pytest.skip("sample dataset not present")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo
    out = tmp_path / "out.json"
    res = subprocess.run(
        [sys.executable, "-m", "pdp_solver_tpu.cli.satyr",
         os.path.join(repo, "config", "Predict", "PDP-p-d-p-sp.yaml"),
         sample, "80", "-c", "-w", "100", "-s", "0", "-o", str(out)],
        capture_output=True, text=True, env=env, timeout=560, cwd=repo)
    assert res.returncode == 0, res.stderr[-2000:]
    rows = [json.loads(l) for l in out.read_text().splitlines() if l.strip()]
    assert len(rows) == 20
    solved = sum(r["solved"] for r in rows)
    assert solved >= 16, f"only {solved}/20 of the easy sample solved"
