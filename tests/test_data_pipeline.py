"""Tests for generators, DIMACS/JSON IO and the batch loader."""

import os

import numpy as np
import pytest

from pdp_solver_tpu.fg.dimacs import (
    parse_dimacs, compact, clauses_to_instance, label_from_filename,
    write_dimacs)
from pdp_solver_tpu.fg.generators import (
    UniformCNFGenerator, ModularCNFGenerator, VariableModularCNFGenerator,
    make_generator)
from pdp_solver_tpu.fg.jsonfmt import (
    parse_line, clauses_to_line, read_json_dataset)
from pdp_solver_tpu.fg.loader import BatchLoader, divide_batch
from tests.helpers import cnf_instance


def _valid_instance(inst):
    n, m, gmap, signs, label = inst[:5]
    assert gmap.shape[0] == 2
    assert gmap.shape[1] == signs.shape[0]
    assert gmap[0].max() < n and gmap[0].min() >= 0
    assert gmap[1].max() == m - 1 and gmap[1].min() == 0
    assert set(np.unique(signs)) <= {-1.0, 1.0}
    # no duplicate variable inside one clause
    for c in range(m):
        vs = gmap[0][gmap[1] == c]
        assert len(vs) == len(set(vs.tolist()))


def test_uniform_generator_wellformed():
    g = UniformCNFGenerator(10, 30, 2, 4, 2.0, 4.0, seed=1)
    for _ in range(20):
        _valid_instance(g.generate())


def test_modular_generators_wellformed():
    g = ModularCNFGenerator(3, 20, 50, 0.7, 0.9, 3, 6, 2.0, 3.0, seed=2)
    for _ in range(10):
        _valid_instance(g.generate())
    g2 = VariableModularCNFGenerator(2, 4, 20, 50, 0.7, 0.9, 3, 6, 2.0, 3.0,
                                     seed=3)
    for _ in range(10):
        _valid_instance(g2.generate())


def test_make_generator_from_config():
    cfg = {"generator": "uniform", "min_n": 4, "max_n": 10, "min_k": 2,
           "max_k": 3, "min_alpha": 2, "max_alpha": 4}
    g = make_generator(cfg, seed=0)
    _valid_instance(g.generate())


def test_json_roundtrip(tmp_path):
    clauses = [[1, -2], [2, 3], [-1]]
    line = clauses_to_line(3, clauses, 1.0, ["id0"])
    n, m, gmap, signs, label, misc = parse_line(line)
    assert (n, m) == (3, 3) and label == 1.0 and misc == ["id0"]
    np.testing.assert_array_equal(gmap[0], [0, 1, 1, 2, 0])
    np.testing.assert_array_equal(signs, [1, -1, 1, 1, -1])

    p = tmp_path / "data.json"
    p.write_text(line + "\n" + clauses_to_line(2, [[1, 2]], 0.0) + "\n")
    rows = read_json_dataset(str(p))
    assert len(rows) == 2 and rows[1][0] == 2


def test_dimacs_roundtrip(tmp_path):
    p = tmp_path / "f_sat=1.cnf"
    write_dimacs(str(p), 3, [[1, -2], [2, 3]])
    n, m, clauses = parse_dimacs(str(p))
    assert (n, m) == (3, 2)
    assert clauses == [[1, -2], [2, 3]]
    assert label_from_filename(str(p)) == 1.0


def test_compact_drops_unused_and_subsumed():
    # var 3 unused; clause [1,-2,4] subsumed by [1,-2]
    n, clauses = compact(4, [[1, -2], [1, -2, 4], []], propagate=True)
    assert clauses == [[1, -2]]
    assert n == 2


def test_divide_batch_memory_limit():
    insts = [cnf_instance(4, [[1, 2], [3, 4]]),          # 4 edges
             cnf_instance(10, [[1, 2, 3]] * 6),          # 18 edges
             cnf_instance(3, [[1]])]                     # 1 edge
    # limit forces the 18-edge instance alone: 18*h*2 > limit >= 18*h
    segs = divide_batch(insts, limit=20 * 3, hidden_dim=3)
    sizes = sorted(len(s) for s in segs)
    assert sizes == [1, 2]


def test_loader_dataset_mode(tmp_path):
    lines = [clauses_to_line(3, [[1, -2], [2, 3]], -1.0, [f"i{i}"])
             for i in range(7)]
    p = tmp_path / "ds.json"
    p.write_text("\n".join(lines) + "\n")
    loader = BatchLoader(input_file=str(p), batch_size=3, limit=10 ** 6,
                         hidden_dim=3)
    batches = list(loader)
    assert len(batches) == 3  # 3+3+1
    total = sum(int(np.asarray(b.instance_mask).sum()) for b, _ in batches)
    assert total == 7
    assert batches[0][1][0] == ["i0"]


def test_loader_generator_fixed_shape():
    g = UniformCNFGenerator(5, 10, 2, 3, 2.0, 3.0, seed=0)
    loader = BatchLoader(generator=g, epoch_size=12, batch_size=4,
                         limit=10 ** 6, hidden_dim=8, fixed_shape=True)
    shapes = set()
    total = 0
    for batch, _ in loader:
        shapes.add((batch.num_vars, batch.num_clauses, batch.num_edges,
                    batch.batch_size))
        total += int(np.asarray(batch.instance_mask).sum())
    assert len(shapes) == 1  # steady state: one compiled program
    assert total == 12


def test_loader_generator_fixed_dims_dense():
    """Explicit fixed_dims pack many instances per segment (the default
    worst-case dims leave segments ~80% padding for wide generators)."""
    g = UniformCNFGenerator(5, 10, 2, 3, 2.0, 3.0, seed=0)
    loader = BatchLoader(generator=g, epoch_size=64, batch_size=64,
                         limit=10 ** 9, hidden_dim=8, fixed_shape=True,
                         fixed_dims=(128, 512, 1024, 16))
    shapes, total, seg_fill = set(), 0, []
    for batch, _ in loader:
        shapes.add((batch.num_vars, batch.num_clauses, batch.num_edges,
                    batch.batch_size))
        real = int(np.asarray(batch.instance_mask).sum())
        total += real
        seg_fill.append(real)
    assert shapes == {(128, 512, 1024, 16)}
    assert total == 64
    assert max(seg_fill) >= 8  # dense: many instances per segment

    # an instance bigger than the pad dims must fail loudly
    import pytest
    big = BatchLoader(generator=g, epoch_size=2, batch_size=2,
                      limit=10 ** 9, hidden_dim=8, fixed_shape=True,
                      fixed_dims=(4, 4, 4, 2))
    with pytest.raises(ValueError):
        list(big)


def test_mixture_generator():
    from pdp_solver_tpu.fg.generators import MixtureCNFGenerator
    a = UniformCNFGenerator(5, 10, 2, 3, 2.0, 3.0, seed=0)
    b = UniformCNFGenerator(20, 30, 4, 4, 8.0, 9.0, seed=0)
    mix = MixtureCNFGenerator([a, b], weights=[0.5, 0.5], seed=1)
    assert mix.max_dims() == tuple(
        max(x, y) for x, y in zip(a.max_dims(), b.max_dims()))
    ns = [mix.generate()[0] for _ in range(40)]
    assert any(n <= 10 for n in ns) and any(n >= 20 for n in ns)


def test_lazy_dataset_mode(tmp_path, monkeypatch):
    import pdp_solver_tpu.fg.loader as L
    lines = [clauses_to_line(3, [[1, -2], [2, 3]], -1.0, [f"i{i}"])
             for i in range(9)]
    p = tmp_path / "big.json"
    p.write_text("\n".join(lines) + "\n")
    # force the lazy path regardless of file size
    monkeypatch.setattr(L, "LAZY_FILE_BYTES", 1)
    loader = L.BatchLoader(input_file=str(p), batch_size=4, limit=10 ** 6,
                           hidden_dim=3, max_cache_size=3)
    total, ids = 0, []
    for batch, misc in loader:
        total += int(np.asarray(batch.instance_mask).sum())
        ids.extend(m[0] for m in misc)
    assert total == 9
    assert ids == [f"i{i}" for i in range(9)]
    # LRU stayed bounded
    assert len(loader._instances._cache) <= 3


def test_compact_dedupes_repeated_literals():
    # "1 1 2" -> [1, 2]; tautology "1 -1" is always true and is dropped
    # (the reference's last-polarity-wins overwrite corrupts the formula)
    n, clauses = compact(2, [[1, 1, 2], [1, -1]])
    assert sorted(map(sorted, clauses)) == [[1, 2]]


def test_fallback_parser_zero_terminators(tmp_path, monkeypatch):
    # clauses share and span lines; the pure-python fallback must agree
    # with the native parser and the DIMACS spec
    import pdp_solver_tpu.fg.native as native
    p = tmp_path / "multi.cnf"
    p.write_text("p cnf 3 3\n1 0 2 0\n-1\n3 0\n")
    monkeypatch.setattr(native, "parse_dimacs_fast", lambda path: None)
    n, m, clauses = parse_dimacs(str(p))
    assert clauses == [[1], [2], [-1, 3]]


def test_label_instances_verified_sat():
    """Solver-backed labeling: verified-SAT instances get label 1, an UNSAT
    instance stays -1 (one-sided labels, unlike the reference's stub that
    returns False for everything, generator.py:15-17)."""
    from pdp_solver_tpu.fg.generators import label_instances
    rng = np.random.default_rng(5)
    from tests.helpers import cnf_instance, random_ksat
    insts = [cnf_instance(20, random_ksat(rng, 20, 50, 3))
             for _ in range(4)]
    gm = np.array([[0, 0], [0, 1]], np.int64)
    insts.append((1, 2, gm, np.array([1.0, -1.0], np.float32), -1.0))
    labeled = label_instances(insts, iterations=150, ls_iterations=300,
                              attempts=1)
    labels = [inst[4] for inst in labeled]
    assert labels[-1] == -1.0
    assert sum(1 for l in labels[:-1] if l == 1.0) >= 3


def test_generate_cli_label_and_sat_only(tmp_path):
    """--label + -s writes only verified-SAT instances, DIMACS filenames
    round-trip the label digit."""
    from pdp_solver_tpu.cli.generate import main as gen_main
    out_d = tmp_path / "dimacs"
    out_j = tmp_path / "json"
    gen_main([str(out_d), str(out_j), "tiny", "3", "uniform",
              "--min_n", "10", "--max_n", "14", "--min_k", "3",
              "--max_k", "3", "--min_a", "2.0", "--max_a", "2.4",
              "--res", "1", "-s", "--label_iters", "100",
              "--seed", "3"])
    json_files = list(out_j.glob("*.json"))
    assert len(json_files) == 1
    lines = [l for l in json_files[0].read_text().splitlines() if l.strip()]
    assert len(lines) == 3
    import json as _json
    for line in lines:
        row = _json.loads(line)
        assert row[3] == 1  # label slot: verified SAT only
    band_dirs = list(out_d.iterdir())
    assert all("sat=1" in f.name for d in band_dirs for f in d.iterdir())
