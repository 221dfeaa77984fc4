"""Scale sanity: industrial-sized formulas through packing and solving."""

import time

import jax
import numpy as np

from pdp_solver_tpu.fg.batch import pack_instances
from pdp_solver_tpu.fg.loader import BatchLoader
from pdp_solver_tpu.fg.jsonfmt import clauses_to_line
from pdp_solver_tpu.solvers import SolverConfig, PDPSolver
from pdp_solver_tpu.train.loss import cnf_evaluate


def _big_ksat(rng, n, m, k=3):
    """Vectorised random k-SAT builder (the test helper is too slow here)."""
    ev = rng.integers(0, n, size=(m, k), dtype=np.int32)
    # ensure distinct vars per clause by re-rolling collisions once
    for _ in range(4):
        dup = (np.sort(ev, axis=1)[:, 1:] == np.sort(ev, axis=1)[:, :-1])
        rows = np.unique(np.nonzero(dup)[0])
        if not len(rows):
            break
        ev[rows] = rng.integers(0, n, size=(len(rows), k), dtype=np.int32)
    signs = (2.0 * rng.integers(0, 2, size=(m, k)) - 1).astype(np.float32)
    gmap = np.stack([ev.reshape(-1),
                     np.repeat(np.arange(m, dtype=np.int32), k)])
    return (n, m, gmap, signs.reshape(-1), -1.0)


def test_single_giant_instance_packs_and_solves(rng):
    # one instance with ~600k edges - far beyond anything the reference's
    # collate path was exercised with
    n, m = 50_000, 200_000
    inst = _big_ksat(rng, n, m)
    t0 = time.time()
    batch = pack_instances([inst])
    pack_s = time.time() - t0
    assert batch.num_edges >= 600_000
    assert pack_s < 60, f"packing too slow: {pack_s:.1f}s"

    solver = PDPSolver(SolverConfig(model_type="p-d-p", tolerance=0.02,
                                    t_max=10, local_search_iterations=5,
                                    epsilon=0.5))
    key = jax.random.PRNGKey(0)
    state = solver.get_init_state(key, batch, True)
    (pred, _), _ = jax.jit(lambda r, b, s: solver.forward(
        {}, r, b, s, 3, is_training=False, check_termination=True))(
        key, batch, state)
    assert np.isfinite(np.asarray(pred)).all()
    solved, unsat = cnf_evaluate(batch, pred)
    assert np.isfinite(float(unsat[0]))


def test_loader_streams_many_instances(tmp_path, rng):
    # thousands of instances through the bucketed loader without blowup
    lines = []
    for i in range(2000):
        n = int(rng.integers(5, 30))
        inst = _big_ksat(rng, n, 3 * n)
        gmap, signs = inst[2], inst[3]
        clauses = [[] for _ in range(inst[1])]
        for v, c, s in zip(gmap[0], gmap[1], signs):
            clauses[c].append(int((v + 1) * s))
        lines.append(clauses_to_line(n, clauses, -1.0))
    p = tmp_path / "many.json"
    p.write_text("\n".join(lines) + "\n")

    loader = BatchLoader(input_file=str(p), batch_size=500, limit=10 ** 7,
                         hidden_dim=3)
    shapes = set()
    total = 0
    for batch, _ in loader:
        shapes.add((batch.num_vars, batch.num_edges))
        total += int(np.asarray(batch.instance_mask).sum())
    assert total == 2000
    # bucketing keeps the number of distinct compiled shapes tiny
    assert len(shapes) <= 6, shapes
