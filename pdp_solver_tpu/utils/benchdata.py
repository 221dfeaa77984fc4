"""Deterministic benchmark datasets shared by bench.py and the reference
measurement harness (tools/measure_reference.py).

The headline set follows BASELINE.json: uniform random 4-SAT, n=100,
alpha=9.0 (inside the reference's 4-SAT band alpha in [7,10],
config/Train/p-prodec2-gcnf-4SAT-pytorch.yaml, and above the 4-SAT
clustering transition ~8.8 so surveys are non-trivial and SP-guided
decimation actually does work), fixed seed so both implementations solve
byte-identical formulas.
"""

import hashlib

import numpy as np


def make_ksat_set(seed=0, count=128, n=100, alpha=9.0, k=4):
    """List of (n, m, graph_map[2,E], edge_sign[E], label) instances."""
    rng = np.random.default_rng(seed)
    m = int(n * alpha)
    insts = []
    for _ in range(count):
        ev = np.empty(m * k, dtype=np.int32)
        ec = np.empty(m * k, dtype=np.int32)
        for ci in range(m):
            ev[ci * k:(ci + 1) * k] = rng.choice(n, k, replace=False)
            ec[ci * k:(ci + 1) * k] = ci
        signs = (2.0 * rng.integers(0, 2, size=m * k) - 1.0).astype(
            np.float32)
        insts.append((n, m, np.stack([ev, ec]), signs, -1.0))
    return insts


def dataset_fingerprint(insts):
    h = hashlib.sha256()
    for n, m, gmap, signs, _ in insts:
        h.update(np.int64(n).tobytes())
        h.update(np.int64(m).tobytes())
        h.update(np.ascontiguousarray(gmap).tobytes())
        h.update(np.ascontiguousarray(signs).tobytes())
    return h.hexdigest()[:16]


def write_json(insts, path):
    from pdp_solver_tpu.fg.jsonfmt import instance_to_line
    with open(path, "w") as f:
        for i, (n, m, gmap, signs, label) in enumerate(insts):
            f.write(instance_to_line(n, m, gmap, signs, label,
                                     [f"bench{i}"]) + "\n")
