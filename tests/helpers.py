"""Shared test helpers: build instances from literal clause lists."""

import numpy as np


def cnf_instance(n, clauses, label=-1.0):
    """clauses: list of lists of signed 1-based literals, e.g. [[1, -2], [2, 3]]."""
    edges_v, edges_c, signs = [], [], []
    for ci, clause in enumerate(clauses):
        for lit in clause:
            edges_v.append(abs(lit) - 1)
            edges_c.append(ci)
            signs.append(1.0 if lit > 0 else -1.0)
    gmap = np.stack([np.array(edges_v, dtype=np.int32),
                     np.array(edges_c, dtype=np.int32)])
    return (n, len(clauses), gmap, np.array(signs, dtype=np.float32), label)


def check_assignment(clauses, assignment01):
    """True iff the 0/1 assignment satisfies every clause."""
    for clause in clauses:
        ok = False
        for lit in clause:
            val = assignment01[abs(lit) - 1]
            if (lit > 0 and val >= 0.5) or (lit < 0 and val < 0.5):
                ok = True
                break
        if not ok:
            return False
    return True


def random_ksat(rng, n, m, k=3):
    """Uniform random k-SAT clause list."""
    clauses = []
    for _ in range(m):
        vs = rng.choice(n, size=k, replace=False)
        signs = rng.integers(0, 2, size=k) * 2 - 1
        clauses.append([int((v + 1) * s) for v, s in zip(vs, signs)])
    return clauses
