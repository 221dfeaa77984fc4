"""Streaming DIMACS reader/writer.

Replaces reference src/dimacs2json.py, whose `CompactDimacs` materialises a
dense clause x variable matrix (O(n*m) memory, dimacs2json.py:38). This parser
streams straight to edge lists, then optionally applies the same two cleanups:
drop empty clauses / unused variables, and subsumption-style simplification.
"""

import os

import numpy as np


def parse_dimacs(path):
    """DIMACS CNF -> (n, m, clauses) with clauses a list of signed-literal
    lists. Tolerates comments, blank lines and trailing 0 terminators.
    Uses the native fgpack parser when built (native/fgpack.cpp)."""
    from pdp_solver_tpu.fg import native
    fast = native.parse_dimacs_fast(path)
    if fast is not None:
        n, m, ev, ec, es = fast
        clauses = [[] for _ in range(m)]
        for v, c, sgn in zip(ev.tolist(), ec.tolist(), es.tolist()):
            clauses[c].append((v + 1) * (1 if sgn > 0 else -1))
        return n, m, clauses

    clauses = []
    current = []
    n = m = 0
    with open(path, "r") as f:
        for line in f:
            seg = line.split()
            if not seg or seg[0] == "c" or seg[0] == "%":
                continue
            if seg[0] == "p":
                n, m = int(seg[2]), int(seg[3])
                continue
            # clauses are 0-terminated and may span or share lines
            for tok in seg:
                if tok == "%":
                    break
                lit = int(tok)
                if lit == 0:
                    if current:
                        clauses.append(current)
                        current = []
                else:
                    current.append(lit)
    if current:
        clauses.append(current)
    return n, m, clauses


def compact(n, clauses, propagate=False):
    """Drop empty clauses and unused variables (reference
    dimacs2json.py:47-51); optionally drop subsumed clauses
    (`_propagate_constraints`, dimacs2json.py:58-83).

    Repeated same-polarity literals are deduplicated and tautological
    clauses (x OR NOT x) are dropped entirely - they are always satisfied,
    so removing them preserves the formula. (The reference's dense matrix
    build instead overwrites with the LAST polarity, dimacs2json.py:44,
    which can flip a satisfiable formula to unsatisfiable; that is a data
    corruption we deliberately do not copy.)

    Returns (n', clauses') with variables renumbered 1..n'.
    """
    deduped = []
    for c in clauses:
        polarity = {}
        tautology = False
        for lit in c:
            v = abs(lit)
            sgn = 1 if lit > 0 else -1
            if v in polarity and polarity[v] != sgn:
                tautology = True
                break
            polarity[v] = sgn
        if not tautology:
            deduped.append([v * s for v, s in polarity.items()])
    clauses = [c for c in deduped if len(c) > 0]

    if propagate:
        clauses = _drop_subsumed(clauses)

    used = sorted({abs(l) for c in clauses for l in c})
    remap = {v: i + 1 for i, v in enumerate(used)}
    clauses = [[int(np.sign(l)) * remap[abs(l)] for l in c] for c in clauses]
    return len(used), clauses


def _drop_subsumed(clauses):
    """A clause is dropped when an earlier (by index) clause's literal set is
    a subset of it with identical polarities. Quadratic, like the reference;
    used only as an offline preprocessing pass."""
    sets = [frozenset(c) for c in clauses]
    keep = []
    kept_sets = []
    for i, s in enumerate(sets):
        subsumed = any(k < s or k == s for k in kept_sets)
        if not subsumed:
            keep.append(clauses[i])
            kept_sets.append(s)
    return keep


def clauses_to_instance(n, clauses, label=-1.0):
    """(n, clauses) -> the packed-instance tuple fg.batch expects."""
    ev, ec, signs = [], [], []
    for ci, clause in enumerate(clauses):
        for lit in clause:
            ev.append(abs(lit) - 1)
            ec.append(ci)
            signs.append(1.0 if lit > 0 else -1.0)
    gmap = np.stack([np.asarray(ev, np.int32), np.asarray(ec, np.int32)])
    return (n, len(clauses), gmap, np.asarray(signs, np.float32), label)


def label_from_filename(path):
    """SAT/UNSAT label encoded as the last digit of the stem (reference
    dimacs2json.py:105: `..._sat=1.DIMACS`)."""
    stem = os.path.splitext(os.path.basename(path))[0]
    return float(stem[-1]) if stem and stem[-1].isdigit() else -1.0


def write_dimacs(path, n, clauses):
    with open(path, "w") as f:
        f.write(f"p cnf {n} {len(clauses)}\n")
        for c in clauses:
            f.write(" ".join(str(l) for l in c) + " 0\n")
