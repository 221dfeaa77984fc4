"""Native fgpack kernels vs the pure-Python implementations."""

import numpy as np
import pytest

from pdp_solver_tpu.fg import native
from pdp_solver_tpu.fg.batch import build_ell_table
from pdp_solver_tpu.fg.dimacs import write_dimacs

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native/libfgpack.so not built")


def test_native_dimacs_parse(tmp_path):
    clauses = [[1, -2, 3], [-1, 4], [2]]
    p = tmp_path / "f.cnf"
    write_dimacs(str(p), 4, clauses)
    # add noise the parser must skip
    p.write_text("c a comment\n" + p.read_text() + "%\n0\n")
    n, m, ev, ec, es = native.parse_dimacs_fast(str(p))
    assert (n, m) == (4, 3)
    np.testing.assert_array_equal(ev, [0, 1, 2, 0, 3, 1])
    np.testing.assert_array_equal(ec, [0, 0, 0, 1, 1, 2])
    np.testing.assert_array_equal(es, [1, -1, 1, -1, 1, 1])


def test_native_ell_matches_python(rng):
    ids = rng.integers(0, 50, size=400).astype(np.int32)
    table_any = build_ell_table(ids, 50)          # native when available
    # force the python path by calling the fallback logic directly
    import pdp_solver_tpu.fg.batch as B
    fast = native.build_ell_fast(ids, 50, table_any.shape[1])
    assert fast is not None
    # per-node edge sets must agree regardless of slot order
    for v in range(50):
        a = sorted(x for x in table_any[v] if x >= 0)
        b = sorted(x for x in np.asarray(fast)[v] if x >= 0)
        expect = sorted(np.flatnonzero(ids == v).tolist())
        assert a == expect and b == expect


def test_native_ell_width_overflow(rng):
    ids = np.zeros(20, np.int32)
    assert native.build_ell_fast(ids, 4, 8) is None
