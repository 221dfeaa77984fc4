"""ctypes bindings for the native data-pipeline kernels (native/fgpack.cpp).

Loads native/libfgpack.so if present (build with `make -C native`); every
entry point has a pure-Python fallback so the package works without the
native build. `available()` reports which path is active.
"""

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libfgpack.so")
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i64 = ctypes.c_int64
    p_c = ctypes.c_char_p
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.dimacs_count.restype = ctypes.c_int
    lib.dimacs_count.argtypes = [p_c, i64, p_i64, p_i64, p_i64]
    lib.dimacs_parse.restype = ctypes.c_int
    lib.dimacs_parse.argtypes = [p_c, i64, p_i32, p_i32, p_f32, i64]
    lib.build_ell.restype = i64
    lib.build_ell.argtypes = [p_i32, i64, p_i32, i64, i64, p_i32]
    lib.max_degree.restype = i64
    lib.max_degree.argtypes = [p_i32, i64, i64, p_i32]
    _LIB = lib
    return _LIB


def available():
    return _lib() is not None


def parse_dimacs_fast(path):
    """Native DIMACS parse -> (n, m, edge_var, edge_clause, edge_sign),
    or None if the native library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    n = ctypes.c_int64()
    m = ctypes.c_int64()
    lits = ctypes.c_int64()
    if lib.dimacs_count(buf, len(buf), ctypes.byref(n), ctypes.byref(m),
                        ctypes.byref(lits)) != 0:
        return None
    E = lits.value
    ev = np.empty(E, np.int32)
    ec = np.empty(E, np.int32)
    es = np.empty(E, np.float32)
    if lib.dimacs_parse(buf, len(buf), ev, ec, es, E) != 0:
        return None
    return int(n.value), int(m.value), ev, ec, es


def build_ell_fast(node_ids, num_nodes, width):
    """Native ELL table build; returns the table or None (unavailable /
    degree > width)."""
    lib = _lib()
    if lib is None:
        return None
    node_ids = np.ascontiguousarray(node_ids, np.int32)
    table = np.empty((num_nodes, width), np.int32)
    scratch = np.empty(num_nodes, np.int32)
    r = lib.build_ell(node_ids, len(node_ids), table.reshape(-1), num_nodes,
                      width, scratch)
    if r < 0:
        return None
    return table
