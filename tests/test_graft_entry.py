"""Regression coverage for the driver entry points (__graft_entry__.py).

The driver compile-checks entry() on one chip and executes
dryrun_multichip(N) on an N-virtual-device CPU mesh; neither was exercised
by the suite until a shard_map strictness change (JAX 0.9 check_vma) broke
the dryrun while every other test stayed green. This keeps both paths in
the suite, on a small 2-device slice of the session's 8-device CPU mesh to
bound compile time.
"""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_small_mesh():
    # 2 devices exercises the same shard_map + Pallas-kernel interaction
    # (including the dp x replica 2-D mesh branch) as the driver's 8
    ge.dryrun_multichip(2)
