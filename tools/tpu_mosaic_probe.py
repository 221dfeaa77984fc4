#!/usr/bin/env python
"""Compile-check the fused edge-pass kernel shapes on chip at tiny sizes.

Each variant compiles + runs on a small synthetic batch and validates
against numpy. Prints one line per variant: ok / the Mosaic error.
"""

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pdp_solver_tpu.ops import pallas_fused as PF

    rng = np.random.default_rng(0)
    E, V, F = 4096, 1500, 1024
    ids_v = np.sort(rng.integers(0, V, E)).astype(np.int32)
    ids_c = np.repeat(np.arange(F, dtype=np.int32), E // F)
    x1 = rng.random(E).astype(np.float32)
    nv = rng.random(V).astype(np.float32)
    nc = rng.random(F).astype(np.float32)

    def run(tag, fn, check):
        try:
            out = jax.jit(fn)()
            out = [np.asarray(o) for o in out]
            err = check(out)
            print(json.dumps({"tag": tag, "ok": bool(err < 1e-4),
                              "err": float(err)}), flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(json.dumps({"tag": tag, "ok": False, "error": msg}),
                  flush=True)
            if os.environ.get("PROBE_TB"):
                traceback.print_exc()

    def f_g(g, ev):
        return (), (g[0] * ev[0],)

    PF_f_g = f_g  # module-level-ish identity for cache keying

    # 1) single gather (unsorted var ids), edge out
    def v1():
        _, (out,) = PF.fused_edge_pass(
            PF_f_g, node_cols=(jnp.asarray(nv),),
            gather_ids=jnp.asarray(ids_v),
            edge_cols=(jnp.asarray(x1),), n_eout=1)
        return (out,)

    run("gather_eout", v1,
        lambda o: np.abs(o[0] - nv[ids_v] * x1).max())

    # 2) gather + reduce (phase-C shape)
    def f_gr(g, ev):
        return (g[0] * ev[0], g[0] + ev[0]), ()

    def v2():
        red, _ = PF.fused_edge_pass(
            f_gr, node_cols=(jnp.asarray(nv),),
            gather_ids=jnp.asarray(ids_v),
            edge_cols=(jnp.asarray(x1),),
            reduce_ids=jnp.asarray(ids_c), num_segments=F, n_red=2)
        return (red,)

    def chk2(o):
        a = np.zeros(F)
        b = np.zeros(F)
        np.add.at(a, ids_c, nv[ids_v] * x1)
        np.add.at(b, ids_c, nv[ids_v] + x1)
        return max(np.abs(o[0][0] - a).max(), np.abs(o[0][1] - b).max())

    run("gather_reduce", v2, chk2)

    # 3) dual gather + eouts (em/ae shape)
    def f_dual(g, ev):
        return (), (g[0] * g[1] * ev[0], g[0] + g[1])

    def v3():
        _, outs = PF.fused_edge_pass(
            f_dual, node_cols=(jnp.asarray(nv),),
            gather_ids=jnp.asarray(ids_v),
            node_cols2=(jnp.asarray(nc),),
            gather_ids2=jnp.asarray(ids_c),
            edge_cols=(jnp.asarray(x1),), n_eout=2)
        return outs

    def chk3(o):
        return max(np.abs(o[0] - nv[ids_v] * nc[ids_c] * x1).max(),
                   np.abs(o[1] - (nv[ids_v] + nc[ids_c])).max())

    run("dual_gather", v3, chk3)

    # 4) dual gather + reduce + eout (worst case shape)
    def f_all(g, ev):
        return (g[0] * g[1],), (g[0] - g[1],)

    def v4():
        red, outs = PF.fused_edge_pass(
            f_all, node_cols=(jnp.asarray(nv),),
            gather_ids=jnp.asarray(ids_v),
            node_cols2=(jnp.asarray(nc),),
            gather_ids2=jnp.asarray(ids_c),
            edge_cols=(jnp.asarray(x1),),
            reduce_ids=jnp.asarray(ids_v), num_segments=V,
            n_red=1, n_eout=1)
        return (red, outs[0])

    def chk4(o):
        a = np.zeros(V)
        np.add.at(a, ids_v, nv[ids_v] * nc[ids_c])
        return max(np.abs(o[0][0] - a).max(),
                   np.abs(o[1] - (nv[ids_v] - nc[ids_c])).max())

    run("dual_gather_reduce_eout", v4, chk4)

    print("DONE")


if __name__ == "__main__":
    main()
