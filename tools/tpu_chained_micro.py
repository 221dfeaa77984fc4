#!/usr/bin/env python
"""Micro-bisect the chained kernel's Mosaic crash: toggle features via env.

PROBE_NODE=0/1  windowed node gather present
PROBE_CL=0/1    clause-col input present
PROBE_COUT=0/1  blocked clause output present
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NODE = int(os.environ.get("PROBE_NODE", "1"))
CL = int(os.environ.get("PROBE_CL", "1"))
COUT = int(os.environ.get("PROBE_COUT", "1"))


def _f1(gathered, edge_vals):
    sign, mask = edge_vals
    x = gathered[0] if gathered else sign
    return (x * mask,)


def _f2(cred, clause_vals):
    (s,) = cred
    c = clause_vals[0] if clause_vals else s
    out = s * c
    return ((out,) if COUT else ()), (out,)


def _f3(bcast, gathered, edge_vals):
    (b,) = bcast
    sign, mask = edge_vals
    return (b * sign * mask,), ()


def main():
    import jax
    import jax.numpy as jnp
    from pdp_solver_tpu.ops.pallas_fused import chained_edge_pass

    E, V, F, k = 4096, 1024, 1024, 4
    rng = np.random.default_rng(0)
    ev = np.repeat(np.arange(F) % V, k).astype(np.int32)
    np.random.shuffle(ev.reshape(F, k).T)   # keep ids local-ish
    ev = np.sort(rng.integers(0, 256, size=E)).astype(np.int32)
    sign = (rng.integers(0, 2, size=E) * 2 - 1).astype(np.float32)
    mask = np.ones(E, np.float32)
    node = np.linspace(0, 1, V).astype(np.float32)
    clause = np.linspace(0, 1, F).astype(np.float32)

    cout, vout, _ = jax.jit(lambda n, c, s, m: chained_edge_pass(
        _f1, _f2, _f3,
        node_cols=(n,) if NODE else (),
        gather_ids=jnp.asarray(ev),
        clause_cols=(c,) if CL else (),
        edge_cols=(s, m),
        clause_width=k, num_clauses=F, num_segments=V,
        n_cred=1, n_cout=1 if COUT else 0, n_bcast=1, n_vred=1,
        interpret=False))(jnp.asarray(node), jnp.asarray(clause),
                          jnp.asarray(sign), jnp.asarray(mask))
    import jax.numpy as jnp2
    print("ok", float(jnp2.sum(vout)),
          None if cout is None else float(jnp2.sum(cout)), flush=True)


if __name__ == "__main__":
    main()
