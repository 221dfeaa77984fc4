#!/usr/bin/env python
"""Isolate the on-chip windowed-kernel mismatch: run variants, report errors."""

import json
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from pdp_solver_tpu.fg.batch import pack_instances
    from pdp_solver_tpu.utils.benchdata import make_ksat_set

    TILE, ALIGN, WINDOW = 1024, 1024, 2048

    batch = jax.device_put(pack_instances(make_ksat_set()))
    E, V = batch.num_edges, batch.num_vars
    rng = np.random.default_rng(0)

    def make_kernel(minmode, win=WINDOW):
        def _kernel(ids_ref, x_ref, out_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            ids = ids_ref[:]
            x = x_ref[:]
            if minmode == "min1d":
                mn = jnp.min(ids)
            elif minmode == "min2d":
                mn = jnp.min(ids.reshape(8, 128))
            else:  # first
                mn = ids[0]
            base = (mn // ALIGN) * ALIGN
            base = pl.multiple_of(base, ALIGN)
            rel = ids - base
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, win), 1)
            onehot = (rel[:, None] == col_ids).astype(jnp.float32)
            sums = jnp.dot(x, onehot, preferred_element_type=jnp.float32)
            w = out_ref[:, pl.ds(base, win)]
            out_ref[:, pl.ds(base, win)] = w + sums
        return _kernel

    def run(x_ct, ids, n, minmode, win=WINDOW):
        C = x_ct.shape[0]
        N_pad = -(-n // ALIGN) * ALIGN + win
        out = pl.pallas_call(
            make_kernel(minmode, win),
            grid=(E // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda i: (i,)),
                pl.BlockSpec((C, TILE), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((C, N_pad), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((C, N_pad), jnp.float32),
        )(ids, x_ct)
        return out[:, :n]

    res = {}
    ids_v = batch.edge_var
    ids_c = batch.edge_clause

    for name, C, ids, n, minmode in [
        ("var_c1_min1d", 1, ids_v, V, "min1d"),
        ("var_c4_min1d", 4, ids_v, V, "min1d"),
        ("var_c4_min2d", 4, ids_v, V, "min2d"),
        ("var_c8_min1d", 8, ids_v, V, "min1d"),
        ("clause_c4_first", 4, ids_c, batch.num_clauses, "first"),
        ("clause_c4_min1d", 4, ids_c, batch.num_clauses, "min1d"),
    ]:
        x = jnp.asarray(rng.normal(size=(C, E)).astype(np.float32))
        x = x * batch.edge_mask[None, :]
        got = np.asarray(jax.jit(functools.partial(
            run, ids=ids, n=n, minmode=minmode))(x))
        want = np.asarray(jax.jit(lambda x: jax.ops.segment_sum(
            x.T, ids, num_segments=n))(x)).T
        err = float(np.abs(got - want).max())
        # where do errors concentrate?
        bad = np.abs(got - want).max(axis=0)
        res[name] = {"err": round(err, 6),
                     "bad_segments": int((bad > 1e-3).sum()),
                     "first_bad": int(np.argmax(bad > 1e-3))
                     if (bad > 1e-3).any() else -1}
        print(name, res[name], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
