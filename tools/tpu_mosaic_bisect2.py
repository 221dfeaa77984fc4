#!/usr/bin/env python
"""Standalone bisect of the chained-kernel Mosaic crash.

MODE=
  rw_dyn    dynamic node-window read + dynamic accumulate write (crash?)
  r_dyn     dynamic read, static write window
  w_dyn     static read, dynamic write
  both_stat both windows static
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODE = os.environ.get("MODE", "rw_dyn")
SUB = 512
TILE = 1024
WINDOW = 2048
ALIGN = 1024


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    E, N = 4096, 4096
    N_pad = N + WINDOW

    def kernel(ids_ref, node_ref, x_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for s in range(TILE // SUB):
            lo = s * SUB
            sub_ids = ids_ref[lo:lo + SUB]
            base = (jnp.min(sub_ids) // ALIGN) * ALIGN
            base = pl.multiple_of(base, ALIGN)
            rel = sub_ids - base
            iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, WINDOW), 1)
            onehot = (rel[:, None] == iota).astype(jnp.float32)

            rb = base if MODE in ("rw_dyn", "r_dyn") else 0
            win = node_ref[pl.ds(rb, WINDOW)][None, :]
            g = jax.lax.dot_general(
                win, onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)[0]

            x = (x_ref[lo:lo + SUB] * g)[None, :]
            sums = jnp.dot(x, onehot,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            wb = base if MODE in ("rw_dyn", "w_dyn") else 0
            window = out_ref[:, pl.ds(wb, WINDOW)]
            out_ref[:, pl.ds(wb, WINDOW)] = window + sums

    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, 256, size=E)).astype(np.int32)
    node = np.linspace(0, 1, N_pad).astype(np.float32)
    x = np.ones(E, np.float32)

    call = pl.pallas_call(
        kernel, grid=(E // TILE,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,)),
                  pl.BlockSpec((N_pad,), lambda i: (0,)),
                  pl.BlockSpec((TILE,), lambda i: (i,))],
        out_specs=pl.BlockSpec((1, N_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, N_pad), jnp.float32))
    out = jax.jit(lambda a, b, c: call(a, b, c))(
        jnp.asarray(ids), jnp.asarray(node), jnp.asarray(x))
    print("ok", MODE, float(jnp.sum(out)), flush=True)


if __name__ == "__main__":
    main()
