"""Fused edge pass: gather -> edge elementwise -> reduce in ONE kernel.

The building block behind the solver's hot loops. On the target chip every
separate XLA op over an [E]-sized array costs ~1-8 ms at E=524k (scatters
worst, unsorted gathers next, even reshape reduces are not free), so a
graph sweep expressed as ~8 XLA ops pays ~8 HBM round-trips. This kernel
runs the entire pattern

    g_c[e]   = node_cols[c][ids_g[e]]          (windowed one-hot gather)
    outs     = f(gathered, edge_cols, sign...) (arbitrary elementwise)
    red[c,n] = sum over e with ids_r[e] == n   (windowed one-hot reduce)
    edge_out = per-edge results

in a single pass over edge tiles with everything resident in VMEM: node
inputs and reduce accumulators are small ([V]~16k, [F]~131k at bench
shapes), edge arrays stream through tile by tile, and the gather/reduce
one-hot matrices hit the MXU. One kernel dispatch replaces the whole
gather + k-elementwise + reduce chain.

Windowed invariant (checked at pack time, FGBatch.fast_var/fast_clause):
every TILE-slab of ids spans < WINDOW - ALIGN distinct ids, so a tile's
gather/reduce window is one aligned dynamic slice of the resident array.

Used by problem/simplify.py (fused round phases C and V), the SP sweep
(modules/propagate.py), and WalkSAT (solvers/base.py). Inference-path
only - no custom VJP; training paths keep the differentiable reduce ops.

Reference equivalence: each pass computes mask-matrix products of
src/pdp/nn/solver.py:151-178 fused with their surrounding elementwise ops.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ALIGN = 1024
WINDOW = 2048
TILE = 1024     # block size: 1-D blocks must be multiples of 1024 (Mosaic)
SUB = 512       # inner sub-tile: keeps each [SUB, WINDOW] one-hot at 4 MB
                # so a dual-gather + reduce pass peaks well under VMEM


def _gather_sub(sub_ids, node_refs):
    """One-hot windowed gather of each node ref at SUB edge ids."""
    base = (jnp.min(sub_ids) // ALIGN) * ALIGN
    base = pl.multiple_of(base, ALIGN)
    rel = sub_ids - base
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, WINDOW), 1)
    onehot = (rel[:, None] == col_iota).astype(jnp.float32)
    win = jnp.stack([r[pl.ds(base, WINDOW)] for r in node_refs], axis=0)
    # [C, W] x [W, S] on the MXU; HIGHEST keeps f32 exact (the default
    # path rounds operands to bf16)
    g = jax.lax.dot_general(
        win, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return tuple(g[c] for c in range(len(node_refs)))


def _build(f, n_node, n_node2, n_edge, n_red, n_eout, has_reduce):
    def kernel(*refs):
        it = iter(refs)
        ids_g_ref = next(it) if n_node else None
        ids_g2_ref = next(it) if n_node2 else None
        ids_r_ref = next(it) if has_reduce else None
        node_refs = [next(it) for _ in range(n_node)]
        node2_refs = [next(it) for _ in range(n_node2)]
        edge_refs = [next(it) for _ in range(n_edge)]
        red_ref = next(it) if has_reduce else None
        eout_refs = [next(it) for _ in range(n_eout)]

        step = pl.program_id(0)

        if has_reduce:
            @pl.when(step == 0)
            def _():
                red_ref[:] = jnp.zeros_like(red_ref)

        for s in range(TILE // SUB):
            lo = s * SUB
            gathered = ()
            if n_node:
                gathered += _gather_sub(ids_g_ref[lo:lo + SUB], node_refs)
            if n_node2:
                gathered += _gather_sub(ids_g2_ref[lo:lo + SUB], node2_refs)

            edge_vals = tuple(r[lo:lo + SUB] for r in edge_refs)
            red_cols, eouts = f(gathered, edge_vals)

            if has_reduce:
                ids_r = ids_r_ref[lo:lo + SUB]
                base_r = (jnp.min(ids_r) // ALIGN) * ALIGN
                base_r = pl.multiple_of(base_r, ALIGN)
                rel_r = ids_r - base_r
                col_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (SUB, WINDOW), 1)
                onehot_r = (rel_r[:, None] == col_iota).astype(jnp.float32)
                x = jnp.stack(red_cols, axis=0)          # [Cr, S]
                sums = jnp.dot(x, onehot_r,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                window = red_ref[:, pl.ds(base_r, WINDOW)]
                red_ref[:, pl.ds(base_r, WINDOW)] = window + sums

            for r, v in zip(eout_refs, eouts):
                r[lo:lo + SUB] = v

    return kernel


@functools.lru_cache(maxsize=None)
def _make_call(f, E_pad, n_node, node_shapes, n_node2, node2_shapes,
               n_edge, n_red, num_segments, n_eout, interpret):
    has_reduce = n_red > 0
    grid = E_pad // TILE
    N_pad = (-(-num_segments // ALIGN) * ALIGN + WINDOW) if has_reduce else 0

    in_specs = []
    if n_node:
        in_specs.append(pl.BlockSpec((TILE,), lambda i: (i,)))
    if n_node2:
        in_specs.append(pl.BlockSpec((TILE,), lambda i: (i,)))
    if has_reduce:
        in_specs.append(pl.BlockSpec((TILE,), lambda i: (i,)))
    for s in node_shapes + node2_shapes:
        in_specs.append(pl.BlockSpec((s,), lambda i: (0,)))
    in_specs += [pl.BlockSpec((TILE,), lambda i: (i,))] * n_edge

    out_specs, out_shape = [], []
    if has_reduce:
        out_specs.append(pl.BlockSpec((n_red, N_pad), lambda i: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((n_red, N_pad), jnp.float32))
    out_specs += [pl.BlockSpec((TILE,), lambda i: (i,))] * n_eout
    out_shape += [jax.ShapeDtypeStruct((E_pad,), jnp.float32)] * n_eout

    kernel = _build(f, n_node, n_node2, n_edge, n_red, n_eout, has_reduce)
    call = pl.pallas_call(kernel, grid=(grid,), in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shape,
                          interpret=interpret)
    return call


def fused_edge_pass(f, *, node_cols=(), gather_ids=None,
                    node_cols2=(), gather_ids2=None, edge_cols=(),
                    reduce_ids=None, num_segments=0, n_red=0, n_eout=0,
                    interpret=False):
    """Run one fused gather->elementwise->reduce pass over the edge list.

    f(gathered, edge_vals) -> (red_cols, edge_outs): a traceable elementwise
    function over [TILE] vectors; `gathered` has one entry per node_cols
    followed by one per node_cols2, `red_cols` must have n_red entries,
    `edge_outs` n_eout. f must be a module-level function (it keys the
    compile cache).

    node_cols: tuple of f32[N] arrays gathered via gather_ids (i32[E]);
    node_cols2/gather_ids2: optional second gather side (e.g. variable-side
    AND clause-side node arrays in one pass).
    edge_cols: tuple of f32[E] per-edge inputs, streamed in tiles.
    reduce_ids/num_segments: reduce target (windowed invariant required).

    Returns (reduced [n_red, num_segments] or None, tuple of n_eout f32[E]).
    """
    arrays = list(edge_cols)
    for ids in (gather_ids, gather_ids2, reduce_ids):
        if ids is not None:
            arrays.append(ids)
    E = arrays[0].shape[0]
    E_pad = -(-E // TILE) * TILE

    def pad_e(x, fill):
        if E_pad == E:
            return x
        return jnp.concatenate(
            [x, jnp.full((E_pad - E,), fill, x.dtype)])

    def pad_nodes(cols):
        shapes, padded = [], []
        for c in cols:
            c = c.astype(jnp.float32)
            n = c.shape[0]
            n_pad = -(-n // ALIGN) * ALIGN + WINDOW
            if n_pad != n:
                c = jnp.concatenate([c, jnp.zeros((n_pad - n,), jnp.float32)])
            shapes.append(n_pad)
            padded.append(c)
        return tuple(shapes), padded

    node_shapes, padded_nodes = pad_nodes(node_cols)
    node2_shapes, padded_nodes2 = pad_nodes(node_cols2)

    args = []
    if gather_ids is not None:
        args.append(pad_e(gather_ids.astype(jnp.int32), 0))
    if gather_ids2 is not None:
        args.append(pad_e(gather_ids2.astype(jnp.int32), 0))
    if reduce_ids is not None:
        args.append(pad_e(reduce_ids.astype(jnp.int32),
                          reduce_ids[-1]))
    args += padded_nodes + padded_nodes2
    args += [pad_e(c.astype(jnp.float32), 0) for c in edge_cols]

    call = _make_call(f, E_pad, len(node_cols), node_shapes,
                      len(node_cols2), node2_shapes,
                      len(edge_cols), n_red, int(num_segments), n_eout,
                      bool(interpret))
    outs = call(*args)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    idx = 0
    reduced = None
    if n_red > 0:
        reduced = outs[0][:, :num_segments]
        idx = 1
    eouts = tuple(o[:E] for o in outs[idx:])
    return reduced, eouts
