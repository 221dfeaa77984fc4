"""Windowed multi-column segment reduce: the scatter-free TPU backend.

Profiling on the target chip (tools/profile_phases.py, docs/
profile_phases.json) shows the entire p-d-p hot loop is bound by XLA
scatter-adds: every `jax.ops.segment_sum` at E=524k costs ~6-8 ms (~65M
updates/s) while gathers, node-level segment ops, and element-wise work are
essentially free. This module replaces every hot scatter with a one-hot MXU
reduction, generalising round 1's ops/pallas_segment.py in three ways:

  * multi-column: x is [E, C]; C columns share one one-hot matrix, so
    stacked reductions cost the same as one;
  * unsorted ids: the only requirement is the *windowed invariant* - each
    TILE-sized slab of edge ids spans < WINDOW - ALIGN distinct ids. Packed
    batches satisfy this by construction for BOTH directions (edges are
    clause-major, instances are contiguous, padding edges point at the last
    real node, replica blocks start on tile boundaries); `pack_instances`
    verifies it and records `fast_var` / `fast_clause` static flags, and
    callers fall back to XLA scatter when a flag is off. There is NO
    correction pass (round 1's correction was itself a full scatter, which
    ate the kernel's entire win);
  * carries a custom VJP (transpose of a segment sum = gather, which is
    free on this chip), so it is safe under jax.grad.

Mechanics per grid step (one TILE of edges): window base = the tile's
minimum id aligned down to ALIGN; build a [TILE, WINDOW] one-hot of the
relative ids; reduce with one [C, TILE] x [TILE, WINDOW] MXU matmul; add
into the [C, N_pad] output window (output resident in VMEM across the
sequential grid).

Reference equivalence: this computes exactly torch.mm(mask, x) for the
variable/function incidence masks of src/pdp/nn/solver.py:151-178.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 1024      # edges per grid step
ALIGN = 1024     # window starts provably aligned for Mosaic dynamic slices
WINDOW = 2048    # output window per tile; invariant: tile id span <= W - A


def _make_kernel(ncols):
    def _kernel(ids_ref, *refs):
        col_refs, out_ref = refs[:ncols], refs[ncols]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        ids = ids_ref[:]                        # i32[T]
        # columns arrive as separate 1-D [T] refs (native layout - no host
        # [E,C] interleave/transpose, which profiling showed costs more than
        # the reduce itself); stack them in VMEM
        x = jnp.stack([r[:] for r in col_refs], axis=0)   # f32[C, T]

        base = (jnp.min(ids) // ALIGN) * ALIGN
        base = pl.multiple_of(base, ALIGN)
        rel = ids - base                        # in [0, WINDOW)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, WINDOW), 1)
        onehot = (rel[:, None] == col_ids).astype(jnp.float32)
        # sums[c, w] = sum_t x[c, t] * onehot[t, w]. HIGHEST precision is
        # required for exactness: the MXU's default f32 path rounds operands
        # to bf16, which puts ~0.4%-relative noise on every reduced value
        # (measured on chip); with a 0/1 right operand the highest-precision
        # pass restores near-bit-exact sums at negligible cost here.
        sums = jnp.dot(x, onehot, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

        window = out_ref[:, pl.ds(base, WINDOW)]
        out_ref[:, pl.ds(base, WINDOW)] = window + sums
    return _kernel


def _run(cols, segment_ids, num_segments, interpret):
    """cols: tuple of f32[E] columns -> f32[C, num_segments]."""
    C = len(cols)
    E = cols[0].shape[0]
    E_pad = -(-E // TILE) * TILE
    N_pad = -(-num_segments // ALIGN) * ALIGN + WINDOW
    if E_pad != E:
        pad_id = segment_ids[-1]
        segment_ids = jnp.concatenate(
            [segment_ids, jnp.full((E_pad - E,), pad_id, segment_ids.dtype)])
        zpad = jnp.zeros((E_pad - E,), jnp.float32)
        cols = tuple(jnp.concatenate([c, zpad]) for c in cols)

    out = pl.pallas_call(
        _make_kernel(C),
        grid=(E_pad // TILE,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,))] * (1 + C),
        out_specs=pl.BlockSpec((C, N_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, N_pad), jnp.float32),
        interpret=interpret,
    )(segment_ids, *cols)
    return out[:, :num_segments]


@functools.lru_cache(maxsize=None)
def _make_fn(num_segments, interpret):
    """custom_vjp wrapper specialised per static segment count."""

    @jax.custom_vjp
    def f(segment_ids, *cols):
        return _run(cols, segment_ids, num_segments, interpret)

    def fwd(segment_ids, *cols):
        return f(segment_ids, *cols), segment_ids

    def bwd(segment_ids, g):
        # transpose of a segment sum is a gather of the cotangent
        return (None,) + tuple(g[i][segment_ids]
                               for i in range(g.shape[0]))

    f.defvjp(fwd, bwd)
    return f


def _make_based_kernel(ncols):
    """Like _make_kernel but the window base comes from a per-tile input
    instead of min(ids): ids outside [base, base + WINDOW) contribute
    nothing (the one-hot has no matching column), which is exactly the
    static residual set the caller handles with a small scatter.

    The bases vector rides whole in SMEM (Mosaic rejects rank-1 blocks
    smaller than the 128-lane tiling; a per-tile (1,) block is illegal on
    real TPU) and is indexed by program_id."""
    def _kernel(base_ref, ids_ref, *refs):
        col_refs, out_ref = refs[:ncols], refs[ncols]
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        ids = ids_ref[:]
        x = jnp.stack([r[:] for r in col_refs], axis=0)   # f32[C, T]
        base = base_ref[step]
        base = pl.multiple_of(base, ALIGN)
        rel = ids - base
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, WINDOW), 1)
        onehot = (rel[:, None] == col_ids).astype(jnp.float32)
        sums = jnp.dot(x, onehot, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        window = out_ref[:, pl.ds(base, WINDOW)]
        out_ref[:, pl.ds(base, WINDOW)] = window + sums
    return _kernel


def _run_based(cols, segment_ids, bases, num_segments, interpret):
    """cols: tuple of f32[E] -> f32[C, num_segments]; bases: i32[E/TILE]
    ALIGN-aligned window base per tile (host-computed, see
    fg/batch.py hybrid metadata). Requires E % TILE == 0 (bucketed shapes
    guarantee it at the sizes where this kernel matters)."""
    C = len(cols)
    E = cols[0].shape[0]
    if E % TILE != 0:
        raise ValueError(f"based windowed reduce needs E % {TILE} == 0, "
                         f"got {E}")
    if bases.shape[0] != E // TILE:
        raise ValueError("bases must have one entry per edge tile")
    N_pad = -(-num_segments // ALIGN) * ALIGN + WINDOW

    from jax.experimental.pallas import tpu as pltpu
    n_tiles = E // TILE
    base_spec = (pl.BlockSpec((n_tiles,), lambda i: (0,))
                 if interpret else
                 pl.BlockSpec(memory_space=pltpu.SMEM))
    out = pl.pallas_call(
        _make_based_kernel(C),
        grid=(n_tiles,),
        in_specs=[base_spec]
        + [pl.BlockSpec((TILE,), lambda i: (i,))] * (1 + C),
        out_specs=pl.BlockSpec((C, N_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, N_pad), jnp.float32),
        interpret=interpret,
    )(bases, segment_ids, *cols)
    return out[:, :num_segments]


@functools.lru_cache(maxsize=None)
def _make_based_fn(num_segments, interpret):
    """custom_vjp wrapper for the based variant: the cotangent gather must
    mask out-of-window edges (their primal contribution was dropped and is
    owned by the caller's residual scatter)."""

    @jax.custom_vjp
    def f(segment_ids, bases, *cols):
        return _run_based(cols, segment_ids, bases, num_segments, interpret)

    def fwd(segment_ids, bases, *cols):
        return f(segment_ids, bases, *cols), (segment_ids, bases)

    def bwd(res, g):
        segment_ids, bases = res
        base_e = jnp.repeat(bases, TILE)
        rel = segment_ids - base_e
        in_win = ((rel >= 0) & (rel < WINDOW)).astype(g.dtype)
        return (None, None) + tuple(g[i][segment_ids] * in_win
                                    for i in range(g.shape[0]))

    f.defvjp(fwd, bwd)
    return f


def windowed_segment_sum_cols_based(cols, segment_ids, bases, num_segments,
                                    interpret=False):
    """Multi-column segment sum with HOST-CHOSEN per-tile window bases.

    Unlike windowed_segment_sum_cols there is no invariant requirement:
    edges whose id falls outside their tile's [base, base + WINDOW) window
    are silently dropped here and MUST be re-added by the caller via the
    batch's static residual-edge scatter (fg/batch.py computes both the
    bases and the residual list so the pair is exact by construction;
    modules/common.py owns the recombination)."""
    cols = tuple(c.astype(jnp.float32) for c in cols)
    return _make_based_fn(int(num_segments), bool(interpret))(
        segment_ids.astype(jnp.int32), bases.astype(jnp.int32), *cols)


def windowed_segment_sum_cols(cols, segment_ids, num_segments,
                              interpret=False):
    """Exact multi-column segment sum for ids satisfying the windowed
    invariant. `cols` is a tuple of f32[E] columns (kept as separate 1-D
    arrays on purpose: [E, C] interleaves/transposes with tiny minor dims
    are relayouts that cost more than the reduce on TPU). Returns
    f32[C, num_segments]; row i is the reduce of cols[i].

    The caller owns checking the invariant (FGBatch.fast_var/fast_clause);
    out-of-window ids silently drop, so never call this unchecked.
    """
    cols = tuple(c.astype(jnp.float32) for c in cols)
    return _make_fn(int(num_segments), bool(interpret))(
        segment_ids.astype(jnp.int32), *cols)


def windowed_segment_sum(x, segment_ids, num_segments, interpret=False):
    """[E] / [E, C] compatibility wrapper over windowed_segment_sum_cols."""
    if x.ndim == 1:
        return windowed_segment_sum_cols(
            (x,), segment_ids, num_segments, interpret)[0]
    cols = tuple(x[:, i] for i in range(x.shape[1]))
    return windowed_segment_sum_cols(cols, segment_ids, num_segments,
                                     interpret).T


def uniform_clause_sum_cols(cols, k, num_clauses):
    """Clause-direction segment sum for uniform-width clause-major batches:
    a per-column [F, k] reshape-sum, no scatter and no [E, C] interleave.
    cols: tuple of f32[E]; returns f32[C, num_clauses]. Clause c owns edges
    [c*k, (c+1)*k); padding edges carry zeros (callers pre-mask)."""
    need = k * num_clauses
    outs = []
    for c in cols:
        E = c.shape[0]
        if need > E:
            c = jnp.concatenate([c, jnp.zeros((need - E,), c.dtype)])
        outs.append(c[:need].reshape(num_clauses, k).sum(axis=1))
    return jnp.stack(outs, axis=0)


def uniform_clause_sum(x, k, num_clauses):
    """[E] / [E, C] compatibility wrapper over uniform_clause_sum_cols."""
    if x.ndim == 1:
        return uniform_clause_sum_cols((x,), k, num_clauses)[0]
    cols = tuple(x[:, i] for i in range(x.shape[1]))
    return uniform_clause_sum_cols(cols, k, num_clauses).T
