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


def _kernel(ids_ref, x_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]                            # i32[T]
    x = x_ref[:]                                # f32[C, T]

    base = (jnp.min(ids) // ALIGN) * ALIGN
    base = pl.multiple_of(base, ALIGN)
    rel = ids - base                            # in [0, WINDOW)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, WINDOW), 1)
    onehot = (rel[:, None] == col_ids).astype(jnp.float32)
    # sums[c, w] = sum_t x[c, t] * onehot[t, w]
    sums = jnp.dot(x, onehot, preferred_element_type=jnp.float32)

    window = out_ref[:, pl.ds(base, WINDOW)]
    out_ref[:, pl.ds(base, WINDOW)] = window + sums


def _run(x_ct, segment_ids, num_segments, interpret):
    """x_ct: f32[C, E] column-major edge values -> f32[C, num_segments]."""
    C, E = x_ct.shape
    E_pad = -(-E // TILE) * TILE
    N_pad = -(-num_segments // ALIGN) * ALIGN + WINDOW
    if E_pad != E:
        pad_id = segment_ids[-1]
        segment_ids = jnp.concatenate(
            [segment_ids, jnp.full((E_pad - E,), pad_id, segment_ids.dtype)])
        x_ct = jnp.concatenate(
            [x_ct, jnp.zeros((C, E_pad - E), x_ct.dtype)], axis=1)

    out = pl.pallas_call(
        _kernel,
        grid=(E_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,)),
            pl.BlockSpec((C, TILE), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((C, N_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, N_pad), jnp.float32),
        interpret=interpret,
    )(segment_ids, x_ct)
    return out[:, :num_segments]


@functools.lru_cache(maxsize=None)
def _make_fn(num_segments, interpret):
    """custom_vjp wrapper specialised per static segment count."""

    @jax.custom_vjp
    def f(x_ct, segment_ids):
        return _run(x_ct, segment_ids, num_segments, interpret)

    def fwd(x_ct, segment_ids):
        return f(x_ct, segment_ids), segment_ids

    def bwd(segment_ids, g):
        # transpose of a segment sum is a gather of the cotangent
        return g[:, segment_ids], None

    f.defvjp(fwd, bwd)
    return f


def windowed_segment_sum(x, segment_ids, num_segments, interpret=False):
    """Exact segment sum for ids satisfying the windowed invariant.

    x: f32[E] or f32[E, C] -> f32[num_segments] / f32[num_segments, C].
    The caller owns checking the invariant (FGBatch.fast_var/fast_clause);
    out-of-window ids silently drop, so never call this unchecked.
    """
    scalar = x.ndim == 1
    x_ct = (x[None, :] if scalar else x.T).astype(jnp.float32)
    out = _make_fn(int(num_segments), bool(interpret))(
        x_ct, segment_ids.astype(jnp.int32))
    return out[0] if scalar else out.T


def uniform_clause_sum(x, k, num_clauses):
    """Clause-direction segment sum for uniform-width clause-major batches:
    a [F, k] reshape-sum, no scatter at all. x: [E] or [E, C]; clause c owns
    edges [c*k, (c+1)*k); padding edges carry zeros (callers pre-mask)."""
    scalar = x.ndim == 1
    x2 = x[:, None] if scalar else x
    E, C = x2.shape
    need = k * num_clauses
    if need > E:
        x2 = jnp.concatenate([x2, jnp.zeros((need - E, C), x2.dtype)])
    out = x2[:need].reshape(num_clauses, k, C).sum(axis=1)
    return out[:, 0] if scalar else out
