"""Windowed 2-D segment reduce / gather for [E, d] feature blocks.

The neural solvers move [E, d] hidden states (d = 50..150) between edges
and nodes every iteration. The 1-D column kernels (ops/pallas_reduce.py)
would need d separate column slices - d relayout ops - so these kernels
keep the feature block 2-D: per edge sub-tile, one [S, W] one-hot matrix
contracts against the [S, d] block (reduce) or the [W, d] node window
(gather) on the MXU. Both carry custom VJPs (they are each other's
transpose), so they are safe under jax.grad for training.

Windowed invariant as everywhere: each TILE-slab of ids spans < WINDOW -
ALIGN distinct ids (FGBatch.fast_var / fast_clause, checked at pack time).

Reference equivalence: torch.mm(mask, x) / torch.mm(mask_T, x) for the
incidence masks of src/pdp/nn/solver.py:151-178.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ALIGN = 1024
WINDOW = 2048
TILE = 1024
SUB = 512
LANE = 128


def _reduce_kernel(ids_ref, x_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for s in range(TILE // SUB):
        lo = s * SUB
        ids = ids_ref[lo:lo + SUB]
        base = (jnp.min(ids) // ALIGN) * ALIGN
        base = pl.multiple_of(base, ALIGN)
        rel = ids - base
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, WINDOW), 1)
        onehot = (rel[:, None] == col_iota).astype(jnp.float32)
        x = x_ref[lo:lo + SUB, :]
        # [W, d] = [S, W]^T x [S, d] on the MXU
        sums = jax.lax.dot_general(
            onehot, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        window = out_ref[pl.ds(base, WINDOW), :]
        out_ref[pl.ds(base, WINDOW), :] = window + sums


def _gather_kernel(ids_ref, nodes_ref, out_ref):
    for s in range(TILE // SUB):
        lo = s * SUB
        ids = ids_ref[lo:lo + SUB]
        base = (jnp.min(ids) // ALIGN) * ALIGN
        base = pl.multiple_of(base, ALIGN)
        rel = ids - base
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, WINDOW), 1)
        onehot = (rel[:, None] == col_iota).astype(jnp.float32)
        window = nodes_ref[pl.ds(base, WINDOW), :]
        # [S, d] = [S, W] x [W, d]
        out_ref[lo:lo + SUB, :] = jax.lax.dot_general(
            onehot, window, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


def _pad_inputs(x, ids):
    E, d = x.shape
    E_pad = -(-E // TILE) * TILE
    d_pad = -(-d // LANE) * LANE
    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
    if E_pad != E:
        x = jnp.pad(x, ((0, E_pad - E), (0, 0)))
        ids = jnp.concatenate(
            [ids, jnp.full((E_pad - E,), ids[-1], ids.dtype)])
    return x, ids, E_pad, d_pad


@functools.lru_cache(maxsize=None)
def _reduce_call(E_pad, d_pad, N_pad, interpret):
    return pl.pallas_call(
        _reduce_kernel, grid=(E_pad // TILE,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,)),
                  pl.BlockSpec((TILE, d_pad), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((N_pad, d_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((N_pad, d_pad), jnp.float32),
        interpret=interpret)


@functools.lru_cache(maxsize=None)
def _gather_call(E_pad, d_pad, N_pad, interpret):
    return pl.pallas_call(
        _gather_kernel, grid=(E_pad // TILE,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,)),
                  pl.BlockSpec((N_pad, d_pad), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((TILE, d_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((E_pad, d_pad), jnp.float32),
        interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def windowed_segment_sum_2d(x, segment_ids, num_segments, interpret=False):
    """[E, d] -> [num_segments, d] exact segment sum (windowed invariant)."""
    E, d = x.shape
    x32 = x.astype(jnp.float32)
    xp, ids, E_pad, d_pad = _pad_inputs(x32, segment_ids.astype(jnp.int32))
    N_pad = -(-num_segments // ALIGN) * ALIGN + WINDOW
    out = _reduce_call(E_pad, d_pad, N_pad, interpret)(ids, xp)
    return out[:num_segments, :d].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def windowed_gather_2d(nodes, ids, num_edges, interpret=False):
    """[N, d] -> [num_edges, d] row gather (windowed invariant on ids)."""
    N, d = nodes.shape
    n32 = nodes.astype(jnp.float32)
    d_pad = -(-d // LANE) * LANE
    N_pad = -(-N // ALIGN) * ALIGN + WINDOW
    n32 = jnp.pad(n32, ((0, N_pad - N), (0, d_pad - d)))
    E = ids.shape[0]
    E_pad = -(-E // TILE) * TILE
    idp = ids.astype(jnp.int32)
    if E_pad != E:
        idp = jnp.concatenate(
            [idp, jnp.full((E_pad - E,), idp[-1], jnp.int32)])
    out = _gather_call(E_pad, d_pad, N_pad, interpret)(idp, n32)
    return out[:num_edges, :d].astype(nodes.dtype)


def _sum2d_fwd(x, segment_ids, num_segments, interpret):
    return (windowed_segment_sum_2d(x, segment_ids, num_segments, interpret),
            segment_ids)


def _sum2d_bwd(num_segments, interpret, segment_ids, g):
    return windowed_gather_2d(g, segment_ids, segment_ids.shape[0],
                              interpret), None


def _gather2d_fwd(nodes, ids, num_edges, interpret):
    return windowed_gather_2d(nodes, ids, num_edges, interpret), (
        ids, nodes.shape[0])


def _gather2d_bwd(num_edges, interpret, res, g):
    ids, N = res
    return windowed_segment_sum_2d(g, ids, N, interpret), None


windowed_segment_sum_2d.defvjp(_sum2d_fwd, _sum2d_bwd)
windowed_gather_2d.defvjp(_gather2d_fwd, _gather2d_bwd)
