"""Pallas TPU kernel: segmented sum over SORTED segment ids via one-hot
matmuls on the MXU.

XLA lowers segment_sum to scatter-add, which serialises per element on TPU
(measured ~90M updates/s on v5e - tools/microbench_ops.py). This kernel
instead processes the edge list in tiles of T elements: within a tile it
builds a one-hot matrix (ids relative to a lane-aligned window base) in VMEM
and reduces with a single MXU matmul, accumulating into the output (resident
in VMEM across the sequential TPU grid). Requirements:

  * segment ids sorted ascending;
  * (num_segments + 2T) * 4 bytes fits in VMEM alongside the tiles
    (fine up to ~1M segments).

Edges whose id falls outside their tile's aligned output window (id gaps
larger than the window, e.g. between the padded replica blocks that
replicate_batch builds) are detected in XLA, excluded from the kernel and
added back with a small scatter correction, so the result is exact for ANY
sorted input. The op carries a custom VJP (the transpose of a segmented sum
is a gather) so it is safe under jax.grad.

`sorted_segment_sum` falls back to jax.ops.segment_sum off-TPU unless
interpret mode is forced (tests).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pdp_solver_tpu.ops.segment import segment_sum as xla_segment_sum

TILE = 1024          # edges per grid step (XLA lays out 1-D i32 as T(1024))
ALIGN = 1024         # Mosaic requires the dynamic window start provably
                     # aligned to its vector width; align down to 1024
WINDOW = 2048        # output window per tile (>= ALIGN + TILE span)


def _kernel(ids_ref, x_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]                        # i32[T], sorted
    x = x_ref[:]                            # f32[T]

    # window base aligned down so the dynamic output slice start is a
    # provable multiple of the vector width Mosaic picks
    base = (ids[0] // ALIGN) * ALIGN
    base = pl.multiple_of(base, ALIGN)
    rel = ids - base                        # in [0, ALIGN + TILE) < WINDOW
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, WINDOW), 1)
    onehot = (rel[:, None] == col_ids).astype(jnp.float32)
    # sums[j] = sum_t x[t] * onehot[t, j]  -> [1, W] = [1, T] @ [T, W]
    sums = jnp.dot(x[None, :], onehot,
                   preferred_element_type=jnp.float32)[0]

    window = out_ref[pl.ds(base, WINDOW)]
    out_ref[pl.ds(base, WINDOW)] = window + sums


def _run(x, segment_ids, num_segments, interpret):
    E = x.shape[0]
    E_pad = -(-E // TILE) * TILE
    N_pad = -(-num_segments // ALIGN) * ALIGN + WINDOW
    if E_pad != E:
        pad_id = segment_ids[-1]
        segment_ids = jnp.concatenate(
            [segment_ids, jnp.full((E_pad - E,), pad_id, segment_ids.dtype)])
        x = jnp.concatenate([x, jnp.zeros((E_pad - E,), x.dtype)])

    # edges outside their tile's aligned window (large id gaps, e.g. padded
    # replica-block boundaries) go through a scatter correction instead
    tile_first = segment_ids.reshape(-1, TILE)[:, 0]
    base = (tile_first // ALIGN) * ALIGN
    rel = segment_ids - jnp.repeat(base, TILE)
    oow = rel >= WINDOW
    x_in = jnp.where(oow, 0.0, x)

    out = pl.pallas_call(
        _kernel,
        grid=(E_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,)),
            pl.BlockSpec((TILE,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((N_pad,), lambda i: (0,)),
        out_shape=jax.ShapeDtypeStruct((N_pad,), jnp.float32),
        interpret=interpret,
    )(segment_ids, x_in)

    correction = xla_segment_sum(jnp.where(oow, x, 0.0), segment_ids,
                                 N_pad, indices_are_sorted=True)
    return (out + correction)[:num_segments]


@functools.lru_cache(maxsize=None)
def _make_tpu_fn(num_segments):
    """custom_vjp wrapper specialised per (static) segment count - the
    output shape must be concrete at trace time."""

    @jax.custom_vjp
    def f(x, segment_ids):
        return _run(x, segment_ids, num_segments, interpret=False)

    def fwd(x, segment_ids):
        return f(x, segment_ids), segment_ids

    def bwd(segment_ids, g):
        # transpose of a segmented sum is a gather of the cotangent
        return g[segment_ids], None

    f.defvjp(fwd, bwd)
    return f


def sorted_segment_sum(x, segment_ids, num_segments, interpret=False):
    """Segmented sum for sorted ids; x: f32[E] -> f32[num_segments]. Exact
    for any sorted input (out-of-window gaps corrected); differentiable."""
    if interpret:
        return _run(x, segment_ids, num_segments, interpret=True)
    if jax.default_backend() != "tpu":
        return xla_segment_sum(x, segment_ids, num_segments,
                               indices_are_sorted=True)
    return _make_tpu_fn(int(num_segments))(x, segment_ids)
