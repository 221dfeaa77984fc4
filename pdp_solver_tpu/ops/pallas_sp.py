"""Single-launch Survey Propagation sweep.

One kernel launch runs the COMPLETE SP sweep (reference
src/pdp/nn/pdp_propagate.py:139-221): clause-direction log-u sums + eta
surveys AND the var-direction polarity-split aggregation + q-triplet, via
a two-phase grid. Phase 0 sweeps the edge tiles accumulating the
polarity-split log(1-eta) sums per variable into a VMEM scratch; phase 1
re-sweeps the tiles, gathers the (now final) per-variable sums, and
computes the eta survey and the (q_u, q_s, q_dc) simplex in place.

MEASURED OUTCOME (this kernel is opt-in via PDP_SP_SWEEP=on): the single
launch LOSES to the two-launch chained+pass-C path at every size (0.51 vs
0.40 ms/sweep at E=33k, 8.2 vs 7.3 ms at E=524k). Kernel launches inside
a compiled loop cost ~0.1 ms, not the multi-ms per-PROGRAM dispatch
floor, so collapsing launches buys nothing by itself, and the two-phase
grid re-streams every edge block and rebuilds the one-hots twice per
sweep. The file is kept as the measured record of that cost model and as
the base for folding the decimator's convergence + scorer reductions
into the sweep's phase 1 (traffic fusion, which does pay).

Layout contract (same as ops/pallas_fused.py): edges sorted by clause with
a uniform clause width k (each clause's k edges sit inside one sub-tile,
batch.fast_clause), variable ids windowed (batch.fast_var).

Numerics are identical to the XLA fallback: f32 everywhere, same safe_log
clamps. (Measured dead ends at E=524k, for the record: a bf16 hi/lo
operand decomposition was 1.4x SLOWER than f32-HIGHEST - the per-sub-tile
decomposition + doubled dot count outweigh the halved one-hot bytes - and
plain bf16 truncation saves only ~18% while corrupting the messages.)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pdp_solver_tpu.ops.pallas_fused import (
    ALIGN, WINDOW, _pick_tiles, _uniform_onehot, _win_geom)
from pdp_solver_tpu.ops.segment import LOG_EPS_PROP, MAX_LOGIT


def _slog(x):
    return jnp.log(jnp.maximum(x, LOG_EPS_PROP))


def _sexp(x):
    return jnp.exp(jnp.minimum(x, MAX_LOGIT))


def _build_sp_sweep(T, k, tile, sub, NP, pi, login, window=0):
    W, A = _win_geom(window)
    def kernel(ids_ref, u_ref, ei_ref, em_ref, mask_ref, es_ref, sg_ref,
               fo_ref, v0_ref, v1_ref, v2_ref,
               eta_out, nv0_out, nv1_out, nv2_out, vred_ref):
        p = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(jnp.logical_and(p == 0, t == 0))
        def _():
            vred_ref[:] = jnp.zeros_like(vred_ref)

        for s in range(tile // sub):
            lo = s * sub
            sub_ids = ids_ref[lo:lo + sub]
            base = (jnp.min(sub_ids) // A) * A
            base = pl.multiple_of(base, A)
            rel = sub_ids - base
            col_iota = jax.lax.broadcasted_iota(jnp.int32, (sub, W), 1)
            onehot = (rel[:, None] == col_iota).astype(jnp.float32)

            ei = ei_ref[lo:lo + sub]
            em = em_ref[lo:lo + sub]
            sg = sg_ref[lo:lo + sub]
            lm = _slog(1.0 - ei) * em
            pos_w = jnp.where(sg == 1.0, 1.0, 0.0)
            neg_w = jnp.where(sg == -1.0, 1.0, 0.0)

            @pl.when(p == 0)
            def _():
                # var-direction accumulate (same one-hot orientation as the
                # phase-1 gather - a transposed contraction would make
                # Mosaic materialise a second one-hot copy)
                x = jnp.stack([lm * pos_w, lm * neg_w], axis=0)
                sums = jnp.dot(x, onehot,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                win_v = vred_ref[:, pl.ds(base, W)]
                vred_ref[:, pl.ds(base, W)] = win_v + sums

            @pl.when(p == 1)
            def _():
                # gather the final polarity sums at this tile's edges: two
                # plain mat-vecs in the SAME orientation as the reduce (a
                # (S, 2) result would put the pathological minor-dim-2
                # layout on the VPU and a transpose in the loop)
                pos_e = jnp.dot(onehot, vred_ref[0, pl.ds(base, W)],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                neg_e = jnp.dot(onehot, vred_ref[1, pl.ds(base, W)],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

                # clause-direction: tile-local log-u sum -> eta survey
                u = u_ref[lo:lo + sub]
                log_u = (u if login else _slog(u)) * em
                u_oh = _uniform_onehot(sub, k)           # [S, S/k]
                cl = jnp.dot(log_u[None, :], u_oh,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                clb = jax.lax.dot_general(
                    cl, u_oh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                mask = mask_ref[lo:lo + sub]
                eta = _sexp(clb[0] - log_u)
                eta_out[lo:lo + sub] = (mask * eta
                                        + (1.0 - mask) * es_ref[lo:lo + sub])

                # var-direction: q-triplet (reference pdp_propagate.py:175-221)
                same = 0.5 * (1 + sg) * pos_e + 0.5 * (1 - sg) * neg_e - lm
                opp = 0.5 * (1 - sg) * pos_e + 0.5 * (1 + sg) * neg_e
                if pi:
                    fo = fo_ref[lo:lo + sub]
                    same = same + _slog(
                        1.0 - pi * jnp.where(fo == sg, 1.0, 0.0))
                    opp = opp + _slog(
                        1.0 - pi * jnp.where(fo == -sg, 1.0, 0.0))
                from pdp_solver_tpu.modules.propagate import (
                    q_triplet_stable)
                q_u, q_s, d_, total = q_triplet_stable(same, opp)
                inv = 1.0 - mask
                nv0_out[lo:lo + sub] = (mask * (q_u / total)
                                        + inv * v0_ref[lo:lo + sub])
                nv1_out[lo:lo + sub] = (mask * (q_s / total)
                                        + inv * v1_ref[lo:lo + sub])
                nv2_out[lo:lo + sub] = (mask * (d_ / total)
                                        + inv * v2_ref[lo:lo + sub])

    return kernel


@functools.lru_cache(maxsize=None)
def _make_sp_call(E_pad, NP, k, tile, sub, pi, login, window, interpret):
    from jax.experimental.pallas import tpu as pltpu
    T = E_pad // tile
    edge_spec = pl.BlockSpec((tile,), lambda p, t: (t,))
    in_specs = [edge_spec] * 11
    out_specs = [edge_spec] * 4
    out_shape = [jax.ShapeDtypeStruct((E_pad,), jnp.float32)] * 4
    kernel = _build_sp_sweep(T, k, tile, sub, NP, pi, login, window)
    return pl.pallas_call(
        kernel, grid=(2, T), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, NP), jnp.float32)],
        interpret=interpret)


def use_sp_sweep(batch) -> bool:
    # same layout contract as the chained passes (uniform clause width,
    # windowed var ids) - delegate so the eligibility rule lives once
    from pdp_solver_tpu.ops.pallas_fused import use_chained_pass
    return use_chained_pass(batch)


def sp_full_sweep(*, gather_ids, clause_width, num_vars,
                  u_like, eta_in, em, mask, eta_state, sign, force,
                  v0, v1, v2, pi=0.0, login=False, window=0,
                  interpret=False):
    """One complete SP sweep in a single kernel launch.

    Returns (new_eta, nv0, nv1, nv2) as f32[E] edge columns; numerically
    identical to the fused/XLA paths in modules/propagate.py."""
    k = clause_width
    tile, sub = _pick_tiles(k)
    E = gather_ids.shape[0]
    E_pad = -(-E // tile) * tile
    W_g, A_g = _win_geom(window)
    NP = -(-num_vars // A_g) * A_g + W_g

    def pad_e(x, fill):
        x = x.astype(jnp.float32)
        if E_pad == E:
            return x
        return jnp.concatenate([x, jnp.full((E_pad - E,), fill, x.dtype)])

    ids = gather_ids.astype(jnp.int32)
    if E_pad != E:
        ids = jnp.concatenate(
            [ids, jnp.full((E_pad - E,), gather_ids[-1], jnp.int32)])

    call = _make_sp_call(E_pad, NP, k, tile, sub, float(pi), bool(login),
                         int(window), bool(interpret))
    new_eta, nv0, nv1, nv2 = call(
        ids, pad_e(u_like, 0), pad_e(eta_in, 0), pad_e(em, 0),
        pad_e(mask, 0), pad_e(eta_state, 0), pad_e(sign, 0),
        pad_e(force, 0), pad_e(v0, 0), pad_e(v1, 0), pad_e(v2, 0))
    return new_eta[:E], nv0[:E], nv1[:E], nv2[:E]
