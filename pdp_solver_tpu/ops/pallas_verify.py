"""Per-iteration CNF verification + edge-mask recomputation in ONE launch.

Every solver iteration with termination checking ends with two edge-scale
passes (reference solver.py:370-386): verify the current prediction
(clause satisfaction -> per-instance counts, train/loss.py cnf_evaluate)
and rebuild the next iteration's edge masks (liveness em, instance-active
ae, problem/state.py edge_masks_pair). The ae mask depends on the
verification result (solved instances freeze), which forced two kernel
dispatches and an instance-level round trip.

This kernel runs both in one two-phase launch: phase 0 streams the edge
tiles accumulating the per-instance (max_sat, got_sat) counts into a VMEM
scratch; phase 1 re-streams the tiles, derives the updated instance-active
flags in VMEM (active' = active * not-solved), and emits both edge masks.
Phase-1 operands are all 0/1 flags, so its one-hots and gathers run as
exact bfloat16 matmuls (half the construction + operand traffic); phase
0's prediction gather stays f32.

MEASURED OUTCOME (opt-in via PDP_VERIFY_MASKS=on): a WASH at bench shapes
- headline wall 12.6 -> 12.8 s, per-iteration slope within noise. The
two-phase grid re-streams every edge block, which cancels the saved
launch (in-loop launches cost ~0.1 ms; see docs/PERFORMANCE.md). This is
the third datum for that cost model: single-phase passes that ELIMINATE
redundant streams win (the combined decimator reduce, -2.8 ms/iter);
two-phase launch-count fusions do not. Kept bit-exact-tested as the
instance-broadcast kernel pattern (clause-side flag gather + u_oh
broadcast).

Layout contract as ops/pallas_fused.py chained passes (uniform clause
width, windowed var ids, num_instances <= IWIN); replication-grouped
termination (_group_any) is NOT folded in - callers with replication > 1
use the split path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pdp_solver_tpu.ops.pallas_fused import (
    ALIGN, IWIN, WINDOW, _pick_tiles, _uniform_onehot)


def _build_verify(T, k, tile, sub, NP):
    def kernel(ids_ref, sign_ref, bmask_ref,
               pred_ref, av_ref, ab_var_ref, ac_ref, cm_ref, cb_ref,
               em_ref, ae_ref, iout_ref, ired_ref):
        p = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(jnp.logical_and(p == 0, t == 0))
        def _():
            ired_ref[:] = jnp.zeros_like(ired_ref)

        for s in range(tile // sub):
            lo = s * sub
            sub_ids = ids_ref[lo:lo + sub]
            base = (jnp.min(sub_ids) // ALIGN) * ALIGN
            base = pl.multiple_of(base, ALIGN)
            rel = sub_ids - base
            col_iota = jax.lax.broadcasted_iota(jnp.int32, (sub, WINDOW), 1)
            csl = slice(lo // k, (lo + sub) // k)
            bmask = bmask_ref[lo:lo + sub]

            @pl.when(p == 0)
            def _():
                onehot = (rel[:, None] == col_iota).astype(jnp.float32)
                p_e = jnp.dot(onehot, pred_ref[pl.ds(base, WINDOW)],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                sign = sign_ref[lo:lo + sub]
                # literal value under the thresholded prediction
                # (train/loss.py _cnf_chain_f1)
                lit = sign * p_e + (1.0 - sign) / 2.0
                sat_e = jnp.where(lit > 0.5, 1.0, 0.0) * bmask

                u_oh = _uniform_onehot(sub, k)               # [S, S/k]
                cs = jnp.dot(sat_e[None, :], u_oh,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                cm_t = cm_ref[0, csl]
                clause_sat = jnp.where(cs[0] > 0, 1.0, 0.0) * cm_t

                # clause -> instance accumulate (cm is 0 on padded
                # clauses); counts are 0/1 flags -> exact bf16 product
                cbt = cb_ref[0, csl].astype(jnp.int32)
                iota_b = jax.lax.broadcasted_iota(
                    jnp.int32, (sub // k, IWIN), 1)
                oh_b = (cbt[:, None] == iota_b).astype(jnp.bfloat16)
                ired_ref[:, :] = ired_ref[:, :] + jnp.dot(
                    jnp.stack([cm_t, clause_sat],
                              axis=0).astype(jnp.bfloat16), oh_b,
                    preferred_element_type=jnp.float32)

            @pl.when(p == 1)
            def _():
                # not-solved flag from the (final) counts; 1 = still open
                notsolved = jnp.where(ired_ref[0, :] == ired_ref[1, :],
                                      0.0, 1.0)

                # all phase-1 values are 0/1 -> exact bf16 matmuls. The
                # instance flag is gathered on the CLAUSE side (a clause's
                # instance == its variables' instance), whose one-hot is
                # k-fold smaller than a per-edge instance one-hot - the
                # latter measurably cancelled the whole fusion win
                onehot_b = (rel[:, None] == col_iota).astype(jnp.bfloat16)
                av_e = jnp.dot(
                    onehot_b,
                    av_ref[pl.ds(base, WINDOW)][:, None].astype(
                        jnp.bfloat16),
                    preferred_element_type=jnp.float32)[:, 0]
                ab_e = jnp.dot(
                    onehot_b,
                    ab_var_ref[pl.ds(base, WINDOW)][:, None].astype(
                        jnp.bfloat16),
                    preferred_element_type=jnp.float32)[:, 0]

                cbt = cb_ref[0, csl].astype(jnp.int32)
                iota_b = jax.lax.broadcasted_iota(
                    jnp.int32, (sub // k, IWIN), 1)
                oh_b = (cbt[:, None] == iota_b).astype(jnp.bfloat16)
                ns_c = jnp.dot(oh_b, notsolved[:, None].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)[:, 0]

                u_oh = _uniform_onehot(sub, k).astype(jnp.bfloat16)
                bc = jax.lax.dot_general(
                    jnp.stack([ac_ref[0, csl], ns_c],
                              axis=0).astype(jnp.bfloat16), u_oh,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

                em_ref[lo:lo + sub] = av_e * bc[0] * bmask
                ae_ref[lo:lo + sub] = ab_e * bc[1]

        @pl.when(jnp.logical_and(p == 1, t == T - 1))
        def _():
            iout_ref[:] = ired_ref[:]

    return kernel


@functools.lru_cache(maxsize=None)
def _make_verify_call(E_pad, NP, k, tile, sub, interpret):
    from jax.experimental.pallas import tpu as pltpu
    T = E_pad // tile
    edge_spec = pl.BlockSpec((tile,), lambda p, t: (t,))
    clause_spec = pl.BlockSpec((1, tile // k), lambda p, t: (0, t))
    node_spec = pl.BlockSpec((NP,), lambda p, t: (0,))

    in_specs = [edge_spec] * 3 + [node_spec] * 3 + [clause_spec] * 3
    out_specs = [edge_spec, edge_spec,
                 pl.BlockSpec((2, IWIN), lambda p, t: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct((E_pad,), jnp.float32),
                 jax.ShapeDtypeStruct((E_pad,), jnp.float32),
                 jax.ShapeDtypeStruct((2, IWIN), jnp.float32)]
    kernel = _build_verify(T, k, tile, sub, NP)
    return pl.pallas_call(
        kernel, grid=(2, T), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, IWIN), jnp.float32)],
        interpret=interpret)


def use_verify_masks(batch) -> bool:
    from pdp_solver_tpu.ops.pallas_fused import use_chained_pass
    return bool(use_chained_pass(batch) and batch.batch_size <= IWIN)


def verify_and_masks(batch, problem, active_b, var_pred, *,
                     interpret=False):
    """One launch: (solved, unsat_count, em, ae) where em/ae are the next
    iteration's edge masks computed against active_b AFTER freezing the
    instances this verification solved. Matches
    cnf_evaluate + (solved<=0.5 update) + edge_masks_pair for
    replication == 1."""
    k = batch.clause_width
    tile, sub = _pick_tiles(k)
    E = batch.edge_var.shape[0]
    E_pad = -(-E // tile) * tile
    V = batch.num_vars
    NP = -(-V // ALIGN) * ALIGN + WINDOW
    B = batch.batch_size
    rows = E_pad // k
    F = batch.num_clauses

    def pad_e(x, fill):
        x = x.astype(jnp.float32) if x.dtype != jnp.int32 else x
        if E_pad == E:
            return x
        return jnp.concatenate([x, jnp.full((E_pad - E,), fill, x.dtype)])

    def pad_n(x):
        return jnp.concatenate(
            [x.astype(jnp.float32), jnp.zeros((NP - V,), jnp.float32)])

    def pad_c(x, fill=0):
        x = x.astype(jnp.float32)
        if F >= rows:
            return x[:rows][None, :]
        return jnp.concatenate(
            [x, jnp.full((rows - F,), float(fill), jnp.float32)])[None, :]

    ab_var = active_b[batch.var_batch]     # V-level, ~free per iteration

    call = _make_verify_call(E_pad, NP, k, tile, sub, bool(interpret))
    em, ae, iout = call(
        pad_e(batch.edge_var.astype(jnp.int32), batch.edge_var[-1]),
        pad_e(batch.edge_sign, 0),
        pad_e(batch.edge_mask, 0),
        pad_n(var_pred[:, 0]),
        pad_n(problem.active_vars),
        pad_n(ab_var),
        pad_c(problem.active_clauses),
        pad_c(batch.clause_mask),
        pad_c(batch.clause_batch))
    max_sat, got_sat = iout[0, :B], iout[1, :B]
    solved = (max_sat == got_sat).astype(jnp.float32)
    return solved, max_sat - got_sat, em[:E], ae[:E]
