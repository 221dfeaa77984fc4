"""Multi-iteration WalkSAT mega-kernel.

One launch runs K complete WalkSAT iterations (reference
src/pdp/nn/solver.py:433-496: clause energies, break counts / flip deltas,
eps-greedy variable selection, flip) with the assignment, the per-variable
reductions and the per-instance energies resident in VMEM for the whole
block. On the tunneled device every kernel launch pays a multi-ms floor, so
K iterations per launch divide that floor by K; the per-instance argmax
selection and the flip also happen in-kernel, removing the XLA
segment-argmax / scatter ops the per-iteration path needs.

Layout contract (same as ops/pallas_fused.py): edges sorted by clause with
a uniform clause width k (each clause's k edges sit inside one sub-tile,
batch.fast_clause), variable ids windowed (batch.fast_var). The selection
phase additionally requires num_instances <= 512 and pads variables to a
multiple of the 2048-lane selection window.

Randomness: a splitmix-style integer hash of (seed, iteration, lane) -
deterministic, identical in interpret and compiled mode, and free of host
round-trips. With eps < 0 the kernel is pure-greedy and bit-identical to
the per-iteration fallback path (tested in tests/test_walksat_mega.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pdp_solver_tpu.ops.pallas_fused import (
    ALIGN, IWIN, WINDOW, _pick_tiles, _uniform_onehot, _win_geom,
    batch_var_window)

SELW = 2048          # selection window over variables
B_MAX = 512          # instance cap: [B_pad, SELW] temporaries stay <= 4MB
V_MAX = 63488        # variable cap: bounds the unrolled selection windows
BIG = 3e38   # finite stand-in for +/-inf (plain float: jnp scalars would be
             # captured consts, which pallas_call rejects)


def _hash01(x, salt):
    """Deterministic U[0,1) lanes from i32 lanes (splitmix-style mixer)."""
    h = x * jnp.int32(-1640531527) + salt          # 0x9E3779B9
    h = h ^ (h >> 15)
    h = h * jnp.int32(-2048144777)                 # 0x85EBCA77
    h = h ^ (h >> 13)
    return (h & jnp.int32(0x7FFFFF)).astype(jnp.float32) * (1.0 / (1 << 23))


def _build_walksat(K, T, k, tile, sub, NP, B_pad, eps, window=0):
    n_w = NP // SELW
    W, A = _win_geom(window)

    def kernel(seed_ref, ids_ref, w_ref, dm_ref, em_ref,
               ac_ref, cb_ref, assign0_ref, av_ref, vmask_ref, vb_ref,
               assign_ref, energy_ref, vred_ref):
        kk = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(jnp.logical_and(kk == 0, t == 0))
        def _():
            assign_ref[:] = assign0_ref[:]

        @pl.when(t == 0)
        def _():
            vred_ref[:] = jnp.zeros_like(vred_ref)
            energy_ref[:] = jnp.zeros_like(energy_ref)

        # ---- edge phase: energies, flip deltas, per-var unsat ----------
        # every matmul operand here is a small integer (one-hots, +/-1
        # literal values, clause sums <= k, 0/1 flags), so bfloat16
        # operands are EXACT while halving the dominant VMEM traffic; all
        # accumulation stays f32 via preferred_element_type. The selection
        # phase below stays f32 (it carries variable indices up to V_MAX,
        # which bf16 cannot represent).
        for s in range(tile // sub):
            lo = s * sub
            sub_ids = ids_ref[lo:lo + sub]
            base = (jnp.min(sub_ids) // A) * A
            base = pl.multiple_of(base, A)
            rel = sub_ids - base
            col_iota = jax.lax.broadcasted_iota(jnp.int32, (sub, W), 1)
            onehot = (rel[:, None] == col_iota).astype(jnp.bfloat16)

            # mat-vec per node ref, SAME one-hot orientation as the reduce
            # below - the transposed contraction would make Mosaic
            # materialise a second 4MB one-hot copy and blow the VMEM budget.
            # Only the assignment is gathered in-kernel: the edge-constant
            # factors (sign*mask*active_var, mask*active_var) are precomputed
            # once per local search by the caller, halving the gather matmuls
            # 2-D rhs: Mosaic's bf16 matmul path rejects a rank-1 rhs
            # ("rhs must be vector-like [B, K]"); insert the minor dim while
            # still f32 (minor-dim insertion is 32-bit-only), then cast
            # assign is [1, NP]: the dynamic window slice must ride the
            # lane dimension (Mosaic proves 128-multiples there; a 1-D
            # dim-0 slice would demand a full 1024-tile multiple)
            asg_g = jnp.dot(
                onehot,
                assign_ref[0, pl.ds(base, W)][:, None].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)[:, 0]

            em = em_ref[lo:lo + sub]
            dist = w_ref[lo:lo + sub] * asg_g
            deg = dm_ref[lo:lo + sub]

            u_oh = _uniform_onehot(sub, k).astype(jnp.bfloat16)  # [S,S/k]
            cred = jnp.dot(
                jnp.stack([dist, deg], axis=0).astype(jnp.bfloat16), u_oh,
                preferred_element_type=jnp.float32)
            csl = slice(lo // k, (lo + sub) // k)
            ac_t = ac_ref[0, csl]
            unsat = jnp.where(cred[0] == -cred[1], 1.0, 0.0) * ac_t

            # clause -> instance energy accumulate
            cbt = cb_ref[0, csl].astype(jnp.int32)
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (sub // k, IWIN), 1)
            oh_b = (cbt[:, None] == iota_b).astype(jnp.bfloat16)
            energy_ref[:, :] = energy_ref[:, :] + jnp.dot(
                unsat[None, :].astype(jnp.bfloat16), oh_b,
                preferred_element_type=jnp.float32)

            # clause levels back to the edges (same one-hot orientation)
            bc = jax.lax.dot_general(
                jnp.stack([cred[0], cred[1], unsat],
                          axis=0).astype(jnp.bfloat16), u_oh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            agg_e = bc[0] - dist
            critical = jnp.where(agg_e == 1.0 - bc[1], 1.0, 0.0) * em
            # deg (= mask*active_var) in place of the bare mask is exact
            # downstream: vred[1] is only ever read multiplied by the
            # node-level active_vars, which equals the per-edge av factor
            x = jnp.stack([critical * dist, bc[2] * deg], axis=0)
            sums = jnp.dot(x.astype(jnp.bfloat16), onehot,
                           preferred_element_type=jnp.float32)
            win_v = vred_ref[:, pl.ds(base, W)]
            vred_ref[:, pl.ds(base, W)] = win_v + sums

        # ---- selection + flip phase (all reductions final) -------------
        @pl.when(t == T - 1)
        def _():
            salt = seed_ref[0] + kk * jnp.int32(1000003)
            iota_bp = jax.lax.broadcasted_iota(
                jnp.int32, (B_pad, SELW), 0)
            unsat_bf = (energy_ref[0, :B_pad] > 0).astype(jnp.float32)

            # the window sweeps run as lax.fori_loop so the Mosaic stack
            # holds ONE window's [B_pad, SELW] temporaries at a time --
            # unrolled python loops allocate every window's temporaries
            # side by side and blow the 16MB scoped-vmem budget
            def window_vals(w):
                s0 = pl.multiple_of(w * SELW, SELW)
                sl = pl.ds(s0, SELW)
                seg = vb_ref[sl].astype(jnp.int32)
                valid = vmask_ref[sl] > 0
                d = vred_ref[0, sl]
                uv = vred_ref[1, sl] * av_ref[sl]
                gidx = (jax.lax.broadcasted_iota(jnp.int32, (SELW,), 0)
                        + w * SELW)
                vbest = jnp.where(valid, -d, -BIG)
                if eps < 0:
                    vrand = None
                else:
                    u = _hash01(gidx, salt)
                    vrand = jnp.where(
                        valid, u * (uv > 0).astype(jnp.float32), -BIG)
                segm = seg[None, :] == iota_bp
                return sl, seg, segm, gidx, vbest, vrand

            # pass 1: per-instance maxima
            def pass1(w, carry):
                maxb, maxr = carry
                _, _, segm, _, vbest, vrand = window_vals(w)
                mb = jnp.where(segm, vbest[None, :], -BIG)
                maxb = jnp.maximum(maxb, jnp.max(mb, axis=1))
                if eps >= 0:
                    mr = jnp.where(segm, vrand[None, :], -BIG)
                    maxr = jnp.maximum(maxr, jnp.max(mr, axis=1))
                return maxb, maxr

            maxb, maxr = jax.lax.fori_loop(
                0, n_w, pass1,
                (jnp.full((B_pad,), -BIG, jnp.float32),
                 jnp.full((B_pad,), -BIG, jnp.float32)))

            # pass 2: first index attaining the maximum
            def pass2(w, carry):
                idxb, idxr = carry
                _, _, segm, gidx, vbest, vrand = window_vals(w)
                gf = gidx.astype(jnp.float32)
                mm = jnp.logical_and(segm, vbest[None, :] == maxb[:, None])
                idxb = jnp.minimum(
                    idxb, jnp.min(jnp.where(mm, gf[None, :], BIG), axis=1))
                if eps >= 0:
                    mm2 = jnp.logical_and(segm,
                                          vrand[None, :] == maxr[:, None])
                    idxr = jnp.minimum(
                        idxr,
                        jnp.min(jnp.where(mm2, gf[None, :], BIG), axis=1))
                return idxb, idxr

            idxb, idxr = jax.lax.fori_loop(
                0, n_w, pass2,
                (jnp.full((B_pad,), BIG, jnp.float32),
                 jnp.full((B_pad,), BIG, jnp.float32)))

            if eps < 0:
                chosen = idxb
            else:
                coin = _hash01(
                    jax.lax.broadcasted_iota(jnp.int32, (B_pad,), 0),
                    salt ^ jnp.int32(0x5BD1E995))
                chosen = jnp.where(coin > eps, idxb, idxr)

            # flip: one variable per still-unsat instance
            def pass3(w, carry):
                sl, seg, _, gidx, _, _ = window_vals(w)
                oh = (seg[:, None]
                      == jax.lax.broadcasted_iota(
                          jnp.int32, (SELW, B_pad), 1)).astype(jnp.float32)
                per_var = jnp.dot(
                    oh, jnp.stack([chosen, unsat_bf], axis=1),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                flip = jnp.logical_and(
                    gidx.astype(jnp.float32) == per_var[:, 0],
                    per_var[:, 1] > 0).astype(jnp.float32)
                assign_ref[0, sl] = assign_ref[0, sl] * (1.0 - 2.0 * flip)
                return carry

            jax.lax.fori_loop(0, n_w, pass3, jnp.int32(0))

    return kernel


@functools.lru_cache(maxsize=None)
def _make_walksat_call(K, E_pad, NP, B_pad, k, tile, sub, eps, window,
                       interpret):
    T = E_pad // tile
    edge_spec = pl.BlockSpec((tile,), lambda kk, t: (t,))
    clause_spec = pl.BlockSpec((1, tile // k), lambda kk, t: (0, t))
    node_spec = pl.BlockSpec((NP,), lambda kk, t: (0,))

    node2_spec = pl.BlockSpec((1, NP), lambda kk, t: (0, 0))
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]          # seed
    in_specs += [edge_spec] * 4                                 # ids/sgn/m/em
    in_specs += [clause_spec] * 2                               # ac, cb
    in_specs += [node2_spec]                                    # a0 [1, NP]
    in_specs += [node_spec] * 3                                 # av/vm/vb

    out_specs = [node2_spec,
                 pl.BlockSpec((1, IWIN), lambda kk, t: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct((1, NP), jnp.float32),
                 jax.ShapeDtypeStruct((1, IWIN), jnp.float32)]

    kernel = _build_walksat(K, T, k, tile, sub, NP, B_pad, eps, window)
    return pl.pallas_call(
        kernel, grid=(K, T), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, NP), jnp.float32)],
        interpret=interpret)


def use_walksat_mega(batch) -> bool:
    from pdp_solver_tpu.ops.pallas_fused import use_fused_pass
    return bool(use_fused_pass(batch)
                and _pick_tiles(batch.clause_width) is not None
                and batch.clause_width > 0
                and batch.batch_size <= B_MAX
                and batch.num_vars <= V_MAX)


def walksat_edge_constants(batch, active_vars):
    """Edge-constant factors, computed ONCE per local search (XLA ops
    outside the while_loop): w = sign*mask*active_var scales the gathered
    assignment into the literal value, dm = mask*active_var is the active
    degree column."""
    av_e = active_vars[batch.edge_var]
    w = batch.edge_sign * batch.edge_mask * av_e
    dm = batch.edge_mask * av_e
    return w, dm


def walksat_block(assign, *, batch, active_vars, active_clauses, em,
                  K, seed, eps, edge_constants=None, interpret=False):
    """Run K WalkSAT iterations in one kernel launch.

    assign: f32[V] in {-1,+1}; seed: i32[1]; eps: static float (< 0 =
    pure greedy, used by the deterministic parity tests); edge_constants:
    optional precomputed walksat_edge_constants(batch, active_vars) --
    pass it when calling in a loop so the gather is not re-traced per
    block. Returns (new_assign f32[V], energy f32[B]) where energy is the
    per-instance unsat count of the assignment ENTERING the last
    iteration (the same lag the per-iteration loop's done flag has)."""
    k = batch.clause_width
    tile, sub = _pick_tiles(k)
    E = batch.edge_var.shape[0]
    E_pad = -(-E // tile) * tile
    V = batch.num_vars
    B = batch.batch_size
    B_pad = max(128, -(-B // 128) * 128)
    win = batch_var_window(batch)
    W_g = win or WINDOW
    NP = (-(-(V + W_g) // SELW)) * SELW

    def pad_e(x, fill):
        if E_pad == E:
            return x
        return jnp.concatenate([x, jnp.full((E_pad - E,), fill, x.dtype)])

    def pad_n(x, fill):
        return jnp.concatenate(
            [x.astype(jnp.float32),
             jnp.full((NP - V,), fill, jnp.float32)])

    rows = E_pad // k
    F = batch.num_clauses

    def pad_c(x, fill):
        x = x.astype(jnp.float32)
        if F >= rows:
            return x[:rows][None, :]
        return jnp.concatenate(
            [x, jnp.full((rows - F,), fill, jnp.float32)])[None, :]

    if edge_constants is None:
        edge_constants = walksat_edge_constants(batch, active_vars)
    w_col, dm_col = edge_constants
    args = [
        jnp.asarray(seed, jnp.int32).reshape((1,)),
        pad_e(batch.edge_var.astype(jnp.int32), batch.edge_var[-1]),
        pad_e(w_col.astype(jnp.float32), 0),
        pad_e(dm_col.astype(jnp.float32), 0),
        pad_e(em.astype(jnp.float32), 0),
        pad_c(active_clauses, 0),
        pad_c(batch.clause_batch, 0),
        pad_n(assign, 0)[None, :],
        pad_n(active_vars, 0),
        pad_n(batch.var_mask, 0),
        pad_n(batch.var_batch, B_pad),   # pad segment never matches
    ]
    call = _make_walksat_call(int(K), E_pad, NP, B_pad, k, tile, sub,
                              float(eps), int(win), bool(interpret))
    new_assign, energy = call(*args)
    return new_assign[0, :V], energy[0, :B]
