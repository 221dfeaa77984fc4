"""CNF simplification as on-device fixed points.

Reference: `SATProblem._propagate_single_clauses` (unit propagation,
src/pdp/nn/solver.py:228-273), `_peel` (pure-literal elimination,
solver.py:180-203) and `_set_variable_core` (solver.py:205-226). The reference
runs data-dependent Python while-loops with `.sum().item()`-style host syncs
per round; here each loop is a `lax.while_loop` whose condition is a scalar
reduction that never leaves the device.

All tensors are 1-D ([V], [F], [E], [B]); the caller owns 2-D lifting.
"""

import jax
import jax.numpy as jnp

from pdp_solver_tpu.fg.batch import FGBatch
from pdp_solver_tpu.modules.common import (
    scatter_to_vars, scatter_to_clauses, scatter_to_vars_cols,
    scatter_to_clauses_cols)
from pdp_solver_tpu.ops import segment_sum
from pdp_solver_tpu.problem.state import ProblemState


def set_variable_core(batch: FGBatch, state: ProblemState,
                      assignment: jnp.ndarray) -> ProblemState:
    """Fix variables to +-1 values; deactivate them and any clause they satisfy.

    Port of solver.py:205-226. `assignment` is f32[V] in {-1, 0, +1}; zero
    entries are untouched.
    """
    F = batch.num_clauses
    assignment = assignment * state.active_vars

    a_e = assignment[batch.edge_var] * batch.edge_mask
    # number of assigned inputs / signed evaluation per clause, one stacked
    # two-column reduction
    ie = scatter_to_clauses_cols(
        batch, (jnp.abs(a_e), batch.edge_sign * a_e))
    input_num = ie[0]
    clause_eval = ie[1]

    # a clause with at least one satisfying assigned literal is removed
    satisfied = (clause_eval > -input_num) & (state.active_clauses > 0)

    assigned = jnp.abs(assignment) == 1
    return state._replace(
        active_vars=jnp.where(assigned, 0.0, state.active_vars),
        active_clauses=jnp.where(satisfied, 0.0, state.active_clauses),
        solution=jnp.where(assigned, (assignment + 1.0) / 2.0, state.solution),
    )


def _unit_clauses(batch: FGBatch, state: ProblemState) -> jnp.ndarray:
    """f32[F] indicator of active clauses with exactly one active variable."""
    contrib = state.active_vars[batch.edge_var] * batch.edge_mask
    degree = scatter_to_clauses(batch, contrib)
    return (degree == 1).astype(jnp.float32) * state.active_clauses


def unit_propagate(batch: FGBatch, state: ProblemState) -> ProblemState:
    """Unit-clause propagation with conflict -> whole-instance UNSAT marking.

    Port of solver.py:228-273. On conflict the reference marks the instance
    UNSAT and deactivates its nodes; we deactivate whenever the instance has
    >= 1 conflicting variable (the reference's `== 1` test at solver.py:256-261
    silently skips deactivation when two conflicts land in the same round,
    which is a latent bug we do not copy - is_sat is set identically).
    """
    V, B = batch.num_vars, batch.batch_size

    def cond(carry):
        _, single = carry
        return jnp.sum(single) > 0

    def body(carry):
        state, single = carry
        s_e = single[batch.edge_clause] * batch.edge_mask
        ie = scatter_to_vars_cols(batch, (s_e, batch.edge_sign * s_e))
        input_num = ie[0]
        var_eval = ie[1]

        # conflicting variables are forced both ways by unit clauses
        conflict = ((jnp.abs(var_eval) != input_num).astype(jnp.float32)
                    * state.active_vars)
        unsat_count = segment_sum(conflict, batch.var_batch, B,
                                  indices_are_sorted=True)
        unsat_b = unsat_count >= 1
        is_sat = jnp.where(unsat_b, 0.0, state.is_sat)
        active_vars = jnp.where(unsat_b[batch.var_batch], 0.0,
                                state.active_vars)
        active_clauses = jnp.where(unsat_b[batch.clause_batch], 0.0,
                                   state.active_clauses)

        # forced assignments (uses post-conflict active mask, solver.py:264)
        assigned = ((jnp.abs(var_eval) == input_num).astype(jnp.float32)
                    * active_vars)
        assignment = jnp.sign(var_eval) * assigned

        # unit clauses themselves are consumed (solver.py:270)
        active_clauses = jnp.where(single > 0, 0.0, active_clauses)

        state = state._replace(active_vars=active_vars,
                               active_clauses=active_clauses,
                               is_sat=is_sat)
        state = set_variable_core(batch, state, assignment)
        return state, _unit_clauses(batch, state)

    state, _ = jax.lax.while_loop(cond, body, (state, _unit_clauses(batch, state)))
    return state


def peel(batch: FGBatch, state: ProblemState) -> ProblemState:
    """Iteratively remove pure-literal (and isolated) variables.

    Port of solver.py:180-203: a variable whose active degree equals the
    absolute signed degree occurs with a single polarity (or not at all); it
    can be fixed to that polarity, satisfying (removing) all its clauses.
    Degrees are updated incrementally exactly like the reference.
    """
    V, F = batch.num_vars, batch.num_clauses
    e_clause_active = state.active_clauses[batch.edge_clause] * batch.edge_mask
    ds = scatter_to_vars_cols(
        batch, (e_clause_active, batch.edge_sign * e_clause_active))
    degree = ds[0]
    signed_degree = ds[1]

    def pure_vars(state, degree, signed_degree):
        return ((degree == jnp.abs(signed_degree)).astype(jnp.float32)
                * state.active_vars)

    def cond(carry):
        state, degree, signed_degree = carry
        return jnp.sum(pure_vars(state, degree, signed_degree)) > 0

    def body(carry):
        state, degree, signed_degree = carry
        single_v = pure_vars(state, degree, signed_degree)

        touched = scatter_to_clauses(
            batch, single_v[batch.edge_var] * batch.edge_mask)
        single_f = (touched > 0).astype(jnp.float32) * state.active_clauses

        f_e = single_f[batch.edge_clause] * batch.edge_mask
        dd = scatter_to_vars_cols(batch, (f_e, batch.edge_sign * f_e))
        delta = dd[0] * state.active_vars
        signed_delta = dd[1] * state.active_vars

        solution = jnp.where(
            single_v == 1,
            (jnp.sign(signed_degree) + 1.0) / 2.0,
            state.solution)

        state = state._replace(
            solution=solution,
            active_vars=jnp.where(single_v == 1, 0.0, state.active_vars),
            active_clauses=jnp.where(single_f == 1, 0.0, state.active_clauses))
        return state, degree - delta, signed_degree - signed_delta

    state, _, _ = jax.lax.while_loop(cond, body, (state, degree, signed_degree))
    return state


def simplify(batch: FGBatch, state: ProblemState) -> ProblemState:
    """Unit propagation followed by peeling (solver.py:281-285)."""
    return peel(batch, unit_propagate(batch, state))


def set_variables(batch: FGBatch, state: ProblemState,
                  assignment: jnp.ndarray) -> ProblemState:
    """Fix variables then re-simplify (solver.py:275-279) - the decimation step."""
    return simplify(batch, set_variable_core(batch, state, assignment))


# --------------------------------------------------------------------------
# Fused simplification: one fixed-point loop, two reduces per round
# --------------------------------------------------------------------------
#
# The reference (and the port above) runs three separate passes per
# decimation - satisfied-clause removal (set_variable_core), a unit-prop
# while-loop, then a peel while-loop - each with its own reduces. On the
# kernel-count-bound TPU that is ~15+ ops per simplify round. The fused
# loop below reaches the same fixed point with ONE clause-direction reduce
# and ONE variable-direction reduce per round:
#
#   phase C (edges -> clauses, [E,2]): active-variable degree + count of
#       true assigned literals; removes satisfied clauses, detects units.
#   phase V (edges -> vars, [E,4]): unit forcing (input_num / var_eval)
#       and pure-literal degrees (degree / signed_degree); applies forced
#       and pure assignments, detects conflicts.
#
# Equivalence with unit_propagate+peel (verified by tests/test_simplify.py
# fused-parity tests): pure assignments only ever satisfy clauses, so they
# cannot create units or conflicts, and a variable that is both unit-forced
# and pure receives the same sign either way (a forcing unit clause is an
# active occurrence of the forced polarity, so the pure polarity matches).
# Satisfied-clause removal via the solution invariant replaces the
# reference's delta-based check: an active clause never contains a true
# assigned literal, so testing all assigned literals each round (instead of
# only the newly assigned ones) removes exactly the same clauses.


def _phase_c_f(gathered, edge_vals):
    """Edge elementwise of the fused round's clause-direction pass.

    All compares branch to f32 operands - Mosaic cannot select between i1
    vectors ("unsupported target bitwidth for truncation")."""
    av_e, sol_e = gathered
    sign, mask = edge_vals
    pos_true = jnp.where(sol_e >= 1.0, 1.0, 0.0)
    neg_true = jnp.where(sol_e <= 0.0, 1.0, 0.0)
    lit_true = jnp.where(sign > 0, pos_true, neg_true)
    assigned = jnp.where(av_e <= 0, 1.0, 0.0)
    return (av_e * mask, lit_true * assigned * mask), ()


def _phase_v_f(gathered, edge_vals):
    """Edge elementwise of the fused round's variable-direction pass."""
    single_e, ac_e = gathered
    sign, mask = edge_vals
    s_e = single_e * mask
    c_e = ac_e * mask
    return (s_e, sign * s_e, c_e, sign * c_e), ()


# chained single-launch round (uniform clause width): phase C reduced
# tile-locally, clause update computed at clause level, broadcast back and
# reduced to vars - one kernel instead of two
def _sround_f1(gathered, edge_vals):
    av_e, sol_e = gathered
    sign, mask = edge_vals
    pos_true = jnp.where(sol_e >= 1.0, 1.0, 0.0)
    neg_true = jnp.where(sol_e <= 0.0, 1.0, 0.0)
    lit_true = jnp.where(sign > 0, pos_true, neg_true)
    assigned = jnp.where(av_e <= 0, 1.0, 0.0)
    return (av_e * mask, lit_true * assigned * mask)


def _sround_f2(cred, clause_vals):
    degree_f, sat_f = cred
    (ac,) = clause_vals
    ac2 = jnp.where(sat_f > 0, 0.0, ac)
    single_f = jnp.where(degree_f == 1.0, 1.0, 0.0) * ac2
    return (ac2,), (ac2, single_f)


def _sround_f3(bcast, gathered, edge_vals):
    ac_e, single_e = bcast
    sign, mask = edge_vals
    s_e = single_e * mask
    c_e = ac_e * mask
    return (s_e, sign * s_e, c_e, sign * c_e), ()


def _use_fused_kernel(batch: FGBatch) -> bool:
    from pdp_solver_tpu.ops.pallas_fused import use_fused_pass
    return use_fused_pass(batch)


def _fused_round(batch: FGBatch, state: ProblemState):
    """One combined unit-prop + peel + satisfied-removal round."""
    use_kernel = _use_fused_kernel(batch)

    from pdp_solver_tpu.ops.pallas_fused import use_chained_pass
    if use_kernel and use_chained_pass(batch):
        from pdp_solver_tpu.ops.pallas_fused import (
            batch_var_window, chained_edge_pass)
        cout, vd, _ = chained_edge_pass(
            _sround_f1, _sround_f2, _sround_f3,
            node_cols=(state.active_vars, state.solution),
            gather_ids=batch.edge_var,
            clause_cols=(state.active_clauses,),
            edge_cols=(batch.edge_sign, batch.edge_mask),
            clause_width=batch.clause_width,
            num_clauses=batch.num_clauses,
            num_segments=batch.num_vars,
            n_cred=2, n_cout=1, n_bcast=2, n_vred=4,
            window=batch_var_window(batch),
            interpret=jax.default_backend() != "tpu")
        active_clauses = cout[0]
        removed_any = jnp.sum(state.active_clauses - active_clauses)
        return _fused_round_tail(
            batch, state, active_clauses, removed_any,
            vd[0], vd[1], vd[2], vd[3])

    # ---- phase C: edges -> clauses ------------------------------------
    if use_kernel:
        from pdp_solver_tpu.ops.pallas_fused import (
            batch_var_window, fused_edge_pass)
        cd, _ = fused_edge_pass(
            _phase_c_f,
            node_cols=(state.active_vars, state.solution),
            gather_ids=batch.edge_var,
            edge_cols=(batch.edge_sign, batch.edge_mask),
            reduce_ids=batch.edge_clause,
            reduce_uniform=batch.clause_width,
            num_segments=batch.num_clauses, n_red=2,
            window=batch_var_window(batch),
            interpret=jax.default_backend() != "tpu")
    else:
        av_e = state.active_vars[batch.edge_var]
        sol_e = state.solution[batch.edge_var]
        # literal true under an *assigned* variable (solution exactly 0 or
        # 1; active variables hold 0.5 or merged predictions, never counted)
        lit_true = jnp.where(batch.edge_sign > 0, sol_e >= 1.0, sol_e <= 0.0)
        assigned_true = (lit_true & (av_e <= 0)).astype(jnp.float32)
        cd = scatter_to_clauses_cols(batch, (av_e, assigned_true))
    degree_f = cd[0]
    sat_f = cd[1]

    active_clauses = jnp.where(sat_f > 0, 0.0, state.active_clauses)
    removed_any = jnp.sum(state.active_clauses - active_clauses)
    single_f = (degree_f == 1).astype(jnp.float32) * active_clauses

    # ---- phase V: edges -> vars ---------------------------------------
    if use_kernel:
        from pdp_solver_tpu.ops.pallas_fused import (
            batch_var_window, fused_edge_pass)
        vd, _ = fused_edge_pass(
            _phase_v_f,
            node_cols=(single_f, active_clauses),
            gather_ids=batch.edge_clause,
            gather_uniform=batch.clause_width,
            edge_cols=(batch.edge_sign, batch.edge_mask),
            reduce_ids=batch.edge_var,
            num_segments=batch.num_vars, n_red=4,
            window=batch_var_window(batch),
            interpret=jax.default_backend() != "tpu")
    else:
        s_e = single_f[batch.edge_clause] * batch.edge_mask
        c_e = active_clauses[batch.edge_clause] * batch.edge_mask
        vd = scatter_to_vars_cols(
            batch, (s_e, batch.edge_sign * s_e, c_e, batch.edge_sign * c_e))
    return _fused_round_tail(batch, state, active_clauses, removed_any,
                             vd[0], vd[1], vd[2], vd[3])


def _fused_round_tail(batch, state, active_clauses, removed_any,
                      input_num, var_eval, degree_v, signed_degree_v):
    """Node-level conclusion of a fused round (shared by the chained and
    two-pass kernels): conflicts, unit forcing, pure literals."""
    B = batch.batch_size

    # conflicts: a variable forced both ways by unit clauses marks its
    # whole instance UNSAT (solver.py:247-261; >=1 conflict deactivates,
    # not ==1 - see unit_propagate above)
    conflict = ((jnp.abs(var_eval) != input_num).astype(jnp.float32)
                * state.active_vars)
    unsat_b = segment_sum(conflict, batch.var_batch, B,
                          indices_are_sorted=True) >= 1
    is_sat = jnp.where(unsat_b, 0.0, state.is_sat)
    active_vars = jnp.where(unsat_b[batch.var_batch], 0.0,
                            state.active_vars)
    active_clauses = jnp.where(unsat_b[batch.clause_batch], 0.0,
                               active_clauses)

    # unit forcing (post-conflict mask, solver.py:264)
    forced = ((input_num > 0) & (jnp.abs(var_eval) == input_num))
    forced = forced.astype(jnp.float32) * active_vars
    # pure literals incl. isolated variables (peel above)
    pure = (degree_v == jnp.abs(signed_degree_v)).astype(jnp.float32) \
        * active_vars * (1.0 - forced)

    value = forced * jnp.sign(var_eval) + pure * jnp.sign(signed_degree_v)
    fixed = jnp.maximum(forced, pure * (degree_v > 0)) * (jnp.abs(value) > 0)
    # isolated pure variables (degree 0) deactivate without a value write,
    # exactly like peel's (sign(0)+1)/2 = 0.5
    deactivate = jnp.maximum(forced * (jnp.abs(value) > 0), pure)

    solution = jnp.where(fixed > 0, (value + 1.0) / 2.0, state.solution)
    active_vars = jnp.where(deactivate > 0, 0.0, active_vars)

    new_state = ProblemState(active_vars=active_vars,
                             active_clauses=active_clauses,
                             solution=solution, is_sat=is_sat)
    changed = (removed_any + jnp.sum(deactivate)
               + jnp.sum(unsat_b.astype(jnp.float32))) > 0
    return new_state, changed


def fused_simplify(batch: FGBatch, state: ProblemState,
                   max_rounds: int = 0) -> ProblemState:
    """Simplify to the unit-prop + peel fixed point in one while_loop.

    max_rounds > 0 caps the fixed point ("lazy simplification"): each
    combined round is a full edge pass, and deep unit-propagation cascades
    after a decimation are the single largest per-iteration cost in the
    solve loop. A capped simplify is still CORRECT — it only defers
    propagation: round 1 always removes the clauses satisfied by the new
    assignment, and any remaining units/pure literals are recomputed from
    scratch by the next simplify call (the fixed point is idempotent and
    monotone — active sets only shrink, forced values never change).
    Verification reads the solution, so deferral can never create a false
    "solved"; it can only delay conflict detection by an iteration.
    0 = run to the fixed point (reference semantics, the default)."""

    def cond(carry):
        _, changed, rounds = carry
        if max_rounds > 0:
            return jnp.logical_and(changed, rounds < max_rounds)
        return changed

    def body(carry):
        state, _, rounds = carry
        state, changed = _fused_round(batch, state)
        return state, changed, rounds + 1

    state, _, _ = jax.lax.while_loop(
        cond, body, (state, jnp.sum(batch.edge_mask) >= 0,
                     jnp.zeros((), jnp.int32)))
    return state


def fused_set_variables(batch: FGBatch, state: ProblemState,
                        assignment: jnp.ndarray,
                        max_rounds: int = 0) -> ProblemState:
    """Decimation step via the fused loop: write the assignment, deactivate
    the variables, and let the first fused round remove the satisfied
    clauses (subsumes set_variable_core's delta-based satisfied check)."""
    assignment = assignment * state.active_vars
    assigned = jnp.abs(assignment) == 1
    state = state._replace(
        active_vars=jnp.where(assigned, 0.0, state.active_vars),
        solution=jnp.where(assigned, (assignment + 1.0) / 2.0,
                           state.solution))
    return fused_simplify(batch, state, max_rounds=max_rounds)
