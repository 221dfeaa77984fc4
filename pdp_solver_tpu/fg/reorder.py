"""Community-major instance reordering: the pack-time locality pass.

Large modular / industrial CNFs break the windowed-kernel invariant
(fg/batch.py _windowed_ok): the reference's Community Attachment generator
permutes variables randomly (generators.py _communities), so any TILE of
clause-major edges touches variable ids spread over the whole instance and
every var-direction reduce falls back to XLA scatter — measured ~9 min per
n=10,000 instance at the 8800-iteration budget (docs/eval_modular_r3.json).

This module restores locality before packing:

  1. recover communities with synchronous label propagation over the
     variable co-occurrence graph (mode-of-neighbor-labels; converges in
     a few rounds on Community Attachment graphs and recovers the planted
     partition essentially exactly at the reference's q in [0.8, 0.9]);
  2. renumber variables community-major (community, then old id);
  3. sort clauses by their minimum renumbered variable, so consecutive
     edges reference nearby variable ids.

After the pass, ~95% of clauses span < 1024 renumbered ids, which is what
the hybrid based-window reduce (fg/batch.py _hybrid_var_meta +
ops/pallas_reduce.py windowed_segment_sum_cols_based) needs to take the
var-direction reduce off the scatter path. Reordering is semantically a
variable renaming + clause permutation: `restore_solution` maps solver
output back to the original numbering.
"""

import numpy as np


def community_labels(n, edge_var, edge_clause, rounds=12):
    """Label-propagation communities over the variable co-occurrence graph.

    Pairs: every variable of a clause is linked to the clause's first
    variable (a star per clause — enough signal for label propagation and
    only O(E) pairs). Returns i64[n] labels (not necessarily dense)."""
    ev = np.asarray(edge_var, np.int64)
    ec = np.asarray(edge_clause, np.int64)
    order = np.argsort(ec, kind="stable")
    ev_s, ec_s = ev[order], ec[order]
    first = np.r_[True, ec_s[1:] != ec_s[:-1]]
    # head variable of the owning clause, per edge
    head = ev_s[np.maximum.accumulate(np.where(first, np.arange(len(ev_s)),
                                               0))]
    keep = ev_s != head
    u = np.concatenate([ev_s[keep], head[keep]])
    v = np.concatenate([head[keep], ev_s[keep]])

    labels = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        lu = labels[v]
        o = np.lexsort((lu, u))
        su, sl = u[o], lu[o]
        new_run = np.r_[True, (su[1:] != su[:-1]) | (sl[1:] != sl[:-1])]
        run_node = su[new_run]
        run_label = sl[new_run]
        counts = np.diff(np.r_[np.flatnonzero(new_run), len(su)])
        # per node: the label with the highest count (ties -> smaller label)
        o2 = np.lexsort((run_label, -counts, run_node))
        sel = o2[np.r_[True, run_node[o2][1:] != run_node[o2][:-1]]]
        nl = labels.copy()
        nl[run_node[sel]] = run_label[sel]
        if (nl == labels).all():
            break
        labels = nl
    return labels


def reorder_instance(inst, rounds=12):
    """Community-major renumbering of one instance tuple.

    inst: (n, m, graph_map[2, E], edge_sign[E], label, *rest).
    Returns (inst2, var_order) where inst2 is the same formula with
    variables renumbered community-major and clauses sorted by minimum new
    variable id; var_order[i] = the ORIGINAL id of new variable i
    (see restore_solution)."""
    n, m = int(inst[0]), int(inst[1])
    gmap, signs = inst[2], np.asarray(inst[3], np.float32).reshape(-1)
    ev = np.asarray(gmap[0], np.int64)
    ec = np.asarray(gmap[1], np.int64)

    labels = community_labels(n, ev, ec, rounds=rounds)
    var_order = np.lexsort((np.arange(n), labels))   # new -> old
    rank = np.empty(n, np.int64)
    rank[var_order] = np.arange(n)                   # old -> new
    ev2 = rank[ev]

    # sort clauses by min renumbered variable; edges stay clause-major
    order_e = np.argsort(ec, kind="stable")
    ev_s, ec_s, sg_s = ev2[order_e], ec[order_e], signs[order_e]
    first = np.r_[True, ec_s[1:] != ec_s[:-1]]
    clause_start = np.flatnonzero(first)
    clause_end = np.r_[clause_start[1:], len(ec_s)]
    cmin = np.minimum.reduceat(ev_s, clause_start)
    corder = np.argsort(cmin, kind="stable")         # new clause order

    widths = clause_end - clause_start
    new_widths = widths[corder]
    # gather edge runs in the new clause order
    idx = np.concatenate([np.arange(clause_start[c], clause_end[c])
                          for c in corder]) if m else np.zeros(0, np.int64)
    new_ev = ev_s[idx].astype(np.int32)
    new_sg = sg_s[idx]
    new_ec = np.repeat(np.arange(m, dtype=np.int32), new_widths)

    inst2 = (n, m, np.stack([new_ev, new_ec]), new_sg) + tuple(inst[4:])
    return inst2, var_order


def reorder_instances(instances, rounds=12):
    """Reorder every instance; returns (instances2, var_orders)."""
    outs, orders = [], []
    for inst in instances:
        i2, vo = reorder_instance(inst, rounds=rounds)
        outs.append(i2)
        orders.append(vo)
    return outs, orders


def restore_solution(solution, var_order):
    """Map a solution over renumbered variables back to original ids."""
    sol = np.asarray(solution)
    out = np.empty_like(sol)
    out[var_order] = sol
    return out
