"""Fused edge pass: gather -> edge elementwise -> reduce in ONE kernel.

The building block behind the solver's hot loops. On the target chip every
separate XLA op over an [E]-sized array costs ~1-8 ms at E=524k (node->edge
gathers worst: ~4 ms unsorted, ~8 ms sorted), so a graph sweep expressed as
~8 XLA ops pays ~8 HBM round-trips. This kernel runs the entire pattern

    g_c[e]   = node_cols[c][ids_g[e]]          (gather)
    outs     = f(gathered, edge_cols, sign...) (arbitrary elementwise)
    red[c,n] = sum over e with ids_r[e] == n   (reduce)
    edge_out = per-edge results

in a single pass over edge tiles with everything resident in VMEM.

Two mechanisms per side, chosen by the caller:

* windowed (any ids satisfying the pack-time invariant - every TILE-slab
  spans < WINDOW - ALIGN ids, FGBatch.fast_var/fast_clause): a [SUB,
  WINDOW] one-hot of the ids against an aligned window of the resident
  node array, contracted on the MXU. Exact, but the one-hot build itself
  is the dominant VPU cost (~1M lane-ops per sub-tile).

* uniform (clause-major uniform-k sides, FGBatch.clause_width > 0, where
  ids[e] = e // k for real edges): no ids at all - node rows are blocked
  [1, TILE/k] per grid step with fully static indexing, and the
  gather/reduce contracts a CONSTANT [SUB, SUB/k] one-hot (16x fewer
  lane-ops than windowed). Padding edges read garbage rows, so every
  f MUST mask its reduce columns and treat padding edge outputs as
  meaningless (all callers do - padding edges are masked everywhere).

Inference-path only - no custom VJP; training paths keep the
differentiable reduce ops (ops/pallas_reduce*.py carry VJPs).

Reference equivalence: each pass computes mask-matrix products of
src/pdp/nn/solver.py:151-178 fused with their surrounding elementwise ops.
"""

import contextlib
import functools
import os
import threading

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ALIGN = 1024
WINDOW = 2048

_STATE = threading.local()


def _win_geom(window):
    """(W, A) one-hot window geometry. `window` in {0, 512, 1024, 2048};
    0 = the default 2048. The window base is aligned down to A = W/2, so
    correctness needs every sub-tile id span <= W - A = W/2 — verified at
    pack time (FGBatch.var_window) for the var direction. The one-hot
    build and both of its MXU streams scale linearly with W."""
    W = int(window) or WINDOW
    return W, W // 2


def batch_var_window(batch) -> int:
    """The verified var-direction window for this batch (0 = default 2048).

    Pass as `window=` to fused/chained passes whose every WINDOWED side
    (gather AND reduce ids) is the var direction (batch.edge_var). Gated on
    the uniform clause layout: with clause_width supported, the clause
    sides of every fast-path call ride the uniform one-hot, so the var
    direction is the only windowed machinery left. PDP_VAR_WINDOW=off
    disables (falls back to the 2048 window everywhere)."""
    if os.environ.get("PDP_VAR_WINDOW", "auto") == "off":
        return 0
    k = getattr(batch, "clause_width", 0)
    if not k or _pick_tiles(k) is None:
        return 0
    w = int(getattr(batch, "var_window", 0) or 0)
    return w if w in (512, 1024) else 0


@contextlib.contextmanager
def training_mode():
    """Disable the no-VJP fused passes for the enclosed trace.

    The fused kernels carry no differentiation rule; solver.forward enters
    this context when is_training=True so gradient paths (p-nd-np / np-d-np
    classical sweeps fed by neural state) fall back to the differentiable
    ops instead of crashing in jax.grad. is_training is a static Python
    bool, so the decision is baked per-trace."""
    prev = getattr(_STATE, "training", False)
    _STATE.training = True
    try:
        yield
    finally:
        _STATE.training = prev


def use_fused_pass(batch) -> bool:
    """Single gate for the no-VJP fused edge passes (PDP_FUSED_PASS env:
    auto|on|off). 'on' forces the kernel off-TPU (interpret-testable) but
    still requires the pack-time windowed invariants - forcing it past
    fast_var/fast_clause would silently drop out-of-window ids."""
    if getattr(_STATE, "training", False):
        return False
    mode = os.environ.get("PDP_FUSED_PASS", "auto")
    if mode == "off":
        return False
    if mode == "on":
        return bool(batch.fast_var and batch.fast_clause)
    return bool(batch.fast_var and batch.fast_clause
                and jax.default_backend() == "tpu")

# (TILE, SUB) per uniform clause width k. TILE must be a multiple of 1024
# (1-D i32 block constraint) with TILE/k a multiple of 128 (2-D minor-dim
# blocks for the uniform side); SUB bounds each windowed one-hot at ~4-7MB.
_TILES = {0: (1024, 512), 2: (1024, 512), 4: (1024, 512), 8: (1024, 512),
          3: (3072, 384), 5: (5120, 640), 6: (3072, 768), 7: (7168, 896)}


def _pick_tiles(k):
    return _TILES.get(k)


def _gather_windowed(sub_ids, node_refs, sub, W=WINDOW, A=ALIGN):
    """One-hot windowed gather of each node ref at SUB edge ids.

    Node refs are [1, N] 2-D: the dynamic window slice rides the minor
    (lane) dimension, where Mosaic only needs a 128-multiple base — a 1-D
    ref's dimension-0 slice must prove a full 1024 (8x128) tile multiple,
    which the sub-2048 windows' W/2-aligned bases cannot."""
    base = (jnp.min(sub_ids) // A) * A
    base = pl.multiple_of(base, A)
    rel = sub_ids - base
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (sub, W), 1)
    onehot = (rel[:, None] == col_iota).astype(jnp.float32)
    win = jnp.stack([r[0, pl.ds(base, W)] for r in node_refs], axis=0)
    # [C, W] x [W, S] on the MXU; HIGHEST keeps f32 exact (the default
    # path rounds operands to bf16)
    g = jax.lax.dot_general(
        win, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return tuple(g[c] for c in range(len(node_refs)))


def _uniform_onehot(sub, k):
    """Constant [SUB, SUB/k] one-hot: edge t belongs to local clause t//k."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (sub, sub // k), 0) // k
    cols = jax.lax.broadcasted_iota(jnp.int32, (sub, sub // k), 1)
    return (rows == cols).astype(jnp.float32)


def _gather_uniform(node_refs, lo, sub, k):
    """Broadcast node rows [lo/k, (lo+SUB)/k) to their k edges each.

    node refs are [1, TILE/k] blocks (static indexing, no ids)."""
    sl = slice(lo // k, (lo + sub) // k)
    win = jnp.stack([r[0, sl] for r in node_refs], axis=0)   # [C, S/k]
    onehot = _uniform_onehot(sub, k)                         # [S, S/k]
    g = jax.lax.dot_general(
        win, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return tuple(g[c] for c in range(len(node_refs)))


def _build(f, n_node, n_node2, n_edge, n_red, n_eout,
           gk, g2k, rk, tile, sub, window=0):
    """gk/g2k/rk: uniform clause width per side (0 = windowed ids)."""
    W, A = _win_geom(window)

    def kernel(*refs):
        it = iter(refs)
        ids_g_ref = next(it) if (n_node and not gk) else None
        ids_g2_ref = next(it) if (n_node2 and not g2k) else None
        ids_r_ref = next(it) if (n_red and not rk) else None
        node_refs = [next(it) for _ in range(n_node)]
        node2_refs = [next(it) for _ in range(n_node2)]
        edge_refs = [next(it) for _ in range(n_edge)]
        red_ref = next(it) if n_red else None
        eout_refs = [next(it) for _ in range(n_eout)]

        step = pl.program_id(0)

        if n_red and not rk:
            @pl.when(step == 0)
            def _():
                red_ref[:] = jnp.zeros_like(red_ref)

        for s in range(tile // sub):
            lo = s * sub
            gathered = ()
            if n_node:
                gathered += (_gather_uniform(node_refs, lo, sub, gk) if gk
                             else _gather_windowed(ids_g_ref[lo:lo + sub],
                                                   node_refs, sub, W, A))
            if n_node2:
                gathered += (_gather_uniform(node2_refs, lo, sub, g2k)
                             if g2k
                             else _gather_windowed(ids_g2_ref[lo:lo + sub],
                                                   node2_refs, sub, W, A))

            edge_vals = tuple(r[lo:lo + sub] for r in edge_refs)
            red_cols, eouts = f(gathered, edge_vals)

            if n_red:
                x = jnp.stack(red_cols, axis=0)              # [Cr, S]
                if rk:
                    # each clause's k edges live inside this sub-tile:
                    # write the complete [Cr, S/k] block, no accumulation
                    sums = jnp.dot(x, _uniform_onehot(sub, rk),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
                    red_ref[:, lo // rk:(lo + sub) // rk] = sums
                else:
                    ids_r = ids_r_ref[lo:lo + sub]
                    base_r = (jnp.min(ids_r) // A) * A
                    base_r = pl.multiple_of(base_r, A)
                    rel_r = ids_r - base_r
                    col_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (sub, W), 1)
                    onehot_r = (rel_r[:, None] == col_iota) \
                        .astype(jnp.float32)
                    sums = jnp.dot(x, onehot_r,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
                    win_r = red_ref[:, pl.ds(base_r, W)]
                    red_ref[:, pl.ds(base_r, W)] = win_r + sums

            for r, v in zip(eout_refs, eouts):
                r[lo:lo + sub] = v

    return kernel


@functools.lru_cache(maxsize=None)
def _make_call(f, E_pad, n_node, node_shapes, n_node2, node2_shapes,
               n_edge, n_red, num_segments, n_eout,
               gk, g2k, rk, tile, sub, window, interpret):
    W, A = _win_geom(window)
    grid = E_pad // tile
    edge_spec = pl.BlockSpec((tile,), lambda i: (i,))

    def node_specs(shapes, uk):
        if uk:
            # [1, E_pad/k] rows blocked [1, tile/k] per grid step
            return [pl.BlockSpec((1, tile // uk), lambda i: (0, i))
                    for _ in shapes]
        # [1, N] 2-D so window slices ride the lane dimension (see
        # _gather_windowed)
        return [pl.BlockSpec((1, s), lambda i: (0, 0)) for s in shapes]

    in_specs = []
    if n_node and not gk:
        in_specs.append(edge_spec)
    if n_node2 and not g2k:
        in_specs.append(edge_spec)
    if n_red and not rk:
        in_specs.append(edge_spec)
    in_specs += node_specs(node_shapes, gk)
    in_specs += node_specs(node2_shapes, g2k)
    in_specs += [edge_spec] * n_edge

    out_specs, out_shape = [], []
    if n_red:
        if rk:
            rows = E_pad // rk
            out_specs.append(
                pl.BlockSpec((n_red, tile // rk), lambda i: (0, i)))
            out_shape.append(
                jax.ShapeDtypeStruct((n_red, rows), jnp.float32))
        else:
            N_pad = -(-num_segments // A) * A + W
            out_specs.append(pl.BlockSpec((n_red, N_pad),
                                          lambda i: (0, 0)))
            out_shape.append(
                jax.ShapeDtypeStruct((n_red, N_pad), jnp.float32))
    out_specs += [edge_spec] * n_eout
    out_shape += [jax.ShapeDtypeStruct((E_pad,), jnp.float32)] * n_eout

    kernel = _build(f, n_node, n_node2, n_edge, n_red, n_eout,
                    gk, g2k, rk, tile, sub, window)
    return pl.pallas_call(kernel, grid=(grid,), in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shape,
                          interpret=interpret)


IWIN = 2048  # instance-reduce window: num_instances must fit one window


def _build_chained(f1, f2, f3, n_node, n_cl, n_edge,
                   n_cred, n_cout, n_bcast, n_vred, n_eout, n_ired,
                   k, tile, sub, window=0):
    """Kernel for chained_edge_pass: both graph directions in one launch."""
    W, A = _win_geom(window)

    def kernel(*refs):
        it = iter(refs)
        ids_ref = next(it)
        node_refs = [next(it) for _ in range(n_node)]
        clause_refs = [next(it) for _ in range(n_cl)]
        cb_ref = next(it) if n_ired else None
        edge_refs = [next(it) for _ in range(n_edge)]
        cout_ref = next(it) if n_cout else None
        vred_ref = next(it) if n_vred else None
        ired_ref = next(it) if n_ired else None
        eout_refs = [next(it) for _ in range(n_eout)]

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            if n_vred:
                vred_ref[:] = jnp.zeros_like(vred_ref)
            if n_ired:
                ired_ref[:] = jnp.zeros_like(ired_ref)

        for s in range(tile // sub):
            lo = s * sub
            sub_ids = ids_ref[lo:lo + sub]
            base = (jnp.min(sub_ids) // A) * A
            base = pl.multiple_of(base, A)
            rel = sub_ids - base
            col_iota = jax.lax.broadcasted_iota(jnp.int32, (sub, W), 1)
            # ONE [S, W] one-hot per sub-tile, used in the SAME orientation
            # by the gather (mat-vec) and the reduce (mat-mat): contracting
            # its transpose instead makes Mosaic materialise a second 4MB
            # copy per sub-tile and the kernel blows the 16MB VMEM budget
            onehot = (rel[:, None] == col_iota).astype(jnp.float32)

            gathered = tuple(
                jnp.dot(onehot, r[0, pl.ds(base, W)],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                for r in node_refs)   # node refs are [1, N] (lane windows)
            edge_vals = tuple(r[lo:lo + sub] for r in edge_refs)

            # edges -> clauses, tile-local (uniform k)
            cred_cols = f1(gathered, edge_vals)
            u_onehot = _uniform_onehot(sub, k)               # [S, S/k]
            cred = jnp.dot(jnp.stack(cred_cols, axis=0), u_onehot,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            cred = tuple(cred[c] for c in range(n_cred))

            csl = slice(lo // k, (lo + sub) // k)
            clause_vals = tuple(r[0, csl] for r in clause_refs)

            # clause-level compute; bcast cols return to the edges in-tile
            fout = f2(cred, clause_vals)
            cout_cols, bcast_cols = fout[0], fout[1]
            ired_cols = fout[2] if n_ired else ()
            if n_cout:
                cout_ref[:, csl] = jnp.stack(cout_cols, axis=0)

            if n_ired:
                # clause -> instance accumulate; instance ids fit a single
                # static window (num_instances <= IWIN, checked by caller)
                cb = cb_ref[0, csl].astype(jnp.int32)
                iota_b = jax.lax.broadcasted_iota(
                    jnp.int32, (sub // k, IWIN), 1)
                onehot_b = (cb[:, None] == iota_b).astype(jnp.float32)
                y = jnp.stack(ired_cols, axis=0)
                ired_ref[:, :] = ired_ref[:, :] + jnp.dot(
                    y, onehot_b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

            if n_vred or n_eout:
                bc = jax.lax.dot_general(
                    jnp.stack(bcast_cols, axis=0), u_onehot,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                bcast_edges = tuple(bc[c] for c in range(n_bcast))

                # edges -> vars, windowed accumulate (same one-hot, same
                # orientation)
                vred_cols, eouts = f3(bcast_edges, gathered, edge_vals)
                if n_vred:
                    x = jnp.stack(vred_cols, axis=0)
                    sums = jnp.dot(x, onehot,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
                    win_v = vred_ref[:, pl.ds(base, W)]
                    vred_ref[:, pl.ds(base, W)] = win_v + sums

                for r, v in zip(eout_refs, eouts):
                    r[lo:lo + sub] = v

    return kernel


@functools.lru_cache(maxsize=None)
def _make_chained_call(f1, f2, f3, E_pad, n_node, node_shapes,
                       n_cl, n_edge, n_cred, n_cout, n_bcast,
                       n_vred, n_eout, n_ired, num_vars, k, tile, sub,
                       window, interpret):
    W, A = _win_geom(window)
    grid = E_pad // tile
    edge_spec = pl.BlockSpec((tile,), lambda i: (i,))
    rows = E_pad // k
    clause_spec = pl.BlockSpec((1, tile // k), lambda i: (0, i))

    in_specs = [edge_spec]
    in_specs += [pl.BlockSpec((1, s), lambda i: (0, 0))
                 for s in node_shapes]
    in_specs += [clause_spec for _ in range(n_cl)]
    if n_ired:
        in_specs.append(clause_spec)
    in_specs += [edge_spec] * n_edge

    out_specs, out_shape = [], []
    if n_cout:
        out_specs.append(pl.BlockSpec((n_cout, tile // k), lambda i: (0, i)))
        out_shape.append(jax.ShapeDtypeStruct((n_cout, rows), jnp.float32))
    if n_vred:
        N_pad = -(-num_vars // A) * A + W
        out_specs.append(pl.BlockSpec((n_vred, N_pad), lambda i: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((n_vred, N_pad), jnp.float32))
    if n_ired:
        out_specs.append(pl.BlockSpec((n_ired, IWIN), lambda i: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((n_ired, IWIN), jnp.float32))
    out_specs += [edge_spec] * n_eout
    out_shape += [jax.ShapeDtypeStruct((E_pad,), jnp.float32)] * n_eout

    kernel = _build_chained(f1, f2, f3, n_node, n_cl, n_edge,
                            n_cred, n_cout, n_bcast, n_vred, n_eout, n_ired,
                            k, tile, sub, window)
    return pl.pallas_call(kernel, grid=(grid,), in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shape,
                          interpret=interpret)


def use_chained_pass(batch) -> bool:
    """Chained passes additionally need the uniform clause layout (the
    clause reduce must be tile-local)."""
    return bool(use_fused_pass(batch)
                and _pick_tiles(batch.clause_width) is not None
                and batch.clause_width > 0)


def chained_edge_pass(f1, f2, f3, *, node_cols, gather_ids, clause_cols=(),
                      edge_cols=(), clause_width, num_clauses,
                      num_segments, n_cred, n_cout, n_bcast, n_vred,
                      n_eout=0, n_ired=0, clause_batch=None,
                      num_instances=0, window=0, interpret=False):
    """Both graph directions of a clause-direction -> var-direction chain in
    ONE kernel launch (uniform clause width k only: every clause's k edges
    sit inside one sub-tile, so the clause reduce is tile-local and the
    clause-level result can be broadcast straight back to its edges).

        f1(gathered_nodes, edge_vals) -> n_cred edge reduce columns
        f2(clause_reduced, clause_vals) -> (n_cout out cols, n_bcast cols)
            or, when n_ired: (cout cols, bcast cols, n_ired instance cols)
        f3(bcast_edge_vals, gathered_nodes, edge_vals)
            -> (n_vred var reduce columns, n_eout edge outputs)
            (skipped entirely when n_vred == n_eout == 0; pass f3=None)

    When n_ired > 0, f2's third tuple is clause-level columns summed per
    instance via `clause_batch` (i32[num_clauses] instance ids); requires
    num_instances <= IWIN and f2 to zero its instance columns on padded
    clauses (pad ids are 0, so unmasked padding would pollute instance 0).

    All f* must be module-level (compile-cache keys) and mask by the edge
    mask where reductions must ignore padding. node_cols are gathered (and
    the n_vred columns reduced) via gather_ids under the windowed invariant
    (batch.fast_var); clause_cols are [F] arrays in the uniform layout.

    Returns (clause_out [n_cout, num_clauses] or None,
             var_out [n_vred, num_segments], eouts).

    Replaces chains like simplify's phase C + phase V or WalkSAT's
    clause-energy + break-count passes (two launches -> one) on a device
    with a multi-ms per-launch floor."""
    k = clause_width
    tile, sub = _pick_tiles(k)
    E = gather_ids.shape[0]
    E_pad = -(-E // tile) * tile

    def pad_e(x, fill):
        if E_pad == E:
            return x
        return jnp.concatenate([x, jnp.full((E_pad - E,), fill, x.dtype)])

    Wg, Ag = _win_geom(window)
    node_shapes, padded_nodes = [], []
    for c in node_cols:
        c = c.astype(jnp.float32)
        n = c.shape[0]
        n_pad = -(-n // Ag) * Ag + Wg
        if n_pad != n:
            c = jnp.concatenate([c, jnp.zeros((n_pad - n,), jnp.float32)])
        node_shapes.append(n_pad)
        padded_nodes.append(c[None, :])         # [1, N] lane-dim windows

    rows = E_pad // k
    padded_clauses = []
    for c in clause_cols:
        c = c.astype(jnp.float32)
        n = c.shape[0]
        if n >= rows:
            c = c[:rows]
        else:
            c = jnp.concatenate([c, jnp.zeros((rows - n,), jnp.float32)])
        padded_clauses.append(c[None, :])

    args = [pad_e(gather_ids.astype(jnp.int32), gather_ids[-1])]
    args += padded_nodes + padded_clauses
    if n_ired:
        if num_instances > IWIN:
            raise ValueError(f"num_instances {num_instances} > IWIN {IWIN}")
        cb = clause_batch.astype(jnp.float32)
        if cb.shape[0] >= rows:
            cb = cb[:rows]
        else:
            cb = jnp.concatenate([cb, jnp.zeros((rows - cb.shape[0],),
                                                jnp.float32)])
        args.append(cb[None, :])
    args += [pad_e(c.astype(jnp.float32), 0) for c in edge_cols]

    call = _make_chained_call(
        f1, f2, f3, E_pad, len(node_cols), tuple(node_shapes),
        len(clause_cols), len(edge_cols), n_cred, n_cout, n_bcast,
        n_vred, n_eout, n_ired, int(num_segments), k, tile, sub,
        int(window), bool(interpret))
    outs = call(*args)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    idx = 0
    clause_out = None
    if n_cout:
        clause_out = outs[0]
        if rows >= num_clauses:
            clause_out = clause_out[:, :num_clauses]
        else:
            clause_out = jnp.pad(clause_out,
                                 ((0, 0), (0, num_clauses - rows)))
        idx = 1
    var_out = None
    if n_vred:
        var_out = outs[idx][:, :num_segments]
        idx += 1
    inst_out = None
    if n_ired:
        inst_out = outs[idx][:, :num_instances]
        idx += 1
    eouts = tuple(o[:E] for o in outs[idx:])
    if n_ired:
        return clause_out, var_out, eouts, inst_out
    return clause_out, var_out, eouts


def fused_edge_pass(f, *, node_cols=(), gather_ids=None, gather_uniform=0,
                    node_cols2=(), gather_ids2=None, gather2_uniform=0,
                    edge_cols=(), reduce_ids=None, reduce_uniform=0,
                    num_segments=0, n_red=0, n_eout=0, window=0,
                    interpret=False):
    """Run one fused gather->elementwise->reduce pass over the edge list.

    f(gathered, edge_vals) -> (red_cols, edge_outs): a traceable elementwise
    function over [SUB] vectors; `gathered` has one entry per node_cols
    followed by one per node_cols2, `red_cols` must have n_red entries,
    `edge_outs` n_eout. f must be a module-level function (it keys the
    compile cache) and MUST mask its reduce columns by the edge mask.

    node_cols / node_cols2: tuples of f32[N] arrays gathered via
    gather_ids / gather_ids2 (i32[E], windowed invariant).
    *_uniform: set to the batch's clause_width when that side's ids are
    clause-major uniform (ids[e] == e // k for real edges) - the kernel
    then uses static blocking + a constant one-hot instead of the windowed
    machinery. Ignored (windowed fallback) for unsupported k.
    edge_cols: tuple of f32[E] per-edge inputs, streamed in tiles.
    reduce_ids/num_segments: reduce target.
    window: one-hot window override (batch_var_window(batch)); pass it ONLY
    when every windowed side's ids carry the verified var_window invariant
    (all windowed sides = batch.edge_var). 0 = default 2048.

    Returns (reduced [n_red, num_segments] or None, tuple of n_eout f32[E]).
    """
    E = (list(edge_cols) + [i for i in (gather_ids, gather_ids2, reduce_ids)
                            if i is not None])[0].shape[0]

    uks = {k for k in (gather_uniform and len(node_cols) and gather_uniform,
                       gather2_uniform and len(node_cols2)
                       and gather2_uniform,
                       reduce_uniform and n_red and reduce_uniform) if k}
    uk = uks.pop() if len(uks) == 1 else (0 if not uks else None)
    if uk is None or _pick_tiles(uk) is None:
        # mixed ks can't share one tiling; fall back to windowed everywhere
        uk = 0
    tile, sub = _pick_tiles(uk)
    gk = uk if (gather_uniform and node_cols) else 0
    g2k = uk if (gather2_uniform and node_cols2) else 0
    rk = uk if (reduce_uniform and n_red) else 0

    E_pad = -(-E // tile) * tile

    def pad_e(x, fill):
        if E_pad == E:
            return x
        return jnp.concatenate(
            [x, jnp.full((E_pad - E,), fill, x.dtype)])

    Wg, Ag = _win_geom(window)

    def prep_nodes(cols, uk_side):
        shapes, padded = [], []
        for c in cols:
            c = c.astype(jnp.float32)
            n = c.shape[0]
            if uk_side:
                rows = E_pad // uk_side
                if n >= rows:
                    c = c[:rows]
                else:
                    c = jnp.concatenate(
                        [c, jnp.zeros((rows - n,), jnp.float32)])
                c = c[None, :]                  # [1, rows] 2-D blocked
                shapes.append(rows)
            else:
                n_pad = -(-n // Ag) * Ag + Wg
                if n_pad != n:
                    c = jnp.concatenate(
                        [c, jnp.zeros((n_pad - n,), jnp.float32)])
                c = c[None, :]                  # [1, N] lane-dim windows
                shapes.append(n_pad)
            padded.append(c)
        return tuple(shapes), padded

    node_shapes, padded_nodes = prep_nodes(node_cols, gk)
    node2_shapes, padded_nodes2 = prep_nodes(node_cols2, g2k)

    # pad every ids column with its LAST real id (not 0): a fill of 0 in a
    # sub-tile that mixes real tail edges with padding would pull the window
    # base to 0 and silently drop any real id >= WINDOW
    args = []
    if node_cols and not gk:
        args.append(pad_e(gather_ids.astype(jnp.int32), gather_ids[-1]))
    if node_cols2 and not g2k:
        args.append(pad_e(gather_ids2.astype(jnp.int32), gather_ids2[-1]))
    if n_red and not rk:
        args.append(pad_e(reduce_ids.astype(jnp.int32), reduce_ids[-1]))
    args += padded_nodes + padded_nodes2
    args += [pad_e(c.astype(jnp.float32), 0) for c in edge_cols]

    call = _make_call(f, E_pad, len(node_cols), node_shapes,
                      len(node_cols2), node2_shapes,
                      len(edge_cols), n_red, int(num_segments), n_eout,
                      gk, g2k, rk, tile, sub, int(window), bool(interpret))
    outs = call(*args)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    idx = 0
    reduced = None
    if n_red > 0:
        reduced = outs[0]
        if rk:
            rows = reduced.shape[1]
            if rows >= num_segments:
                reduced = reduced[:, :num_segments]
            else:
                reduced = jnp.pad(reduced,
                                  ((0, 0), (0, num_segments - rows)))
        else:
            reduced = reduced[:, :num_segments]
        idx = 1
    eouts = tuple(o[:E] for o in outs[idx:])
    return reduced, eouts
