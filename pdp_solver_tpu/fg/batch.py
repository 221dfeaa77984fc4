"""The factor-graph compiler: CNF instances -> packed, padded edge-list tensors.

Replaces the reference's collate pipeline (src/pdp/factorgraph/dataset.py:
138-187 `dag_collate_fn` + `DynamicBatchDivider`). A batch of CNF instances is
concatenated into one disjoint bipartite factor graph; unlike the reference's
ragged concatenation, shapes here are padded up to static *bucket* dimensions
so XLA compiles one program per bucket instead of one per batch.

Encoding (mirrors the reference semantics, src/pdp/factorgraph/dataset.py:120-136):
  edge_var[e]     variable index of edge e (instance-offset)
  edge_clause[e]  clause   index of edge e (instance-offset)
  edge_sign[e]    +1 if the literal is positive, -1 if negated, 0 on padding
  var_batch[v]    instance id of variable v      (reference batch_variable_map)
  clause_batch[f] instance id of clause  f       (reference batch_function_map)

Edges are stored sorted by (instance, clause) - the natural DIMACS order - so
clause-segment reductions can use the sorted fast path.

Padding rows point at the last valid slot with a 0 mask so segment ops stay
in-bounds; padding *instances* are marked in instance_mask and start deactivated
so the solver's masking machinery ignores them for free.

Static fast-path metadata (computed once at pack time, carried as pytree
aux data so jit specialises on it):

  clause_width  k > 0 when every real clause has exactly k literals and edges
                are clause-major: the clause-direction segment reduce becomes
                a [F, k] reshape-sum and never touches XLA scatter.
  fast_var /    every TILE-sized slab of edge ids spans < WINDOW ids, so the
  fast_clause   windowed one-hot MXU kernel (ops/pallas_reduce.py) computes
                the segment sum exactly with no scatter correction.
"""

import dataclasses
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# must match ops/pallas_reduce.py
REDUCE_TILE = 1024
REDUCE_WINDOW = 2048
REDUCE_ALIGN = 1024
# uniform widths whose fused tilings use non-TILE-aligned sub-windows
# (ops/pallas_fused.py _TILES); their windowed invariant must hold over
# adjacent slab pairs, see _windowed_ok
_ODD_K = (3, 5, 6, 7)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FGBatch:
    """A packed batch of CNF factor graphs (a JAX pytree with static aux).

    Besides the flat edge list, the batch carries ELL-format adjacency
    tables (`var_edges` [V, DV], `clause_edges` [F, DC]; -1 padded): each
    node's incident edge ids at fixed width (opt-in backend; the windowed
    Pallas reduce is the TPU default). A zero-width table ([N, 0]) means
    "not built" (degree cap exceeded).
    """

    edge_var: jnp.ndarray      # i32[E]
    edge_clause: jnp.ndarray   # i32[E]
    edge_sign: jnp.ndarray     # f32[E]
    var_batch: jnp.ndarray     # i32[V]
    clause_batch: jnp.ndarray  # i32[F]
    edge_mask: jnp.ndarray     # f32[E] 1 = real edge
    var_mask: jnp.ndarray      # f32[V]
    clause_mask: jnp.ndarray   # f32[F]
    instance_mask: jnp.ndarray  # f32[B]
    label: jnp.ndarray         # f32[B]
    var_edges: jnp.ndarray     # i32[V, DV] edge ids per variable, -1 pad
    clause_edges: jnp.ndarray  # i32[F, DC] edge ids per clause, -1 pad
    # per-instance meta features (reference `meta_data` / graph_feat slot,
    # src/pdp/factorgraph/dataset.py:157); [B, 0] when the dataset has none
    graph_feat: jnp.ndarray = None  # f32[B, meta_dim]
    # -- hybrid windowed-reduce metadata (var direction; see
    #    _hybrid_var_meta): per-tile window bases + the static residual
    #    edge list the based kernel drops. Zero-length when unused. --
    var_bases: jnp.ndarray = None       # i32[E/TILE] (or [0])
    var_resid: jnp.ndarray = None       # i32[R_pad] edge indices (or [0])
    var_resid_mask: jnp.ndarray = None  # f32[R_pad] 1 = real residual
    # -- static fast-path metadata (pytree aux, not traced) --
    clause_width: int = 0      # uniform clause size k, 0 = ragged
    fast_var: bool = False     # var-dir windowed-kernel invariant holds
    fast_clause: bool = False  # clause-dir windowed-kernel invariant holds
    hybrid_var: bool = False   # var-dir based-kernel + residual split valid
    # minimal verified one-hot window for var-direction windowed kernels:
    # 512 or 1024 when every contiguous <=1024-edge run of edge_var spans
    # <= W/2 ids (so a W-window with a W/2-aligned base always covers it),
    # 0 = only the default 2048 window is verified (== fast_var). The
    # windowed one-hot build + its MXU streams scale linearly with W, so a
    # 512 window is ~4x less kernel work per edge than 2048 (the measured
    # r4 sweep ceiling, BENCH_r04 large_batch).
    var_window: int = 0

    _ARRAY_FIELDS = ("edge_var", "edge_clause", "edge_sign", "var_batch",
                     "clause_batch", "edge_mask", "var_mask", "clause_mask",
                     "instance_mask", "label", "var_edges", "clause_edges",
                     "graph_feat", "var_bases", "var_resid",
                     "var_resid_mask")

    def __post_init__(self):
        if self.graph_feat is None:
            object.__setattr__(
                self, "graph_feat",
                np.zeros((np.shape(self.label)[0], 0), np.float32))
        if self.var_bases is None:
            object.__setattr__(self, "var_bases",
                               np.zeros((0,), np.int32))
        if self.var_resid is None:
            object.__setattr__(self, "var_resid",
                               np.zeros((0,), np.int32))
        if self.var_resid_mask is None:
            object.__setattr__(self, "var_resid_mask",
                               np.zeros((0,), np.float32))

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._ARRAY_FIELDS)
        aux = (self.clause_width, self.fast_var, self.fast_clause,
               self.hybrid_var, self.var_window)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, clause_width=aux[0], fast_var=aux[1],
                   fast_clause=aux[2], hybrid_var=aux[3],
                   var_window=aux[4])

    # NamedTuple-compat helper used by a few call sites/tests
    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def num_edges(self):
        return self.edge_var.shape[0]

    @property
    def num_vars(self):
        return self.var_batch.shape[0]

    @property
    def num_clauses(self):
        return self.clause_batch.shape[0]

    @property
    def batch_size(self):
        return self.label.shape[0]


def bucket_dims(v: int, f: int, e: int, b: int,
                granularity: float = 2.0,
                min_dim: int = 128) -> Tuple[int, int, int, int]:
    """Round dims up to a geometric grid to bound the number of compiled programs.

    Replaces the reference's DynamicBatchDivider memory heuristic
    (src/pdp/factorgraph/dataset.py:36-74) with static shape buckets: every
    packed batch lands on one of O(log V * log E) shapes, each jit-compiled
    once and cached.
    """

    def up(x):
        x = max(x, min_dim)
        g = min_dim
        while g < x:
            g = int(np.ceil(g * granularity))
        return g

    return up(v), up(f), up(e), up(b)


def _windowed_ok(ids: np.ndarray, pairwise: bool = False) -> bool:
    """True when every windowed one-hot kernel sub-tile over these ids is
    exact (span <= WINDOW - ALIGN after aligning the window base down).

    pairwise=True checks ADJACENT PAIRS of TILE-slabs instead of single
    slabs: the fused edge passes (ops/pallas_fused.py) use sub-tile widths
    like 384/640/896 for uniform k in {3,5,6,7} whose windows are not
    TILE-aligned and can straddle two slabs; a per-slab span bound does not
    transfer to such a straddling window, and out-of-window ids would be
    silently dropped. For the nested 1024/512 tilings (every other k) the
    per-slab bound is exact and the pair bound would be needlessly strict
    (it rejects plain sorted gap-free ids)."""
    n = ids.shape[0]
    if n == 0:
        return True
    pad = -(-n // REDUCE_TILE) * REDUCE_TILE
    padded = np.concatenate([ids, np.full(pad - n, ids[-1], ids.dtype)])
    tiles = padded.reshape(-1, REDUCE_TILE)
    mins, maxs = tiles.min(axis=1), tiles.max(axis=1)
    if pairwise and len(mins) > 1:
        mins = np.minimum(mins[:-1], mins[1:])
        maxs = np.maximum(maxs[:-1], maxs[1:])
    return bool(((maxs - mins) <= REDUCE_WINDOW - REDUCE_ALIGN).all())


def _min_var_window(ids: np.ndarray) -> int:
    """Smallest verified one-hot window in {512, 1024} for these ids, 0 if
    only the default 2048 window applies.

    Requirement for window W with base = floor(min/(W/2)) * (W/2): every
    contiguous run of <= 1024 edges must span <= W/2 ids (then
    max - base <= span + (W/2 - 1) < W). Bounded conservatively by sliding
    3 consecutive 512-slabs (any <=1024-run touches at most 3), which
    covers every sub-tile width the fused kernels use (384..1024),
    including the odd-k widths that straddle slab boundaries."""
    n = ids.shape[0]
    if n == 0:
        return 512
    slab = 512
    pad = -(-n // slab) * slab
    padded = np.concatenate([ids, np.full(pad - n, ids[-1], ids.dtype)])
    tiles = padded.reshape(-1, slab)
    mins, maxs = tiles.min(axis=1), tiles.max(axis=1)
    t = len(mins)
    if t >= 3:
        mins = np.minimum(np.minimum(mins[:-2], mins[1:-1]), mins[2:])
        maxs = np.maximum(np.maximum(maxs[:-2], maxs[1:-1]), maxs[2:])
    elif t == 2:
        mins = np.minimum(mins[:1], mins[1:])
        maxs = np.maximum(maxs[:1], maxs[1:])
    span = int((maxs - mins).max())
    for w in (512, 1024):
        if span <= w // 2:
            return w
    return 0


def _hybrid_var_meta(edge_var: np.ndarray, resid_round: int = 256):
    """Per-tile window bases + residual edges for the based windowed reduce
    (ops/pallas_reduce.py windowed_segment_sum_cols_based).

    When the global windowed invariant fails (modular/industrial CNFs mix
    far-apart variable ids in one tile), the reduce can still ride the MXU
    for the bulk of edges: pick, per TILE of edges, the ALIGN-aligned
    window covering the MOST ids (the two adjacent ALIGN blocks with the
    highest combined count); edges outside their tile's window form a
    static residual list handled by one small scatter. Exact by
    construction: kernel(bases) + scatter(residuals) == segment_sum.

    Returns (bases i32[E/TILE], resid i32[R_pad], resid_mask f32[R_pad],
    coverage fraction). Residual length is rounded up to `resid_round` to
    bound recompiles across batches of the same bucket shape."""
    E = edge_var.shape[0]
    assert E % REDUCE_TILE == 0
    T = E // REDUCE_TILE
    w_blk = REDUCE_WINDOW // REDUCE_ALIGN          # ALIGN blocks per window
    blocks = (edge_var.astype(np.int64) // REDUCE_ALIGN).reshape(
        T, REDUCE_TILE)
    nblk = int(blocks.max()) + 1 if E else 1
    # per-tile histogram over ALIGN blocks: counts[t, j]
    counts = np.zeros((T, nblk + w_blk), np.int64)
    np.add.at(counts, (np.repeat(np.arange(T), REDUCE_TILE),
                       blocks.reshape(-1)), 1)
    # window starting at block j covers blocks [j, j + w_blk)
    covered = sum(counts[:, j:j + nblk] for j in range(w_blk))
    best = np.argmax(covered, axis=1)              # [T] best start block
    bases = (best * REDUCE_ALIGN).astype(np.int32)
    bad = (blocks < best[:, None]) | (blocks >= best[:, None] + w_blk)
    resid = np.nonzero(bad.reshape(-1))[0].astype(np.int32)
    r_pad = max(-(-len(resid) // resid_round) * resid_round, resid_round)
    resid_idx = np.zeros(r_pad, np.int32)
    resid_idx[:len(resid)] = resid
    resid_mask = (np.arange(r_pad) < len(resid)).astype(np.float32)
    coverage = 1.0 - len(resid) / max(E, 1)
    return bases, resid_idx, resid_mask, coverage


def pack_instances(instances: Sequence[tuple],
                   pad_v: int = None, pad_f: int = None,
                   pad_e: int = None, pad_b: int = None,
                   bucket: bool = True,
                   granularity: float = 2.0) -> FGBatch:
    """Pack per-instance tuples (n, m, graph_map[2,Ei], edge_sign[Ei], label)
    into one padded FGBatch (numpy; call jax.device_put on the result or let
    jit consume it).
    """
    n_inst = len(instances)
    tot_v = sum(int(inst[0]) for inst in instances)
    tot_f = sum(int(inst[1]) for inst in instances)
    tot_e = sum(int(inst[2].shape[1]) for inst in instances)

    if pad_v is None:
        if bucket:
            pad_v, pad_f, pad_e, pad_b = bucket_dims(
                tot_v, tot_f, tot_e, n_inst, granularity)
        else:
            pad_v, pad_f, pad_e, pad_b = tot_v, tot_f, tot_e, n_inst

    if tot_v > pad_v or tot_f > pad_f or tot_e > pad_e or n_inst > pad_b:
        raise ValueError(
            f"batch ({tot_v},{tot_f},{tot_e},{n_inst}) exceeds padded shape "
            f"({pad_v},{pad_f},{pad_e},{pad_b})")

    edge_var = np.zeros(pad_e, dtype=np.int32)
    edge_clause = np.zeros(pad_e, dtype=np.int32)
    edge_sign = np.zeros(pad_e, dtype=np.float32)
    var_batch = np.zeros(pad_v, dtype=np.int32)
    clause_batch = np.zeros(pad_f, dtype=np.int32)
    label = np.zeros(pad_b, dtype=np.float32)

    v_off = f_off = e_off = 0
    for b, inst in enumerate(instances):
        n, m, gmap, signs = int(inst[0]), int(inst[1]), inst[2], inst[3]
        ei = gmap.shape[1]
        # keep edges sorted by clause within the instance (stable), the
        # natural order of DIMACS / the JSON format
        order = np.argsort(gmap[1], kind="stable")
        edge_var[e_off:e_off + ei] = gmap[0][order] + v_off
        edge_clause[e_off:e_off + ei] = gmap[1][order] + f_off
        edge_sign[e_off:e_off + ei] = np.asarray(signs, dtype=np.float32).reshape(-1)[order]
        var_batch[v_off:v_off + n] = b
        clause_batch[f_off:f_off + m] = b
        label[b] = float(inst[4])
        v_off += n
        f_off += m
        e_off += ei

    # padding rows point at the last real slot (contributions are masked out)
    last_v = max(v_off - 1, 0)
    last_f = max(f_off - 1, 0)
    last_b = max(n_inst - 1, 0)
    edge_var[e_off:] = last_v
    edge_clause[e_off:] = last_f
    var_batch[v_off:] = last_b
    clause_batch[f_off:] = last_b

    edge_mask = (np.arange(pad_e) < e_off).astype(np.float32)
    var_mask = (np.arange(pad_v) < v_off).astype(np.float32)
    clause_mask = (np.arange(pad_f) < f_off).astype(np.float32)
    instance_mask = (np.arange(pad_b) < n_inst).astype(np.float32)

    var_edges = build_ell_table(edge_var[:e_off], pad_v)
    clause_edges = build_ell_table(edge_clause[:e_off], pad_f)

    # optional per-instance meta features (7th tuple element; zero-width
    # when absent - the reference's always-None graph_feat slot)
    metas = [np.asarray(inst[6], np.float32).reshape(-1)
             for inst in instances if len(inst) > 6 and inst[6] is not None]
    if metas and len(metas) == n_inst:
        md = metas[0].shape[0]
        graph_feat = np.zeros((pad_b, md), np.float32)
        graph_feat[:n_inst] = np.stack(metas)
    else:
        graph_feat = np.zeros((pad_b, 0), np.float32)

    # uniform clause width: every real clause has exactly k literals laid out
    # clause-major, so the clause reduce is a reshape-sum (see modules/common)
    clause_width = 0
    if e_off > 0 and f_off > 0 and e_off % f_off == 0:
        k = e_off // f_off
        counts = np.bincount(edge_clause[:e_off], minlength=f_off)
        if (counts[:f_off] == k).all():
            clause_width = k

    fast_var = _windowed_ok(edge_var, pairwise=clause_width in _ODD_K)
    fast_clause = _windowed_ok(edge_clause,
                               pairwise=clause_width in _ODD_K)
    var_window = _min_var_window(edge_var) if fast_var else 0

    # hybrid var-direction metadata: when the global invariant fails
    # (modular / ragged / industrial formulas) but most edges still live in
    # a 2-block window per tile, the based kernel + residual scatter covers
    # the reduce scatter-free (modules/common.py dispatch). Worth it only
    # when the windowed share dominates.
    hybrid_var = False
    var_bases = var_resid = var_resid_mask = None
    if not fast_var and pad_e % REDUCE_TILE == 0 and e_off > 0:
        var_bases, var_resid, var_resid_mask, coverage = _hybrid_var_meta(
            edge_var)
        hybrid_var = coverage >= 0.5
        if not hybrid_var:
            var_bases = var_resid = var_resid_mask = None

    return FGBatch(
        edge_var=edge_var, edge_clause=edge_clause, edge_sign=edge_sign,
        var_batch=var_batch, clause_batch=clause_batch,
        edge_mask=edge_mask, var_mask=var_mask, clause_mask=clause_mask,
        instance_mask=instance_mask, label=label,
        var_edges=var_edges, clause_edges=clause_edges,
        graph_feat=graph_feat,
        var_bases=var_bases, var_resid=var_resid,
        var_resid_mask=var_resid_mask,
        clause_width=clause_width,
        fast_var=fast_var,
        fast_clause=fast_clause,
        hybrid_var=hybrid_var,
        var_window=var_window)


ELL_MAX_WIDTH = 512   # above this degree fall back to segment scatters
ELL_ROUND = 8


def build_ell_table(node_ids, num_nodes, max_width=ELL_MAX_WIDTH):
    """Edge ids per node at fixed width (ELL), -1 padded; [num_nodes, 0] when
    the max degree exceeds `max_width` (degenerate graphs). Uses the native
    fgpack kernel when built (native/fgpack.cpp), numpy otherwise."""
    counts = np.bincount(node_ids, minlength=num_nodes)
    width = int(counts.max()) if counts.size else 0
    if width > max_width:
        return np.zeros((num_nodes, 0), dtype=np.int32)
    width = max(ELL_ROUND, -(-width // ELL_ROUND) * ELL_ROUND)

    from pdp_solver_tpu.fg import native
    fast = native.build_ell_fast(node_ids, num_nodes, width)
    if fast is not None:
        return fast
    table = np.full((num_nodes, width), -1, dtype=np.int32)
    order = np.argsort(node_ids, kind="stable")
    sorted_ids = node_ids[order]
    if len(order):
        # position of each edge within its node's contiguous run
        new_run = np.r_[True, sorted_ids[1:] != sorted_ids[:-1]]
        run_idx = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        pos = np.arange(len(order)) - starts[run_idx]
        table[sorted_ids, pos] = order
    return table


def replicate_batch(batch: FGBatch, replication: int) -> FGBatch:
    """Replicate every instance R times with index offsets (search parallelism).

    TPU-native equivalent of reference `SATProblem._replicate_batch`
    (src/pdp/nn/solver.py:56-82): replica r of instance b gets instance id
    r * B + b, variable slot v + r * V, clause slot f + r * F; de-duplication
    later reduces over the leading replica axis by reshape (see
    solvers/base.py deduplicate).

    Fast-path metadata: when E is a multiple of the reduce TILE, replica
    blocks start on tile boundaries, so no tile straddles two replicas and
    the windowed invariants survive replication. The reshape clause reduce
    additionally needs pad_e == k * pad_f so replica r's clause c lands in
    reshape row r * pad_f + c.
    """
    if replication <= 1:
        return batch
    R = replication
    E, V, F, B = (batch.num_edges, batch.num_vars, batch.num_clauses,
                  batch.batch_size)
    r_e = jnp.repeat(jnp.arange(R, dtype=jnp.int32), E)
    r_v = jnp.repeat(jnp.arange(R, dtype=jnp.int32), V)
    r_f = jnp.repeat(jnp.arange(R, dtype=jnp.int32), F)

    def rep_table(table, num_rows):
        t = jnp.tile(table, (R, 1))
        off = jnp.repeat(jnp.arange(R, dtype=jnp.int32), num_rows)[:, None] * E
        return jnp.where(t >= 0, t + off, -1)

    # Replica boundaries sit at multiples of E. The windowed kernels are
    # safe only if no sub-window straddles a boundary (ids jump by ~V
    # there): true for the 1024/512 tilings (k in {0,2,4,8}) when E is a
    # multiple of the 1024 tile, but the k in {3,5,6,7} fused tilings use
    # 384/640/768/896-wide sub-windows that a power-of-two E cannot align
    # to - drop the fast flags for those (scatter fallback stays exact).
    k = batch.clause_width
    tile_aligned = E % REDUCE_TILE == 0 and k in (0, 2, 4, 8)
    # hybrid metadata replicates exactly when replica blocks are
    # tile-aligned: bases shift by r * V per replica block of tiles,
    # residual indices by r * E. V must be ALIGN-aligned or the shifted
    # bases would violate the kernel's alignment contract.
    hybrid = (batch.hybrid_var and E % REDUCE_TILE == 0
              and V % REDUCE_ALIGN == 0)
    if hybrid:
        rT = jnp.repeat(jnp.arange(R, dtype=jnp.int32), E // REDUCE_TILE)
        rRes = jnp.repeat(jnp.arange(R, dtype=jnp.int32),
                          batch.var_resid.shape[0])
        var_bases = jnp.tile(batch.var_bases, R) + rT * V
        var_resid = jnp.tile(batch.var_resid, R) + rRes * E
        var_resid_mask = jnp.tile(batch.var_resid_mask, R)
    else:
        var_bases = jnp.zeros((0,), jnp.int32)
        var_resid = jnp.zeros((0,), jnp.int32)
        var_resid_mask = jnp.zeros((0,), jnp.float32)
    return FGBatch(
        edge_var=jnp.tile(batch.edge_var, R) + r_e * V,
        edge_clause=jnp.tile(batch.edge_clause, R) + r_e * F,
        edge_sign=jnp.tile(batch.edge_sign, R),
        var_batch=jnp.tile(batch.var_batch, R) + r_v * B,
        clause_batch=jnp.tile(batch.clause_batch, R) + r_f * B,
        edge_mask=jnp.tile(batch.edge_mask, R),
        var_mask=jnp.tile(batch.var_mask, R),
        clause_mask=jnp.tile(batch.clause_mask, R),
        instance_mask=jnp.tile(batch.instance_mask, R),
        label=jnp.tile(batch.label, R),
        var_edges=rep_table(batch.var_edges, V),
        clause_edges=rep_table(batch.clause_edges, F),
        graph_feat=jnp.tile(batch.graph_feat, (R, 1)),
        var_bases=var_bases, var_resid=var_resid,
        var_resid_mask=var_resid_mask,
        clause_width=(k if k > 0 and E == k * F else 0),
        fast_var=batch.fast_var and tile_aligned,
        fast_clause=batch.fast_clause and tile_aligned,
        hybrid_var=hybrid,
        # per-replica spans are unchanged and (under tile_aligned, i.e. the
        # 512/1024 sub-tilings with E % 1024 == 0) no sub-tile straddles a
        # replica boundary, so the verified window carries over
        var_window=(batch.var_window if tile_aligned else 0),
    )


def unpack_instances(batch: FGBatch):
    """Inverse of pack_instances: recover per-instance tuples
    (n, m, graph_map[2,Ei], edge_sign[Ei], label[, None, meta]) from a
    packed batch (host-side; padding instances are dropped). Enables
    repacking subsets of an already-packed batch (solvers/compact.py)."""
    ev = np.asarray(batch.edge_var)
    ec = np.asarray(batch.edge_clause)
    es = np.asarray(batch.edge_sign)
    vb = np.asarray(batch.var_batch)
    cb = np.asarray(batch.clause_batch)
    vm = np.asarray(batch.var_mask) > 0
    cm = np.asarray(batch.clause_mask) > 0
    em = np.asarray(batch.edge_mask) > 0
    labels = np.asarray(batch.label)
    metas = np.asarray(batch.graph_feat)
    n_real = int(np.asarray(batch.instance_mask).sum())

    n_by_b = np.bincount(vb[vm], minlength=n_real)[:n_real]
    m_by_b = np.bincount(cb[cm], minlength=n_real)[:n_real]
    v_off = np.concatenate([[0], np.cumsum(n_by_b)])
    f_off = np.concatenate([[0], np.cumsum(m_by_b)])
    e_inst = vb[ev[em]]   # owning instance of each real edge (edges are
    e_by_b = np.bincount(e_inst, minlength=n_real)[:n_real]
    e_off = np.concatenate([[0], np.cumsum(e_by_b)])

    out = []
    for b in range(n_real):
        sl = slice(int(e_off[b]), int(e_off[b + 1]))
        gmap = np.stack([ev[sl] - v_off[b], ec[sl] - f_off[b]]).astype(
            np.int32)
        inst = [int(n_by_b[b]), int(m_by_b[b]), gmap,
                es[sl].astype(np.float32), float(labels[b])]
        if metas.shape[1] > 0:
            inst += [None, metas[b]]
        out.append(tuple(inst))
    return out
