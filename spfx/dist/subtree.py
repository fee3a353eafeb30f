"""Subtree-decomposed multi-chip factorization: chips own disjoint
elimination subtrees; total communication is ONE factor-sized all-reduce.

The TPU-native answer to the reference's per-GPU descendant residency
(GPUSerial cache + leaf-queue work sharing,
Cholesky/Source/SparseFrame.c:2267-2467): instead of keeping hot panels
resident per device at runtime, the PLAN assigns each chip a set of
elimination subtrees (the ND separator tree provides them — an ancestor of
any node lies in the same subtree or above every subtree), so:

- LOCAL PHASE (zero communication): each chip factorizes its subtrees
  entirely locally — all panels of owned supernodes plus every update
  SOURCED at them, including those targeting shared ancestors. All chips
  run ONE program (the mega scan/switch engine); ownership lives in the
  per-chip step/chunk tables, sharded over the mesh's leading dim.
- MERGE: starting copies are identical (the assembled A), each chip's
  writes are confined to its subtrees + ancestor rows, so the merged
  factor is exactly L0 + psum(L_chip - L0): one all-reduce, ~1x the
  factor array — vs the batch-sharded engine's two full-factor psums per
  level (~93 GB per 48^3 factorize; spfx.dist.factorize keeps that layout
  for meshes where etree parallelism is insufficient).
- TOP PHASE (batch-sharded): the shared ancestor region holds a constant
  fraction of all flops in 3D (the root separator's near-dense front —
  measured 62-87% of total at 10^3..32^3), so ownership alone cannot
  parallelize it; its few levels run batch-sharded (each chip takes a
  slice of every bucket, one delta-psum per phase — the
  spfx.dist.factorize layout restricted to the top levels).

Communication per factorize: 1 merge psum + 2 psums x top_levels — vs the
batch-sharded engine's 2 psums x ALL levels (e.g. 48^3: ~37 top levels of
236 total, a ~6x comm reduction, with the lower ~40-70% of flops running
comm-free). All three phases live inside one jitted shard_map: one
dispatch per factorize, like the single-chip mega engine.

Plan sharing: every per-chip plan is built with ``sn_filter`` over the
same symbolic analysis and the same ``sn_group`` storage key, so the
uniform level-major layout is byte-identical across chips (see
spfx.plan.schedule.build_plan).
"""

from __future__ import annotations

import heapq
import time
from functools import partial

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spfx.chol.factorize import CholeskyFactor
from spfx.lu.factorize import LUFactor
from spfx.dist.mesh import make_mesh
from spfx.kernels import blocks, mega
from spfx.plan.schedule import build_plan
from spfx.symbolic.analyze import analyze
from spfx.utils.config import Config, DEFAULT


def sn_parent(sym) -> np.ndarray:
    """Supernodal elimination tree: parent supernode of each supernode
    (-1 at roots) — the column etree restricted to supernode last columns
    (ref ST_Parent, Cholesky/Source/SparseFrame.c:1640-1665)."""
    last = sym.sn_start[1:] - 1
    p = sym.parent[last]
    return np.where(p >= 0, sym.sn_of[np.maximum(p, 0)], -1)


def _sn_flops(sym) -> np.ndarray:
    """Per-supernode numeric work estimate for load balancing: panel
    factorization plus (approximately) the update products it sources."""
    W = np.diff(sym.sn_start).astype(np.float64)
    nb = (np.diff(sym.sn_ptr) - np.diff(sym.sn_start)).astype(np.float64)
    return W**3 / 3.0 + nb * W**2 + 2.0 * nb * nb * W


def assign_owners(sym, ndev: int, factor: int = 4) -> np.ndarray:
    """owner[s] in [0, ndev) for supernodes of chip-owned subtrees, -1 for
    the shared top region. Splits the largest subtrees until ~factor*ndev
    candidates exist, then LPT-packs them into ndev balanced bins.

    The etree is postordered (analyze guarantees it), so a subtree is a
    contiguous supernode id range [first_descendant(s), s]."""
    ns = sym.nsuper
    par = sn_parent(sym)
    own = _sn_flops(sym)
    sub = own.copy()
    fd = np.arange(ns)
    for s in range(ns):
        p = par[s]
        if p >= 0:
            sub[p] += sub[s]
            fd[p] = min(fd[p], fd[s])
    children = [[] for _ in range(ns)]
    for s in range(ns):
        if par[s] >= 0:
            children[par[s]].append(s)
    total = float(sub[par < 0].sum())
    # max-heap of candidate subtree roots. Split any candidate bigger than
    # half a bin (it would break LPT balance); splitting a node moves only
    # that node's own work into the shared top region, so this rule keeps
    # the top as small as balance allows.
    cands = [(-sub[s], int(s)) for s in np.flatnonzero(par < 0)]
    heapq.heapify(cands)
    big = total / max(1, 2 * ndev)           # breaks LPT balance if kept
    small = total / max(1, 4 * factor * ndev)  # not worth the top growth
    done = []
    while cands:
        negf, s = heapq.heappop(cands)
        want = len(done) + len(cands) < factor * ndev or -negf > big
        if not children[s] or not want or -negf < small:
            done.append((negf, s))
            continue
        for c in children[s]:        # s itself joins the top region
            heapq.heappush(cands, (-sub[c], int(c)))
    cands = done
    owner = np.full(ns, -1, dtype=np.int64)
    bins = [(0.0, b) for b in range(ndev)]
    heapq.heapify(bins)
    for negf, s in sorted(cands):
        load, b = heapq.heappop(bins)
        owner[fd[s]:s + 1] = b
        heapq.heappush(bins, (load - negf, b))
    return owner


def _union_tables(per_chip):
    """Merge per-chip (classes, cls_ids, chunk_ids) into one class set with
    per-chip stacked tables and equal-length padded step lists.

    Every chip runs the same compiled switch program; chips differ only in
    their (sharded) tables. Steps are padded with an all-dead chunk (fill
    values are no-op tasks: width 0 / start -1) appended to class 0."""
    keys, kinds, fills = [], [], []
    key_to_gid = {}
    for classes, _, _ in per_chip:
        for c in classes:
            if c["key"] not in key_to_gid:
                key_to_gid[c["key"]] = len(keys)
                keys.append(c["key"])
                kinds.append((c["kind"], c["static"]))
                fills.append(c["fills"])
    ng = len(keys)
    ndev = len(per_chip)
    # per-class target shapes: max over chips (chunk count and trailing dims)
    shapes = [None] * ng
    for classes, _, _ in per_chip:
        for c in classes:
            g = key_to_gid[c["key"]]
            shp = [t.shape for t in c["tables"]]
            if shapes[g] is None:
                shapes[g] = [list(s) for s in shp]
            else:
                for tgt, s in zip(shapes[g], shp):
                    for d in range(len(s)):
                        tgt[d] = max(tgt[d], s[d])
    for g in range(ng):
        for s in shapes[g]:
            s[0] += 1 if g == 0 else 0      # class 0: +1 all-dead pad chunk
    stacked = []
    for g in range(ng):
        stacked.append([np.full((ndev,) + tuple(s), f, np.int32)
                        for s, f in zip(shapes[g], fills[g])])
    steps = []
    for ci, (classes, cls_ids, chunk_ids) in enumerate(per_chip):
        gmap = {i: key_to_gid[c["key"]] for i, c in enumerate(classes)}
        for c in classes:
            g = key_to_gid[c["key"]]
            for t, a in zip(stacked[g], c["tables"]):
                t[(ci,) + tuple(slice(0, d) for d in a.shape)] = a
        steps.append((np.asarray([gmap[i] for i in cls_ids], np.int32),
                      np.asarray(chunk_ids, np.int32)))
    smax = max((len(s[0]) for s in steps), default=0)
    dead = np.int32(shapes[0][0][0] - 1) if ng else np.int32(0)
    gsteps = np.zeros((ndev, smax), np.int32)
    isteps = np.full((ndev, smax), dead, np.int32)
    for ci, (g, i) in enumerate(steps):
        gsteps[ci, :len(g)] = g
        isteps[ci, :len(g)] = i
        isteps[ci, len(g):] = dead
        gsteps[ci, len(g):] = 0
    return kinds, stacked, gsteps, isteps


class _SubtreeBase:
    """Shared machinery for the subtree-decomposed engines."""

    lu = False

    def __init__(self, A: sp.spmatrix, config: Config = DEFAULT,
                 mesh: Mesh | None = None, axis: str | None = None,
                 sym=None):
        A = sp.csc_matrix(A)
        if config.layout != "contig":
            raise ValueError("subtree engine requires layout='contig'")
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(axis or "d")
        self.axis = axis or self.mesh.axis_names[0]
        self.ndev = int(np.prod(self.mesh.devices.shape))
        t0 = time.perf_counter()
        self.sym = sym if sym is not None else analyze(
            A, config, symmetrize=self.lu)
        self.analyze_time = time.perf_counter() - t0
        t0 = time.perf_counter()
        self.owner = assign_owners(self.sym, self.ndev)
        grp = self.owner + 1            # top region sorts first within class
        plans = [build_plan(self.sym, A, config, lu=self.lu,
                            sn_filter=(self.owner == c), sn_group=grp)
                 for c in range(self.ndev)]
        plan_top = build_plan(self.sym, A, config, lu=self.lu,
                              sn_filter=(self.owner == -1), sn_group=grp)
        # the full plan (same layout) backs assembly, solve and validation
        self.plan = build_plan(self.sym, A, config, lu=self.lu, sn_group=grp)
        # one shared storage size: filtered plans grow slack independently
        smax = max([p.slack for p in plans]
                   + [plan_top.slack, self.plan.slack])
        for p in plans + [plan_top, self.plan]:
            p.slack = smax
        self.plan_time = time.perf_counter() - t0
        self.local_flops = [p.flops for p in plans]
        self.top_flops = plan_top.flops

        per_chip = [mega._collect(p) for p in plans]
        kinds, stacked, gsteps, isteps = _union_tables(per_chip)

        shd = NamedSharding(self.mesh, P(self.axis))
        rep = NamedSharding(self.mesh, P())
        self._gsteps = jax.device_put(gsteps, shd)
        self._isteps = jax.device_put(isteps, shd)
        flat_local, lay_local = [], []
        for tabs in stacked:
            lay_local.append(len(tabs))
            flat_local.extend(jax.device_put(t, shd) for t in tabs)
        self._flat_local = flat_local
        # top phase: the shared separator region holds a CONSTANT fraction
        # of all flops in 3D (the root separator's near-dense factorization
        # — measured 62-87% at 10^3..32^3 with 8 bins), so ownership alone
        # cannot parallelize it. It runs BATCH-SHARDED instead (the
        # dist.factorize layout: each chip takes a slice of every bucket's
        # tasks, one delta psum per phase) — but only over the ~top levels,
        # so total comm is 2 x factor x #top_levels instead of per-level
        # over the whole schedule.
        from spfx.dist.factorize import (_chol_chunk_fn, _lu_chunk_fn,
                                         _pad_dim0)
        from spfx.plan.schedule import PanelBucketC, UpdateBucketC
        tspec, targs = [], []
        self.top_levels = 0
        for lp in plan_top.levels:
            if not lp.updates and not lp.panels:
                continue
            self.top_levels += 1
            upds, panels = [], []
            for ub in lp.updates:
                assert isinstance(ub, UpdateBucketC)
                if ub.head_start is not None:
                    upds.append(("UT", ub.mp, ub.kp, ub.csp))
                    arrs = (ub.kw, ub.mrows, ub.rstart, ub.src_start,
                            ub.head_start, ub.tgt_row_start, ub.tgt_cpos)
                    fills = (0, 0, 0, -1, -1, -1, -1)
                else:
                    upds.append(("UC", ub.mp, ub.kp, ub.csp))
                    arrs = (ub.kw, ub.mrows, ub.src_start,
                            ub.tgt_row_start, ub.tgt_cpos)
                    fills = (0, 0, -1, -1, -1)
                for a, f in zip(arrs, fills):
                    targs.append(jax.device_put(
                        _pad_dim0(a, self.ndev, f), shd))
            for pb in lp.panels:
                assert isinstance(pb, PanelBucketC)
                panels.append(("PC", pb.cp, pb.rbp))
                arrs = (pb.widths, pb.nbelow, pb.diag_start, pb.below_start)
                for a, f in zip(arrs, (0, 0, -1, -1)):
                    targs.append(jax.device_put(
                        _pad_dim0(a, self.ndev, f), shd))
            tspec.append((tuple(upds), tuple(panels)))
        top_fn = (_lu_chunk_fn if self.lu else _chol_chunk_fn)(
            tuple(tspec), self.axis)
        self._flat_top = targs
        asm = [jax.device_put(self.plan.assembly_idx.astype(np.int32), rep)]
        if self.lu:
            asm.append(jax.device_put(
                self.plan.assembly_idx_u.astype(np.int32), rep))
        self._asm = tuple(asm)

        storage = self.plan.storage
        fac_prec = config.matmul_precision
        upd_prec = config.update_precision or fac_prec
        axis = self.axis
        nstate = 2 if self.lu else 1
        lu = self.lu
        nloc = len(flat_local)

        def fn(vals, asm, gsteps, isteps, *tables):
            loc = [t[0] for t in tables[:nloc]]
            top = list(tables[nloc:])
            tabs_local = mega._unflatten(lay_local, loc)
            if lu:
                vl, vu = vals
                L0 = jnp.zeros((storage,), vl.dtype).at[asm[0]].set(vl)
                U0 = jnp.zeros((storage,), vl.dtype).at[asm[1]].set(vu)
                carry0 = (L0, U0)
            else:
                L0 = jnp.zeros((storage,), vals[0].dtype) \
                    .at[asm[0]].set(vals[0])
                carry0 = (L0,)

            def wrap(brs):
                if lu:
                    return brs

                def one(c, i, br):
                    return (br(c[0], i),)
                return [partial(one, br=br) for br in brs]

            brs = wrap(mega.make_branches(kinds, tabs_local, lu,
                                          fac_prec, upd_prec))

            def body(c, xs):
                g, i = xs
                return lax.switch(g, brs, c, i), None

            carry = carry0
            if brs and gsteps.shape[1]:
                carry, _ = lax.scan(body, carry, (gsteps[0], isteps[0]))
            # merge: every chip's writes are confined to its own subtrees
            # plus ancestor rows; identical starting copies cancel
            carry = tuple(c0 + lax.psum(c - c0, axis)
                          for c, c0 in zip(carry, carry0))
            with jax.default_matmul_precision(fac_prec):
                carry = top_fn(*carry, *top)
            if not lu:
                carry = (carry,)
            return carry if lu else carry[0]

        in_specs = ((P(),) * nstate, (P(),) * nstate, P(axis), P(axis)) \
            + (P(axis),) * nloc + (P(axis),) * len(targs)
        out_specs = (P(), P()) if lu else P()
        self._run = jax.jit(jax.shard_map(
            fn, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False))

    def _factor_arrays(self, A: sp.spmatrix):
        dtype = jnp.dtype(self.config.dtype)
        Ap = A[self.sym.perm][:, self.sym.perm]
        low = sp.tril(Ap).tocsc()
        rep = NamedSharding(self.mesh, P())
        vals = [jax.device_put(low.data.astype(dtype), rep)]
        if self.lu:
            upt = sp.tril(Ap.T, -1).tocsc()
            vals.append(jax.device_put(upt.data.astype(dtype), rep))
        return tuple(vals)


class SubtreeCholesky(_SubtreeBase):
    """Cholesky context with subtree-owned multi-chip factorization.

    Usage mirrors ``spfx.dist.factorize.ShardedCholesky``; communication
    per factorize is ONE factor-sized psum instead of two per level."""

    lu = False

    def factorize(self, A: sp.spmatrix) -> CholeskyFactor:
        A = sp.csc_matrix(A)
        vals = self._factor_arrays(A)
        L = self._run(vals, self._asm, self._gsteps, self._isteps,
                      *self._flat_local, *self._flat_top)
        return CholeskyFactor(A, self.sym, self.plan, L, self.config)


class SubtreeLU(_SubtreeBase):
    """LU (no-pivot) context with subtree-owned multi-chip factorization."""

    lu = True

    def factorize(self, A: sp.spmatrix) -> LUFactor:
        A = sp.csc_matrix(A)
        vals = self._factor_arrays(A)
        Lx, Ux = self._run(vals, self._asm, self._gsteps, self._isteps,
                           *self._flat_local, *self._flat_top)
        return LUFactor(A, self.sym, self.plan, Lx, Ux, self.config)
