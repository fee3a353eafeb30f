"""Stage-streamed factorization: factors larger than HBM (and larger than
the 2^31-element int32 addressing ceiling of the in-core engines).

The reference packs the elimination tree into device-slot-sized STAGES and
streams factor panels host<->device around a residency cache
(Cholesky/Source/SparseFrame.c:1721-1846 slot partitioning, :2437-2467
GPUSerial residency). spfx's TPU redesign keeps the same two ideas and
drops the dynamic cache:

- the LEVEL-MAJOR uniform storage layout (spfx.plan.schedule) makes every
  stage's OWN region one contiguous range [stage_lo, stage_hi);
- a stage's update tasks read only FINISHED descendant panels, all known at
  plan time, so the engine host-gathers exactly those panels into a packed
  device buffer — a plan-time-perfect "cache" with zero misses and no
  device-side index indirection.

Per stage: upload [packed descendants | assembled own region], run the
stage's levels as one mega scan (all tables REBASED to stage-local int32
offsets — this is what lifts the global 2^31 ceiling: the global plan is
built with int64 tables via build_plan(idx_dtype=np.int64)), download the
finished own region into the host factor. The host array is the factor of
record; solves run on the host backend (spfx/cpp f64 solve) which has no
size ceiling beyond host RAM.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from spfx.chol.factorize import CholeskyFactor
from spfx.plan.schedule import (FactorPlan, LevelPlan, PanelBucketC,
                                UpdateBucketC, build_plan)
from spfx.symbolic.analyze import analyze
from spfx.utils.config import Config, DEFAULT


@dataclasses.dataclass
class _Stage:
    levels: List[LevelPlan]        # rebased per-stage buckets
    lo: int                        # own region start (global, int64)
    hi: int                        # own region end (global)
    src_sns: np.ndarray            # descendant supernodes packed as input
    src_lo: np.ndarray             # (nsrc,) global start of each source
    src_len: np.ndarray            # (nsrc,) elements of each source
    src_base: np.ndarray           # (nsrc,) stage-buffer position of each
    #                                source, CONGRUENT to src_lo mod the
    #                                DMA ALIGN tile (the update tables'
    #                                superwindow row offsets were built
    #                                from global starts)
    packed: int                    # total packed source elements
    storage: int                   # packed + own + slack (device buffer)


def _stage_partition(plan: FactorPlan, offsets, rows_elems, cap: int):
    """Greedy level partition: a stage's device working set (its own
    contiguous region + its packed source panels) stays under ``cap``
    elements. A single level never splits (its buckets may interleave)."""
    stages = []
    cur: List[int] = []
    for li, lp in enumerate(plan.levels):
        cand = cur + [li]
        own, src = _stage_extent(plan, cand, offsets, rows_elems)
        need = (own[1] - own[0]) + int(src.sum())
        if cur and need > cap:
            stages.append(cur)
            cur = [li]
        else:
            cur = cand
    if cur:
        stages.append(cur)
    return stages


def _level_sns(lp):
    out = []
    for pb in lp.panels:
        out.append(pb.sns)
    return np.concatenate(out) if out else np.zeros(0, np.int64)


def _stage_extent(plan, level_ids, offsets, rows_elems):
    sns = np.concatenate([_level_sns(plan.levels[li]) for li in level_ids])
    if len(sns) == 0:
        return (0, 0), np.zeros(0, np.int64)
    lo = int(offsets[sns].min())
    hi = int((offsets[sns] + rows_elems[sns]).max())
    srcs = _stage_sources(plan, level_ids, sns)
    return (lo, hi), rows_elems[srcs] if len(srcs) else np.zeros(0, np.int64)


def _stage_sources(plan, level_ids, own_sns):
    own = set(own_sns.tolist())
    srcs = set()
    for li in level_ids:
        for ub in plan.levels[li].updates:
            for d in np.unique(ub.sds):
                if d >= 0 and d not in own:
                    srcs.add(int(d))
    return np.asarray(sorted(srcs), dtype=np.int64)


class StreamingCholesky:
    """Out-of-core supernodal Cholesky: host-resident factor, stage-wise
    device execution. API mirrors spfx.chol.factorize.Cholesky; solves use
    the host backend on the downloaded factor.

    The LU line (StreamingLU) shares every mechanism — the reference's
    stage machinery likewise serves both lines (LU/Source/
    SparseFrame.c:1647-2231 builds the same ST_* tables): the only deltas
    are twin host/device arrays, the U^T assembly scatter, and the
    lu=True branch set in the stage runner."""

    lu = False

    def __init__(self, A: sp.spmatrix, config: Config = DEFAULT,
                 stage_elems: int = 1 << 27, sym=None):
        A = sp.csc_matrix(A)
        if config.layout != "contig":
            raise ValueError("streaming engine requires layout='contig'")
        self.config = config
        self.stage_elems = int(stage_elems)
        t0 = time.perf_counter()
        self.sym = sym if sym is not None else analyze(
            A, config, symmetrize=self.lu)
        self.analyze_time = time.perf_counter() - t0
        t0 = time.perf_counter()
        self.plan = build_plan(self.sym, A, config, lu=self.lu,
                               idx_dtype=np.int64)
        # per-supernode element extent in the uniform layout (the plan's
        # own rows_sn is the layout of record — recomputing it here would
        # silently drift from build_plan's padding rules)
        self.rows_elems = self.plan.rows_sn * self.plan.strides
        self._build_stages()
        self._runners = {}        # stage index -> compiled _StageRunner
        self.plan_time = time.perf_counter() - t0

    # ---------------- stage construction --------------------------------
    def _build_stages(self):
        plan, offsets = self.plan, self.plan.offsets
        parts = _stage_partition(plan, offsets, self.rows_elems,
                                 self.stage_elems)
        self.stages: List[_Stage] = []
        for level_ids in parts:
            sns = np.concatenate(
                [_level_sns(plan.levels[li]) for li in level_ids])
            if len(sns) == 0:
                continue
            lo = int(offsets[sns].min())
            hi = int((offsets[sns] + self.rows_elems[sns]).max())
            srcs = _stage_sources(plan, level_ids, sns)
            src_lo = offsets[srcs] if len(srcs) else np.zeros(0, np.int64)
            src_len = self.rows_elems[srcs] if len(srcs) \
                else np.zeros(0, np.int64)
            # pack sources preserving start mod ALIGN (DMA superwindow
            # congruence, see _Stage.src_base), then place the own region
            # so its shift is a multiple of ALIGN too
            from spfx.plan.schedule import ALIGN
            src_base = np.zeros(len(srcs), dtype=np.int64)
            cur = 0
            for k in range(len(srcs)):
                cur += (int(src_lo[k]) - cur) % ALIGN
                src_base[k] = cur
                cur += int(src_len[k])
            packed = cur + (lo - cur) % ALIGN
            base = np.zeros(plan.offsets.shape[0], dtype=np.int64)
            if len(srcs):
                base[srcs] = src_base
            own_off = packed - lo            # own region lands after packed
            levels = [self._rebase_level(plan.levels[li], sns, srcs, base,
                                         own_off, offsets, 0)
                      for li in level_ids]
            # stage buffer: packed sources + own region + whatever padded
            # bucket tails / extend-add slabs / gather superwindows overrun
            # past it (globally those land on later panels; here they need
            # real slack). MUST be the plan's computed slack — it accounts
            # the aligned superwindow sizes ((mp+ext)*kp etc.); the module
            # SLACK floor alone let end-of-buffer DMA windows clip-shift and
            # read garbage as real rows (NaN factors on TPU).
            slk = plan.slack
            storage = packed + (hi - lo) + slk
            for lvl in levels:
                for pb in lvl.panels:
                    storage = max(storage, int(pb.slab_lo[0]) + slk
                                  + len(pb.widths) * (pb.cp + pb.rbp)
                                  * pb.cp)
                for ub in lvl.updates:
                    storage = max(storage, int(ub.slab_lo[0]) + slk
                                  + ub.slab_rows * ub.csp)
            self.stages.append(_Stage(levels, lo, hi, srcs, src_lo,
                                      src_len, src_base, packed, storage))

    def _rebase_level(self, lp, own_sns, srcs, src_base, own_off,
                      offsets, storage):
        panels, updates = [], []
        for pb in lp.panels:
            assert isinstance(pb, PanelBucketC)
            r = lambda a: np.where(a >= 0, a + own_off, -1).astype(np.int32)
            panels.append(dataclasses.replace(
                pb, diag_start=r(pb.diag_start),
                below_start=r(pb.below_start),
                slab_lo=(pb.slab_lo + own_off).astype(np.int32),
                _dev=None))
        for ub in lp.updates:
            assert isinstance(ub, UpdateBucketC)
            # source windows: own-region descendants shift with the region;
            # packed descendants map to their packed offset
            d = ub.sds

            def remap(starts):
                valid = (d >= 0) & (starts >= 0)
                rel = starts.astype(np.int64) - \
                    np.where(valid, offsets[np.maximum(d, 0)], 0)
                in_own = np.isin(d, own_sns) & valid
                in_src = np.isin(d, srcs) & valid
                assert (valid <= (in_own | in_src)).all(), \
                    "update source panel missing from stage inputs"
                return np.where(
                    in_own, starts.astype(np.int64) + own_off,
                    np.where(in_src, src_base[np.maximum(d, 0)] + rel,
                             -1)).astype(np.int32)

            nb = dataclasses.replace(
                ub, src_start=remap(ub.src_start),
                head_start=(None if ub.head_start is None
                            else remap(ub.head_start)),
                slab_lo=(ub.slab_lo + own_off).astype(np.int32),
                _dev=None)
            nb.sds = ub.sds
            updates.append(nb)
        return LevelPlan(panels, updates)

    # ---------------- execution -----------------------------------------
    def factorize(self, A: sp.spmatrix):
        A = sp.csc_matrix(A)
        dtype = np.dtype(self.config.dtype)
        plan = self.plan
        hosts = [np.zeros(plan.storage, dtype=dtype)
                 for _ in range(2 if self.lu else 1)]
        Ap = A[self.sym.perm][:, self.sym.perm]
        hosts[0][plan.assembly_idx] = sp.tril(Ap).tocsc().data.astype(dtype)
        if self.lu:
            hosts[1][plan.assembly_idx_u] = \
                sp.tril(Ap.T, -1).tocsc().data.astype(dtype)
        for si, st in enumerate(self.stages):
            bufs = [np.zeros(st.storage, dtype=dtype) for _ in hosts]
            for host, buf in zip(hosts, bufs):
                for k in range(len(st.src_sns)):
                    b = int(st.src_base[k])
                    buf[b:b + st.src_len[k]] = \
                        host[st.src_lo[k]:st.src_lo[k] + st.src_len[k]]
                buf[st.packed:st.packed + (st.hi - st.lo)] = \
                    host[st.lo:st.hi]
            # stage programs are compiled once and reused across
            # factorize() calls (same-pattern refactorization pays zero
            # retrace/recompile, like the in-core engines)
            runner = self._runners.get(si)
            if runner is None:
                stage_plan = FactorPlan(
                    n=plan.n, xsize=st.storage - plan.slack,
                    levels=st.levels,
                    assembly_idx=np.zeros(0, np.int64),
                    offsets=plan.offsets, flops=0.0, strides=plan.strides,
                    slack=plan.slack)
                runner = self._runners[si] = _StageRunner(
                    stage_plan, self.config, lu=self.lu)
            outs = runner.run(*(jnp.asarray(b) for b in bufs))
            for host, out in zip(hosts, outs):
                res = np.asarray(out)
                host[st.lo:st.hi] = \
                    res[st.packed:st.packed + (st.hi - st.lo)]
        # the factor of record is HOST-resident (it may exceed HBM/int32);
        # the factor objects' host-solve paths read numpy directly, and
        # their occasional device paths accept the numpy arrays as-is
        if self.lu:
            from spfx.lu.factorize import LUFactor
            f = LUFactor(A, self.sym, self.plan, hosts[0], hosts[1],
                         self.config)
            f._Lh, f._Uh = hosts
        else:
            f = CholeskyFactor(A, self.sym, self.plan, hosts[0],
                               self.config)
            f._Lh = hosts[0]
        return f


class StreamingLU(StreamingCholesky):
    """Out-of-core unpivoted supernodal LU: twin host-resident L / U^T
    factors, stage-wise device execution (ref stage partition for the LU
    line, LU/Source/SparseFrame.c:1647-2231)."""

    lu = True


class _StageRunner:
    """One-dispatch scan over a rebased stage's levels (no assembly: the
    stage buffer arrives pre-assembled from the host)."""

    def __init__(self, stage_plan: FactorPlan, config: Config,
                 lu: bool = False):
        from spfx.kernels import mega
        self.lu = lu
        classes, cls_ids, chunk_ids = mega._collect(stage_plan)
        self._steps = (jnp.asarray(cls_ids), jnp.asarray(chunk_ids))
        self._flat, self._layout = mega._flatten_tables(classes)
        kinds = [(c["kind"], c["static"]) for c in classes]
        fac_prec = config.matmul_precision
        upd_prec = config.update_precision or fac_prec
        layout = self._layout

        @jax.jit
        def run(state, cls_ids, chunk_ids, *flat):
            from jax import lax
            tabs = mega._unflatten(layout, flat)
            brs = mega.make_branches(kinds, tabs, lu, fac_prec, upd_prec)
            if not (brs and len(cls_ids)):
                return state
            if lu:
                def body(carry, xs):
                    c, i = xs
                    return lax.switch(c, brs, carry, i), None

                state, _ = lax.scan(body, state, (cls_ids, chunk_ids))
                return state

            def body(L, xs):
                c, i = xs
                return lax.switch(c, brs, L, i), None

            L, _ = lax.scan(body, state[0], (cls_ids, chunk_ids))
            return (L,)

        self._run = run

    def run(self, *bufs):
        return self._run(tuple(bufs), *self._steps, *self._flat)
