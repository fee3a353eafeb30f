"""Single-dispatch numeric engine: the ENTIRE static factorization schedule
compiled as one XLA program.

Why this exists: the reference hides per-task launch latency with CUDA
streams and busy-polled events (Cholesky/Source/SparseFrame.c:2514-2523).
The TPU-native answer is stronger — compile the whole schedule into a single
``lax.scan`` so there is exactly ONE host->device dispatch per factorization,
making throughput independent of host/tunnel round-trip latency (measured
55us..1.8s per call depending on link contention; a 48^3 Poisson factorize
is ~1.8k bucket tasks, i.e. minutes of pure dispatch at the slow end).

Structure:
- every bucket in the plan (see spfx.plan.schedule) belongs to a *class*
  keyed by its static padded shapes + batch size;
- per class, the bucket index arrays are stacked into one table;
- the schedule becomes a flat step list (class_id, chunk_index), executed by
  ``lax.scan`` whose body is a ``lax.switch`` over one traced branch per
  class (each branch = the same batched gather->MXU->scatter bucket kernel
  as the per-call engine in spfx.kernels.blocks);
- assembly (ref loadA :1998-2028) is folded into the same program: the
  factorization input is just the permuted lower-triangle value vector.

Compiled size is O(#classes) (tens of branches), not O(#steps) (thousands),
so the program compiles once in seconds and caches persistently; the factor
array is the scan carry, which XLA buffer assignment keeps in place (unlike
a fully unrolled graph, where overlapping live ranges force copies — the
round-1 "fused chunk" path measured 3-5x slower for exactly that reason).
"""

from __future__ import annotations

from functools import partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from spfx.kernels import blocks


def _stack(arrs: List[np.ndarray]) -> np.ndarray:
    return np.stack(arrs, axis=0)


class _Packed:
    """One class's view into the engine-wide packed table buffer.

    Why packing exists (measured, v5e 48^3 trace): when every class closes
    over its own small s32 tables, XLA passes them all as conditional
    operands and copies each into SMEM EVERY scan step — ~26 copy-start
    ops x ~12.6us per step (~0.5s of the 0.94s factorize). Concatenating
    every class's tables into ONE flat int32 HBM buffer leaves a single
    shared operand; each branch reads its rows with dynamic_slice at
    static offsets (dynamic-slice reads from HBM measured free of the
    copy pathology, tools/switch_scaling.py)."""

    def __init__(self, buf, meta):
        self.buf = buf            # (N,) int32 device buffer (shared)
        self.meta = meta          # [(base, rowsize, rowshape), ...]


def _pack_tables(classes):
    """Concatenate every class's stacked int32 tables into one flat host
    buffer; returns (buf, metas) with per-class _Packed metadata."""
    bufs, metas = [], []
    off = 0
    for c in classes:
        meta = []
        for t in c["tables"]:
            t32 = np.ascontiguousarray(np.asarray(t, dtype=np.int32))
            rowsz = int(np.prod(t32.shape[1:], dtype=np.int64)) if \
                t32.ndim > 1 else 1
            meta.append((off, rowsz, tuple(t32.shape[1:])))
            bufs.append(t32.reshape(-1))
            off += int(t32.size)
        metas.append(meta)
    buf = np.concatenate(bufs) if bufs else np.zeros(0, np.int32)
    return buf, metas


def _take(tabs, i):
    """Row i of every class table: stacked device arrays (legacy) or a
    _Packed view into the shared flat buffer."""
    if isinstance(tabs, _Packed):
        out = []
        for base, rowsz, shp in tabs.meta:
            if rowsz == 0:                      # e.g. xrows with rbp == 0
                out.append(jnp.zeros(shp, tabs.buf.dtype))
                continue
            v = lax.dynamic_slice(tabs.buf, (base + i * rowsz,), (rowsz,))
            out.append(v.reshape(shp) if shp else v.reshape(()))
        return tuple(out)
    return tuple(lax.dynamic_index_in_dim(t, i, 0, keepdims=False)
                 for t in tabs)


def _collect(plan, solve_only: bool = False):
    """Walk levels in execution order; group buckets into classes.

    Returns (classes, cls_ids, chunk_ids) where classes is a list of
    dicts {kind, static, tables(list of stacked host arrays)}.

    The class key is the padded SHAPE only — NOT the batch size: chunks of
    the same shape but smaller batch are padded with dead tasks (width 0 /
    start -1, which every kernel masks to no-ops) up to the class max. One
    compiled switch branch per shape class is what keeps whole-program
    compile time O(#shapes); per-(shape, B) branches measured 65 classes at
    16^3 / 150 at 32^3 and 200-600s XLA time.
    """
    key_to_cid = {}
    classes = []
    cls_ids, chunk_ids = [], []

    def add(kind, key, static, host_arrays, fills):
        cid = key_to_cid.get(key)
        if cid is None:
            cid = len(classes)
            key_to_cid[key] = cid
            classes.append({"kind": kind, "key": key, "static": static,
                            "rows": [], "fills": fills})
        cls_ids.append(cid)
        chunk_ids.append(len(classes[cid]["rows"]))
        classes[cid]["rows"].append(host_arrays)

    from spfx.plan.schedule import PanelBucketC, UpdateBucketC
    for lp in plan.levels:
        if not solve_only:
            for ub in lp.updates:
                if isinstance(ub, UpdateBucketC) \
                        and ub.head_start is not None:
                    # M-tiled class (round 5): np == csp is uniform, so the
                    # key is just the tile/source/target shapes
                    add("UT", ("UT", ub.mp, ub.kp, ub.csp, ub.slab_rows),
                        (ub.mp, ub.kp, ub.csp, ub.slab_rows),
                        [ub.kw, ub.mrows, ub.rstart, ub.src_start,
                         ub.head_start, ub.slab_lo, ub.ea_idx,
                         ub.ea_rbase, ub.ea_rel, ub.ea_ng, ub.tgt_cpos],
                        [0, 0, 0, -1, -1, 0, 0, 0, -1, 0, -1])
                elif isinstance(ub, UpdateBucketC):
                    # class key deliberately EXCLUDES np (= tgt_cpos width):
                    # chunks with different true-N paddings share one switch
                    # branch (tgt_cpos re-padded to the class max below) —
                    # measured 183 -> ~110 classes at 48^3, and whole-program
                    # compile time is ~linear in class count
                    ng = ub.ea_ng if ub.ea_ng is not None \
                        else np.asarray([len(ub.ea_rbase)], np.int32)
                    add("UC", ("UC", ub.mp, ub.kp, ub.csp, ub.slab_rows),
                        (ub.mp, ub.kp, ub.csp, ub.slab_rows),
                        [ub.kw, ub.mrows, ub.src_start, ub.slab_lo,
                         ub.ea_idx, ub.ea_rbase, ub.ea_rel, ng,
                         ub.tgt_cpos],
                        [0, 0, -1, 0, 0, 0, -1, 0, -1])
                else:
                    mp = ub.src_row_start.shape[1]
                    add("U", ("U", mp, ub.kp, ub.csp),
                        (ub.kp, ub.csp),
                        [ub.kw, ub.src_row_start, ub.tgt_row_start,
                         ub.tgt_cpos], [0, -1, -1, -1])
        for pb in lp.panels:
            if isinstance(pb, PanelBucketC):
                key = ("PC", pb.cp, pb.rbp)
                if solve_only:
                    tabs = [pb.widths, pb.nbelow, pb.diag_start,
                            pb.below_start, pb.xcols, pb.xrows]
                    fills = [0, 0, -1, -1, -1, -1]
                else:
                    # uniform-block path: just masks + the block base
                    tabs = [pb.widths, pb.nbelow, pb.slab_lo]
                    fills = [0, 0, 0]
                add("PC", key, (pb.cp, pb.rbp), tabs, fills)
            else:
                cp = pb.diag_row_start.shape[1]
                rbp = pb.below_row_start.shape[1]
                if solve_only:
                    add("P", ("P", cp, rbp), (),
                        [pb.widths, pb.diag_row_start, pb.below_row_start,
                         pb.xcols, pb.xrows], [0, -1, -1, -1, -1])
                else:
                    add("P", ("P", cp, rbp), (),
                        [pb.widths, pb.diag_row_start, pb.below_row_start],
                        [0, -1, -1])

    for c in classes:
        ntab = len(c["rows"][0])
        # pad every table to the class-wide max shape: the batch dim (chunks
        # padded with dead tasks) AND trailing dims (e.g. tgt_cpos' np width
        # differs across chunks merged into one class; -1 columns are
        # dropped by the kernels' one-hot expansion)
        shapes = [tuple(max(r[i].shape[d] for r in c["rows"])
                        for d in range(c["rows"][0][i].ndim))
                  for i in range(ntab)]
        padded = []
        for r in c["rows"]:
            row = []
            for a, f, shp in zip(r, c["fills"], shapes):
                if a.shape != shp:
                    out = np.full(shp, f, a.dtype)
                    out[tuple(slice(0, d) for d in a.shape)] = a
                    a = out
                row.append(a)
            padded.append(row)
        c["tables"] = [_stack([r[i] for r in padded])
                       for i in range(ntab)]
        del c["rows"]
    return classes, np.asarray(cls_ids, np.int32), \
        np.asarray(chunk_ids, np.int32)


def _flatten_tables(classes, packed: bool = True):
    """Device operands + layout for the class tables. packed=True (the
    single-chip engines) returns ONE flat int32 buffer plus per-class
    _Packed metadata (see _Packed for why); packed=False returns the
    legacy per-table arrays (the sharded engines device_put tables with
    their own shardings)."""
    if packed:
        buf, metas = _pack_tables(classes)
        return [jnp.asarray(buf)], metas
    flat, layout = [], []
    for c in classes:
        layout.append(len(c["tables"]))
        flat.extend(jnp.asarray(t) for t in c["tables"])
    return flat, layout


def _unflatten(layout, flat):
    if layout and isinstance(layout[0], list):      # packed metas
        return [_Packed(flat[0], m) for m in layout]
    out, k = [], 0
    for n in layout:
        out.append(tuple(flat[k:k + n]))
        k += n
    return out


def region_smax(kinds_statics, tables) -> int:
    """Largest single-step writable region over the classes: UC slabs and
    PC bucket blocks (region-return engine; see make_region_branches)."""
    smax = 8
    for (kind, static), tabs in zip(kinds_statics, tables):
        if kind in ("UC", "UT"):
            mp, kp, csp, srows = static
            smax = max(smax, srows * csp)
        elif kind == "PC":
            cp, rbp = static
            B = tabs[0].shape[1]
            smax = max(smax, B * (cp + rbp) * cp)
        else:
            return 0             # rowwin classes: no region contract
    return smax


def make_region_branches(kinds, tabs_by_class, lu: bool, fac_prec,
                         upd_prec, smax: int):
    """REGION-RETURN branches: each maps (carry, chunk_index) to
    (region(s) of exactly ``smax`` elements, base offset); the scan body
    writes the region into the carry OUTSIDE the lax.switch. Rationale
    (measured, v5e, 268MB carry / 8MB regions): a branch that reads and
    writes large carry slices inside lax.switch costs 679us/step — XLA
    copies the full carry through the conditional — while the
    region-return form costs 94us/step. Requires a contig plan (PC/UC
    classes only)."""
    from spfx.kernels import blocks as B
    brs = []
    for (kind, static), tabs in zip(kinds, tabs_by_class):
        if not lu:
            if kind == "UT":
                mp, kp, csp, srows = static

                def br(L, i, tabs=tabs, mp=mp, kp=kp, csp=csp,
                       srows=srows):
                    kw, mr, rs, ss, hs, lo, eai, erb, erl, ng, cpos = \
                        _take(tabs, i)
                    with jax.default_matmul_precision(upd_prec):
                        E = B.update_rows_sym_t(
                            L, kw, mr, rs, ss, hs, cpos, mp, kp, csp)
                    return B.extend_add_region(L, lo[0], eai, erb, erl, E,
                                               srows, csp, smax, ng[0])
            elif kind == "UC":
                mp, kp, csp, srows = static

                def br(L, i, tabs=tabs, mp=mp, kp=kp, csp=csp,
                       srows=srows):
                    kw, mr, ss, lo, eai, erb, erl, ng, cpos = \
                        _take(tabs, i)
                    with jax.default_matmul_precision(upd_prec):
                        E = B.update_rows_sym_c(
                            L, kw, mr, ss, cpos, mp, kp, csp)
                    return B.extend_add_region(L, lo[0], eai, erb, erl, E,
                                               srows, csp, smax, ng[0])
            elif kind == "PC":
                cp, rbp = static

                def br(L, i, tabs=tabs, cp=cp, rbp=rbp):
                    w, nb, lo = _take(tabs, i)
                    with jax.default_matmul_precision(fac_prec):
                        return B.factor_panels_chol_region(
                            L, w, nb, lo[0], cp, rbp, smax)
            else:
                raise ValueError(f"region engine: unsupported kind {kind}")
        else:
            if kind == "UT":
                mp, kp, csp, srows = static

                def br(carry, i, tabs=tabs, mp=mp, kp=kp, csp=csp,
                       srows=srows):
                    Lx, Ux = carry
                    kw, mr, rs, ss, hs, lo, eai, erb, erl, ng, cpos = \
                        _take(tabs, i)
                    with jax.default_matmul_precision(upd_prec):
                        EL, EU = B.update_rows_lu_t(
                            Lx, Ux, kw, mr, rs, ss, hs, cpos, mp, kp, csp)
                    return B.extend_add_region_lu(
                        Lx, Ux, lo[0], eai, erb, erl, EL, EU,
                        srows, csp, smax, ng[0])
            elif kind == "UC":
                mp, kp, csp, srows = static

                def br(carry, i, tabs=tabs, mp=mp, kp=kp, csp=csp,
                       srows=srows):
                    Lx, Ux = carry
                    kw, mr, ss, lo, eai, erb, erl, ng, cpos = \
                        _take(tabs, i)
                    with jax.default_matmul_precision(upd_prec):
                        EL, EU = B.update_rows_lu_c(
                            Lx, Ux, kw, mr, ss, cpos, mp, kp, csp)
                    return B.extend_add_region_lu(
                        Lx, Ux, lo[0], eai, erb, erl, EL, EU,
                        srows, csp, smax, ng[0])
            elif kind == "PC":
                cp, rbp = static

                def br(carry, i, tabs=tabs, cp=cp, rbp=rbp):
                    Lx, Ux = carry
                    w, nb, lo = _take(tabs, i)
                    with jax.default_matmul_precision(fac_prec):
                        return B.factor_panels_lu_region(
                            Lx, Ux, w, nb, lo[0], cp, rbp, smax)
            else:
                raise ValueError(f"region engine: unsupported kind {kind}")
        brs.append(br)
    return brs


def region_scan(brs, carry0, steps, lu: bool):
    """Scan the step list with region-return branches: ONE unconditional
    carry write per step, outside the switch."""
    if not lu:
        def body(L, xs):
            c, i = xs
            reg, off = lax.switch(c, brs, L, i)
            return lax.dynamic_update_slice(L, reg, (off,)), None

        L, _ = lax.scan(body, carry0[0], steps)
        return (L,)

    def body(carry, xs):
        Lx, Ux = carry
        c, i = xs
        regl, regu, off = lax.switch(c, brs, carry, i)
        Lx = lax.dynamic_update_slice(Lx, regl, (off,))
        Ux = lax.dynamic_update_slice(Ux, regu, (off,))
        return (Lx, Ux), None

    carry, _ = lax.scan(body, carry0, steps)
    return carry


def make_branches(kinds, tabs_by_class, lu: bool, fac_prec, upd_prec):
    """One traced branch per shape class (shared by MegaRunner and the
    subtree-sharded engine in spfx.dist.subtree). Each branch maps
    (carry, chunk_index) -> carry; carry is L (Cholesky) or (Lx, Ux)."""
    from spfx.kernels import blocks as B
    brs = []
    for (kind, static), tabs in zip(kinds, tabs_by_class):
        if not lu:
            if kind == "U":
                kp, csp = static

                def br(L, i, tabs=tabs, kp=kp, csp=csp):
                    kw, srs, trs, cpos = _take(tabs, i)
                    with jax.default_matmul_precision(upd_prec):
                        E = B.update_rows_sym(L, kw, srs, cpos, kp, csp)
                    return B._win_scatter_add(L, trs, -E)
            elif kind == "UT":
                mp, kp, csp, srows = static

                def br(L, i, tabs=tabs, mp=mp, kp=kp, csp=csp,
                       srows=srows):
                    kw, mr, rs, ss, hs, lo, eai, erb, erl, ng, cpos = \
                        _take(tabs, i)
                    with jax.default_matmul_precision(upd_prec):
                        E = B.update_rows_sym_t(
                            L, kw, mr, rs, ss, hs, cpos, mp, kp, csp)
                    return B.extend_add_slab(L, lo[0], eai, erb, erl, E,
                                             srows, csp, ng[0])
            elif kind == "UC":
                mp, kp, csp, srows = static

                def br(L, i, tabs=tabs, mp=mp, kp=kp, csp=csp,
                       srows=srows):
                    kw, mr, ss, lo, eai, erb, erl, ng, cpos = \
                        _take(tabs, i)
                    with jax.default_matmul_precision(upd_prec):
                        E = B.update_rows_sym_c(
                            L, kw, mr, ss, cpos, mp, kp, csp)
                    return B.extend_add_slab(L, lo[0], eai, erb, erl, E,
                                             srows, csp, ng[0])
            elif kind == "PC":
                cp, rbp = static

                def br(L, i, tabs=tabs, cp=cp, rbp=rbp):
                    w, nb, lo = _take(tabs, i)
                    with jax.default_matmul_precision(fac_prec):
                        return B.factor_panels_chol_u(L, w, nb, lo[0],
                                                      cp, rbp)
            else:
                def br(L, i, tabs=tabs):
                    w, drs, brs_ = _take(tabs, i)
                    with jax.default_matmul_precision(fac_prec):
                        dD, dB = B.panel_deltas_chol(L, w, drs, brs_)
                    L = B._win_scatter_add(L, drs, dD)
                    return B._win_scatter_add(L, brs_, dB)
        else:
            if kind == "U":
                kp, csp = static

                def br(carry, i, tabs=tabs, kp=kp, csp=csp):
                    Lx, Ux = carry
                    kw, srs, trs, cpos = _take(tabs, i)
                    with jax.default_matmul_precision(upd_prec):
                        EL, EU = B.update_rows_lu(
                            Lx, Ux, kw, srs, cpos, kp, csp)
                    Lx = B._win_scatter_add(Lx, trs, -EL)
                    Ux = B._win_scatter_add(Ux, trs, -EU)
                    return Lx, Ux
            elif kind == "UT":
                mp, kp, csp, srows = static

                def br(carry, i, tabs=tabs, mp=mp, kp=kp, csp=csp,
                       srows=srows):
                    Lx, Ux = carry
                    kw, mr, rs, ss, hs, lo, eai, erb, erl, ng, cpos = \
                        _take(tabs, i)
                    with jax.default_matmul_precision(upd_prec):
                        EL, EU = B.update_rows_lu_t(
                            Lx, Ux, kw, mr, rs, ss, hs, cpos, mp, kp, csp)
                    Lx = B.extend_add_slab(Lx, lo[0], eai, erb, erl, EL,
                                           srows, csp, ng[0])
                    Ux = B.extend_add_slab(Ux, lo[0], eai, erb, erl, EU,
                                           srows, csp, ng[0])
                    return Lx, Ux
            elif kind == "UC":
                mp, kp, csp, srows = static

                def br(carry, i, tabs=tabs, mp=mp, kp=kp, csp=csp,
                       srows=srows):
                    Lx, Ux = carry
                    kw, mr, ss, lo, eai, erb, erl, ng, cpos = \
                        _take(tabs, i)
                    with jax.default_matmul_precision(upd_prec):
                        EL, EU = B.update_rows_lu_c(
                            Lx, Ux, kw, mr, ss, cpos, mp, kp, csp)
                    Lx = B.extend_add_slab(Lx, lo[0], eai, erb, erl, EL,
                                           srows, csp, ng[0])
                    Ux = B.extend_add_slab(Ux, lo[0], eai, erb, erl, EU,
                                           srows, csp, ng[0])
                    return Lx, Ux
            elif kind == "PC":
                cp, rbp = static

                def br(carry, i, tabs=tabs, cp=cp, rbp=rbp):
                    Lx, Ux = carry
                    w, nb, lo = _take(tabs, i)
                    with jax.default_matmul_precision(fac_prec):
                        return B.factor_panels_lu_u(Lx, Ux, w, nb, lo[0],
                                                    cp, rbp)
            else:
                def br(carry, i, tabs=tabs):
                    Lx, Ux = carry
                    w, drs, brs_ = _take(tabs, i)
                    with jax.default_matmul_precision(fac_prec):
                        dDL, dBL, dDU, dBU = B.panel_deltas_lu(
                            Lx, Ux, w, drs, brs_)
                    Lx = B._win_scatter_add(Lx, drs, dDL)
                    Lx = B._win_scatter_add(Lx, brs_, dBL)
                    Ux = B._win_scatter_add(Ux, drs, dDU)
                    Ux = B._win_scatter_add(Ux, brs_, dBU)
                    return Lx, Ux
        brs.append(br)
    return brs


class MegaRunner:
    """One-dispatch factorization for a FactorPlan (Cholesky or LU)."""

    def __init__(self, plan, lu: bool = False, config=None):
        from spfx.utils.config import DEFAULT
        config = config or DEFAULT
        self.lu = lu
        self.plan = plan
        self.storage = plan.storage
        classes, cls_ids, chunk_ids = _collect(plan)
        self._steps = (jnp.asarray(cls_ids), jnp.asarray(chunk_ids))
        self._flat, self._layout = _flatten_tables(classes)
        self._kinds = [(c["kind"], c["static"]) for c in classes]
        # region-return engine (contig plans): branches emit a fixed-size
        # region + offset; the carry write happens outside the switch
        self._smax = region_smax(self._kinds,
                                 [c["tables"] for c in classes])
        self._asm = jnp.asarray(plan.assembly_idx.astype(np.int32))
        if lu:
            self._asm_u = jnp.asarray(plan.assembly_idx_u.astype(np.int32))
        fac_prec = config.matmul_precision
        upd_prec = config.update_precision or fac_prec
        storage = self.storage

        kinds = self._kinds
        smax = self._smax

        def branches(tabs_by_class):
            return make_branches(kinds, tabs_by_class, lu, fac_prec,
                                 upd_prec)

        layout = self._layout

        if not lu:
            def once(vals, asm, cls_ids, chunk_ids, flat):
                tabs_by_class = _unflatten(layout, flat)
                L = jnp.zeros((storage,), dtype=vals.dtype).at[asm].set(vals)
                if smax and len(kinds):
                    brs = make_region_branches(kinds, tabs_by_class, False,
                                               fac_prec, upd_prec, smax)
                    (L,) = region_scan(brs, (L,), (cls_ids, chunk_ids),
                                       False)
                    return L
                brs = branches(tabs_by_class)

                def body(L, xs):
                    c, i = xs
                    return lax.switch(c, brs, L, i), None

                if len(brs):
                    L, _ = lax.scan(body, L, (cls_ids, chunk_ids))
                return L

            @jax.jit
            def run_rep(reps, vals, asm, cls_ids, chunk_ids, *flat):
                # `reps` back-to-back factorizations inside one dispatch
                # (benchmark path): a full-reduction data dependence chains
                # the iterations so none can be elided or reordered.
                def body(i, Lp):
                    v = vals + jnp.sum(Lp) * 0
                    return once(v, asm, cls_ids, chunk_ids, flat)

                init = jnp.zeros((storage,), dtype=vals.dtype)
                return lax.fori_loop(0, reps, body, init)

            # run == run_rep(1): ONE compiled program serves both the
            # production path and the bench slope path (a separate plain jit
            # doubled the dominant cold-start cost for nothing)
            def run(vals, asm, cls_ids, chunk_ids, *flat):
                return run_rep(jnp.int32(1), vals, asm, cls_ids, chunk_ids,
                               *flat)

            self._run, self._run_rep, self._once = run, run_rep, once
        else:
            def once(vals_l, vals_u, asm_l, asm_u, cls_ids, chunk_ids, flat):
                tabs_by_class = _unflatten(layout, flat)
                Lx = jnp.zeros((storage,), dtype=vals_l.dtype) \
                    .at[asm_l].set(vals_l)
                Ux = jnp.zeros((storage,), dtype=vals_u.dtype) \
                    .at[asm_u].set(vals_u)
                carry = (Lx, Ux)
                if smax and len(kinds):
                    brs = make_region_branches(kinds, tabs_by_class, True,
                                               fac_prec, upd_prec, smax)
                    return region_scan(brs, carry, (cls_ids, chunk_ids),
                                       True)
                brs = branches(tabs_by_class)

                def body(carry, xs):
                    c, i = xs
                    return lax.switch(c, brs, carry, i), None

                if len(brs):
                    carry, _ = lax.scan(body, carry, (cls_ids, chunk_ids))
                return carry

            @jax.jit
            def run_rep(reps, vals_l, vals_u, asm_l, asm_u, cls_ids,
                        chunk_ids, *flat):
                def body(i, carry):
                    d = (jnp.sum(carry[0]) + jnp.sum(carry[1])) * 0
                    return once(vals_l + d, vals_u + d, asm_l, asm_u,
                                cls_ids, chunk_ids, flat)

                init = (jnp.zeros((storage,), dtype=vals_l.dtype),
                        jnp.zeros((storage,), dtype=vals_u.dtype))
                return lax.fori_loop(0, reps, body, init)

            def run(vals_l, vals_u, asm_l, asm_u, cls_ids, chunk_ids,
                    *flat):
                return run_rep(jnp.int32(1), vals_l, vals_u, asm_l, asm_u,
                               cls_ids, chunk_ids, *flat)

            self._run, self._run_rep, self._once = run, run_rep, once

    def trace_fn(self):
        """Unjitted whole-factorization callable (vals[, vals_u]) -> factor,
        with steps/tables closed over — for callers that jit it themselves
        (e.g. the driver's compile check)."""
        if not self.lu:
            return lambda vals: self._once(vals, self._asm, *self._steps,
                                           self._flat)
        return lambda vl, vu: self._once(vl, vu, self._asm, self._asm_u,
                                         *self._steps, self._flat)

    def run(self, vals, vals_u=None):
        """Factorize from permuted lower(-and-upper^T) entry values."""
        if not self.lu:
            return self._run(vals, self._asm, *self._steps, *self._flat)
        return self._run(vals, vals_u, self._asm, self._asm_u,
                         *self._steps, *self._flat)

    def run_repeat(self, reps: int, vals, vals_u=None):
        """reps back-to-back factorizations in ONE dispatch (bench path).

        `reps` is a traced scalar, so every rep count shares one compiled
        program; timing two counts and taking the slope cancels all constant
        per-dispatch overhead (host->device round trip, sync fetch)."""
        r = jnp.asarray(reps, jnp.int32)
        if not self.lu:
            return self._run_rep(r, vals, self._asm, *self._steps,
                                 *self._flat)
        return self._run_rep(r, vals, vals_u, self._asm, self._asm_u,
                             *self._steps, *self._flat)


class MegaSolver:
    """One-dispatch forward and backward level-batched triangular solves."""

    def __init__(self, plan, lu: bool = False, config=None):
        from spfx.utils.config import DEFAULT
        config = config or DEFAULT
        self.lu = lu
        prec = config.matmul_precision
        classes, cls_ids, chunk_ids = _collect(plan, solve_only=True)
        self._flat, self._layout = _flatten_tables(classes)
        self._fwd_steps = (jnp.asarray(cls_ids), jnp.asarray(chunk_ids))
        self._bwd_steps = (jnp.asarray(cls_ids[::-1].copy()),
                           jnp.asarray(chunk_ids[::-1].copy()))
        layout = self._layout
        nclasses = len(classes)
        kinds = [(c["kind"], c["static"]) for c in classes]

        def make(prim, prim_c):
            def scan_fn(F, x, cls_ids, chunk_ids, *flat):
                tabs_by_class = _unflatten(layout, flat)

                def mk(kind, static, tabs):
                    if kind == "PC":
                        cp, rbp = static

                        def br(x, i, tabs=tabs, cp=cp, rbp=rbp):
                            w, nb, ds, bs, xcols, xrows = _take(tabs, i)
                            with jax.default_matmul_precision(prec):
                                return prim_c(F, x, w, nb, ds, bs,
                                              xcols, xrows, cp, rbp, lu)
                    else:
                        def br(x, i, tabs=tabs):
                            w, drs, brs_, xcols, xrows = _take(tabs, i)
                            with jax.default_matmul_precision(prec):
                                return prim(F, x, w, drs, brs_, xcols,
                                            xrows)
                    return br

                brs = [mk(k, s, t)
                       for (k, s), t in zip(kinds, tabs_by_class)]

                def body(x, xs):
                    c, i = xs
                    return lax.switch(c, brs, x, i), None

                if nclasses:
                    x, _ = lax.scan(body, x, (cls_ids, chunk_ids))
                return x

            return jax.jit(scan_fn, donate_argnums=1)

        fwd_c = blocks.solve_fwd_level_c.__wrapped__
        bwd_c = blocks.solve_bwd_level_c.__wrapped__
        if lu:
            self._fwd = make(blocks.solve_fwd_level_lu.__wrapped__, fwd_c)
            self._bwd = make(blocks.solve_bwd_level_lu.__wrapped__, bwd_c)
        else:
            self._fwd = make(blocks.solve_fwd_level.__wrapped__, fwd_c)
            self._bwd = make(blocks.solve_bwd_level.__wrapped__, bwd_c)

    def forward(self, F, x):
        return self._fwd(F, x, *self._fwd_steps, *self._flat)

    def backward(self, F, x):
        return self._bwd(F, x, *self._bwd_steps, *self._flat)
