"""Pallas TPU kernels for batched supernodal panel math.

The TPU counterpart of the reference's hand-written batched CUDA kernels
(Misc/cublas/cublas_demo_kernel.cu: one threadblock per task, shared-memory
staged tiles). Here: one grid step per task slab, panel tiles staged in VMEM,
MXU matmuls, SYRK+GEMM fused so the shared A-panel tile is loaded once.

These kernels fall back to interpreter mode off-TPU so the same code paths
are exercised by the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spfx.kernels import vmem


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _guard(name: str, nbytes: int) -> None:
    """Assert the modeled scoped-VMEM stack fits (TPU only: interpret mode
    has no VMEM, and the CPU test suite runs f64 shapes that would trip a
    hardware-sized cap)."""
    if not _interpret():
        vmem.assert_fits(name, nbytes)


ALIGN = 1024        # f32 HBM tile: DMA slice offsets must be multiples


def dma_ok(dtype) -> bool:
    """The DMA window gather runs on real TPUs for f32 only (the tiling
    constant and alignment absorption assume 4-byte elements)."""
    import os
    if os.environ.get("SPFX_NO_PALLAS"):
        return False
    return not _interpret() and jnp.dtype(dtype) == jnp.float32


def dma_gather(L, starts, win: int, ns: int = 8):
    """(B,) int32 element starts -> (B, win) f32 windows of L, each start
    ALIGNED DOWN to the f32 HBM tile (ALIGN elements) and clipped to
    bounds.  One DMA per window with ``ns`` in flight: measured 53ns per
    1024-element window on v5e vs 1307ns for the XLA gather's serial
    dynamic-slice loop (tools/dma_gather_probe.py) — batched window
    gathers are THE dominant cost of the mega scan (390k windows at 48^3).

    The consumer absorbs the alignment at PLAN time: row masks / one-hot
    column maps / extend-add tables are built against the superwindow row
    offset r0 = (start mod ALIGN) / kp, so no realignment compute exists
    anywhere.  ``win`` must be a multiple of ALIGN.  Dead tasks
    (start < 0) read window 0 — their rows are plan-masked."""
    assert win % ALIGN == 0, win
    B = starts.shape[0]
    lim = L.shape[0] - win

    def kernel(starts_ref, L_ref, out_ref):
        def body(sems):
            def copy(i, slot):
                s = jnp.clip(starts_ref[i], 0, lim)
                s = pl.multiple_of((s // ALIGN) * ALIGN, ALIGN)
                d = pl.multiple_of(i * win, ALIGN)
                return pltpu.make_async_copy(
                    L_ref.at[pl.ds(s, win)], out_ref.at[pl.ds(d, win)],
                    sems.at[slot])

            for k in range(min(ns, B)):
                copy(jnp.int32(k), jnp.int32(k)).start()

            def loop(i, _):
                copy(i, i % ns).wait()

                @pl.when(i + ns < B)
                def _():
                    copy(i + ns, (i + ns) % ns).start()

                return 0

            jax.lax.fori_loop(0, B, loop, 0)

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((ns,)))

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B * win,), L.dtype),
    )(starts, L).reshape(B, win)


def dma_gather2(L, starts_a, win_a: int, starts_b, win_b: int, ns: int = 8):
    """Two batched window gathers (e.g. a step's source superwindows AND its
    head windows) in ONE pallas call — halves the per-step kernel-dispatch
    cost of the mega scan's update branches (two dma_gather calls measured
    ~11us + ~7us per step, tools/step_floor_probe.py).  Same alignment /
    clipping / dead-task contract as dma_gather."""
    assert win_a % ALIGN == 0 and win_b % ALIGN == 0, (win_a, win_b)
    Ba, Bb = starts_a.shape[0], starts_b.shape[0]
    lim_a, lim_b = L.shape[0] - win_a, L.shape[0] - win_b

    def kernel(sa_ref, sb_ref, L_ref, oa_ref, ob_ref):
        def body(sems):
            def copy(i, slot):
                # windows [0, Ba) are A-windows, [Ba, Ba+Bb) B-windows
                in_a = i < Ba
                j = jnp.where(in_a, i, i - Ba)
                sr = jnp.where(in_a, jnp.clip(sa_ref[jnp.minimum(j, Ba - 1)],
                                              0, lim_a),
                               jnp.clip(sb_ref[jnp.minimum(j, Bb - 1)],
                                        0, lim_b))
                s = pl.multiple_of((sr // ALIGN) * ALIGN, ALIGN)

                def mk(o_ref, base, win):
                    d = pl.multiple_of(base * win, ALIGN)
                    return pltpu.make_async_copy(
                        L_ref.at[pl.ds(s, win)], o_ref.at[pl.ds(d, win)],
                        sems.at[slot])
                return in_a, mk, j

            def start(i, slot):
                in_a, mk, j = copy(i, slot)

                @pl.when(in_a)
                def _():
                    mk(oa_ref, j, win_a).start()

                @pl.when(jnp.logical_not(in_a))
                def _():
                    mk(ob_ref, j, win_b).start()

            def wait(i, slot):
                in_a, mk, j = copy(i, slot)

                @pl.when(in_a)
                def _():
                    mk(oa_ref, j, win_a).wait()

                @pl.when(jnp.logical_not(in_a))
                def _():
                    mk(ob_ref, j, win_b).wait()

            total = Ba + Bb
            for k in range(min(ns, total)):
                start(jnp.int32(k), jnp.int32(k))

            def loop(i, _):
                wait(i, i % ns)

                @pl.when(i + ns < total)
                def _():
                    start(i + ns, (i + ns) % ns)

                return 0

            jax.lax.fori_loop(0, total, loop, 0)

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((ns,)))

    oa, ob = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)],
        out_shape=[jax.ShapeDtypeStruct((Ba * win_a,), L.dtype),
                   jax.ShapeDtypeStruct((Bb * win_b,), L.dtype)],
    )(starts_a, starts_b, L)
    return oa.reshape(Ba, win_a), ob.reshape(Bb, win_b)


# --------------------------------------------------------------------------
# Fused batched SYRK + GEMM panel update:
#   S[b] = A[b] @ A[b]^T          (n x n)
#   G[b] = B[b] @ A[b]^T          (m x n)
# (ref launch_syrk_gemm, cublas_demo_kernel.cu:99-108)
# --------------------------------------------------------------------------

def _syrk_gemm_kernel(a_ref, b_ref, s_ref, g_ref):
    a = a_ref[...]
    at = jnp.swapaxes(a, -1, -2)
    s_ref[...] = jax.lax.dot_general(
        a, at, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=s_ref.dtype)
    g_ref[...] = jax.lax.dot_general(
        b_ref[...], at, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=g_ref.dtype)


@functools.partial(jax.jit, static_argnames=("slab",))
def syrk_gemm_batched(A, B, slab: int = 32):
    """A: (batch, n, k), B: (batch, m, k) -> (S, G). batch % slab == 0.

    slab bounds VMEM residency: in+out tiles must fit the ~16MB scoped
    limit (slab=64 at n=m=64 OOMs on v5e: 16.29M > 16M)."""
    bt, n, k = A.shape
    m = B.shape[1]
    grid = (bt // slab,)
    return pl.pallas_call(
        _syrk_gemm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((slab, n, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, m, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((slab, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, m, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, n, n), A.dtype),
            jax.ShapeDtypeStruct((bt, m, n), A.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(A, B)


# --------------------------------------------------------------------------
# Batched small Cholesky, batch-in-lanes layout:
# factor many tiny SPD matrices at once by vectorizing the elimination
# recurrence across the batch (the VPU's lane dimension), instead of running
# one serial potrf per matrix. Input (batch, c, c) with c small (<= 32).
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# Fused supernodal panel factorization in BATCH-IN-LANES layout:
# potrf(D) + L21 = B @ L11^-H in one kernel, intermediates resident in VMEM.
#
# Layout: tensors are (rows, cols, batch) so the VPU lane dimension is the
# task batch. Every column step of the factorization recurrence is then a
# STATIC SUBLANE slice (A[:, j, :]) — no cross-lane shuffles, no relayouts.
# (Both the plain-XLA unrolled recurrence and a naive (batch, r, c)-layout
# Pallas kernel measure a flat ~5-13ms per bucket call regardless of shape:
# the former round-trips (B,C,C) through HBM per column, the latter pays a
# Mosaic cross-lane shuffle per A[:, :, j] slice. This kernel does neither.)
#
# Two-phase grid (bi, ri): ri == 0 factors the diag block and leaves L11 in
# scratch (TPU grids iterate sequentially; scratch persists), every ri step
# triangular-solves one row block of the below panel against it. Replaces
# cuSOLVER potrf + cuBLAS trsm (ref Cholesky/Source/SparseFrame.c:2795-2837).
# --------------------------------------------------------------------------

LANES_CP_MAX = vmem.LANES_CP_MAX
_LANE = 128


def _lanes_masks(cp, w2, dtype):
    """(cp, slab) column/row validity mask from (1, slab) width vector."""
    return (jax.lax.broadcasted_iota(jnp.int32, (cp, w2.shape[1]), 0)
            < w2).astype(dtype)


def _mid(A, j):
    """A[:, j, :] with traced j, as a one-hot reduction (Mosaic cannot
    dynamic_slice a VALUE; masked reduction costs one extra pass over A)."""
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, A.shape[1], 1), 1)
           == j).astype(A.dtype)
    return jnp.sum(A * sel, axis=1)


def _row0(A, j):
    """A[j, :, :] with traced j (one-hot reduction over dim 0)."""
    sel = (jax.lax.broadcasted_iota(jnp.int32, (A.shape[0], 1, 1), 0)
           == j).astype(A.dtype)
    return jnp.sum(A * sel, axis=0)


def _potrf_lanes(A):
    """Cholesky of (cp, cp, slab) in lanes layout; returns L (zeros above
    the diagonal). A must already be masked (invalid rows/cols zero, unit
    diag padding). The column recurrence is a ``fori_loop`` with dynamic
    middle-dim indexing, so compiled size is O(1) in cp — this is what lets
    one kernel cover every panel width up to WIDE_CP_MAX."""
    cp = A.shape[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (cp, A.shape[2]), 0)
    cm1 = jax.lax.broadcasted_iota(jnp.int32, (1, cp, 1), 1)

    def body(j, A):
        colj = _mid(A, j)                              # (cp, slab)
        piv = jax.lax.rsqrt(
            jnp.sum(jnp.where(ri == j, colj, 0.0), axis=0, keepdims=True))
        cj = jnp.where(ri >= j, colj * piv, 0.0)
        ucj = jnp.where(ri > j, cj, 0.0)
        A = A - cj[:, None, :] * ucj[None, :, :]
        return jnp.where(cm1 == j, cj[:, None, :], A)

    return jax.lax.fori_loop(0, cp, body, A)


def _trsm_lanes(M, maxis: int, acc, unit: bool):
    """Solve X Mu = acc in lanes layout: acc (rblk, cp, slab); row j of the
    upper-triangular Mu is M sliced at index j along ``maxis``
    (maxis=1: Mu = M^T with M lower, e.g. L11; maxis=0: Mu = M upper)."""
    cp = acc.shape[1]
    ci = jax.lax.broadcasted_iota(jnp.int32, (cp, acc.shape[2]), 0)
    cm1 = jax.lax.broadcasted_iota(jnp.int32, (1, cp, 1), 1)

    def body(j, acc):
        mrow = _mid(M, j) if maxis == 1 else _row0(M, j)   # (cp, slab)
        xj = _mid(acc, j)
        if not unit:
            diag = jnp.sum(jnp.where(ci == j, mrow, 0.0), axis=0,
                           keepdims=True)
            xj = xj / diag
        tail = jnp.where(ci > j, mrow, 0.0)            # Mu[j, k], k > j
        acc = acc - xj[:, None, :] * tail[None, :, :]
        return jnp.where(cm1 == j, xj[:, None, :], acc)

    return jax.lax.fori_loop(0, cp, body, acc)


def _chol_panel_lanes_kernel(w_ref, nb_ref, d_ref, b_ref, dd_ref, db_ref,
                             l11_ref):
    cp = d_ref.shape[0]
    ri = pl.program_id(1)
    w2 = w_ref[...]                                    # (1, slab)
    cm = _lanes_masks(cp, w2, d_ref.dtype)             # (cp, slab)

    @pl.when(ri == 0)
    def _():
        Draw = d_ref[...]
        D = Draw * cm[:, None, :] * cm[None, :, :]
        eye = jnp.eye(cp, dtype=D.dtype)[:, :, None]
        D = D + eye * (1.0 - cm)[None, :, :]
        L11 = _potrf_lanes(D)
        l11_ref[...] = L11
        dd_ref[...] = (L11 - Draw) * cm[:, None, :] * cm[None, :, :]

    rblk = b_ref.shape[0]
    if rblk:
        nb2 = nb_ref[...]                              # (1, slab)
        Braw = b_ref[...]                              # (rblk, cp, slab)
        L11 = l11_ref[...]
        # X L11^T = B: M[j, k] = L11[k, j] -> row j of M is L11[:, j, :]
        L21 = _trsm_lanes(L11, 1, Braw * cm[None, :, :], unit=False)
        base = ri * rblk
        rm = ((jax.lax.broadcasted_iota(
            jnp.int32, (rblk, nb2.shape[1]), 0) + base)
            < nb2).astype(Braw.dtype)
        db_ref[...] = (L21 - Braw) * cm[None, :, :] * rm[:, None, :]


def _lanes_slab(B: int, cp: int, rbp: int):
    """Lane-count per grid step (see vmem.lanes_slab; VMEM pressure is
    managed by the footprint-model routing in blocks.py, not by shrinking
    slab — Mosaic pads the lane dim to 128 regardless)."""
    return vmem.lanes_slab(B)


def _row_blk(rbp: int, cp: int, slab: int, itemsize: int = 4,
             budget: int = 1 << 16):
    """Below-panel rows per grid step, bounded in PADDED tile bytes (see
    vmem.lanes_row_blk — round 3's nominal-byte version under-counted
    slab < 128 blocks by 128/slab and OOMed on hardware)."""
    return vmem.lanes_row_blk(rbp, cp, slab, itemsize, budget)


def _chol_diag_lanes_kernel(w_ref, d_ref, dd_ref):
    cp = d_ref.shape[0]
    w2 = w_ref[...]
    cm = _lanes_masks(cp, w2, d_ref.dtype)
    Draw = d_ref[...]
    D = Draw * cm[:, None, :] * cm[None, :, :]
    eye = jnp.eye(cp, dtype=D.dtype)[:, :, None]
    D = D + eye * (1.0 - cm)[None, :, :]
    L11 = _potrf_lanes(D)
    dd_ref[...] = (L11 - Draw) * cm[:, None, :] * cm[None, :, :]


@functools.partial(jax.jit, static_argnames=("cp", "rbp"))
def chol_panel_deltas_lanes(widths, nbelow, DrawT, BrawT, cp: int, rbp: int):
    """Lanes-layout panel deltas: DrawT (cp, cp, B), BrawT (rbp, cp, B),
    widths/nbelow (B,) -> (ddT (cp,cp,B), dbT (rbp,cp,B))."""
    B = widths.shape[0]
    slab = _lanes_slab(B, cp, rbp)
    _guard("chol_panel_deltas_lanes",
           vmem.lanes_panel_bytes(cp, rbp, B, DrawT.dtype.itemsize))
    w2 = widths.reshape(1, B)
    sblk = pl.BlockSpec((1, slab), lambda bi, ri: (0, bi),
                        memory_space=pltpu.VMEM)
    dblk = pl.BlockSpec((cp, cp, slab), lambda bi, ri: (0, 0, bi),
                        memory_space=pltpu.VMEM)
    if rbp == 0:
        sblk1 = pl.BlockSpec((1, slab), lambda bi: (0, bi),
                             memory_space=pltpu.VMEM)
        dblk1 = pl.BlockSpec((cp, cp, slab), lambda bi: (0, 0, bi),
                             memory_space=pltpu.VMEM)
        dd = pl.pallas_call(
            _chol_diag_lanes_kernel,
            grid=(B // slab,),
            in_specs=[sblk1, dblk1],
            out_specs=dblk1,
            out_shape=jax.ShapeDtypeStruct((cp, cp, B), DrawT.dtype),
            compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
        )(w2, DrawT)
        return dd, jnp.zeros((0, cp, B), DrawT.dtype)
    rblk = _row_blk(rbp, cp, slab, DrawT.dtype.itemsize)
    grid = (B // slab, rbp // rblk)
    nb2 = nbelow.reshape(1, B)
    bblk = pl.BlockSpec((rblk, cp, slab), lambda bi, ri: (ri, 0, bi),
                        memory_space=pltpu.VMEM)
    dd, db = pl.pallas_call(
        _chol_panel_lanes_kernel,
        grid=grid,
        in_specs=[sblk, sblk, dblk, bblk],
        out_specs=[dblk, bblk],
        out_shape=[
            jax.ShapeDtypeStruct((cp, cp, B), DrawT.dtype),
            jax.ShapeDtypeStruct((rbp, cp, B), DrawT.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((cp, cp, slab), DrawT.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(w2, nb2, DrawT, BrawT)
    return dd, db


def _getrf_lanes(D, cm):
    """No-pivot LU of (cp, cp, slab) in lanes layout, in-place right-looking
    fori recurrence (see _potrf_lanes for why fori + dynamic middle-dim
    slicing). Returns (L11 with unit diag, U11) in (row, col, slab) layout."""
    cp = D.shape[0]
    ri2 = jax.lax.broadcasted_iota(jnp.int32, (cp, D.shape[2]), 0)
    cm1 = jax.lax.broadcasted_iota(jnp.int32, (1, cp, 1), 1)

    def body(k, A):
        rowk = _row0(A, k)                                       # (cp, slab)
        colk = _mid(A, k)                                        # (cp, slab)
        piv = jnp.sum(jnp.where(ri2 == k, colk, 0.0), axis=0,
                      keepdims=True)
        lcol = jnp.where(ri2 > k, colk / piv, 0.0)
        urow = jnp.where(ri2 >= k, rowk, 0.0)          # A[k, j], j >= k
        A = A - lcol[:, None, :] * urow[None, :, :]
        # after the rank-1, column k is 0 below the diagonal; deposit L there
        return A + lcol[:, None, :] * (cm1 == k).astype(A.dtype)

    A = jax.lax.fori_loop(0, cp, body, D)
    rr = jax.lax.broadcasted_iota(jnp.int32, (cp, cp, 1), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (cp, cp, 1), 1)
    eye = jnp.eye(cp, dtype=A.dtype)[:, :, None]
    L11 = jnp.where(rr > cc, A, 0.0) + eye
    U11 = jnp.where(rr <= cc, A, 0.0)
    return L11, U11


def _lu_diag_prep(dl_ref, du_ref, cm, cp):
    DLraw = dl_ref[...]
    DUraw = du_ref[...]
    DL = DLraw * cm[:, None, :] * cm[None, :, :]
    DU = DUraw * cm[:, None, :] * cm[None, :, :]
    rr = jax.lax.broadcasted_iota(jnp.int32, (cp, cp, 1), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (cp, cp, 1), 1)
    D = jnp.where(rr >= cc, DL, 0.0) \
        + jnp.where(rr < cc, jnp.swapaxes(DU, 0, 1), 0.0)
    eye = jnp.eye(cp, dtype=D.dtype)[:, :, None]
    return DLraw, DUraw, D + eye * (1.0 - cm)[None, :, :]


def _lu_panel_lanes_kernel(w_ref, nb_ref, dl_ref, du_ref, bl_ref, bu_ref,
                           ddl_ref, ddu_ref, dbl_ref, dbu_ref,
                           l11_ref, u11_ref):
    cp = dl_ref.shape[0]
    ri = pl.program_id(1)
    w2 = w_ref[...]
    cm = _lanes_masks(cp, w2, dl_ref.dtype)            # (cp, slab)

    @pl.when(ri == 0)
    def _():
        DLraw, DUraw, D = _lu_diag_prep(dl_ref, du_ref, cm, cp)
        L11, U11 = _getrf_lanes(D, cm)
        l11_ref[...] = L11
        u11_ref[...] = U11
        U11t = jnp.swapaxes(U11, 0, 1)
        ddl_ref[...] = (L11 - DLraw) * cm[:, None, :] * cm[None, :, :]
        ddu_ref[...] = (U11t - DUraw) * cm[:, None, :] * cm[None, :, :]

    rblk = bl_ref.shape[0]
    if rblk:
        nb2 = nb_ref[...]
        BLraw = bl_ref[...]
        BUraw = bu_ref[...]
        L11 = l11_ref[...]
        U11 = u11_ref[...]
        # L21: X U11 = BL; row j of M is U11[j, :, :]
        L21 = _trsm_lanes(U11, 0, BLraw * cm[None, :, :], unit=False)
        # U12t: X L11^T = BU (unit diag); row j of M is L11[:, j, :]
        U12t = _trsm_lanes(L11, 1, BUraw * cm[None, :, :], unit=True)
        base = ri * rblk
        rm = ((jax.lax.broadcasted_iota(
            jnp.int32, (rblk, nb2.shape[1]), 0) + base)
            < nb2).astype(BLraw.dtype)
        dbl_ref[...] = (L21 - BLraw) * cm[None, :, :] * rm[:, None, :]
        dbu_ref[...] = (U12t - BUraw) * cm[None, :, :] * rm[:, None, :]


def _lu_diag_lanes_kernel(w_ref, dl_ref, du_ref, ddl_ref, ddu_ref):
    cp = dl_ref.shape[0]
    w2 = w_ref[...]
    cm = _lanes_masks(cp, w2, dl_ref.dtype)
    DLraw, DUraw, D = _lu_diag_prep(dl_ref, du_ref, cm, cp)
    L11, U11 = _getrf_lanes(D, cm)
    U11t = jnp.swapaxes(U11, 0, 1)
    ddl_ref[...] = (L11 - DLraw) * cm[:, None, :] * cm[None, :, :]
    ddu_ref[...] = (U11t - DUraw) * cm[:, None, :] * cm[None, :, :]


@functools.partial(jax.jit, static_argnames=("cp", "rbp"))
def lu_panel_deltas_lanes(widths, nbelow, DLt, DUt, BLt, BUt,
                          cp: int, rbp: int):
    """Lanes-layout LU panel deltas -> (ddlT, dduT, dblT, dbuT)."""
    B = widths.shape[0]
    slab = _lanes_slab(B, cp, rbp)
    _guard("lu_panel_deltas_lanes",
           vmem.lanes_panel_bytes(cp, rbp, B, DLt.dtype.itemsize, lu=True))
    w2 = widths.reshape(1, B)
    sblk = pl.BlockSpec((1, slab), lambda bi, ri: (0, bi),
                        memory_space=pltpu.VMEM)
    dblk = pl.BlockSpec((cp, cp, slab), lambda bi, ri: (0, 0, bi),
                        memory_space=pltpu.VMEM)
    if rbp == 0:
        sblk1 = pl.BlockSpec((1, slab), lambda bi: (0, bi),
                             memory_space=pltpu.VMEM)
        dblk1 = pl.BlockSpec((cp, cp, slab), lambda bi: (0, 0, bi),
                             memory_space=pltpu.VMEM)
        ddl, ddu = pl.pallas_call(
            _lu_diag_lanes_kernel,
            grid=(B // slab,),
            in_specs=[sblk1, dblk1, dblk1],
            out_specs=[dblk1, dblk1],
            out_shape=[jax.ShapeDtypeStruct((cp, cp, B), DLt.dtype),
                       jax.ShapeDtypeStruct((cp, cp, B), DLt.dtype)],
            compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
        )(w2, DLt, DUt)
        z = jnp.zeros((0, cp, B), DLt.dtype)
        return ddl, ddu, z, z
    rblk = _row_blk(rbp, cp, slab, DLt.dtype.itemsize, budget=1 << 17)
    grid = (B // slab, rbp // rblk)
    nb2 = nbelow.reshape(1, B)
    bblk = pl.BlockSpec((rblk, cp, slab), lambda bi, ri: (ri, 0, bi),
                        memory_space=pltpu.VMEM)
    ddl, ddu, dbl, dbu = pl.pallas_call(
        _lu_panel_lanes_kernel,
        grid=grid,
        in_specs=[sblk, sblk, dblk, dblk, bblk, bblk],
        out_specs=[dblk, dblk, bblk, bblk],
        out_shape=[
            jax.ShapeDtypeStruct((cp, cp, B), DLt.dtype),
            jax.ShapeDtypeStruct((cp, cp, B), DLt.dtype),
            jax.ShapeDtypeStruct((rbp, cp, B), DLt.dtype),
            jax.ShapeDtypeStruct((rbp, cp, B), DLt.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((cp, cp, slab), DLt.dtype),
                        pltpu.VMEM((cp, cp, slab), DLt.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(w2, nb2, DLt, DUt, BLt, BUt)
    return ddl, ddu, dbl, dbu

# --------------------------------------------------------------------------
# Slab extend-add: apply update rows into a (slab_rows, csp) VMEM-resident
# view of the factor with dynamic-SUBLANE row adds. Replaces XLA scatter_add
# for the descendant->ancestor extend-add (ref mappedSubtract,
# cuda_kernel.cu:62-124): XLA's TPU scatter costs ~2.6us/row (measured,
# independent of uniqueness/sortedness); this loop costs VMEM-op time.
# Target rows land on sublanes because every panel stride equals csp (the
# slab is storage viewed 2-D), so no dynamic lane indexing is needed.
# --------------------------------------------------------------------------


def _extend_add_kernel(rows_ref, e_ref, slab_in_ref, slab_ref):
    RE = e_ref.shape[0]
    base = pl.program_id(0) * RE

    @pl.when(pl.program_id(0) == 0)
    def _():
        slab_ref[...] = slab_in_ref[...]

    def body(r, carry):
        t = rows_ref[base + r]

        @pl.when(t >= 0)
        def _():
            slab_ref[pl.ds(t, 1), :] = slab_ref[pl.ds(t, 1), :] \
                - e_ref[pl.ds(r, 1), :]
        return carry

    jax.lax.fori_loop(0, RE, body, 0)


def extend_add_rows(slab, rows, Ef):
    """slab (Rs, csp) -= rows of Ef (RE_total, csp) at sublane indices
    ``rows`` (RE_total,); row < 0 drops. Falls back to XLA scatter when
    Mosaic can't hold the slab (complex dtypes, or a slab whose padded
    bytes exceed the routing cap — near-root strides can exceed VMEM)."""
    Rs, csp = slab.shape
    total = Ef.shape[0]
    it = Ef.dtype.itemsize
    RE = vmem.extend_add_re(csp, total, it)
    if jnp.iscomplexobj(Ef) or vmem.no_pallas() \
            or vmem.extend_add_bytes(Rs, csp, RE, it) > vmem.CAP_ROUTE:
        sent = jnp.where(rows >= 0, rows, Rs)      # Rs is OOB -> dropped
        return slab.at[sent].add(-Ef, mode="drop")
    _guard("extend_add_rows", vmem.extend_add_bytes(Rs, csp, RE, it))
    pad = (-total) % RE
    if pad:
        Ef = jnp.concatenate([Ef, jnp.zeros((pad, csp), Ef.dtype)])
        rows = jnp.concatenate([rows, jnp.full((pad,), -1, rows.dtype)])
    return pl.pallas_call(
        _extend_add_kernel,
        grid=((total + pad) // RE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((RE, csp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Rs, csp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Rs, csp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rs, csp), Ef.dtype),
        input_output_aliases={2: 0},       # slab buffer updated in place
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(rows, Ef, slab)


# --------------------------------------------------------------------------
# WIDE panel factorization (cp > LANES_CP_MAX): one task per grid step,
# task-major (B, cp, cp) layout, blocked right-looking factorization with
# 32-column panels — unrolled rank-1 recurrences inside a panel, MXU
# dot_generals for the trailing update and the below-panel triangular solves.
# Replaces the XLA linalg expanders (While loops, ~6.5 ms/step inside the
# mega scan) for the near-root supernodes; the reference's analogue is its
# blocked right-looking GPU potrf in 256-column blocks
# (Cholesky/Source/SparseFrame.c:2838-2940) and blocked LU (:3384-3513).
# --------------------------------------------------------------------------

WIDE_CP_MAX = vmem.WIDE_CP_MAX
_WBLK = 32                 # column-panel width of the blocked factorization


def _iota2(n, m, d):
    return jax.lax.broadcasted_iota(jnp.int32, (n, m), d)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=a.dtype)


def _wide_potrf(D, cp: int):
    """Blocked Cholesky of one (cp, cp) tile in VMEM. D must be masked
    (invalid rows/cols zero, unit diagonal on padding) and SYMMETRIC.
    Returns full A with L in the lower triangle.

    The 32-column panel recurrence runs as a ``fori_loop`` whose body
    extracts the pivot row/column with dynamic one-hot contractions (Mosaic
    cannot index lanes dynamically; one-hot matvecs ride the MXU instead),
    so compiled size is O(cp/32), not O(cp)."""
    A = D
    lane = _iota2(1, _WBLK, 1)
    rows = _iota2(cp, 1, 0)
    colsel0 = _iota2(_WBLK, 1, 0)
    for s in range(0, cp, _WBLK):
        e = s + _WBLK

        def body(j, P, s=s):
            g = s + j
            colsel = (colsel0 == j).astype(P.dtype)        # (_WBLK, 1)
            rowsel = (_iota2(1, cp, 1) == g).astype(P.dtype)
            pcol = _dot(P, colsel, ((1,), (0,)))           # P[:, j] (cp, 1)
            prow = _dot(rowsel, P, ((1,), (0,)))           # P[g, :] (1, _WBLK)
            piv = jax.lax.rsqrt(_dot(rowsel, pcol, ((1,), (0,))))
            lcol = pcol * piv * (rows >= g).astype(P.dtype)
            # row g of the trailing symmetric block == column g
            lrow = prow * piv * (lane > j).astype(P.dtype)
            return jnp.where(lane == j, lcol, P - lcol * lrow)

        P = jax.lax.fori_loop(0, _WBLK, body, A[:, s:e])
        A = _wide_put(A, P, s, e, cp)
        if e < cp:
            # trailing update rides the MXU: A[:, e:] -= P @ P[e:, :]^T
            # (all rows: keeps the trailing block symmetric, see above)
            upd = _dot(P, A[e:, s:e], ((1,), (1,)))
            A = jnp.concatenate([A[:, :e], A[:, e:] - upd], axis=1)
    return A


def _wide_put(A, P, s: int, e: int, cp: int, axis: int = 1):
    """A[:, s:e] = P (or rows for axis=0) without zero-size concatenates."""
    parts = []
    if s:
        parts.append(A[:, :s] if axis == 1 else A[:s])
    parts.append(P)
    if e < cp:
        parts.append(A[:, e:] if axis == 1 else A[e:])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _wide_trsm(T, X, cp: int, unit: bool = False):
    """Solve X M = B in-place-blocked, M = T upper triangular (T is the
    transposed lower factor, resident in VMEM scratch), X (rblk, cp)."""
    lane = _iota2(1, _WBLK, 1)
    colsel0 = _iota2(_WBLK, 1, 0)
    for s in range(0, cp, _WBLK):
        e = s + _WBLK
        Xb = X[:, s:e]
        if s:
            Xb = Xb - _dot(X[:, :s], T[:s, s:e], ((1,), (0,)))

        def body(j, Xb, s=s):
            g = s + j
            colsel = (colsel0 == j).astype(Xb.dtype)
            rowsel = (_iota2(1, cp, 1) == g).astype(Xb.dtype)
            trow = _dot(rowsel, T[:, s:e], ((1,), (0,)))   # T[g, s:e]
            xj = _dot(Xb, colsel, ((1,), (0,)))            # Xb[:, j]
            if not unit:
                piv = _dot(trow, colsel, ((1,), (0,)))     # T[g, g]
                xj = xj * pl.reciprocal(piv, approx=False)
            mrow = trow * (lane > j).astype(Xb.dtype)
            return jnp.where(lane == j, xj, Xb - xj * mrow)

        Xb = jax.lax.fori_loop(0, _WBLK, body, Xb)
        X = _wide_put(X, Xb, s, e, cp)
    return X


def _chol_panel_wide_kernel(w_ref, nb_ref, d_ref, b_ref, dd_ref, db_ref,
                            t_ref):
    cp = d_ref.shape[1]
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    w = w_ref[bi]
    cmr = (_iota2(cp, 1, 0) < w).astype(d_ref.dtype)     # (cp, 1) rows
    cmc = (_iota2(1, cp, 1) < w).astype(d_ref.dtype)     # (1, cp) cols

    @pl.when(ri == 0)
    def _():
        Draw = d_ref[0]
        # the panel stores only the LOWER triangle (the upper half of the
        # window is scatter garbage, like lax.linalg.cholesky's
        # symmetrize_input=False contract); rebuild the symmetric D the
        # in-kernel row-as-column trick relies on
        rr = _iota2(cp, cp, 0)
        cc = _iota2(cp, cp, 1)
        Dl = jnp.where(rr >= cc, Draw * cmr * cmc, 0.0)
        D = Dl + jnp.where(rr < cc, Dl.T, 0.0)
        D = D + jnp.eye(cp, dtype=D.dtype) * (1.0 - cmc)
        A = _wide_potrf(D, cp)
        L11 = jnp.where(rr >= cc, A, 0.0)
        dd_ref[0] = (L11 - Draw) * cmr * cmc
        t_ref[...] = L11.T                               # M = L11^T (upper)

    rblk = b_ref.shape[1]
    if rblk:
        nb = nb_ref[bi]
        Braw = b_ref[0]                                  # (rblk, cp)
        T = t_ref[...]
        L21 = _wide_trsm(T, Braw * cmc, cp)
        rm = ((_iota2(rblk, 1, 0) + ri * rblk) < nb).astype(Braw.dtype)
        db_ref[0] = (L21 - Braw) * cmc * rm


def _wide_row_blk(rbp: int, cp: int, itemsize: int = 4,
                  budget: int = 1 << 17):
    """Below rows per wide grid step, in padded tile bytes (vmem model)."""
    return vmem.wide_row_blk(rbp, cp, itemsize, budget)


def _chol_diag_wide_kernel(w_ref, d_ref, dd_ref):
    cp = d_ref.shape[1]
    w = w_ref[pl.program_id(0)]
    cmr = (_iota2(cp, 1, 0) < w).astype(d_ref.dtype)
    cmc = (_iota2(1, cp, 1) < w).astype(d_ref.dtype)
    Draw = d_ref[0]
    rr = _iota2(cp, cp, 0)
    cc = _iota2(cp, cp, 1)
    Dl = jnp.where(rr >= cc, Draw * cmr * cmc, 0.0)    # lower-only storage
    D = Dl + jnp.where(rr < cc, Dl.T, 0.0)
    D = D + jnp.eye(cp, dtype=D.dtype) * (1.0 - cmc)
    A = _wide_potrf(D, cp)
    L11 = jnp.where(rr >= cc, A, 0.0)
    dd_ref[0] = (L11 - Draw) * cmr * cmc


@functools.partial(jax.jit, static_argnames=("cp", "rbp"))
def chol_panel_deltas_wide(widths, nbelow, Draw, Braw, cp: int, rbp: int):
    """Task-major wide-panel Cholesky deltas: Draw (B, cp, cp),
    Braw (B, rbp, cp), widths/nbelow (B,) -> (dd, db) same layouts."""
    B = widths.shape[0]
    _guard("chol_panel_deltas_wide",
           vmem.wide_panel_bytes(cp, rbp, B, Draw.dtype.itemsize))
    w2 = widths
    nb2 = nbelow
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if rbp == 0:
        dd = pl.pallas_call(
            _chol_diag_wide_kernel,
            grid=(B,),
            in_specs=[smem,
                      pl.BlockSpec((1, cp, cp), lambda bi: (bi, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, cp, cp), lambda bi: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, cp, cp), Draw.dtype),
            compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
        )(w2, Draw)
        return dd, jnp.zeros((B, 0, cp), Draw.dtype)
    rblk = _wide_row_blk(rbp, cp, Draw.dtype.itemsize)
    grid = (B, rbp // rblk)
    sblk = smem
    dblk = pl.BlockSpec((1, cp, cp), lambda bi, ri: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    bblk = pl.BlockSpec((1, rblk, cp),
                        lambda bi, ri: (bi, ri, 0),
                        memory_space=pltpu.VMEM)
    dd, db = pl.pallas_call(
        _chol_panel_wide_kernel,
        grid=grid,
        in_specs=[sblk, sblk, dblk, bblk],
        out_specs=[dblk, bblk],
        out_shape=[
            jax.ShapeDtypeStruct((B, cp, cp), Draw.dtype),
            jax.ShapeDtypeStruct((B, rbp, cp), Draw.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((cp, cp), Draw.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(w2, nb2, Draw, Braw)
    return dd, db


def _wide_getrf(D, cp: int):
    """Blocked no-pivot LU of one (cp, cp) VMEM tile (masked input, unit
    diagonal padding). Returns A holding L strictly below the diagonal and
    U on/above it."""
    A = D
    lane = _iota2(1, _WBLK, 1)
    rows = _iota2(cp, 1, 0)
    colsel0 = _iota2(_WBLK, 1, 0)
    for s in range(0, cp, _WBLK):
        e = s + _WBLK

        def body(j, P, s=s):
            g = s + j
            colsel = (colsel0 == j).astype(P.dtype)
            rowsel = (_iota2(1, cp, 1) == g).astype(P.dtype)
            pcol = _dot(P, colsel, ((1,), (0,)))           # P[:, j]
            prow = _dot(rowsel, P, ((1,), (0,)))           # P[g, :]
            piv = pl.reciprocal(_dot(rowsel, pcol, ((1,), (0,))),
                                approx=False)
            colm = (rows > g).astype(P.dtype)
            lcol = pcol * piv * colm                       # rows > g
            urow = prow * (lane > j).astype(P.dtype)
            # store L below the diagonal; keep U (incl pivot) on/above
            newcol = pcol * (1.0 - colm) + lcol
            return jnp.where(lane == j, newcol, P - lcol * urow)

        P = jax.lax.fori_loop(0, _WBLK, body, A[:, s:e])
        A = _wide_put(A, P, s, e, cp)
        if e < cp:
            # U[s:e, e:] = unit_lower(L[s:e, s:e])^{-1} A[s:e, e:]
            ri0 = _iota2(_WBLK, 1, 0)

            def rbody(k, R, s=s):
                rowselk = (_iota2(1, cp, 1) == s + k).astype(R.dtype)
                lrow = _dot(rowselk, P, ((1,), (0,))) \
                    * (lane < k).astype(R.dtype)           # L[s+k, s:s+k]
                rsel = (_iota2(1, _WBLK, 1) == k).astype(R.dtype)
                rk = _dot(rsel, R, ((1,), (0,))) \
                    - _dot(lrow, R, ((1,), (0,)))
                return jnp.where(ri0 == k, rk, R)

            R = jax.lax.fori_loop(1, _WBLK, rbody, A[s:e, e:])
            # trailing: A[e:, e:] -= L[e:, s:e] @ U[s:e, e:]; rows s:e of
            # the trailing columns become the U rows computed above
            upd = _dot(P[e:, :], R, ((1,), (0,)))
            tail = jnp.concatenate([R, A[e:, e:] - upd], axis=0)
            A = jnp.concatenate(
                [A[:, :e], _wide_put(A[:, e:], tail, s, cp, cp, axis=0)],
                axis=1)
    return A


def _lu_panel_wide_kernel(w_ref, nb_ref, dl_ref, du_ref, bl_ref, bu_ref,
                          ddl_ref, ddu_ref, dbl_ref, dbu_ref,
                          tl_ref, u_ref):
    cp = dl_ref.shape[1]
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    w = w_ref[bi]
    cmr = (_iota2(cp, 1, 0) < w).astype(dl_ref.dtype)
    cmc = (_iota2(1, cp, 1) < w).astype(dl_ref.dtype)

    @pl.when(ri == 0)
    def _():
        DLraw = dl_ref[0]
        DUraw = du_ref[0]
        DL = DLraw * cmr * cmc
        DU = DUraw * cmr * cmc
        rr = _iota2(cp, cp, 0)
        cc = _iota2(cp, cp, 1)
        D = jnp.where(rr >= cc, DL, 0.0) \
            + jnp.where(rr < cc, DU.T, 0.0)
        D = D + jnp.eye(cp, dtype=D.dtype) * (1.0 - cmc)
        A = _wide_getrf(D, cp)
        L11 = jnp.where(rr > cc, A, 0.0) + jnp.eye(cp, dtype=A.dtype)
        U11 = jnp.where(rr <= cc, A, 0.0)
        ddl_ref[0] = (L11 - DLraw) * cmr * cmc
        ddu_ref[0] = (U11.T - DUraw) * cmr * cmc
        tl_ref[...] = L11.T                      # for X L11^T = BU (unit)
        u_ref[...] = U11                         # for X U11 = BL

    rblk = bl_ref.shape[1]
    if rblk:
        nb = nb_ref[bi]
        BLraw = bl_ref[0]
        BUraw = bu_ref[0]
        L21 = _wide_trsm(u_ref[...], BLraw * cmc, cp)
        U12t = _wide_trsm(tl_ref[...], BUraw * cmc, cp, unit=True)
        rm = ((_iota2(rblk, 1, 0) + ri * rblk) < nb).astype(BLraw.dtype)
        dbl_ref[0] = (L21 - BLraw) * cmc * rm
        dbu_ref[0] = (U12t - BUraw) * cmc * rm


def _lu_diag_wide_kernel(w_ref, dl_ref, du_ref, ddl_ref, ddu_ref):
    cp = dl_ref.shape[1]
    w = w_ref[pl.program_id(0)]
    cmr = (_iota2(cp, 1, 0) < w).astype(dl_ref.dtype)
    cmc = (_iota2(1, cp, 1) < w).astype(dl_ref.dtype)
    DLraw = dl_ref[0]
    DUraw = du_ref[0]
    rr = _iota2(cp, cp, 0)
    cc = _iota2(cp, cp, 1)
    D = jnp.where(rr >= cc, DLraw * cmr * cmc, 0.0) \
        + jnp.where(rr < cc, (DUraw * cmr * cmc).T, 0.0) \
        + jnp.eye(cp, dtype=DLraw.dtype) * (1.0 - cmc)
    A = _wide_getrf(D, cp)
    L11 = jnp.where(rr > cc, A, 0.0) + jnp.eye(cp, dtype=A.dtype)
    U11 = jnp.where(rr <= cc, A, 0.0)
    ddl_ref[0] = (L11 - DLraw) * cmr * cmc
    ddu_ref[0] = (U11.T - DUraw) * cmr * cmc


@functools.partial(jax.jit, static_argnames=("cp", "rbp"))
def lu_panel_deltas_wide(widths, nbelow, DL, DU, BL, BU, cp: int, rbp: int):
    """Task-major wide-panel LU deltas -> (ddl, ddu, dbl, dbu)."""
    B = widths.shape[0]
    _guard("lu_panel_deltas_wide",
           vmem.wide_panel_bytes(cp, rbp, B, DL.dtype.itemsize, lu=True))
    w2 = widths
    nb2 = nbelow
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if rbp == 0:
        dblk1 = pl.BlockSpec((1, cp, cp), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
        ddl, ddu = pl.pallas_call(
            _lu_diag_wide_kernel,
            grid=(B,),
            in_specs=[smem, dblk1, dblk1],
            out_specs=[dblk1, dblk1],
            out_shape=[jax.ShapeDtypeStruct((B, cp, cp), DL.dtype),
                       jax.ShapeDtypeStruct((B, cp, cp), DL.dtype)],
            compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
        )(w2, DL, DU)
        z = jnp.zeros((B, 0, cp), DL.dtype)
        return ddl, ddu, z, z
    rblk = _wide_row_blk(rbp, cp, DL.dtype.itemsize, budget=1 << 16)
    grid = (B, rbp // rblk)
    sblk = smem
    dblk = pl.BlockSpec((1, cp, cp), lambda bi, ri: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    bblk = pl.BlockSpec((1, rblk, cp),
                        lambda bi, ri: (bi, ri, 0),
                        memory_space=pltpu.VMEM)
    ddl, ddu, dbl, dbu = pl.pallas_call(
        _lu_panel_wide_kernel,
        grid=grid,
        in_specs=[sblk, sblk, dblk, dblk, bblk, bblk],
        out_specs=[dblk, dblk, bblk, bblk],
        out_shape=[
            jax.ShapeDtypeStruct((B, cp, cp), DL.dtype),
            jax.ShapeDtypeStruct((B, cp, cp), DL.dtype),
            jax.ShapeDtypeStruct((B, rbp, cp), DL.dtype),
            jax.ShapeDtypeStruct((B, rbp, cp), DL.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((cp, cp), DL.dtype),
                        pltpu.VMEM((cp, cp), DL.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(w2, nb2, DL, DU, BL, BU)
    return ddl, ddu, dbl, dbu


# --------------------------------------------------------------------------
# Block potrf + explicit inverse, batch-in-lanes: the serial O(NB) work of a
# panel factorization confined to (NB, NB) diagonal blocks; everything else
# (column panels, trailing updates, below-panel triangular solves) becomes
# batched MXU matmuls against the INVERTED diagonal block — the standard
# GPU-BLAS trsm-via-inverted-diagonal-blocks scheme (what cuBLAS does inside
# trsm, and the reference leans on via cuSOLVER/cuBLAS,
# Cholesky/Source/SparseFrame.c:2795-2940). Round-4 profile: the previous
# whole-panel one-hot recurrences made PC classes 3.6-4.8 ms/call — 67% of
# factorize time for ~15% of its flops.
# --------------------------------------------------------------------------

NB = 32                    # diagonal block size of the blocked panel path


def _inv_lower_lanes(L, cm):
    """X = L^{-1} for lower-triangular L (nb, nb, slab) in lanes layout
    (unit rows on padded columns). Row-serial forward substitution:
    X[i, :] = (e_i - L[i, :i] @ X[:i, :]) / L[i, i]."""
    nb = L.shape[0]
    slab = L.shape[2]
    ki = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)   # k (contract)
    r1 = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)   # row selector
    ji = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)   # col selector
    X0 = jnp.eye(nb, dtype=L.dtype)[:, :, None] \
        * jnp.ones((1, 1, slab), L.dtype)

    def body(i, X):
        Lrow = _row0(L, i)                                # (nb, slab) L[i, k]
        piv = jnp.sum(jnp.where(ki[:, 0, :] == i, Lrow, 0.0), axis=0,
                      keepdims=True)                      # (1, slab) L[i, i]
        lt = jnp.where(ki[:, 0, :] < i, Lrow, 0.0)        # k < i
        acc = jnp.sum(lt[:, None, :] * X, axis=0)         # (nb, slab)
        ei = (jax.lax.broadcasted_iota(jnp.int32, (nb, slab), 0)
              == i).astype(L.dtype)
        xrow = (ei - acc) / piv
        return jnp.where(r1 == i, xrow[None, :, :], X)

    return jax.lax.fori_loop(0, nb, body, X0)


def _potrf_inv_lanes_kernel(w_ref, d_ref, l_ref, inv_ref):
    nb = d_ref.shape[0]
    w2 = w_ref[...]                                       # (1, slab)
    cm = _lanes_masks(nb, w2, d_ref.dtype)
    D = d_ref[...] * cm[:, None, :] * cm[None, :, :]
    D = D + jnp.eye(nb, dtype=D.dtype)[:, :, None] * (1.0 - cm)[None, :, :]
    L = _potrf_lanes(D)
    l_ref[...] = L * cm[:, None, :] * cm[None, :, :]      # zero padding rows
    inv_ref[...] = _inv_lower_lanes(L, cm)


@functools.partial(jax.jit, static_argnames=())
def potrf_inv_lanes(wrel, DT):
    """Factor + invert (nb, nb, B) lanes-layout SPD diagonal blocks:
    returns (LT, invT) with L lower (zeros on padded rows/cols) and
    inv = L^{-1} (unit rows on padded columns, so multiplying by inv is a
    no-op there)."""
    nb, _, B = DT.shape
    slab = vmem.lanes_slab(B)
    _guard("potrf_inv_lanes",
           vmem.lanes_panel_bytes(nb, 0, B, DT.dtype.itemsize) * 2)
    w2 = wrel.reshape(1, B)
    sblk = pl.BlockSpec((1, slab), lambda bi: (0, bi),
                        memory_space=pltpu.VMEM)
    dblk = pl.BlockSpec((nb, nb, slab), lambda bi: (0, 0, bi),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _potrf_inv_lanes_kernel,
        grid=(B // slab,),
        in_specs=[sblk, dblk],
        out_specs=[dblk, dblk],
        out_shape=[jax.ShapeDtypeStruct((nb, nb, B), DT.dtype),
                   jax.ShapeDtypeStruct((nb, nb, B), DT.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(w2, DT)


def _unit_inv_lower_lanes(L, nb):
    """X = L^{-1} for UNIT lower-triangular L (nb, nb, slab) (diag == 1)."""
    slab = L.shape[2]
    ki = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)
    r1 = ki
    X0 = jnp.eye(nb, dtype=L.dtype)[:, :, None] \
        * jnp.ones((1, 1, slab), L.dtype)

    def body(i, X):
        Lrow = _row0(L, i)
        lt = jnp.where(ki[:, 0, :] < i, Lrow, 0.0)
        acc = jnp.sum(lt[:, None, :] * X, axis=0)
        ei = (jax.lax.broadcasted_iota(jnp.int32, (nb, slab), 0)
              == i).astype(L.dtype)
        xrow = ei - acc
        return jnp.where(r1 == i, xrow[None, :, :], X)

    return jax.lax.fori_loop(0, nb, body, X0)


def _getrf_inv_lanes_kernel(w_ref, d_ref, l_ref, u_ref, linv_ref, uinv_ref):
    nb = d_ref.shape[0]
    w2 = w_ref[...]
    cm = _lanes_masks(nb, w2, d_ref.dtype)
    D = d_ref[...] * cm[:, None, :] * cm[None, :, :]
    D = D + jnp.eye(nb, dtype=D.dtype)[:, :, None] * (1.0 - cm)[None, :, :]
    L11, U11 = _getrf_lanes(D, cm)
    mm = cm[:, None, :] * cm[None, :, :]
    l_ref[...] = L11 * mm                    # unit diag masked off padding
    u_ref[...] = U11 * mm
    linv_ref[...] = _unit_inv_lower_lanes(L11, nb)
    # U^{-1} = ((U^T)^{-1})^T: invert the lower-triangular transpose
    Ut = jnp.swapaxes(U11, 0, 1)
    uinv_ref[...] = jnp.swapaxes(_inv_lower_lanes(Ut, cm), 0, 1)


@functools.partial(jax.jit, static_argnames=())
def getrf_inv_lanes(wrel, DT):
    """No-pivot LU + explicit triangle inverses of (nb, nb, B) lanes-layout
    square diagonal blocks (lower holds L-side values, upper the U-side):
    returns (L, U, Linv, Uinv); padded columns behave as identity."""
    nb, _, B = DT.shape
    slab = vmem.lanes_slab(B)
    _guard("getrf_inv_lanes",
           vmem.lanes_panel_bytes(nb, 0, B, DT.dtype.itemsize, lu=True) * 2)
    w2 = wrel.reshape(1, B)
    sblk = pl.BlockSpec((1, slab), lambda bi: (0, bi),
                        memory_space=pltpu.VMEM)
    dblk = pl.BlockSpec((nb, nb, slab), lambda bi: (0, 0, bi),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((nb, nb, B), DT.dtype)
    return pl.pallas_call(
        _getrf_inv_lanes_kernel,
        grid=(B // slab,),
        in_specs=[sblk, dblk],
        out_specs=[dblk] * 4,
        out_shape=[shp] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(w2, DT)


def _chol_lanes_kernel(d_ref, l_ref):
    c = d_ref.shape[1]
    A = d_ref[...]                       # (slab, c, c)

    def col(j, A):
        # extract column j with a one-hot contraction (Mosaic cannot lower a
        # dynamic lane index like A[:, :, j] / A.at[:, :, j].set)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
        onehot = (lane == j).astype(A.dtype)              # (1, 1, c)
        Acolj = jnp.sum(A * onehot, axis=2)               # (slab, c)
        piv = jax.lax.rsqrt(jnp.sum(Acolj
                                    * (jax.lax.broadcasted_iota(
                                        jnp.int32, (1, c), 1) == j), axis=1))
        colj = Acolj * piv[:, None]                       # (slab, c)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        colj = jnp.where(idx >= j, colj, 0.0)
        # rank-1 update of the trailing block only (cols > j): finished
        # columns must not be touched again
        ucolj = jnp.where(idx > j, colj, 0.0)
        A = A - colj[:, :, None] * ucolj[:, None, :]
        # write column j back via one-hot select
        A = jnp.where(onehot > 0, colj[:, :, None], A)
        return A

    A = jax.lax.fori_loop(0, c, col, A)
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    colx = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    l_ref[...] = jnp.where((row >= colx)[None], A, 0.0)


@functools.partial(jax.jit, static_argnames=("slab",))
def cholesky_small_batched(D, slab: int = 256):
    """(batch, c, c) SPD -> lower Cholesky factors; batch % slab == 0."""
    bt, c, _ = D.shape
    return pl.pallas_call(
        _chol_lanes_kernel,
        grid=(bt // slab,),
        in_specs=[pl.BlockSpec((slab, c, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((slab, c, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, c, c), D.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(D)
