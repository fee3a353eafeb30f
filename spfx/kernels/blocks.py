"""Batched dense-block numeric primitives (XLA implementations).

These replace the reference's cuBLAS/cuSOLVER calls (dsyrk/dgemm/dtrsm/
dpotrf, Cholesky/Source/SparseFrame.c:2549-2940) and its CUDA map/scatter
kernels (cuda_kernel.cu). Everything is batched over a bucket of same-padded
supernode tasks.

Memory-access design (see spfx.plan.schedule): panels are row-major, so all
panel traffic is *windowed* — a fixed-width contiguous slice per panel row —
which XLA lowers to vector loads/stores instead of elementwise gathers:
- gathers: lax.gather with slice_sizes=(window,), FILL_OR_DROP (start = -1
  reads zeros);
- scatters: lax.scatter_add of whole rows (start = -1 drops); overlapping
  window tails carry exact zeros, so the overlap-adds are no-ops;
- the irregular *column* placement of an update inside its target panel is a
  one-hot matmul (MXU), not a scatter;
- panel factorization results are written back as deltas (new - old), so the
  windowed add leaves neighbouring data untouched and lands garbage slots on
  exactly 0.0 (g + (0 - g) == 0 in IEEE).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_FILL = lax.GatherScatterMode.FILL_OR_DROP


def _win_gather(L, starts, win: int):
    """(B, X) int32 row starts -> (B, X, win); start<0 or OOB -> zeros."""
    B, X = starts.shape
    out = lax.gather(
        L, starts.reshape(-1, 1),
        lax.GatherDimensionNumbers(offset_dims=(1,),
                                   collapsed_slice_dims=(),
                                   start_index_map=(0,)),
        slice_sizes=(win,), mode=_FILL, fill_value=0)
    return out.reshape(B, X, win)


def _win_scatter_add(L, starts, upd):
    """starts (S,) int32, upd (S, win): L[s:s+win] += upd row-wise;
    start<0 drops the row."""
    win = upd.shape[-1]
    if starts.size == 0 or win == 0:
        return L
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    return lax.scatter_add(L, starts.reshape(-1, 1),
                           upd.reshape(-1, win), dnums,
                           indices_are_sorted=False, unique_indices=False,
                           mode=_FILL)


def _col_mask(widths, cp, dtype):
    return (jnp.arange(cp)[None, :] < widths[:, None]).astype(dtype)


# --------------------------------------------------------------------------
# Batched dense factorization cores, trace-time unrolled.
#
# XLA's Cholesky/TriangularSolve expanders lower to While loops; inside the
# mega engine's scan those cost ~6.5 ms per step on TPU (measured grid=16:
# 0.65s of a 1.35s factorize was linalg expander overhead). All panel shapes
# are static powers of two, so we unroll: blocked 2x2 recursion down to an
# 8-wide base case of rank-1 VPU ops — straight-line code, MXU matmuls for
# all off-diagonal blocks, no While anywhere.
# --------------------------------------------------------------------------

_BASE = 8


def _conj(x):
    return jnp.conj(x) if jnp.iscomplexobj(x) else x


def _unrolled() -> bool:
    """Unrolled cores only pay off on TPU (they exist to avoid While-based
    expander loops inside the mega scan); on CPU they explode compile time,
    so the XLA expanders are used there."""
    return jax.default_backend() == "tpu"


def potrf_batched(D):
    """Batched lower Cholesky of (B, C, C); C static, pow2, >= 8."""
    c = D.shape[-1]
    if not _unrolled():
        return lax.linalg.cholesky(D, symmetrize_input=False)
    if c <= _BASE:
        A = D
        cols = []
        ri = jnp.arange(c)
        for j in range(c):
            d = jnp.sqrt(A[:, j, j])
            cj = jnp.where(ri[None, :] >= j, A[:, :, j] / d[:, None], 0)
            A = A - cj[:, :, None] * _conj(cj)[:, None, :]
            cols.append(cj)
        return jnp.stack(cols, axis=2)
    h = c // 2
    A11, A21, A22 = D[:, :h, :h], D[:, h:, :h], D[:, h:, h:]
    L11 = potrf_batched(A11)
    L21 = trsm_right_upper(_conj(jnp.swapaxes(L11, 1, 2)), A21)
    S = A22 - jnp.einsum("bik,bjk->bij", L21, _conj(L21),
                         preferred_element_type=D.dtype)
    L22 = potrf_batched(S)
    z = jnp.zeros_like(A21)
    return jnp.concatenate([
        jnp.concatenate([L11, jnp.swapaxes(z, 1, 2)], axis=2),
        jnp.concatenate([L21, L22], axis=2)], axis=1)


def trsm_right_upper(M, B, unit: bool = False):
    """Solve X M = B for X, M (B, C, C) upper triangular, B (B, R, C)."""
    c = M.shape[-1]
    if not _unrolled():
        return lax.linalg.triangular_solve(M, B, left_side=False,
                                           lower=False, unit_diagonal=unit)
    if c <= _BASE:
        ci = jnp.arange(c)
        acc = B
        cols = []
        for j in range(c):
            xj = acc[:, :, j] if unit else acc[:, :, j] / M[:, j, j][:, None]
            cols.append(xj)
            row = jnp.where(ci[None, :] > j, M[:, j, :], 0)   # M[j, k], k > j
            acc = acc - xj[:, :, None] * row[:, None, :]
        return jnp.stack(cols, axis=2)
    h = c // 2
    M11, M12, M22 = M[:, :h, :h], M[:, :h, h:], M[:, h:, h:]
    X1 = trsm_right_upper(M11, B[:, :, :h], unit)
    B2 = B[:, :, h:] - jnp.einsum("brk,bkj->brj", X1, M12,
                                  preferred_element_type=B.dtype)
    X2 = trsm_right_upper(M22, B2, unit)
    return jnp.concatenate([X1, X2], axis=2)


def trsm_left_lower(L, B, unit: bool = False):
    """Solve L X = B for X, L (B, C, C) lower triangular, B (B, C, R)."""
    c = L.shape[-1]
    if not _unrolled():
        return lax.linalg.triangular_solve(L, B, left_side=True, lower=True,
                                           unit_diagonal=unit)
    if c <= _BASE:
        ri = jnp.arange(c)
        acc = B
        rows = []
        for i in range(c):
            xi = acc[:, i, :] if unit else acc[:, i, :] / L[:, i, i][:, None]
            rows.append(xi)
            col = jnp.where(ri[None, :] > i, L[:, :, i], 0)   # L[k, i], k > i
            acc = acc - col[:, :, None] * xi[:, None, :]
        return jnp.stack(rows, axis=1)
    h = c // 2
    L11, L21, L22 = L[:, :h, :h], L[:, h:, :h], L[:, h:, h:]
    X1 = trsm_left_lower(L11, B[:, :h, :], unit)
    B2 = B[:, h:, :] - jnp.einsum("bik,bkj->bij", L21, X1,
                                  preferred_element_type=B.dtype)
    X2 = trsm_left_lower(L22, B2, unit)
    return jnp.concatenate([X1, X2], axis=1)


def trsm_left_upper(M, B, unit: bool = False):
    """Solve M X = B for X, M (B, C, C) upper triangular, B (B, C, R)."""
    c = M.shape[-1]
    if not _unrolled():
        return lax.linalg.triangular_solve(M, B, left_side=True, lower=False,
                                           unit_diagonal=unit)
    if c <= _BASE:
        ri = jnp.arange(c)
        acc = B
        rows = [None] * c
        for i in range(c - 1, -1, -1):
            xi = acc[:, i, :] if unit else acc[:, i, :] / M[:, i, i][:, None]
            rows[i] = xi
            col = jnp.where(ri[None, :] < i, M[:, :, i], 0)   # M[k, i], k < i
            acc = acc - col[:, :, None] * xi[:, None, :]
        return jnp.stack(rows, axis=1)
    h = c // 2
    M11, M12, M22 = M[:, :h, :h], M[:, :h, h:], M[:, h:, h:]
    X2 = trsm_left_upper(M22, B[:, h:, :], unit)
    B1 = B[:, :h, :] - jnp.einsum("bik,bkj->bij", M12, X2,
                                  preferred_element_type=B.dtype)
    X1 = trsm_left_upper(M11, B1, unit)
    return jnp.concatenate([X1, X2], axis=1)


@partial(jax.jit, static_argnames=("storage",))
def assemble(idx, vals, storage: int):
    """Device-side assembly (ref loadA :1998-2028): scatter the permuted
    lower-triangle entry values into a fresh flat panel array. Only the nnz
    values cross the host->device link; the index vector is a plan constant
    cached on device."""
    return jnp.zeros((storage,), dtype=vals.dtype).at[idx].set(vals)


# --------------------------------------------------------------------------
# Cholesky panel: L11 = chol(D); L21 = B @ L11^{-T}
# (ref dpotrf+dtrsm panel, :2134-2145 CPU / :2795-2837 GPU)
# --------------------------------------------------------------------------

def panel_deltas_chol(L, widths, diag_row_start, below_row_start):
    """Compute the panel-factorization row deltas (new - old) without
    writing them back; shared by the in-place and the sharded engines."""
    cp = diag_row_start.shape[1]
    cm = _col_mask(widths, cp, L.dtype)                  # (B, Cp)
    Draw = _win_gather(L, diag_row_start, cp)            # (B, Cp, Cp)
    D = Draw * cm[:, None, :]
    D = D + jnp.eye(cp, dtype=L.dtype)[None] * (1.0 - cm)[:, None, :]
    L11 = potrf_batched(D)
    Braw = _win_gather(L, below_row_start, cp)
    # complex: A = L L^H, so the panel solve and the descendant products use
    # the conjugate transpose (ref zpotrf/zherk/ztrsm line)
    L21 = trsm_right_upper(_conj(jnp.swapaxes(L11, 1, 2)),
                           Braw * cm[:, None, :])
    on = cm[:, None, :] > 0
    dD = jnp.where(on, L11, Draw) - Draw
    dB = jnp.where(on, L21, Braw) - Braw
    return dD, dB


@partial(jax.jit, donate_argnums=0)
def factor_panels_chol(L, widths, diag_row_start, below_row_start):
    dD, dB = panel_deltas_chol(L, widths, diag_row_start, below_row_start)
    L = _win_scatter_add(L, diag_row_start, dD)
    return _win_scatter_add(L, below_row_start, dB)


# --------------------------------------------------------------------------
# Contiguous-layout ("contig") kernels: panel storage stride equals the
# pow2-padded supernode width, so the diag block (rows 0..cp), the below
# block (rows w..w+rbp) and an update task's source rows (lpos..lpos+mp) are
# each ONE contiguous region — gathered/scattered with a single transfer
# descriptor per task. Windowed gathers on TPU are descriptor-rate-bound
# (~75ns each, measured), so this layout replaces O(rows) descriptors with
# O(tasks). Row tails beyond a task's true extent read the NEXT panel's data
# (not zeros), so every kernel applies an explicit row-validity mask; all
# written deltas are zero on masked rows, making the overrunning adds no-ops.
# --------------------------------------------------------------------------


def _task_gather(L, starts, rows: int, win: int):
    """(B,) int32 task starts -> (B, rows, win) contiguous blocks."""
    out = _win_gather(L, starts.reshape(-1, 1), rows * win)
    return out.reshape(starts.shape[0], rows, win)


def _task_scatter_add(L, starts, upd):
    """(B,) starts, (B, rows, win): contiguous block add; start<0 drops."""
    return _win_scatter_add(L, starts,
                            upd.reshape(starts.shape[0], -1))


def _row_mask(nrows, rp, dtype):
    return (jnp.arange(rp)[None, :] < nrows[:, None]).astype(dtype)


def _chol_deltas_blocked(Draw, Braw, widths, nbelow, cp: int, rbp: int):
    """Blocked-MXU panel path (the round-4 panel redesign): NB-column block
    steps where the only serial work is a batched (NB, NB) diagonal-block
    potrf + EXPLICIT INVERSE in one Pallas kernel
    (pallas_blocks.potrf_inv_lanes); the column-panel solves and trailing
    updates are batched MXU einsums against the inverse — the GPU-BLAS
    trsm-via-inverted-diagonal-blocks scheme. Replaces whole-panel one-hot
    recurrences that measured 3.6-4.8 ms/call (67% of factorize time for
    ~15% of its flops, round-4 grid=16 profile)."""
    from spfx.kernels import pallas_blocks
    NB = pallas_blocks.NB
    B = widths.shape[0]
    cm = _col_mask(widths, cp, Draw.dtype)
    D = Draw * cm[:, None, :] * cm[:, :, None]
    if rbp:
        rm = _row_mask(nbelow, rbp, Draw.dtype)
        M = jnp.concatenate([D, Braw * cm[:, None, :] * rm[:, :, None]],
                            axis=1)
    else:
        M = D
    for s in range(0, cp, NB):
        e = min(s + NB, cp)
        wrel = jnp.clip(widths - s, 0, e - s)
        LT, invT = pallas_blocks.potrf_inv_lanes(
            wrel, jnp.transpose(M[:, s:e, s:e], (1, 2, 0)))
        Lss = jnp.transpose(LT, (2, 0, 1))             # (B, NB, NB)
        inv = jnp.transpose(invT, (2, 0, 1))           # L^{-1}, unit on pad
        Pb = M[:, e:, s:e]                             # (B, rows-e, NB)
        # X L^T = Pb  ->  X = Pb @ inv^T (MXU)
        Pcol = jnp.einsum("brk,bjk->brj", Pb, inv,
                          preferred_element_type=M.dtype)
        # static-offset slice updates instead of whole-panel concatenates:
        # the concat form measured 10-18us of layout copies per block step
        # (the panel is rebuilt NB-columns at a time)
        M = M.at[:, s:e, s:e].set(Lss)
        M = M.at[:, e:, s:e].set(Pcol)
        if e < cp:
            # trailing update rides the MXU; rows of Pcol aligned to the
            # future columns are its leading cp-e rows
            Pdiag = Pcol[:, :cp - e, :]
            M = M.at[:, e:, e:].add(-jnp.einsum(
                "bik,bjk->bij", Pcol, Pdiag,
                preferred_element_type=M.dtype))
    # the trailing updates touched the diag window's upper half (zero by
    # the storage contract — assembly scatters lower-triangle entries
    # only); mask the final L11 back to lower so dD leaves it exactly zero
    row = lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
    col = lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
    L11 = jnp.where((row >= col)[None], M[:, :cp, :], 0.0)
    dD = (L11 - Draw) * cm[:, None, :] * cm[:, :, None]
    if rbp:
        dB = (M[:, cp:, :] - Braw) * cm[:, None, :] * rm[:, :, None]
    else:
        dB = jnp.zeros((B, 0, cp), Draw.dtype)
    return dD, dB


def _chol_deltas_blocks(Draw, Braw, widths, nbelow, cp: int, rbp: int):
    """Cholesky panel deltas from task-major blocks Draw (B, cp, cp) /
    Braw (B, rbp, cp). Routed by the single scoped-VMEM footprint model
    (spfx.kernels.vmem.route_panel): batch-in-lanes Pallas kernel for
    narrow panels, blocked wide Pallas kernel for cp >= 128 or whatever
    the lanes stack can't hold, XLA expanders for complex / non-TPU."""
    from spfx.kernels import pallas_blocks, vmem
    B = widths.shape[0]
    route = "xla"
    if _unrolled() and not jnp.iscomplexobj(Draw):
        route = vmem.route_panel(cp, rbp, B, Draw.dtype.itemsize)
    if route == "blocked":
        return _chol_deltas_blocked(Draw, Braw, widths, nbelow, cp, rbp)
    if route == "lanes":
        DrawT = jnp.transpose(Draw, (1, 2, 0))
        BrawT = jnp.transpose(Braw, (1, 2, 0)) if rbp \
            else jnp.zeros((0, cp, B), Draw.dtype)
        ddT, dbT = pallas_blocks.chol_panel_deltas_lanes(
            widths, nbelow, DrawT, BrawT, cp=cp, rbp=rbp)
        return jnp.transpose(ddT, (2, 0, 1)), jnp.transpose(dbT, (2, 0, 1))
    if route == "wide":
        # wide panels: blocked Pallas kernel (MXU trailing updates), no XLA
        # linalg While loop inside the mega scan
        return pallas_blocks.chol_panel_deltas_wide(
            widths, nbelow, Draw, Braw, cp=cp, rbp=rbp)
    cm = _col_mask(widths, cp, Draw.dtype)                 # (B, Cp)
    # rows >= w of the diag window may hold junk (zero padding under the
    # uniform layout; raw storage under stride_padding); zero them so the
    # factorization's padding rows stay exactly e_j (otherwise pivots
    # 1 - sum(L21^2) can go negative -> NaN)
    D = Draw * cm[:, None, :] * cm[:, :, None]
    D = D + jnp.eye(cp, dtype=Draw.dtype)[None] * (1.0 - cm)[:, None, :]
    cplx = jnp.iscomplexobj(Draw)
    L11 = lax.linalg.cholesky(D, symmetrize_input=False)
    dD = (L11 - Draw) * cm[:, None, :] * cm[:, :, None]    # rows<w, cols<w
    if rbp:
        rm = _row_mask(nbelow, rbp, Draw.dtype)
        L21 = lax.linalg.triangular_solve(L11, Braw * cm[:, None, :],
                                          left_side=False, lower=True,
                                          transpose_a=True, conjugate_a=cplx)
        dB = (L21 - Braw) * cm[:, None, :] * rm[:, :, None]
    else:
        dB = jnp.zeros((widths.shape[0], 0, cp), Draw.dtype)
    return dD, dB


def panel_deltas_chol_c(L, widths, nbelow, diag_start, below_start,
                        cp: int, rbp: int):
    """Contig-layout Cholesky panel deltas via per-task window gathers
    (kept for the sharded engine; the in-place engines use the uniform-block
    path below, which reads the whole bucket with one dynamic slice)."""
    Draw = _task_gather(L, diag_start, cp, cp)
    Braw = _task_gather(L, below_start, rbp, cp) if rbp \
        else jnp.zeros((widths.shape[0], 0, cp), L.dtype)
    return _chol_deltas_blocks(Draw, Braw, widths, nbelow, cp, rbp)


def factor_panels_chol_u(L, widths, nbelow, slab_lo, cp: int, rbp: int):
    """Factor one uniform panel bucket IN PLACE: the bucket's B panels are
    contiguous at [slab_lo, slab_lo + B*(cp+rbp)*cp), task stride
    (cp+rbp)*cp (see PanelBucketC) — one dynamic slice in, one dynamic
    update slice out, zero per-task transfer descriptors."""
    B = widths.shape[0]
    S = (cp + rbp) * cp
    blk = lax.dynamic_slice(L, (slab_lo,), (B * S,)) \
        .reshape(B, cp + rbp, cp)
    dd, db = _chol_deltas_blocks(blk[:, :cp, :], blk[:, cp:, :],
                                 widths, nbelow, cp, rbp)
    upd = jnp.concatenate([dd, db], axis=1) if rbp else dd
    return lax.dynamic_update_slice(L, (blk + upd).reshape(-1), (slab_lo,))


@partial(jax.jit, donate_argnums=0, static_argnames=("cp", "rbp"))
def factor_panels_chol_c(L, widths, nbelow, diag_start, below_start,
                         cp: int, rbp: int):
    dD, dB = panel_deltas_chol_c(L, widths, nbelow, diag_start, below_start,
                                 cp, rbp)
    L = _task_scatter_add(L, diag_start, dD)
    if rbp:
        L = _task_scatter_add(L, below_start, dB)
    return L


@partial(jax.jit, donate_argnums=0, static_argnames=("cp", "rbp"))
def factor_panels_chol_uj(L, widths, nbelow, slab_lo, cp: int, rbp: int):
    """Jitted per-bucket wrapper of factor_panels_chol_u (calls engine)."""
    return factor_panels_chol_u(L, widths, nbelow, slab_lo[0], cp, rbp)


@partial(jax.jit, donate_argnums=(0, 1), static_argnames=("cp", "rbp"))
def factor_panels_lu_uj(Lx, Ux, widths, nbelow, slab_lo,
                        cp: int, rbp: int):
    """Jitted per-bucket wrapper of factor_panels_lu_u (calls engine)."""
    return factor_panels_lu_u(Lx, Ux, widths, nbelow, slab_lo[0], cp, rbp)


def update_rows_sym_c(L, kw, mrows, src_start, tgt_cpos,
                      mp: int, kp: int, csp: int):
    """Contig-layout symmetric update rows (cf. update_rows_sym): one
    contiguous (mp x kp) source gather per task; the N block is the leading
    rows of the same window."""
    G = _task_gather(L, src_start, mp, kp)                 # (B, mp, kp)
    G = G * _col_mask(kw, kp, L.dtype)[:, None, :] \
        * _row_mask(mrows, mp, L.dtype)[:, :, None]
    np_ = tgt_cpos.shape[1]
    Gt = _conj(G[:, :np_, :])
    C = jnp.einsum("bmk,bnk->bmn", G, Gt, preferred_element_type=L.dtype)
    oh = (tgt_cpos[:, :, None] == jnp.arange(csp)[None, None, :])
    return jnp.einsum("bmn,bnc->bmc", C, oh.astype(L.dtype),
                      preferred_element_type=L.dtype)


def extend_add_slab(L, slab_lo, ea_idx, ea_rbase, ea_rel, E,
                    srows: int, csp: int, ng=None):
    """Subtract the valid update rows of E (B, mp, csp) into the slab
    L[slab_lo : slab_lo + srows*csp] viewed as (srows, csp) — WINDOWED
    ONE-HOT form: per plan-time group (sorted by target row), one
    (W, EA_G) one-hot times the group's gathered E rows lands the whole
    group as an MXU matmul subtracted into a contiguous W-row window.
    No scatter and no serial row loop (the round-3 Pallas loop measured
    ~1.9us/row on hardware — with ~1M real rows at 48^3 it dominated the
    factorize; this path is ~50ms of MXU + window traffic instead).

    The one-hot product is EXACT for any matmul precision whose operand
    splitting is an exact decomposition (bf16x3/x6): multiplying by 1.0
    reconstructs the f32 value bit-for-bit, so the extend-add stays an
    exact accumulation like the scatter it replaces. Complex dtypes fall
    back to XLA scatter."""
    from spfx.plan.schedule import EA_G, ea_window
    W = ea_window(srows)
    slab = lax.dynamic_slice(L, (slab_lo,), (srows * csp,)) \
        .reshape(srows, csp)
    Eflat = E.reshape(-1, csp)
    if jnp.iscomplexobj(E):
        rows = jnp.where(ea_rel >= 0, ea_rbase[:, None] + ea_rel,
                         srows).reshape(-1)       # srows is OOB -> dropped
        Ec = Eflat[ea_idx]
        slab = slab.at[rows].add(-Ec, mode="drop")
        return lax.dynamic_update_slice(L, slab.reshape(-1), (slab_lo,))
    if ng is not None:
        slab = _ea_groups_dyn(slab, ea_rbase, ea_rel, ea_idx, Eflat, W, ng)
    else:
        ngs = ea_rbase.shape[0]
        Ec = Eflat[ea_idx].reshape(ngs, EA_G, csp)
        slab = _ea_groups(slab, ea_rbase, ea_rel, Ec, W)
    return lax.dynamic_update_slice(L, slab.reshape(-1), (slab_lo,))


def _ea_groups(slab, ea_rbase, ea_rel, Ec, W: int):
    """Apply the windowed one-hot extend-add groups to a (srows, csp)
    slab view (see extend_add_slab)."""
    iw = jnp.arange(W, dtype=ea_rel.dtype)

    def body(slab, grp):
        rbase, rel, ec = grp
        rb = rbase.astype(jnp.int32)
        oh = (iw[:, None] == rel[None, :]).astype(ec.dtype)
        delta = jnp.einsum("wg,gc->wc", oh, ec,
                           precision=lax.Precision.HIGHEST)
        win = lax.dynamic_slice(slab, (rb, jnp.int32(0)),
                                (W, slab.shape[1]))
        return lax.dynamic_update_slice(slab, win - delta,
                                        (rb, jnp.int32(0))), None

    slab, _ = lax.scan(body, slab, (ea_rbase, ea_rel, Ec))
    return slab


def _ea_groups_dyn(slab, ea_rbase, ea_rel, ea_idx, Eflat, W: int, ng):
    """_ea_groups with a DYNAMIC trip count: the mega engine pads each
    class's group tables to the class-wide max, and every dead group would
    burn a (W, EA_G) x (EA_G, csp) MXU matmul plus an EA_G-row gather of
    E; tripping exactly ``ng`` times (a traced scalar from the chunk's
    ea_ng table) skips them entirely — a fori_loop iteration measures
    ~1-2us on v5e (tools/switch_scaling.py)."""
    from spfx.plan.schedule import EA_G
    iw = jnp.arange(W, dtype=ea_rel.dtype)
    csp = slab.shape[1]

    def body(g, slab):
        rb = lax.dynamic_index_in_dim(ea_rbase, g, 0,
                                      keepdims=False).astype(jnp.int32)
        rel = lax.dynamic_index_in_dim(ea_rel, g, 0, keepdims=False)
        idx = lax.dynamic_slice(ea_idx, (g * EA_G,), (EA_G,))
        ec = Eflat[idx]
        oh = (iw[:, None] == rel[None, :]).astype(ec.dtype)
        delta = jnp.einsum("wg,gc->wc", oh, ec,
                           precision=lax.Precision.HIGHEST)
        win = lax.dynamic_slice(slab, (rb, jnp.int32(0)), (W, csp))
        return lax.dynamic_update_slice(slab, win - delta,
                                        (rb, jnp.int32(0)))

    return lax.fori_loop(0, ng, body, slab)


def extend_add_region(L, slab_lo, ea_idx, ea_rbase, ea_rel, E,
                      srows: int, csp: int, smax: int, ng=None):
    """Region-return form of extend_add_slab: computes the updated
    [slab_lo, slab_lo + smax) region of L WITHOUT writing it (the mega
    engine's scan body writes it outside the lax.switch — a read+write
    branch inside switch forces a full-carry copy per step, measured
    679us vs 94us at 268MB storage). The region tail beyond the slab is
    returned unchanged. ``ng`` (traced): true group count — see
    _ea_groups_dyn."""
    from spfx.plan.schedule import EA_G, ea_window
    W = ea_window(srows)
    region = lax.dynamic_slice(L, (slab_lo,), (smax,))
    slab = region[:srows * csp].reshape(srows, csp)
    Eflat = E.reshape(-1, csp)
    if ng is not None:
        slab = _ea_groups_dyn(slab, ea_rbase, ea_rel, ea_idx, Eflat, W, ng)
    else:
        ngs = ea_rbase.shape[0]
        Ec = Eflat[ea_idx].reshape(ngs, EA_G, csp)
        slab = _ea_groups(slab, ea_rbase, ea_rel, Ec, W)
    region = lax.dynamic_update_slice(region, slab.reshape(-1),
                                      (jnp.int32(0),))
    return region, slab_lo


def factor_panels_chol_region(L, widths, nbelow, slab_lo,
                              cp: int, rbp: int, smax: int):
    """Region-return form of factor_panels_chol_u (see extend_add_region
    for why): returns the updated bucket region and its base offset."""
    B = widths.shape[0]
    S = (cp + rbp) * cp
    region = lax.dynamic_slice(L, (slab_lo,), (smax,))
    blk = region[:B * S].reshape(B, cp + rbp, cp)
    dd, db = _chol_deltas_blocks(blk[:, :cp, :], blk[:, cp:, :],
                                 widths, nbelow, cp, rbp)
    upd = jnp.concatenate([dd, db], axis=1) if rbp else dd
    region = lax.dynamic_update_slice(region, (blk + upd).reshape(-1),
                                      (jnp.int32(0),))
    return region, slab_lo


def factor_panels_lu_region(Lx, Ux, widths, nbelow, slab_lo,
                            cp: int, rbp: int, smax: int):
    """Region-return LU panel factorization (twin regions, one offset)."""
    B = widths.shape[0]
    S = (cp + rbp) * cp
    regl = lax.dynamic_slice(Lx, (slab_lo,), (smax,))
    regu = lax.dynamic_slice(Ux, (slab_lo,), (smax,))
    bl = regl[:B * S].reshape(B, cp + rbp, cp)
    bu = regu[:B * S].reshape(B, cp + rbp, cp)
    dDL, dBL, dDU, dBU = _lu_deltas_blocks(
        bl[:, :cp, :], bu[:, :cp, :], bl[:, cp:, :], bu[:, cp:, :],
        widths, nbelow, cp, rbp)
    ul = jnp.concatenate([dDL, dBL], axis=1) if rbp else dDL
    uu = jnp.concatenate([dDU, dBU], axis=1) if rbp else dDU
    regl = lax.dynamic_update_slice(regl, (bl + ul).reshape(-1),
                                    (jnp.int32(0),))
    regu = lax.dynamic_update_slice(regu, (bu + uu).reshape(-1),
                                    (jnp.int32(0),))
    return regl, regu, slab_lo


def extend_add_region_lu(Lx, Ux, slab_lo, ea_idx, ea_rbase, ea_rel,
                         EL, EU, srows: int, csp: int, smax: int,
                         ng=None):
    """Region-return LU extend-add (twin regions, one offset)."""
    from spfx.plan.schedule import EA_G, ea_window
    W = ea_window(srows)
    regl = lax.dynamic_slice(Lx, (slab_lo,), (smax,))
    regu = lax.dynamic_slice(Ux, (slab_lo,), (smax,))
    sl = regl[:srows * csp].reshape(srows, csp)
    su = regu[:srows * csp].reshape(srows, csp)
    if ng is not None:
        sl = _ea_groups_dyn(sl, ea_rbase, ea_rel, ea_idx,
                            EL.reshape(-1, csp), W, ng)
        su = _ea_groups_dyn(su, ea_rbase, ea_rel, ea_idx,
                            EU.reshape(-1, csp), W, ng)
    else:
        ngs = ea_rbase.shape[0]
        EcL = EL.reshape(-1, csp)[ea_idx].reshape(ngs, EA_G, csp)
        EcU = EU.reshape(-1, csp)[ea_idx].reshape(ngs, EA_G, csp)
        sl = _ea_groups(sl, ea_rbase, ea_rel, EcL, W)
        su = _ea_groups(su, ea_rbase, ea_rel, EcU, W)
    regl = lax.dynamic_update_slice(regl, sl.reshape(-1), (jnp.int32(0),))
    regu = lax.dynamic_update_slice(regu, su.reshape(-1), (jnp.int32(0),))
    return regl, regu, slab_lo


@partial(jax.jit, donate_argnums=0,
         static_argnames=("mp", "kp", "csp", "srows"))
def apply_updates_sym_c(L, kw, mrows, src_start, slab_lo, ea_idx, ea_rbase,
                        ea_rel, tgt_cpos, mp: int, kp: int, csp: int,
                        srows: int):
    E = update_rows_sym_c(L, kw, mrows, src_start, tgt_cpos, mp, kp, csp)
    return extend_add_slab(L, slab_lo[0], ea_idx, ea_rbase, ea_rel, E,
                           srows, csp)


def _task_gather_aligned(L, starts, rows: int, kp: int):
    """Superwindow gather with every start aligned DOWN to the f32 HBM
    tile: the planner builds all row masks / column maps / extend-add
    tables against the superwindow row base (see _make_update_bucket_t),
    so no realignment compute exists.  TPU f32 uses one DMA per window
    (53ns/window measured vs 1307ns for the XLA gather's serial
    dynamic-slice loop); other backends take the windowed XLA gather on
    the pre-aligned starts."""
    from spfx.kernels import pallas_blocks
    if pallas_blocks.dma_ok(L.dtype):
        return pallas_blocks.dma_gather(L, starts, rows * kp).reshape(
            starts.shape[0], rows, kp)
    A = pallas_blocks.ALIGN
    sal = jnp.where(starts >= 0, (starts // A) * A, -1)
    return _task_gather(L, sal, rows, kp)


def _rng_mask(rstart, mrows, rows: int, dtype):
    """Row-validity mask of a superwindow: rows [rstart, rstart+mrows)."""
    mi = jnp.arange(rows)[None, :]
    return ((mi >= rstart[:, None])
            & (mi < (rstart + mrows)[:, None])).astype(dtype)


def _pair_gather_aligned(L, starts_a, rows_a: int, starts_b, rows_b: int,
                         kp: int):
    """Two superwindow gathers (source tiles + head windows) in ONE pallas
    call (dma_gather2); non-DMA backends take two windowed XLA gathers."""
    from spfx.kernels import pallas_blocks
    if pallas_blocks.dma_ok(L.dtype):
        A_, B_ = pallas_blocks.dma_gather2(L, starts_a, rows_a * kp,
                                           starts_b, rows_b * kp)
        return (A_.reshape(starts_a.shape[0], rows_a, kp),
                B_.reshape(starts_b.shape[0], rows_b, kp))
    return (_task_gather_aligned(L, starts_a, rows_a, kp),
            _task_gather_aligned(L, starts_b, rows_b, kp))


def update_rows_sym_t(L, kw, mrows, rstart, src_start, head_start,
                      tgt_cpos, mp: int, kp: int, csp: int):
    """M-TILED symmetric update rows (round-5 classes, see
    UpdateBucketC.head_start): each batch item is one (<= mp)-row tile of
    a task; the task's N block is a separate head window.  Windows are
    ALIGN-superwindows (see _task_gather_aligned): the tile's true rows
    sit at [rstart, rstart+mrows), and head rows outside the true N carry
    tgt_cpos == -1, so the one-hot drops those C columns.

    G carries NO k-column mask: C sums over k and H's k-mask already
    zeroes every k >= kw term, so masking G too was redundant work
    (one (B, rows_g, kp) multiply + mask build per scan step)."""
    from spfx.kernels import pallas_blocks
    ext = pallas_blocks.ALIGN // kp
    rows_g = mp + ext
    np_h = tgt_cpos.shape[1]
    G, H = _pair_gather_aligned(L, src_start, rows_g, head_start, np_h, kp)
    G = G * _rng_mask(rstart, mrows, rows_g, L.dtype)[:, :, None]
    H = H * _col_mask(kw, kp, L.dtype)[:, None, :]
    C = jnp.einsum("bmk,bnk->bmn", G, _conj(H),
                   preferred_element_type=L.dtype)
    oh = (tgt_cpos[:, :, None] == jnp.arange(csp)[None, None, :])
    return jnp.einsum("bmn,bnc->bmc", C, oh.astype(L.dtype),
                      preferred_element_type=L.dtype)


def update_rows_lu_t(Lx, Ux, kw, mrows, rstart, src_start, head_start,
                     tgt_cpos, mp: int, kp: int, csp: int):
    """M-tiled LU update rows: GEMM pair with separately gathered head
    superwindows (cf. update_rows_lu_c / update_rows_sym_t).  The G tiles
    carry no k-mask — each product pairs a G with a k-masked H, which
    zeroes the same terms (see update_rows_sym_t)."""
    from spfx.kernels import pallas_blocks
    ext = pallas_blocks.ALIGN // kp
    rows_g = mp + ext
    np_h = tgt_cpos.shape[1]
    km = _col_mask(kw, kp, Lx.dtype)[:, None, :]
    rm = _rng_mask(rstart, mrows, rows_g, Lx.dtype)[:, :, None]
    GL, HL = _pair_gather_aligned(Lx, src_start, rows_g, head_start, np_h,
                                  kp)
    GU, HU = _pair_gather_aligned(Ux, src_start, rows_g, head_start, np_h,
                                  kp)
    GL = GL * rm
    GU = GU * rm
    HL = HL * km
    HU = HU * km
    CL = jnp.einsum("bmk,bnk->bmn", GL, HU,
                    preferred_element_type=Lx.dtype)
    CU = jnp.einsum("bmk,bnk->bmn", GU, HL,
                    preferred_element_type=Lx.dtype)
    oh = (tgt_cpos[:, :, None] == jnp.arange(csp)[None, None, :]) \
        .astype(Lx.dtype)
    EL = jnp.einsum("bmn,bnc->bmc", CL, oh, preferred_element_type=Lx.dtype)
    EU = jnp.einsum("bmn,bnc->bmc", CU, oh, preferred_element_type=Lx.dtype)
    return EL, EU


@partial(jax.jit, donate_argnums=0,
         static_argnames=("mp", "kp", "csp", "srows"))
def apply_updates_sym_t(L, kw, mrows, rstart, src_start, head_start,
                        slab_lo, ea_idx, ea_rbase, ea_rel, tgt_cpos,
                        mp: int, kp: int, csp: int, srows: int):
    E = update_rows_sym_t(L, kw, mrows, rstart, src_start, head_start,
                          tgt_cpos, mp, kp, csp)
    return extend_add_slab(L, slab_lo[0], ea_idx, ea_rbase, ea_rel, E,
                           srows, csp)


@partial(jax.jit, donate_argnums=(0, 1),
         static_argnames=("mp", "kp", "csp", "srows"))
def apply_updates_lu_t(Lx, Ux, kw, mrows, rstart, src_start, head_start,
                       slab_lo, ea_idx, ea_rbase, ea_rel, tgt_cpos,
                       mp: int, kp: int, csp: int, srows: int):
    EL, EU = update_rows_lu_t(Lx, Ux, kw, mrows, rstart, src_start,
                              head_start, tgt_cpos, mp, kp, csp)
    Lx = extend_add_slab(Lx, slab_lo[0], ea_idx, ea_rbase, ea_rel, EL,
                         srows, csp)
    Ux = extend_add_slab(Ux, slab_lo[0], ea_idx, ea_rbase, ea_rel, EU,
                         srows, csp)
    return Lx, Ux


def _lu_deltas_blocked(DLraw, DUraw, BLraw, BUraw, widths, nbelow,
                       cp: int, rbp: int):
    """Blocked-MXU LU panel path (cf. _chol_deltas_blocked): the serial
    work is a batched (NB, NB) diagonal-block getrf + explicit L/U
    inverses in one Pallas kernel; panel solves (L-side below vs Uinv,
    U-side row block vs Linv, U^T below vs Linv^T) and the trailing
    update are batched MXU einsums."""
    from spfx.kernels import pallas_blocks
    NB = pallas_blocks.NB
    B = widths.shape[0]
    dt = DLraw.dtype
    cm = _col_mask(widths, cp, dt)
    wm = _row_mask(widths, cp, dt)
    row = lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
    col = lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
    DL = DLraw * cm[:, None, :] * wm[:, :, None]
    DU = DUraw * cm[:, None, :] * wm[:, :, None]
    Mf = jnp.where((row >= col)[None], DL, 0.0) \
        + jnp.swapaxes(jnp.where((row > col)[None], DU, 0.0), 1, 2)
    if rbp:
        rm = _row_mask(nbelow, rbp, dt)
        PL = BLraw * cm[:, None, :] * rm[:, :, None]
        PU = BUraw * cm[:, None, :] * rm[:, :, None]
    else:
        PL = PU = jnp.zeros((B, 0, cp), dt)
    ee = lambda *a: jnp.einsum(*a, preferred_element_type=dt)
    for s in range(0, cp, NB):
        e = min(s + NB, cp)
        wrel = jnp.clip(widths - s, 0, e - s)
        LT, UT, LiT, UiT = pallas_blocks.getrf_inv_lanes(
            wrel, jnp.transpose(Mf[:, s:e, s:e], (1, 2, 0)))
        t = lambda a: jnp.transpose(a, (2, 0, 1))
        Lb, Ub, Linv, Uinv = t(LT), t(UT), t(LiT), t(UiT)
        # L-side column below the block: X U = P  ->  X = P @ Uinv
        PbL = jnp.concatenate([Mf[:, e:, s:e], PL[:, :, s:e]], axis=1)
        Lcol = ee("brk,bkj->brj", PbL, Uinv)
        # U-side row block: L U12 = A  ->  U12 = Linv @ A (unit L)
        U12 = ee("bik,bkj->bij", Linv, Mf[:, s:e, e:])
        # U^T below panel: X L^T = P (unit)  ->  X = P @ Linv^T
        U12t_pu = ee("brk,bjk->brj", PU[:, :, s:e], Linv)
        Ld = Lcol[:, :cp - e, :]            # rows e..cp <-> future columns
        nbs = e - s
        rb = lax.broadcasted_iota(jnp.int32, (nbs, nbs), 0)
        cb = lax.broadcasted_iota(jnp.int32, (nbs, nbs), 1)
        Dnew = jnp.where((rb > cb)[None], Lb, 0.0) + Ub
        # static-offset slice updates instead of whole-panel concatenates
        # (see _chol_deltas_blocked)
        Mf = Mf.at[:, s:e, s:e].set(Dnew)
        Mf = Mf.at[:, e:, s:e].set(Ld)
        if e < cp:
            Mf = Mf.at[:, s:e, e:].set(U12)
            Mf = Mf.at[:, e:, e:].add(-ee("bik,bkj->bij", Ld, U12))
        if rbp:
            Lp = Lcol[:, cp - e:, :]
            if e < cp:
                PL = PL.at[:, :, e:].add(-ee("brk,bkj->brj", Lp, U12))
                PU = PU.at[:, :, e:].add(-ee("brk,bjk->brj", U12t_pu, Ld))
            PL = PL.at[:, :, s:e].set(Lp)
            PU = PU.at[:, :, s:e].set(U12t_pu)
    L11 = jnp.where((row > col)[None], Mf, 0.0) \
        + jnp.eye(cp, dtype=dt)[None]
    U11t = jnp.swapaxes(jnp.where((row <= col)[None], Mf, 0.0), 1, 2)
    mmask = cm[:, None, :] * wm[:, :, None]
    dDL = (L11 - DLraw) * mmask
    dDU = (U11t - DUraw) * mmask
    if rbp:
        bm = cm[:, None, :] * rm[:, :, None]
        dBL = (PL - BLraw) * bm
        dBU = (PU - BUraw) * bm
    else:
        dBL = jnp.zeros((B, 0, cp), dt)
        dBU = dBL
    return dDL, dBL, dDU, dBU


def _lu_deltas_blocks(DLraw, DUraw, BLraw, BUraw, widths, nbelow,
                      cp: int, rbp: int):
    """LU panel deltas from task-major blocks (cf. _chol_deltas_blocks,
    same vmem-model routing with lu=True: twin L/U blocks double the
    resident footprint); returns (dDL, dBL, dDU, dBU)."""
    from spfx.kernels import pallas_blocks, vmem
    B = widths.shape[0]
    route = "xla"
    if _unrolled() and not jnp.iscomplexobj(DLraw):
        route = vmem.route_panel(cp, rbp, B, DLraw.dtype.itemsize, lu=True)
    if route == "blocked":
        return _lu_deltas_blocked(DLraw, DUraw, BLraw, BUraw,
                                  widths, nbelow, cp, rbp)
    if route == "lanes":
        t = lambda a: jnp.transpose(a, (1, 2, 0))
        z = jnp.zeros((0, cp, widths.shape[0]), DLraw.dtype)
        ddl, ddu, dbl, dbu = pallas_blocks.lu_panel_deltas_lanes(
            widths, nbelow, t(DLraw), t(DUraw),
            t(BLraw) if rbp else z, t(BUraw) if rbp else z, cp=cp, rbp=rbp)
        b = lambda a: jnp.transpose(a, (2, 0, 1))
        return b(ddl), b(dbl), b(ddu), b(dbu)
    if route == "wide":
        ddl, ddu, dbl, dbu = pallas_blocks.lu_panel_deltas_wide(
            widths, nbelow, DLraw, DUraw, BLraw, BUraw, cp=cp, rbp=rbp)
        return ddl, dbl, ddu, dbu
    cm = _col_mask(widths, cp, DLraw.dtype)
    row = lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
    col = lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
    # zero rows >= w too, so padding pivots stay exactly 1 (no NaN/Inf)
    wm = _row_mask(widths, cp, DLraw.dtype)
    DL = DLraw * cm[:, None, :] * wm[:, :, None]
    DU = DUraw * cm[:, None, :] * wm[:, :, None]
    D = jnp.where((row >= col)[None], DL, 0) \
        + jnp.swapaxes(jnp.where((row > col)[None], DU, 0), 1, 2)
    D = D + jnp.eye(cp, dtype=DLraw.dtype)[None] * (1.0 - cm)[:, None, :]
    L11, U11 = getrf_nopiv(D)
    U11t = jnp.swapaxes(U11, 1, 2)
    dDL = (L11 - DLraw) * cm[:, None, :] * wm[:, :, None]
    dDU = (U11t - DUraw) * cm[:, None, :] * wm[:, :, None]
    if rbp:
        rm = _row_mask(nbelow, rbp, DLraw.dtype)
        L21 = trsm_right_upper(U11, BLraw * cm[:, None, :])
        U12t = trsm_right_upper(jnp.swapaxes(L11, 1, 2),
                                BUraw * cm[:, None, :], unit=True)
        dBL = (L21 - BLraw) * cm[:, None, :] * rm[:, :, None]
        dBU = (U12t - BUraw) * cm[:, None, :] * rm[:, :, None]
    else:
        dBL = jnp.zeros((widths.shape[0], 0, cp), DLraw.dtype)
        dBU = dBL
    return dDL, dBL, dDU, dBU


def panel_deltas_lu_c(Lx, Ux, widths, nbelow, diag_start, below_start,
                      cp: int, rbp: int):
    """Contig-layout LU panel deltas via per-task window gathers (kept for
    the sharded engine; in-place engines use factor_panels_lu_u)."""
    z = jnp.zeros((widths.shape[0], 0, cp), Lx.dtype)
    return _lu_deltas_blocks(
        _task_gather(Lx, diag_start, cp, cp),
        _task_gather(Ux, diag_start, cp, cp),
        _task_gather(Lx, below_start, rbp, cp) if rbp else z,
        _task_gather(Ux, below_start, rbp, cp) if rbp else z,
        widths, nbelow, cp, rbp)


def factor_panels_lu_u(Lx, Ux, widths, nbelow, slab_lo, cp: int, rbp: int):
    """Factor one uniform LU panel bucket in place (cf.
    factor_panels_chol_u): one dynamic slice per factor array."""
    B = widths.shape[0]
    S = (cp + rbp) * cp
    bl = lax.dynamic_slice(Lx, (slab_lo,), (B * S,)).reshape(B, cp + rbp, cp)
    bu = lax.dynamic_slice(Ux, (slab_lo,), (B * S,)).reshape(B, cp + rbp, cp)
    dDL, dBL, dDU, dBU = _lu_deltas_blocks(
        bl[:, :cp, :], bu[:, :cp, :], bl[:, cp:, :], bu[:, cp:, :],
        widths, nbelow, cp, rbp)
    ul = jnp.concatenate([dDL, dBL], axis=1) if rbp else dDL
    uu = jnp.concatenate([dDU, dBU], axis=1) if rbp else dDU
    Lx = lax.dynamic_update_slice(Lx, (bl + ul).reshape(-1), (slab_lo,))
    Ux = lax.dynamic_update_slice(Ux, (bu + uu).reshape(-1), (slab_lo,))
    return Lx, Ux


@partial(jax.jit, donate_argnums=(0, 1), static_argnames=("cp", "rbp"))
def factor_panels_lu_c(Lx, Ux, widths, nbelow, diag_start, below_start,
                       cp: int, rbp: int):
    dDL, dBL, dDU, dBU = panel_deltas_lu_c(Lx, Ux, widths, nbelow,
                                           diag_start, below_start, cp, rbp)
    Lx = _task_scatter_add(Lx, diag_start, dDL)
    Ux = _task_scatter_add(Ux, diag_start, dDU)
    if rbp:
        Lx = _task_scatter_add(Lx, below_start, dBL)
        Ux = _task_scatter_add(Ux, below_start, dBU)
    return Lx, Ux


def update_rows_lu_c(Lx, Ux, kw, mrows, src_start, tgt_cpos,
                     mp: int, kp: int, csp: int):
    km = _col_mask(kw, kp, Lx.dtype)[:, None, :]
    rm = _row_mask(mrows, mp, Lx.dtype)[:, :, None]
    GL = _task_gather(Lx, src_start, mp, kp) * km * rm
    GU = _task_gather(Ux, src_start, mp, kp) * km * rm
    np_ = tgt_cpos.shape[1]
    CL = jnp.einsum("bmk,bnk->bmn", GL, GU[:, :np_, :],
                    preferred_element_type=Lx.dtype)
    CU = jnp.einsum("bmk,bnk->bmn", GU, GL[:, :np_, :],
                    preferred_element_type=Lx.dtype)
    oh = (tgt_cpos[:, :, None] == jnp.arange(csp)[None, None, :]) \
        .astype(Lx.dtype)
    EL = jnp.einsum("bmn,bnc->bmc", CL, oh, preferred_element_type=Lx.dtype)
    EU = jnp.einsum("bmn,bnc->bmc", CU, oh, preferred_element_type=Lx.dtype)
    return EL, EU


@partial(jax.jit, donate_argnums=(0, 1),
         static_argnames=("mp", "kp", "csp", "srows"))
def apply_updates_lu_c(Lx, Ux, kw, mrows, src_start, slab_lo, ea_idx,
                       ea_rbase, ea_rel, tgt_cpos, mp: int, kp: int,
                       csp: int, srows: int):
    EL, EU = update_rows_lu_c(Lx, Ux, kw, mrows, src_start, tgt_cpos,
                              mp, kp, csp)
    Lx = extend_add_slab(Lx, slab_lo[0], ea_idx, ea_rbase, ea_rel, EL,
                         srows, csp)
    Ux = extend_add_slab(Ux, slab_lo[0], ea_idx, ea_rbase, ea_rel, EU,
                         srows, csp)
    return Lx, Ux


def _panel_parts_c(L, widths, nbelow, diag_start, below_start,
                   cp: int, rbp: int, unit_pad=True):
    cm = _col_mask(widths, cp, L.dtype)
    L11 = _task_gather(L, diag_start, cp, cp) * cm[:, None, :] \
        * _row_mask(widths, cp, L.dtype)[:, :, None]
    if unit_pad:
        diag_fix = jnp.eye(cp, dtype=L.dtype)[None] * (1.0 - cm)[:, None, :]
        L11 = L11 + diag_fix
    if rbp:
        L21 = _task_gather(L, below_start, rbp, cp) * cm[:, None, :] \
            * _row_mask(nbelow, rbp, L.dtype)[:, :, None]
    else:
        L21 = jnp.zeros((widths.shape[0], 0, cp), L.dtype)
    return L11, L21


@partial(jax.jit, donate_argnums=1, static_argnames=("cp", "rbp", "lu"))
def solve_fwd_level_c(F, x, widths, nbelow, diag_start, below_start,
                      xcols, xrows, cp: int, rbp: int, lu: bool = False):
    L11, L21 = _panel_parts_c(F, widths, nbelow, diag_start, below_start,
                              cp, rbp)
    b = x[_x_idx(x, xcols)]
    y = trsm_left_lower(L11, b, unit=lu)
    x = x.at[_x_idx(x, xcols)].set(y)
    if rbp:
        upd = jnp.einsum("brc,bch->brh", L21, y,
                         preferred_element_type=x.dtype)
        x = x.at[_x_idx(x, xrows)].add(-upd)
    return x


@partial(jax.jit, donate_argnums=1, static_argnames=("cp", "rbp", "lu"))
def solve_bwd_level_c(F, x, widths, nbelow, diag_start, below_start,
                      xcols, xrows, cp: int, rbp: int, lu: bool = False):
    L11, L21 = _panel_parts_c(F, widths, nbelow, diag_start, below_start,
                              cp, rbp)
    t = x[_x_idx(x, xcols)]
    if rbp:
        yb = x[_x_idx(x, xrows)]
        L21c = _conj(L21) if not lu else L21
        t = t - jnp.einsum("brc,brh->bch", L21c, yb,
                           preferred_element_type=x.dtype)
    if lu:
        z = trsm_left_upper(jnp.swapaxes(L11, 1, 2), t)
    else:
        z = trsm_left_upper(_conj(jnp.swapaxes(L11, 1, 2)), t)
    return x.at[_x_idx(x, xcols)].set(z)


# --------------------------------------------------------------------------
# Symmetric descendant update: C = Ld[lpos:, :] @ Ld[lpos:lpos+N, :]^T,
# expanded to the target width by one-hot matmul, row-windowed subtract
# (ref cpuApply dsyrk+dgemm :2061-2086 / GPU stream loop :2514-2698 +
#  mappedSubtract cuda_kernel.cu:62-124)
# --------------------------------------------------------------------------

def update_rows_sym(L, kw, src_row_start, tgt_cpos, kp: int, csp: int):
    """Compute the (B, Mp, csp) update rows E to be subtracted at
    tgt_row_start; shared by the in-place and the sharded engines."""
    G = _win_gather(L, src_row_start, kp)                # (B, Mp, kp)
    G = G * _col_mask(kw, kp, L.dtype)[:, None, :]
    np_ = tgt_cpos.shape[1]
    Gt = jnp.conj(G[:, :np_, :]) if jnp.iscomplexobj(L) else G[:, :np_, :]
    C = jnp.einsum("bmk,bnk->bmn", G, Gt,
                   preferred_element_type=L.dtype)
    oh = (tgt_cpos[:, :, None] == jnp.arange(csp)[None, None, :])
    return jnp.einsum("bmn,bnc->bmc", C, oh.astype(L.dtype),
                      preferred_element_type=L.dtype)


@partial(jax.jit, donate_argnums=0, static_argnames=("kp", "csp"))
def apply_updates_sym(L, kw, src_row_start, tgt_row_start, tgt_cpos,
                      kp: int, csp: int):
    E = update_rows_sym(L, kw, src_row_start, tgt_cpos, kp, csp)
    return _win_scatter_add(L, tgt_row_start, -E)


# --------------------------------------------------------------------------
# LU (no-pivot) panel: D = L11 @ U11 (getrf_nopiv);
# L21 = B_L @ U11^{-1}; U12 = L11^{-1} @ B_U  (stored transposed: U^T panel)
# (ref magma_dgetrf_nopiv + dtrsm, LU/Source/SparseFrame.c:2652-2663;
#  GPU cusolverDnDgetrf with NULL ipiv :3344-3357)
# --------------------------------------------------------------------------

def getrf_nopiv(D):
    """Batched unpivoted LU of (B, C, C): returns (Lunit, U). Blocked
    recursion so the MXU does the bulk of the work at larger C; trace-time
    unrolled base case (no While — see the dense-core comment above)."""
    c = D.shape[-1]
    if c <= (_BASE if _unrolled() else 32):
        return _getrf_nopiv_unblocked(D)
    h = c // 2
    A11, A12 = D[:, :h, :h], D[:, :h, h:]
    A21, A22 = D[:, h:, :h], D[:, h:, h:]
    L11, U11 = getrf_nopiv(A11)
    U12 = trsm_left_lower(L11, A12, unit=True)
    L21 = trsm_right_upper(U11, A21)
    S = A22 - jnp.einsum("bik,bkj->bij", L21, U12,
                         preferred_element_type=D.dtype)
    L22, U22 = getrf_nopiv(S)
    Lf = jnp.concatenate([
        jnp.concatenate([L11, jnp.zeros_like(A12)], axis=2),
        jnp.concatenate([L21, L22], axis=2)], axis=1)
    Uf = jnp.concatenate([
        jnp.concatenate([U11, U12], axis=2),
        jnp.concatenate([jnp.zeros_like(A21), U22], axis=2)], axis=1)
    return Lf, Uf


def _getrf_nopiv_unblocked(D):
    """Right-looking unpivoted LU via rank-1 updates: unrolled at trace time
    on TPU (no While inside the mega scan), fori_loop elsewhere."""
    c = D.shape[-1]
    ri = jnp.arange(c)
    if _unrolled():
        A = D
        lcols, urows = [], []
        for k in range(c):
            piv = A[:, k, k][:, None]
            urow = jnp.where(ri[None, :] >= k, A[:, k, :], 0)       # U[k,:]
            lcol = jnp.where(ri[None, :] > k, A[:, :, k] / piv, 0)  # L[>k,k]
            A = A - lcol[:, :, None] * urow[:, None, :]
            lcols.append(lcol + (ri[None, :] == k).astype(D.dtype))
            urows.append(urow)
        return jnp.stack(lcols, axis=2), jnp.stack(urows, axis=1)

    row = lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = lax.broadcasted_iota(jnp.int32, (c, c), 1)

    def body(k, A):
        piv = A[:, k, k][:, None]
        colk = jnp.where(row[None, :, k] > k, A[:, :, k] / piv, 0.0)
        rowk = jnp.where(col[None, k, :] >= k, A[:, k, :], 0.0)
        A = A - colk[:, :, None] * rowk[:, None, :]
        return A.at[:, :, k].set(jnp.where(row[None, :, k] > k,
                                           colk, A[:, :, k]))

    A = lax.fori_loop(0, c, body, D)
    Lu = jnp.where(row[None] > col[None], A, 0.0) \
        + jnp.eye(c, dtype=D.dtype)[None]
    U = jnp.where(row[None] <= col[None], A, 0.0)
    return Lu, U


def panel_deltas_lu(Lx, Ux, widths, diag_row_start, below_row_start):
    """LU panel-factorization row deltas (dDL, dBL, dDU, dBU); shared by the
    in-place and the sharded engines.

    Lx holds L panels (unit diagonal stored explicitly), Ux holds U^T panels
    with the same row pattern (ref side-by-side L|U storage,
    LU/Source/SparseFrame.c:1786-1797).

    Meaningful triangles: Lx diag block lower (incl diag), Ux diag block
    strictly lower (diag of A lives in Lx; Ux's diag slots hold pivots only
    after factorization). Everything else in the diag block is scatter
    garbage and is masked away."""
    cp = diag_row_start.shape[1]
    cm = _col_mask(widths, cp, Lx.dtype)
    row = lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
    col = lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
    DLraw = _win_gather(Lx, diag_row_start, cp)
    DUraw = _win_gather(Ux, diag_row_start, cp)
    DL = DLraw * cm[:, None, :]
    DU = DUraw * cm[:, None, :]
    D = jnp.where((row >= col)[None], DL, 0) \
        + jnp.swapaxes(jnp.where((row > col)[None], DU, 0), 1, 2)
    D = D + jnp.eye(cp, dtype=Lx.dtype)[None] * (1.0 - cm)[:, None, :]
    L11, U11 = getrf_nopiv(D)
    BLraw = _win_gather(Lx, below_row_start, cp)
    BUraw = _win_gather(Ux, below_row_start, cp)
    L21 = trsm_right_upper(U11, BLraw * cm[:, None, :])
    U12t = trsm_right_upper(jnp.swapaxes(L11, 1, 2),
                            BUraw * cm[:, None, :], unit=True)
    on = cm[:, None, :] > 0
    U11t = jnp.swapaxes(U11, 1, 2)
    return (jnp.where(on, L11, DLraw) - DLraw,
            jnp.where(on, L21, BLraw) - BLraw,
            jnp.where(on, U11t, DUraw) - DUraw,
            jnp.where(on, U12t, BUraw) - BUraw)


@partial(jax.jit, donate_argnums=(0, 1))
def factor_panels_lu(Lx, Ux, widths, diag_row_start, below_row_start):
    """Factor LU supernode panels in place (see panel_deltas_lu)."""
    dDL, dBL, dDU, dBU = panel_deltas_lu(Lx, Ux, widths, diag_row_start,
                                         below_row_start)
    Lx = _win_scatter_add(Lx, diag_row_start, dDL)
    Lx = _win_scatter_add(Lx, below_row_start, dBL)
    Ux = _win_scatter_add(Ux, diag_row_start, dDU)
    Ux = _win_scatter_add(Ux, below_row_start, dBU)
    return Lx, Ux


def update_rows_lu(Lx, Ux, kw, src_row_start, tgt_cpos, kp: int, csp: int):
    """LU descendant update row pair (EL, EU) to be subtracted at
    tgt_row_start (ref U8, LU/Source/SparseFrame.c:2569-2604):
    L side: A[i,q] -= Ld[i,:] . Ud[:,q];  U side: A[q,i] -= Ld[q,:] . Ud[:,i]
    (stored into the U^T panel at the same positions)."""
    km = _col_mask(kw, kp, Lx.dtype)[:, None, :]
    GL = _win_gather(Lx, src_row_start, kp) * km
    GU = _win_gather(Ux, src_row_start, kp) * km
    np_ = tgt_cpos.shape[1]
    CL = jnp.einsum("bmk,bnk->bmn", GL, GU[:, :np_, :],
                    preferred_element_type=Lx.dtype)
    CU = jnp.einsum("bmk,bnk->bmn", GU, GL[:, :np_, :],
                    preferred_element_type=Lx.dtype)
    oh = (tgt_cpos[:, :, None] == jnp.arange(csp)[None, None, :]) \
        .astype(Lx.dtype)
    EL = jnp.einsum("bmn,bnc->bmc", CL, oh, preferred_element_type=Lx.dtype)
    EU = jnp.einsum("bmn,bnc->bmc", CU, oh, preferred_element_type=Lx.dtype)
    return EL, EU


@partial(jax.jit, donate_argnums=(0, 1), static_argnames=("kp", "csp"))
def apply_updates_lu(Lx, Ux, kw, src_row_start, tgt_row_start, tgt_cpos,
                     kp: int, csp: int):
    EL, EU = update_rows_lu(Lx, Ux, kw, src_row_start, tgt_cpos, kp, csp)
    Lx = _win_scatter_add(Lx, tgt_row_start, -EL)
    Ux = _win_scatter_add(Ux, tgt_row_start, -EU)
    return Lx, Ux


# --------------------------------------------------------------------------
# Supernodal triangular solves, batched per level
# (ref solve_supernodal :3036-3139 — scalar and sequential there)
# --------------------------------------------------------------------------

def _x_idx(x, g):
    sent = x.shape[0] - 1
    return jnp.where(g >= 0, g, sent)


def _panel_parts(L, widths, diag_row_start, below_row_start, unit_pad=True):
    cp = diag_row_start.shape[1]
    cm = _col_mask(widths, cp, L.dtype)
    L11 = _win_gather(L, diag_row_start, cp) * cm[:, None, :]
    if unit_pad:
        L11 = L11 + jnp.eye(cp, dtype=L.dtype)[None] * (1.0 - cm)[:, None, :]
    L21 = _win_gather(L, below_row_start, cp) * cm[:, None, :]
    return L11, L21


@partial(jax.jit, donate_argnums=1)
def solve_fwd_level(L, x, widths, diag_row_start, below_row_start, xcols,
                    xrows):
    """x[cols] = L11^{-1} x[cols];  x[below] -= L21 @ x[cols]."""
    L11, L21 = _panel_parts(L, widths, diag_row_start, below_row_start)
    b = x[_x_idx(x, xcols)]
    y = trsm_left_lower(L11, b)
    x = x.at[_x_idx(x, xcols)].set(y)
    upd = jnp.einsum("brc,bch->brh", L21, y, preferred_element_type=x.dtype)
    return x.at[_x_idx(x, xrows)].add(-upd)


@partial(jax.jit, donate_argnums=1)
def solve_bwd_level(L, x, widths, diag_row_start, below_row_start, xcols,
                    xrows):
    """x[cols] = L11^{-T} (x[cols] - L21^T @ x[below])."""
    L11, L21 = _panel_parts(L, widths, diag_row_start, below_row_start)
    yb = x[_x_idx(x, xrows)]
    cplx = jnp.iscomplexobj(L)
    L21c = jnp.conj(L21) if cplx else L21
    t = x[_x_idx(x, xcols)] - jnp.einsum("brc,brh->bch", L21c, yb,
                                         preferred_element_type=x.dtype)
    z = trsm_left_upper(_conj(jnp.swapaxes(L11, 1, 2)), t)
    return x.at[_x_idx(x, xcols)].set(z)


@partial(jax.jit, donate_argnums=1)
def solve_fwd_level_lu(Lx, x, widths, diag_row_start, below_row_start,
                       xcols, xrows):
    """Forward solve on unit-L (ref LU solve :3592-3700, no divide)."""
    L11, L21 = _panel_parts(Lx, widths, diag_row_start, below_row_start)
    b = x[_x_idx(x, xcols)]
    y = trsm_left_lower(L11, b, unit=True)
    x = x.at[_x_idx(x, xcols)].set(y)
    upd = jnp.einsum("brc,bch->brh", L21, y, preferred_element_type=x.dtype)
    return x.at[_x_idx(x, xrows)].add(-upd)


@partial(jax.jit, donate_argnums=1)
def solve_bwd_level_lu(Ux, x, widths, diag_row_start, below_row_start,
                       xcols, xrows):
    """Backward solve on U: x[cols] = U11^{-1} (x[cols] - U12 @ x[below]).
    Ux stores U^T panels: U11 = DU^T (DU lower incl pivots), U12^T = BU."""
    DU, BU = _panel_parts(Ux, widths, diag_row_start, below_row_start)
    yb = x[_x_idx(x, xrows)]
    t = x[_x_idx(x, xcols)] - jnp.einsum("brc,brh->bch", BU, yb,
                                         preferred_element_type=x.dtype)
    z = trsm_left_upper(jnp.swapaxes(DU, 1, 2), t)
    return x.at[_x_idx(x, xcols)].set(z)
