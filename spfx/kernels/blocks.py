"""Batched dense-block numeric primitives (XLA implementations).

These replace the reference's cuBLAS/cuSOLVER calls (dsyrk/dgemm/dtrsm/
dpotrf, Cholesky/Source/SparseFrame.c:2549-2940) and its CUDA map/scatter
kernels (cuda_kernel.cu). Everything is batched over a bucket of same-padded
supernode tasks; XLA lowers the einsums onto the MXU and fuses the gathers.
A Pallas fast path for the hot shapes lives in spfx.kernels.pallas_blocks.

Index convention (see spfx.plan.schedule): flat panel position of local
(r, c) = row_off[r] + col_off[c]; negative offsets mark padding/out-of-
pattern. Gathers send invalid positions to the ZERO sentinel slot
(always 0.0); scatters send them to the TRASH slot (never read).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _gather(L, row_off, col_off):
    """(B,X),(B,Y) offsets -> (B,X,Y) panel block; invalid -> 0."""
    zero = L.shape[0] - 2
    valid = (row_off[:, :, None] >= 0) & (col_off[:, None, :] >= 0)
    idx = jnp.where(valid, row_off[:, :, None] + col_off[:, None, :], zero)
    return L[idx]


def _scatter_idx(L, row_off, col_off):
    trash = L.shape[0] - 1
    valid = (row_off[:, :, None] >= 0) & (col_off[:, None, :] >= 0)
    return jnp.where(valid, row_off[:, :, None] + col_off[:, None, :], trash)


def _diag_block(L, diag_row_off, col_off):
    """Gather the diagonal block and place unit pivots on padded columns so
    the dense factorization is well-posed (padding factors to identity)."""
    D = _gather(L, diag_row_off, col_off)
    cp = D.shape[1]
    pad = (col_off < 0).astype(L.dtype)
    return D + jnp.eye(cp, dtype=L.dtype)[None] * pad[:, None, :]


# --------------------------------------------------------------------------
# Cholesky panel: L11 = chol(D); L21 = B @ L11^{-T}
# (ref dpotrf+dtrsm panel, :2134-2145 CPU / :2795-2837 GPU)
# --------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=0)
def factor_panels_chol(L, diag_row_off, col_off, below_row_off):
    D = _diag_block(L, diag_row_off, col_off)
    # symmetrize_input=False: only the lower triangle is stored/assembled;
    # the default would average in the (zero/garbage) upper slots.
    L11 = lax.linalg.cholesky(D, symmetrize_input=False)
    Bg = _gather(L, below_row_off, col_off)
    L21 = lax.linalg.triangular_solve(L11, Bg, left_side=False, lower=True,
                                      transpose_a=True)
    L = L.at[_scatter_idx(L, diag_row_off, col_off)].set(L11)
    L = L.at[_scatter_idx(L, below_row_off, col_off)].set(L21)
    return L


# --------------------------------------------------------------------------
# Symmetric descendant update: C = Ld[lpos:, :] @ Ld[lpos:lpos+N, :]^T,
# scatter-subtract into the ancestor front
# (ref cpuApply dsyrk+dgemm :2061-2086 / GPU stream loop :2514-2698 +
#  mappedSubtract cuda_kernel.cu:62-124)
# --------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=0)
def apply_updates_sym(L, src_row_off, src_col_off, tgt_row_off, tgt_col_off):
    G = _gather(L, src_row_off, src_col_off)          # (B, Mp, Kp)
    np_ = tgt_col_off.shape[1]
    C = jnp.einsum("bmk,bnk->bmn", G, G[:, :np_, :],
                   preferred_element_type=L.dtype)
    return L.at[_scatter_idx(L, tgt_row_off, tgt_col_off)].add(-C)


# --------------------------------------------------------------------------
# LU (no-pivot) panel: D = L11 @ U11 (getrf_nopiv);
# L21 = B_L @ U11^{-1}; U12 = L11^{-1} @ B_U  (stored transposed: U^T panel)
# (ref magma_dgetrf_nopiv + dtrsm, LU/Source/SparseFrame.c:2652-2663;
#  GPU cusolverDnDgetrf with NULL ipiv :3344-3357)
# --------------------------------------------------------------------------

def getrf_nopiv(D):
    """Batched unpivoted LU of (B, C, C): returns (Lunit, U) with L unit
    lower-triangular and U upper-triangular. Blocked recursion so the MXU
    does the bulk of the work at larger C."""
    c = D.shape[-1]
    if c <= 32:
        return _getrf_nopiv_unblocked(D)
    h = c // 2
    A11, A12 = D[:, :h, :h], D[:, :h, h:]
    A21, A22 = D[:, h:, :h], D[:, h:, h:]
    L11, U11 = getrf_nopiv(A11)
    U12 = lax.linalg.triangular_solve(L11, A12, left_side=True, lower=True,
                                      unit_diagonal=True)
    L21 = lax.linalg.triangular_solve(U11, A21, left_side=False, lower=False)
    S = A22 - jnp.einsum("bik,bkj->bij", L21, U12,
                         preferred_element_type=D.dtype)
    L22, U22 = getrf_nopiv(S)
    zeros_ur = jnp.zeros_like(A12)
    Lf = jnp.concatenate([
        jnp.concatenate([L11, zeros_ur], axis=2),
        jnp.concatenate([L21, L22], axis=2)], axis=1)
    Uf = jnp.concatenate([
        jnp.concatenate([U11, U12], axis=2),
        jnp.concatenate([jnp.zeros_like(A21), U22], axis=2)], axis=1)
    return Lf, Uf


def _getrf_nopiv_unblocked(D):
    """Right-looking unpivoted LU via fori_loop of rank-1 updates."""
    c = D.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)

    def body(k, A):
        piv = A[:, k, k][:, None]
        colk = A[:, :, k] / piv                      # multipliers
        colk = jnp.where(row[None, :, k] > k, colk, 0.0)
        rowk = jnp.where(col[None, k, :] >= k, A[:, k, :], 0.0)
        A = A - colk[:, :, None] * rowk[:, None, :]
        A = A.at[:, :, k].set(jnp.where(row[None, :, k] > k,
                                        colk, A[:, :, k]))
        return A

    A = lax.fori_loop(0, c, body, D)
    Lu = jnp.where(row[None] > col[None], A, 0.0) \
        + jnp.eye(c, dtype=D.dtype)[None]
    U = jnp.where(row[None] <= col[None], A, 0.0)
    return Lu, U


@partial(jax.jit, donate_argnums=(0, 1))
def factor_panels_lu(Lx, Ux, diag_row_off, col_off, below_row_off):
    """Factor LU supernode panels. Lx holds the L panels (col-major, unit
    diagonal stored explicitly), Ux holds U^T panels with the same pattern
    (ref twin-block storage, LU/Source/SparseFrame.c:1786-1797)."""
    DL = _diag_block(Lx, diag_row_off, col_off)   # A11 (lower+diag from Lx)
    DU = _gather(Ux, diag_row_off, col_off)       # A11^T strict upper part
    # Each panel's unused diag-block triangle accumulates harmless scatter
    # garbage from updates (upper-of-lower / upper-of-U^T slots); mask both to
    # their meaningful triangles before summing, and exclude DU's diagonal —
    # the diagonal lives in Lx only (double-count otherwise).
    cp = DL.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (cp, cp), 1)
    DL = jnp.where((row >= col)[None], DL, 0)
    DU = jnp.where((row > col)[None], DU, 0)
    D = DL + jnp.swapaxes(DU, 1, 2)               # full diagonal block
    L11, U11 = getrf_nopiv(D)
    BL = _gather(Lx, below_row_off, col_off)      # A21
    BU = _gather(Ux, below_row_off, col_off)      # A12^T
    L21 = lax.linalg.triangular_solve(U11, BL, left_side=False, lower=False)
    U12t = lax.linalg.triangular_solve(L11, BU, left_side=False, lower=True,
                                       unit_diagonal=True, transpose_a=True)
    Lx = Lx.at[_scatter_idx(Lx, diag_row_off, col_off)].set(L11)
    Lx = Lx.at[_scatter_idx(Lx, below_row_off, col_off)].set(L21)
    Ux = Ux.at[_scatter_idx(Ux, diag_row_off, col_off)].set(
        jnp.swapaxes(U11, 1, 2))
    Ux = Ux.at[_scatter_idx(Ux, below_row_off, col_off)].set(U12t)
    return Lx, Ux


@partial(jax.jit, donate_argnums=(0, 1))
def apply_updates_lu(Lx, Ux, src_row_off, src_col_off, tgt_row_off,
                     tgt_col_off):
    """LU descendant update pair (ref U8, LU/Source/SparseFrame.c:2569-2604):
    L-side: A[i,q] -= Ld[i,:] . Ud[:,q]   (i rows >= lpos, q target cols)
    U-side: A[q,i] -= Ld[q,:] . Ud[:,i]   (stored into the U^T panel)
    """
    GL = _gather(Lx, src_row_off, src_col_off)     # (B, Mp, Kp) rows of Ld
    GU = _gather(Ux, src_row_off, src_col_off)     # (B, Mp, Kp) rows of Ud^T
    np_ = tgt_col_off.shape[1]
    CL = jnp.einsum("bmk,bnk->bmn", GL, GU[:, :np_, :],
                    preferred_element_type=Lx.dtype)
    CU = jnp.einsum("bmk,bnk->bmn", GU, GL[:, :np_, :],
                    preferred_element_type=Lx.dtype)
    idxL = _scatter_idx(Lx, tgt_row_off, tgt_col_off)
    Lx = Lx.at[idxL].add(-CL)
    Ux = Ux.at[idxL].add(-CU)
    return Lx, Ux


# --------------------------------------------------------------------------
# Supernodal triangular solves, batched per level
# (ref solve_supernodal :3036-3139 — scalar and sequential there; batched
#  dense blocks here)
# --------------------------------------------------------------------------

def _x_idx(x, g):
    sent = x.shape[0] - 1
    return jnp.where(g >= 0, g, sent)


@partial(jax.jit, donate_argnums=1)
def solve_fwd_level(L, x, diag_row_off, col_off, below_row_off, xcols, xrows):
    """x[cols] = L11^{-1} x[cols];  x[below] -= L21 @ x[cols]."""
    L11 = _diag_block(L, diag_row_off, col_off)
    b = x[_x_idx(x, xcols)]
    y = lax.linalg.triangular_solve(L11, b, left_side=True, lower=True)
    x = x.at[_x_idx(x, xcols)].set(y)
    L21 = _gather(L, below_row_off, col_off)
    upd = jnp.einsum("brc,bch->brh", L21, y, preferred_element_type=x.dtype)
    return x.at[_x_idx(x, xrows)].add(-upd)


@partial(jax.jit, donate_argnums=1)
def solve_bwd_level(L, x, diag_row_off, col_off, below_row_off, xcols, xrows):
    """x[cols] = L11^{-T} (x[cols] - L21^T @ x[below])."""
    L11 = _diag_block(L, diag_row_off, col_off)
    L21 = _gather(L, below_row_off, col_off)
    yb = x[_x_idx(x, xrows)]
    t = x[_x_idx(x, xcols)] - jnp.einsum("brc,brh->bch", L21, yb,
                                         preferred_element_type=x.dtype)
    z = lax.linalg.triangular_solve(L11, t, left_side=True, lower=True,
                                    transpose_a=True)
    return x.at[_x_idx(x, xcols)].set(z)


@partial(jax.jit, donate_argnums=1)
def solve_fwd_level_lu(Lx, x, diag_row_off, col_off, below_row_off, xcols,
                       xrows):
    """Forward solve on unit-L (ref LU solve :3592-3700, no divide)."""
    L11 = _diag_block(Lx, diag_row_off, col_off)
    b = x[_x_idx(x, xcols)]
    y = lax.linalg.triangular_solve(L11, b, left_side=True, lower=True,
                                    unit_diagonal=True)
    x = x.at[_x_idx(x, xcols)].set(y)
    L21 = _gather(Lx, below_row_off, col_off)
    upd = jnp.einsum("brc,bch->brh", L21, y, preferred_element_type=x.dtype)
    return x.at[_x_idx(x, xrows)].add(-upd)


@partial(jax.jit, donate_argnums=1)
def solve_bwd_level_lu(Ux, x, diag_row_off, col_off, below_row_off, xcols,
                       xrows):
    """Backward solve on U: x[cols] = U11^{-1} (x[cols] - U12 @ x[below]).
    Ux stores U^T panels, so U11 = DU^T and U12 = BU^T."""
    DU = _diag_block(Ux, diag_row_off, col_off)     # U11^T (lower)
    BU = _gather(Ux, below_row_off, col_off)        # U12^T rows
    yb = x[_x_idx(x, xrows)]
    t = x[_x_idx(x, xcols)] - jnp.einsum("brc,brh->bch", BU, yb,
                                         preferred_element_type=x.dtype)
    z = lax.linalg.triangular_solve(DU, t, left_side=True, lower=True,
                                    transpose_a=True)
    return x.at[_x_idx(x, xcols)].set(z)
