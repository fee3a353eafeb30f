"""Batch-in-lanes Pallas panel kernels (interpret mode on CPU) vs the plain
XLA contig-layout math — the two implementations of the same panel deltas."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg as sla

from spfx.kernels import pallas_blocks


def _spd_batch(B, cp, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((B, cp, cp))
    D = D @ np.swapaxes(D, 1, 2) + cp * np.eye(cp)[None]
    return D


def test_chol_panel_lanes_parity():
    B, cp, rbp = 16, 16, 32
    rng = np.random.default_rng(1)
    Dh = _spd_batch(B, cp, 1)
    Bh = rng.standard_normal((B, rbp, cp))
    w = rng.integers(1, cp + 1, B).astype(np.int32)
    nb = rng.integers(0, rbp + 1, B).astype(np.int32)

    DrawT = jnp.asarray(np.transpose(Dh, (1, 2, 0)))
    BrawT = jnp.asarray(np.transpose(Bh, (1, 2, 0)))
    ddT, dbT = pallas_blocks.chol_panel_deltas_lanes(
        jnp.asarray(w), jnp.asarray(nb), DrawT, BrawT, cp=cp, rbp=rbp)
    dd = np.transpose(np.asarray(ddT), (2, 0, 1))
    db = np.transpose(np.asarray(dbT), (2, 0, 1))

    for i in range(B):
        cm = (np.arange(cp) < w[i]).astype(float)
        D = Dh[i] * cm[None, :] * cm[:, None] + np.eye(cp) * (1 - cm)
        L11 = np.linalg.cholesky(D)
        ddr = (L11 - Dh[i]) * cm[None, :] * cm[:, None]
        np.testing.assert_allclose(dd[i], ddr, atol=1e-10)
        rm = (np.arange(rbp) < nb[i]).astype(float)
        L21 = sla.solve_triangular(L11, (Bh[i] * cm[None, :]).T,
                                   lower=True).T
        dbr = (L21 - Bh[i]) * cm[None, :] * rm[:, None]
        np.testing.assert_allclose(db[i], dbr, atol=1e-10)


def test_chol_panel_lanes_diag_only():
    B, cp = 8, 8
    Dh = _spd_batch(B, cp, 2)
    w = np.full(B, cp, np.int32)
    ddT, dbT = pallas_blocks.chol_panel_deltas_lanes(
        jnp.asarray(w), jnp.asarray(np.zeros(B, np.int32)),
        jnp.asarray(np.transpose(Dh, (1, 2, 0))),
        jnp.zeros((0, cp, B)), cp=cp, rbp=0)
    dd = np.transpose(np.asarray(ddT), (2, 0, 1))
    assert dbT.shape == (0, cp, B)
    for i in range(B):
        L11 = np.linalg.cholesky(Dh[i])
        np.testing.assert_allclose(dd[i], L11 - Dh[i], atol=1e-10)


def test_lu_panel_lanes_parity():
    B, cp, rbp = 8, 16, 16
    rng = np.random.default_rng(3)
    # diagonally dominant unsymmetric diag blocks, stored as L-lower / U^T
    A = rng.standard_normal((B, cp, cp))
    A += (np.abs(A).sum(axis=2)[..., None] + 1.0) * np.eye(cp)[None]
    DLh = np.tril(A)
    DUh = np.transpose(np.triu(A, 1), (0, 2, 1))
    BLh = rng.standard_normal((B, rbp, cp))
    BUh = rng.standard_normal((B, rbp, cp))
    w = np.full(B, cp, np.int32)
    nb = np.full(B, rbp, np.int32)

    t = lambda a: jnp.asarray(np.transpose(a, (1, 2, 0)))
    ddl, ddu, dbl, dbu = pallas_blocks.lu_panel_deltas_lanes(
        jnp.asarray(w), jnp.asarray(nb), t(DLh), t(DUh), t(BLh), t(BUh),
        cp=cp, rbp=rbp)
    b = lambda a: np.transpose(np.asarray(a), (2, 0, 1))
    ddl, ddu, dbl, dbu = b(ddl), b(ddu), b(dbl), b(dbu)

    for i in range(B):
        P, L, U = sla.lu(A[i])
        assert np.allclose(P, np.eye(cp))  # diag dominance: no pivoting
        # L panel diag block holds unit-lower L11; U^T panel holds U11^T
        np.testing.assert_allclose(ddl[i] + DLh[i], L, atol=1e-8)
        np.testing.assert_allclose(ddu[i] + DUh[i], U.T, atol=1e-8)
        L21 = sla.solve_triangular(U, BLh[i].T, lower=False, trans='T').T
        np.testing.assert_allclose(dbl[i] + BLh[i], L21, atol=1e-8)
        U12t = sla.solve_triangular(L, BUh[i].T, lower=True,
                                    unit_diagonal=True).T
        np.testing.assert_allclose(dbu[i] + BUh[i], U12t, atol=1e-8)


def _blocked_vs_xla(B, cp, rbp, seed):
    """Blocked-MXU panel path vs the XLA expander path on the same bucket."""
    from spfx.kernels import blocks
    rng = np.random.default_rng(seed)
    Dh = _spd_batch(B, cp, seed)
    Bh = rng.standard_normal((B, rbp, cp)) if rbp else np.zeros((B, 0, cp))
    w = rng.integers(1, cp + 1, B).astype(np.int32)
    nb = rng.integers(0, rbp + 1, B).astype(np.int32) if rbp \
        else np.zeros(B, np.int32)
    # honor the uniform-layout storage contract: cols/rows >= w are zero,
    # and the diag window's upper triangle is never written by assembly
    # (only lower-triangle A entries are scattered), so it is exactly zero
    cm = np.arange(cp)[None, :] < w[:, None]
    Dh = np.tril(Dh) * cm[:, None, :] * cm[:, :, None]
    Bh = Bh * cm[:, None, :]
    args = (jnp.asarray(Dh), jnp.asarray(Bh), jnp.asarray(w),
            jnp.asarray(nb))
    dd1, db1 = blocks._chol_deltas_blocked(*args, cp=cp, rbp=rbp)
    # reference: the masked XLA expander math at the tail of
    # _chol_deltas_blocks (runs on CPU since _unrolled() is False there)
    dd2, db2 = blocks._chol_deltas_blocks(*args, cp=cp, rbp=rbp)
    np.testing.assert_allclose(np.asarray(dd1), np.asarray(dd2),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db2),
                               rtol=1e-10, atol=1e-10)


def test_chol_blocked_parity_small():
    _blocked_vs_xla(8, 16, 32, 3)


def test_chol_blocked_parity_multiblock():
    _blocked_vs_xla(4, 64, 128, 4)


def test_chol_blocked_parity_wide():
    _blocked_vs_xla(2, 128, 64, 5)


def test_chol_blocked_parity_diag_only():
    _blocked_vs_xla(8, 32, 0, 6)


def _lu_blocked_vs_xla(B, cp, rbp, seed):
    from spfx.kernels import blocks
    rng = np.random.default_rng(seed)
    w = rng.integers(1, cp + 1, B).astype(np.int32)
    nb = rng.integers(0, rbp + 1, B).astype(np.int32) if rbp \
        else np.zeros(B, np.int32)
    cm = np.arange(cp)[None, :] < w[:, None]
    # diagonally dominant square blocks split into the Lx/Ux storage halves
    Dh = rng.standard_normal((B, cp, cp))
    Dh = Dh + (np.abs(Dh).sum(2)[:, :, None] + 1.0) * np.eye(cp)[None]
    DL = np.tril(Dh) * cm[:, None, :] * cm[:, :, None]
    DU = np.swapaxes(np.triu(Dh, 1), 1, 2) * cm[:, None, :] \
        * cm[:, :, None]
    if rbp:
        BL = rng.standard_normal((B, rbp, cp)) * cm[:, None, :]
        BU = rng.standard_normal((B, rbp, cp)) * cm[:, None, :]
    else:
        BL = BU = np.zeros((B, 0, cp))
    args = tuple(jnp.asarray(a) for a in
                 (DL, DU, BL, BU, w, nb))
    outs1 = blocks._lu_deltas_blocked(*args, cp=cp, rbp=rbp)
    outs2 = blocks._lu_deltas_blocks(*args, cp=cp, rbp=rbp)
    for o1, o2 in zip(outs1, outs2):
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-9, atol=1e-9)


def test_lu_blocked_parity_small():
    _lu_blocked_vs_xla(8, 16, 32, 7)


def test_lu_blocked_parity_multiblock():
    _lu_blocked_vs_xla(4, 64, 64, 8)


def test_lu_blocked_parity_wide():
    _lu_blocked_vs_xla(2, 128, 32, 9)


def test_lu_blocked_parity_diag_only():
    _lu_blocked_vs_xla(8, 32, 0, 10)
