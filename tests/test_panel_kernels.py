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
