"""Complex (Hermitian) Cholesky line — the reference's zpotrf/zherk path.

Note the reference never finished its complex SOLVE (left as TODO,
Cholesky/Source/SparseFrame.c:3088); spfx supports it fully.
"""

import numpy as np
import pytest

from spfx.chol.factorize import cholesky
from spfx.io import generate
from spfx.utils.config import Config
from spfx.validate import scaled_residual

C128 = Config(dtype="complex128", ordering="nd")


@pytest.mark.parametrize("seed", [20, 21])
def test_LLH_equals_PAPH(seed):
    A = generate.random_hermitian(50, density=0.08, seed=seed)
    f = cholesky(A, C128)
    L = f.L_sparse()
    p = f.sym.perm
    Ap = A[p][:, p].toarray()
    err = np.abs(L @ L.conj().T - Ap).max()
    assert err < 1e-10 * np.abs(Ap).max()


def test_complex_solve_residual():
    A = generate.random_hermitian(64, density=0.06, seed=22)
    f = cholesky(A, C128)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    x = f._solve_device(b.astype(np.complex128))
    r = np.abs(A @ x - b).max()
    anorm = np.abs(A).sum(axis=0).max()
    assert r / (anorm * np.abs(x).max() + np.abs(b).max()) < 1e-12


# ---- complex LU (ref zgetrf_nopiv, LU/Source/SparseFrame.c:2652-2655;
# cusolverDnZgetrf :3348) — exercises the complex fallback of
# _lu_deltas_blocks and the complex scatter branch of extend_add_rows -----

CLU = Config(dtype="complex128", ordering="nd")


def test_complex_lu_equals_PAPt():
    from spfx.lu.factorize import lu
    import scipy.sparse as sp
    A = generate.random_unsym_complex(60, density=0.08, seed=30)
    f = lu(A, CLU)
    L, U = f.LU_sparse()
    p = f.sym.perm
    Ap = A[p][:, p].toarray()
    err = np.abs(L @ U - Ap).max()
    assert err < 1e-10 * np.abs(Ap).max()
    assert np.allclose(L.diagonal(), 1.0)
    assert abs(sp.triu(L, 1)).nnz == 0
    assert abs(sp.tril(U, -1)).nnz == 0


@pytest.mark.parametrize("seed", [31, 32])
def test_complex_lu_solve_residual(seed):
    from spfx.lu.factorize import lu
    A = generate.random_unsym_complex(72, density=0.06, seed=seed)
    f = lu(A, CLU)
    rng = np.random.default_rng(seed)
    b = rng.standard_normal(72) + 1j * rng.standard_normal(72)
    x = f.solve(b.astype(np.complex128))
    r = np.abs(A @ x - b).max()
    anorm = np.abs(A).sum(axis=0).max()
    assert r / (anorm * np.abs(x).max() + np.abs(b).max()) < 1e-12


def test_complex_lu_matches_real_on_real_input():
    from spfx.lu.factorize import lu
    A = generate.random_unsym(50, density=0.08, seed=33)
    fc = lu(sp_complex(A), CLU)
    fr = lu(A, Config(dtype="float64", ordering="nd"))
    b = np.random.default_rng(2).standard_normal(50)
    xc = fc.solve(b.astype(np.complex128))
    xr = fr.solve(b)
    assert np.abs(xc.imag).max() < 1e-10
    assert np.abs(xc.real - xr).max() < 1e-8


def sp_complex(A):
    import scipy.sparse as sp
    B = sp.csc_matrix(A).copy()
    return sp.csc_matrix((B.data.astype(np.complex128), B.indices,
                          B.indptr), shape=B.shape)


def test_complex_matches_real_on_real_input():
    A = generate.laplacian_2d(8)
    fc = cholesky(A.astype(np.complex128), C128)
    fr = cholesky(A, Config(dtype="float64", ordering="nd"))
    b = np.random.default_rng(1).standard_normal(64)
    xc = fc._solve_device(b.astype(np.complex128))
    xr = fr.solve(b, refine=0)
    assert np.abs(xc.imag).max() < 1e-12
    assert np.abs(xc.real - xr).max() < 1e-10
