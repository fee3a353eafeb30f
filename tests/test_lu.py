"""End-to-end unpivoted supernodal LU tests: L U = P A P^T property tests and
residual gates (diagonally dominant inputs, matching the reference's no-pivot
contract, LU/Source/SparseFrame.c:3344)."""

import numpy as np
import pytest
import scipy.sparse as sp

from spfx.io import generate
from spfx.lu.factorize import LU, lu
from spfx.utils.config import Config
from spfx.validate import scaled_residual, synth_rhs

F64 = Config(dtype="float64", ordering="nd")
F32 = Config(dtype="float32", ordering="nd")

CASES = [
    generate.random_unsym(50, density=0.08, seed=10),
    generate.random_unsym(70, density=0.05, seed=11),
    generate.random_unsym(60, density=0.1, seed=12, symmetric_pattern=True),
    generate.laplacian_2d(9),                      # symmetric is a special case
    sp.csc_matrix(sp.diags(np.arange(1.0, 13.0))),
]


@pytest.mark.parametrize("A", CASES)
def test_LU_equals_PAPt(A):
    f = lu(A, F64)
    L, U = f.LU_sparse()
    p = f.sym.perm
    Ap = A[p][:, p].toarray()
    err = np.abs((L @ U - Ap)).max()
    assert err < 1e-9 * np.abs(Ap).max()
    # L unit lower, U upper
    assert np.allclose(L.diagonal(), 1.0)
    assert abs(sp.triu(L, 1)).nnz == 0
    assert abs(sp.tril(U, -1)).nnz == 0


@pytest.mark.parametrize("A", CASES)
def test_lu_solve_residual_f64(A):
    f = lu(A, F64)
    b = synth_rhs(A)
    x = f.solve(b, refine=0)
    assert scaled_residual(A, x, b) < 1e-12


@pytest.mark.parametrize("A", CASES)
def test_lu_solve_residual_f32_refined(A):
    f = lu(A, F32)
    b = synth_rhs(A)
    x0 = f.solve(b, refine=0)
    assert scaled_residual(A, x0, b) < 1e-4
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12


def test_lu_multiple_rhs():
    A = generate.random_unsym(40, density=0.1, seed=13)
    f = lu(A, F64)
    b = np.random.default_rng(5).standard_normal((40, 3))
    x = f.solve(b, refine=0)
    assert np.abs(A @ x - b).max() < 1e-9


def test_lu_reusable_context():
    A = generate.random_unsym(50, density=0.08, seed=14)
    ctx = LU(A, F64)
    A2 = sp.csc_matrix(A * 2.0)
    f2 = ctx.factorize(A2)
    b = synth_rhs(A2)
    assert scaled_residual(A2, f2.solve(b, refine=0), b) < 1e-12


def test_lu_matches_cholesky_on_spd():
    """On SPD input, LU and Cholesky must produce the same solution."""
    from spfx.chol.factorize import cholesky
    A = generate.laplacian_2d(8)
    b = synth_rhs(A)
    x_lu = lu(A, F64).solve(b, refine=0)
    x_ch = cholesky(A, F64).solve(b, refine=0)
    assert np.abs(x_lu - x_ch).max() < 1e-9 * np.abs(x_ch).max()


def test_lu_host_and_device_solve_agree():
    from spfx.symbolic import _native
    if not _native.available():
        import pytest
        pytest.skip("native lib missing")
    A = generate.random_unsym(45, density=0.1, seed=17)
    f = lu(A, F64)
    b = synth_rhs(A)
    xh = f._solve_host(b)
    xd = f._solve_device(b)
    assert np.abs(xh - np.asarray(xd)).max() < 1e-11


def test_static_pivot_permutation():
    from spfx.lu.pivot import static_pivot, diag_dominance
    rng = np.random.default_rng(3)
    A = generate.random_unsym(80, density=0.06, seed=13)
    # scramble the rows: diagonal is no longer dominant (or even present)
    scram = rng.permutation(80)
    B = sp.csc_matrix(A[scram])
    rperm = static_pivot(B)
    assert sorted(rperm) == list(range(80))
    assert diag_dominance(B[rperm]) > diag_dominance(B)
    # greedy matching must fully restore the scrambled dominant diagonal
    assert diag_dominance(sp.csc_matrix(B[rperm])) == pytest.approx(
        diag_dominance(A))


def test_lu_static_pivot_solves_scrambled():
    rng = np.random.default_rng(4)
    A = generate.random_unsym(90, density=0.06, seed=14)
    B = sp.csc_matrix(A[rng.permutation(90)])   # kills the no-pivot contract
    b = synth_rhs(B)
    f = lu(B, Config(dtype="float64", ordering="nd", static_pivot=True))
    x = f.solve(b, refine=0)
    assert scaled_residual(B, x, b) < 1e-12
    # refinement path runs against the unpermuted user matrix
    xr = f.solve(b)
    assert scaled_residual(B, xr, b) < 1e-14


def test_lu_static_pivot_checkpoint_roundtrip(tmp_path):
    from spfx.checkpoint import save_factor, load_factor
    rng = np.random.default_rng(5)
    A = generate.random_unsym(60, density=0.08, seed=15)
    B = sp.csc_matrix(A[rng.permutation(60)])
    cfg = Config(dtype="float64", ordering="nd", static_pivot=True)
    f = lu(B, cfg)
    p = str(tmp_path / "f.npz")
    save_factor(p, f)
    g = load_factor(p, cfg)
    b = synth_rhs(B)
    assert scaled_residual(B, g.solve(b), b) < 1e-14
