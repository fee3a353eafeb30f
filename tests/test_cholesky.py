"""End-to-end supernodal Cholesky tests: L L^T = P A P^T property tests and
reference-style residual gates (SURVEY.md §4 test pyramid)."""

import numpy as np
import pytest
import scipy.sparse as sp

from spfx.chol.factorize import Cholesky, cholesky
from spfx.io import generate
from spfx.utils.config import Config
from spfx.validate import validate, synth_rhs, scaled_residual

F64 = Config(dtype="float64", ordering="nd")
F32 = Config(dtype="float32", ordering="nd")

CASES = [
    generate.laplacian_1d(17).tocsc() + sp.identity(17, format="csc"),
    generate.laplacian_2d(9),
    generate.laplacian_2d(16),
    generate.laplacian_3d(5),
    generate.random_spd(80, density=0.06, seed=7),
    generate.random_spd(50, density=0.25, seed=8),
    generate.stretched_grid(12, 8),
]


@pytest.mark.parametrize("A", CASES)
def test_LLt_equals_PAPt(A):
    f = cholesky(A, F64)
    L = f.L_sparse()
    p = f.sym.perm
    Ap = A[p][:, p].toarray()
    err = np.abs(L @ L.T - Ap).max()
    assert err < 1e-10 * np.abs(Ap).max()


@pytest.mark.parametrize("A", CASES)
def test_solve_residual_f64(A):
    f = cholesky(A, F64)
    x, res = validate(f, refine=0)
    assert res < 1e-12


@pytest.mark.parametrize("A", CASES)
def test_solve_residual_f32_with_refinement(A):
    f = cholesky(A, F32)
    _, res0 = validate(f, refine=0)
    assert res0 < 1e-4          # raw f32 factorization quality
    _, res = validate(f)
    assert res < 1e-12          # refinement recovers double quality


@pytest.mark.parametrize("method", ["identity", "rcm", "nd", "amd"])
def test_all_orderings_solve(method):
    A = generate.laplacian_2d(12)
    f = cholesky(A, Config(dtype="float64", ordering=method))
    _, res = validate(f, refine=0)
    assert res < 1e-12


def test_multiple_rhs():
    A = generate.laplacian_2d(10)
    f = cholesky(A, F64)
    b = np.random.default_rng(3).standard_normal((A.shape[0], 4))
    x = f.solve(b, refine=0)
    assert x.shape == b.shape
    assert np.abs(A @ x - b).max() < 1e-10


def test_reusable_pattern_context():
    A = generate.random_spd(60, density=0.1, seed=9)
    ctx = Cholesky(A, F64)
    f1 = ctx.factorize(A)
    A2 = A + sp.identity(60, format="csc") * 3.0
    f2 = ctx.factorize(A2)
    b = synth_rhs(A)
    assert scaled_residual(A, f1.solve(b, refine=0), b) < 1e-12
    assert scaled_residual(A2, f2.solve(b, refine=0), b) < 1e-12


def test_logdet():
    A = generate.laplacian_2d(8).toarray()
    f = cholesky(sp.csc_matrix(A), F64)
    sign, ld = np.linalg.slogdet(A)
    assert sign > 0
    assert abs(f.logdet() - ld) < 1e-8


def test_identity_matrix():
    A = sp.identity(12, format="csc") * 4.0
    f = cholesky(A, F64)
    b = np.ones(12)
    assert np.allclose(f.solve(b, refine=0), 0.25)


def test_singular_matrix_yields_nan():
    A = generate.laplacian_2d(6) - 1e-2 * sp.identity(36, format="csc")
    A = A - sp.identity(36, format="csc") * 0  # still SPD; make singular:
    B = sp.csc_matrix(A.toarray() * 0.0 + np.eye(36))
    B[0, 0] = 0.0
    f = cholesky(B.tocsc(), F64)
    x = f.solve(np.ones(36), refine=0)
    assert not np.isfinite(x).all()


def test_host_and_device_solve_agree():
    from spfx.symbolic import _native
    if not _native.available():
        import pytest
        pytest.skip("native lib missing")
    A = generate.laplacian_2d(12)
    f = cholesky(A, F64)
    b = synth_rhs(A)
    xh = f._solve_host(b)
    xd = f._solve_device(b)
    assert np.abs(xh - np.asarray(xd)).max() < 1e-11


@pytest.mark.parametrize("cfg", [
    Config(dtype="float64", ordering="nd", update_windowing=True),
    Config(dtype="float64", ordering="nd", max_pad_ratio=4.0),
    Config(dtype="float64", ordering="nd", update_windowing=True,
           max_pad_ratio=2.0),
])
def test_windowed_and_pad_bounded_plans_match(cfg):
    """Column-windowed updates and pad-ratio-bounded quanta are pure plan
    transformations: the factor must be bit-comparable to the default plan."""
    A = generate.laplacian_3d(7)
    ref = cholesky(A, Config(dtype="float64", ordering="nd"))
    alt = cholesky(A, cfg)
    Lr = ref.L_sparse().toarray()
    La = alt.L_sparse().toarray()
    np.testing.assert_allclose(La, Lr, rtol=1e-13, atol=1e-13)


def test_class_min_coarse_classes():
    """class_min=32 must collapse tiny shape classes without changing
    results; call count must strictly drop on a multi-class problem."""
    from spfx.chol.factorize import Cholesky
    A = generate.laplacian_3d(7)
    b = synth_rhs(A)
    fine = Cholesky(A, Config(dtype="float64", ordering="nd", class_min=8,
                              stride_min=0))
    coarse = Cholesky(A, Config(dtype="float64", ordering="nd",
                                class_min=32))
    ncalls = lambda c: sum(len(l.panels) + len(l.updates)
                           for l in c.plan.levels)
    assert ncalls(coarse) < ncalls(fine)
    xf = fine.factorize(A).solve(b, refine=0)
    xc = coarse.factorize(A).solve(b, refine=0)
    assert scaled_residual(A, xc, b) < 1e-12
    assert np.allclose(xf, xc, atol=1e-9)


def test_update_precision_knob():
    """update_precision is a TPU MXU knob; on CPU it must be a no-op
    numerically but still exercise the split-precision code path."""
    from spfx.chol.factorize import Cholesky
    A = generate.laplacian_2d(9)
    b = synth_rhs(A)
    f = Cholesky(A, Config(dtype="float32", ordering="nd",
                           update_precision="high")).factorize(A)
    assert scaled_residual(A, f.solve(b), b) < 1e-12
