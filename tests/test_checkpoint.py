"""Factor save/load round-trip tests (capability absent in the reference)."""

import numpy as np

from spfx.checkpoint import save_factor, load_factor
from spfx.chol.factorize import cholesky
from spfx.io import generate
from spfx.lu.factorize import lu
from spfx.utils.config import Config
from spfx.validate import synth_rhs, scaled_residual

F64 = Config(dtype="float64", ordering="nd")


def test_cholesky_roundtrip(tmp_path):
    A = generate.laplacian_2d(12)
    f = cholesky(A, F64)
    p = tmp_path / "chol.npz"
    save_factor(p, f)
    g = load_factor(p, config=F64)
    b = synth_rhs(A)
    x1 = f.solve(b, refine=0)
    x2 = g.solve(b, refine=0)
    assert np.abs(x1 - x2).max() < 1e-13
    assert scaled_residual(A, x2, b) < 1e-12


def test_lu_roundtrip(tmp_path):
    A = generate.random_unsym(40, density=0.1, seed=33)
    f = lu(A, F64)
    p = tmp_path / "lu.npz"
    save_factor(p, f)
    g = load_factor(p, config=F64)
    b = synth_rhs(A)
    assert np.abs(f.solve(b, refine=0) - g.solve(b, refine=0)).max() < 1e-12
