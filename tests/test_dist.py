"""Multi-chip sharded factorization on the virtual 8-device CPU mesh.

Validates the shard_map work-sharing engine (spfx/dist/factorize.py) against
the single-device engines: identical factors, reference-grade residuals.
"""

import numpy as np
import scipy.sparse as sp
import pytest
import jax

from spfx.io import generate
from spfx.chol.factorize import Cholesky
from spfx.lu.factorize import LU
from spfx.dist.factorize import ShardedCholesky, ShardedLU
from spfx.dist.mesh import make_mesh
from spfx.utils.config import Config
from spfx.validate import synth_rhs, scaled_residual

CFG = Config(dtype="float64", ordering="nd", solve_backend="device")


def _poisson(k=8):
    return generate.laplacian_3d(k)


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_cholesky_matches_single(ndev):
    A = _poisson(6)
    mesh = make_mesh("d", jax.devices()[:ndev])
    ref = Cholesky(A, CFG).factorize(A)
    shr = ShardedCholesky(A, CFG, mesh=mesh).factorize(A)
    np.testing.assert_allclose(np.asarray(shr.L), np.asarray(ref.L),
                               rtol=1e-12, atol=1e-12)


def test_sharded_cholesky_residual():
    A = _poisson(7)
    f = ShardedCholesky(A, CFG, mesh=make_mesh("d")).factorize(A)
    b = synth_rhs(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12


def test_sharded_lu_matches_single():
    rng = np.random.default_rng(0)
    A = _poisson(6).tolil()
    n = A.shape[0]
    # make it unsymmetric but diagonally dominant (no-pivot contract)
    ii = rng.integers(0, n, 3 * n)
    jj = rng.integers(0, n, 3 * n)
    pert = sp.csc_matrix((0.01 * rng.standard_normal(3 * n), (ii, jj)),
                         shape=(n, n))
    A = (A.tocsc() + pert).tocsc()
    ref = LU(A, CFG).factorize(A)
    shr = ShardedLU(A, CFG, mesh=make_mesh("d")).factorize(A)
    np.testing.assert_allclose(np.asarray(shr.Lx), np.asarray(ref.Lx),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(shr.Ux), np.asarray(ref.Ux),
                               rtol=1e-11, atol=1e-11)
    b = synth_rhs(A)
    x = shr.solve(b)
    assert scaled_residual(A, x, b) < 1e-12
