"""Subtree-decomposed multi-chip factorization (spfx/dist/subtree.py) on
the virtual 8-device CPU mesh: owner assignment sanity, parity against the
single-chip engine, and residual gates.

Note the single-chip comparison targets the subtree engine's OWN plan (the
owner-aware storage grouping permutes panel placement), so parity is
checked on solves and on dense-reconstructed factors, not raw storage.
"""

import numpy as np
import scipy.sparse as sp
import pytest
import jax

from spfx.io import generate
from spfx.chol.factorize import Cholesky
from spfx.lu.factorize import LU
from spfx.dist.mesh import make_mesh
from spfx.dist.subtree import (SubtreeCholesky, SubtreeLU, assign_owners,
                               sn_parent)
from spfx.symbolic.analyze import analyze
from spfx.utils.config import Config
from spfx.validate import synth_rhs, scaled_residual

CFG = Config(dtype="float64", ordering="nd", solve_backend="device")


def test_owner_assignment_properties():
    A = generate.laplacian_3d(8)
    sym = analyze(A, CFG)
    owner = assign_owners(sym, 4)
    par = sn_parent(sym)
    assert owner.shape == (sym.nsuper,)
    # every chip owns something on a decent-size problem
    assert set(range(4)) <= set(owner[owner >= 0].tolist())
    # closure: the parent of an owned supernode is same-owner or top
    for s in range(sym.nsuper):
        if owner[s] >= 0 and par[s] >= 0:
            assert owner[par[s]] in (owner[s], -1)
    # top region is an ancestor-closed set
    for s in range(sym.nsuper):
        if owner[s] == -1 and par[s] >= 0:
            assert owner[par[s]] == -1


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_subtree_cholesky_matches_single(ndev):
    A = generate.laplacian_3d(6)
    mesh = make_mesh("d", jax.devices()[:ndev])
    st = SubtreeCholesky(A, CFG, mesh=mesh)
    f = st.factorize(A)
    ref = Cholesky(A, CFG).factorize(A)
    Ld = f.L_sparse().toarray()
    Lr = ref.L_sparse().toarray()
    # same permutation -> identical factors
    assert np.array_equal(st.sym.perm, ref.sym.perm)
    np.testing.assert_allclose(Ld, Lr, rtol=1e-11, atol=1e-11)


def test_subtree_cholesky_residual():
    A = generate.laplacian_3d(7)
    st = SubtreeCholesky(A, CFG, mesh=make_mesh("d"))
    f = st.factorize(A)
    b = synth_rhs(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12
    # the comm-free local phase must carry real work, and the top phase
    # must cover few levels (comm = 2 psums x top_levels, not x all levels)
    assert sum(st.local_flops) > 0.2 * st.top_flops
    assert st.top_levels < len(st.plan.levels)


def test_subtree_local_fraction_dominates_on_2d():
    # on a large-enough 2D problem the separators are thin: subtree
    # ownership should hold the majority of the flops (3D is
    # root-separator-dominated by nature — the root front is ~n^2 dense —
    # so no such bound holds there; measured top fractions 62-87%)
    A = generate.laplacian_2d(64)
    st = SubtreeCholesky(A, CFG, mesh=make_mesh("d"))
    f = st.factorize(A)
    b = synth_rhs(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12
    assert sum(st.local_flops) > st.top_flops


def test_subtree_lu_matches_single():
    A = generate.random_unsym(80, density=0.05, seed=5)
    mesh = make_mesh("d", jax.devices()[:2])
    st = SubtreeLU(A, CFG, mesh=mesh)
    f = st.factorize(A)
    b = synth_rhs(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12


def test_subtree_lu_residual_8dev():
    A = generate.laplacian_3d(6)
    st = SubtreeLU(A, CFG, mesh=make_mesh("d"))
    f = st.factorize(A)
    b = synth_rhs(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12
