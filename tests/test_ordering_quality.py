"""Ordering quality and native-AMD cross-checks."""

import numpy as np
import pytest
import scipy.sparse as sp

from spfx.io import generate
from spfx.ordering import order
from spfx.symbolic import _native
from spfx.symbolic.etree import etree, col_counts


def fill_of(A, perm):
    Ap = sp.csc_matrix(A)[perm][:, perm]
    parent = etree(Ap)
    return int(col_counts(Ap, parent).sum())


@pytest.mark.parametrize("method", ["identity", "rcm", "nd", "amd"])
def test_orderings_are_permutations(method):
    A = generate.laplacian_2d(15)
    p = order(A, method)
    assert np.array_equal(np.sort(p), np.arange(A.shape[0]))


def test_amd_beats_natural_on_grid():
    A = generate.laplacian_2d(20)
    f_nat = fill_of(A, np.arange(A.shape[0]))
    f_amd = fill_of(A, order(A, "amd"))
    assert f_amd < f_nat


def test_nd_beats_natural_on_3d():
    # multi-start BFS + FM refinement measures 0.33x natural fill at 10^3
    # (round-3 single-shot BFS was ~0.6x; bound tightened accordingly)
    A = generate.laplacian_3d(10)
    f_nat = fill_of(A, np.arange(A.shape[0]))
    f_nd = fill_of(A, order(A, "nd"))
    assert f_nd < 0.4 * f_nat


def test_fm_refinement_preserves_separator_invariant():
    """After FM, no edge may connect side 0 to side 1."""
    from spfx.ordering import nd
    import scipy.sparse as sp
    A = generate.laplacian_3d(8)
    S = ((A != 0) + (A != 0).T)
    S.setdiag(0)
    S.eliminate_zeros()
    S = S.tocsr().astype(np.int8)
    rng = np.random.default_rng(0)
    labels = nd._separator_labels(S, rng)
    a = np.flatnonzero(labels == 0)
    b = np.flatnonzero(labels == 1)
    assert len(a) and len(b)
    assert S[a][:, b].nnz == 0
    # balance within the FM cap
    assert max(len(a), len(b)) <= nd._BAL_CAP * S.shape[0] + 1


def test_multilevel_fallback_is_valid_partition():
    from spfx.ordering import nd
    import scipy.sparse as sp
    A = generate.laplacian_3d(9)
    S = ((A != 0) + (A != 0).T)
    S.setdiag(0)
    S.eliminate_zeros()
    S = S.tocsr().astype(np.int8)
    rng = np.random.default_rng(1)
    labels = nd._multilevel_labels(S, rng)
    a = np.flatnonzero(labels == 0)
    b = np.flatnonzero(labels == 1)
    assert len(a) and len(b)
    assert S[a][:, b].nnz == 0


@pytest.mark.skipif(not _native.available(), reason="native planner not built")
def test_native_amd_quality_reasonable():
    """Native quotient-graph MD should be within 2x of ND fill on a grid
    (sanity bound — catches catastrophic degree-update bugs)."""
    A = generate.laplacian_2d(24)
    n = A.shape[0]
    S = ((A != 0) + (A != 0).T).tocsc()
    p = _native.amd(n, S.indptr, S.indices)
    assert p is not None
    assert np.array_equal(np.sort(p), np.arange(n))
    f_amd = fill_of(A, p)
    f_nd = fill_of(A, order(A, "nd"))
    f_nat = fill_of(A, np.arange(n))
    assert f_amd < f_nat
    assert f_amd < 2.5 * f_nd


@pytest.mark.skipif(not _native.available(), reason="native planner not built")
def test_native_matches_python_etree_colcounts():
    A = generate.random_spd(120, density=0.05, seed=30)
    pat = sp.csc_matrix(((A != 0) + (A != 0).T).astype(np.int8))
    import os
    parent_native = etree(pat)
    counts_native = col_counts(pat, parent_native)
    os.environ["SPFX_NO_NATIVE"] = "1"
    try:
        parent_py = etree(pat)
        counts_py = col_counts(pat, parent_py)
    finally:
        del os.environ["SPFX_NO_NATIVE"]
    assert np.array_equal(parent_native, parent_py)
    assert np.array_equal(counts_native, counts_py)


def test_camd_is_permutation_and_respects_constraints():
    from spfx.ordering import camd
    A = generate.laplacian_2d(12)
    n = A.shape[0]
    rng = np.random.default_rng(3)
    C = rng.integers(0, 3, n)
    p = camd(A, C)
    assert np.array_equal(np.sort(p), np.arange(n))
    # constraint classes appear in nondecreasing order along the permutation
    assert (np.diff(C[p]) >= 0).all()


def test_camd_uniform_constraints_orders_like_md():
    from spfx.ordering import camd
    A = generate.laplacian_2d(10)
    n = A.shape[0]
    p = camd(A, np.zeros(n, dtype=np.int64))
    # quality: no worse than 1.3x python-MD fill on the same grid
    f_camd = fill_of(A, p)
    f_nat = fill_of(A, np.arange(n))
    assert f_camd < 0.8 * f_nat


def test_camd_separator_constraints_reduce_fill():
    """ND-style use: interior classes 0, separator class 1."""
    from spfx.ordering import camd
    A = generate.laplacian_2d(12)
    n = A.shape[0]
    # vertical middle column of the 12x12 grid is the separator
    C = np.zeros(n, dtype=np.int64)
    C[np.arange(n) % 12 == 6] = 1
    p = camd(A, C)
    assert (np.diff(C[p]) >= 0).all()
    assert fill_of(A, p) < fill_of(A, np.arange(n))


def test_camd_native_matches_python_semantics():
    """The C++ quotient-graph CAMD must produce a valid class-ordered
    permutation with fill comparable to the exact python MD oracle."""
    from spfx.symbolic import _native
    from spfx.ordering import camd
    if not _native.available():
        import pytest
        pytest.skip("native planner not built")
    import scipy.sparse as sp
    A = generate.laplacian_2d(14)
    n = A.shape[0]
    rng = np.random.default_rng(5)
    C = rng.integers(0, 4, n).astype(np.int64)
    S = ((A != 0) + (A != 0).T).tocsc()
    S.setdiag(0)
    S.eliminate_zeros()
    p_nat = _native.camd(n, S.indptr.astype(np.int64), S.indices, C)
    assert np.array_equal(np.sort(p_nat), np.arange(n))
    assert (np.diff(C[p_nat]) >= 0).all()
    import os
    os.environ["SPFX_NO_NATIVE"] = "1"
    try:
        p_py = camd(A, C)
    finally:
        del os.environ["SPFX_NO_NATIVE"]
    # approximate-degree quality within 25% of the exact oracle
    assert fill_of(A, p_nat) < 1.25 * fill_of(A, p_py)


def test_nd_camd_fill_not_worse():
    """nested_dissection(use_camd=True) (one global constrained AMD over
    the ND partition) must not increase fill vs the per-leaf-AMD path."""
    from spfx.ordering.nd import nested_dissection
    from spfx.symbolic import _native
    if not _native.available():
        import pytest
        pytest.skip("native planner not built")
    A = generate.laplacian_3d(10)
    p_old = nested_dissection(A, use_camd=False)
    p_new = nested_dissection(A, use_camd=True)
    n = A.shape[0]
    assert np.array_equal(np.sort(p_new), np.arange(n))
    assert fill_of(A, p_new) <= 1.02 * fill_of(A, p_old)
