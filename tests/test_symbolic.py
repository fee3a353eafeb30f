"""Unit tests for the host symbolic layer against dense oracles.

The reference has no tests (SURVEY.md §4); these implement the test pyramid
it lacks: etree/postorder/colcount/supernodes validated against a dense
symbolic-factorization oracle on random and structured matrices.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from spfx.io import generate
from spfx.symbolic.etree import etree, postorder, col_counts, etree_levels
from spfx.symbolic.analyze import analyze
from spfx.symbolic.supernodes import (fundamental_supernodes, sn_of_map,
                                      sn_patterns, amalgamate)
from spfx.utils.config import Config


def dense_chol_pattern(A):
    """Oracle: symbolic Cholesky fill pattern by dense elimination."""
    A = np.asarray((A != 0).todense()).astype(bool)
    n = A.shape[0]
    P = A | A.T | np.eye(n, dtype=bool)
    for k in range(n):
        below = np.where(P[k + 1:, k])[0] + k + 1
        for i in below:
            P[below, i] = True
    return np.tril(P)


def dense_etree(A):
    """Oracle etree: parent[j] = min row below diag in factor column j."""
    L = dense_chol_pattern(A)
    n = L.shape[0]
    parent = np.full(n, -1, dtype=np.int64)
    for j in range(n):
        rows = np.where(L[j + 1:, j])[0]
        if len(rows):
            parent[j] = rows[0] + j + 1
    return parent


CASES = [
    generate.laplacian_2d(7),
    generate.laplacian_3d(4),
    generate.random_spd(60, density=0.08, seed=1),
    generate.random_spd(40, density=0.3, seed=2),
    sp.identity(10, format="csc"),
]


@pytest.mark.parametrize("A", CASES)
def test_etree_matches_dense_oracle(A):
    assert np.array_equal(etree(A), dense_etree(A))


@pytest.mark.parametrize("A", CASES)
def test_colcounts_match_dense_oracle(A):
    parent = etree(A)
    counts = col_counts(A, parent)
    L = dense_chol_pattern(A)
    assert np.array_equal(counts, L.sum(axis=0))


def test_postorder_is_valid():
    A = generate.random_spd(80, density=0.05, seed=3)
    parent = etree(A)
    post = postorder(parent)
    assert np.array_equal(np.sort(post), np.arange(80))
    # children appear before parents
    pos = np.empty(80, dtype=np.int64)
    pos[post] = np.arange(80)
    for j in range(80):
        if parent[j] != -1:
            assert pos[j] < pos[parent[j]]


def test_etree_levels_monotone():
    A = generate.laplacian_2d(9)
    parent = etree(A)
    lev = etree_levels(parent)
    for j in range(len(parent)):
        if parent[j] != -1:
            assert lev[parent[j]] > lev[j]


@pytest.mark.parametrize("A", CASES)
def test_supernode_pattern_matches_union_of_columns(A):
    sym = analyze(A, Config(ordering="identity"))
    n = sym.n
    Ap = sp.csc_matrix(A)[sym.perm][:, sym.perm]
    L = dense_chol_pattern(Ap)
    for s in range(sym.nsuper):
        cols = sym.sn_cols(s)
        expect = np.where(L[:, cols].any(axis=1))[0]
        got = sym.sn_row_list(s)
        assert np.array_equal(got, expect), f"supernode {s}"
        # first width rows are the supernode's own columns
        assert np.array_equal(got[:len(cols)], cols)


@pytest.mark.parametrize("A", CASES)
@pytest.mark.parametrize("method", ["identity", "rcm", "nd", "amd"])
def test_analyze_structure_invariants(A, method):
    sym = analyze(A, Config(ordering=method))
    n = sym.n
    assert np.array_equal(np.sort(sym.perm), np.arange(n))
    assert sym.sn_start[0] == 0 and sym.sn_start[-1] == n
    assert (np.diff(sym.sn_start) > 0).all()
    # levels strictly increase along supernodal parent edges
    for s in range(sym.nsuper):
        last = sym.sn_start[s + 1] - 1
        p = sym.parent[last]
        if p != -1:
            assert sym.sn_level[sym.sn_of[p]] > sym.sn_level[s]
    # pattern rows all >= first col, sorted, within range
    for s in range(sym.nsuper):
        rows = sym.sn_row_list(s)
        assert (np.diff(rows) > 0).all()
        assert rows[0] == sym.sn_start[s]
        assert rows[-1] < n


def test_amalgamation_reduces_supernode_count():
    A = generate.laplacian_2d(20)
    relaxed = analyze(A, Config(ordering="nd"))
    strict = analyze(A, Config(ordering="nd", relax_width=(1,),
                               relax_fill=(0.0,)))
    assert relaxed.nsuper <= strict.nsuper
    # relaxation never loses columns
    assert relaxed.sn_start[-1] == strict.sn_start[-1] == A.shape[0]


def test_ordering_reduces_fill():
    A = generate.laplacian_2d(24)
    fill_nat = analyze(A, Config(ordering="identity")).nnzL
    fill_nd = analyze(A, Config(ordering="nd")).nnzL
    assert fill_nd < fill_nat


def test_fundamental_supernodes_partition():
    A = generate.laplacian_2d(10)
    parent = etree(A)
    counts = col_counts(A, parent)
    st = fundamental_supernodes(parent, counts)
    assert st[0] == 0 and st[-1] == A.shape[0]
    sn_of = sn_of_map(st, A.shape[0])
    assert (np.diff(sn_of) >= 0).all()
