"""MatrixMarket reader/writer round-trip tests, cross-checked vs scipy.io."""

import numpy as np
import scipy.io
import scipy.sparse as sp

from spfx.io import generate
from spfx.io.matrix_market import read_matrix, read_triplet, write_matrix


def test_roundtrip_general(tmp_path):
    A = generate.random_unsym(30, density=0.1, seed=4)
    p = tmp_path / "a.mtx"
    write_matrix(p, A)
    B = read_matrix(p)
    assert (A != B).nnz == 0


def test_roundtrip_symmetric_lower_storage(tmp_path):
    A = generate.random_spd(25, density=0.15, seed=5)
    p = tmp_path / "s.mtx"
    write_matrix(p, A, symmetric=True)
    t = read_triplet(p)
    assert t.is_symmetric
    # mirrored on read
    B = read_matrix(p, expand_symmetric=True)
    assert np.allclose((A - B).toarray(), 0)


def test_matches_scipy_reader(tmp_path):
    A = generate.random_spd(20, density=0.2, seed=6)
    p = tmp_path / "x.mtx"
    scipy.io.mmwrite(str(p).removesuffix(".mtx"), sp.coo_matrix(A))
    ours = read_matrix(p)
    theirs = sp.csc_matrix(scipy.io.mmread(p))
    assert np.allclose((ours - theirs).toarray(), 0)


def test_drops_explicit_zeros(tmp_path):
    p = tmp_path / "z.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n"
                 "3 3 4\n1 1 1.0\n2 2 0.0\n3 3 2.0\n2 1 3.0\n")
    A = read_matrix(p)
    assert A.nnz == 3
    assert A[1, 1] == 0


def test_pattern_field(tmp_path):
    p = tmp_path / "p.mtx"
    p.write_text("%%MatrixMarket matrix coordinate pattern general\n"
                 "2 2 2\n1 1\n2 1\n")
    A = read_matrix(p)
    assert A[0, 0] == 1.0 and A[1, 0] == 1.0


def test_cli_driver(tmp_path, capsys):
    """python -m spfx <mtx files>: full pipeline + residual gate."""
    import spfx.__main__ as cli
    from spfx.io import generate, matrix_market

    spd = tmp_path / "spd.mtx"
    matrix_market.write_matrix(str(spd), generate.laplacian_2d(7),
                               symmetric=True)
    uns = tmp_path / "unsym.mtx"
    matrix_market.write_matrix(str(uns), generate.random_unsym(40, 0.1, 1))
    rc = cli.main([str(spd), str(uns), "--save-factor", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "engine=chol" in out and "engine=lu" in out
    assert out.count("residual") == 2
    assert (tmp_path / "spd.mtx.factor.npz").exists()
