"""Engine parity: the single-dispatch mega engine (spfx.kernels.mega) must
produce the same factors and solves as the per-call engine — it executes the
identical bucket schedule, only compiled as one lax.scan program."""

import numpy as np
import scipy.sparse as sp
import pytest

from spfx.io import generate
from spfx.utils.config import Config
from spfx.chol.factorize import Cholesky
from spfx.lu.factorize import LU
from spfx.validate import synth_rhs, scaled_residual


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    B = sp.random(n, n, density=0.02, random_state=seed).tocsc()
    A = B @ B.T + sp.diags(np.full(n, n * 0.1))
    return sp.csc_matrix(A)


def _unsym(n, seed=1):
    B = sp.random(n, n, density=0.02, random_state=seed).tocsc()
    return sp.csc_matrix(B + sp.diags(np.abs(B).sum(axis=1).A1 + 1.0))


@pytest.mark.parametrize("make,n", [(_spd, 300), (lambda n, seed=0:
                                                  generate.laplacian_3d(7),
                                                  343)])
def test_mega_chol_matches_calls(make, n):
    A = make(n)
    f_calls = Cholesky(A, Config(dtype="float64", engine="calls")).factorize(A)
    f_mega = Cholesky(A, Config(dtype="float64", engine="mega")).factorize(A)
    Lc = np.asarray(f_calls.L)
    Lm = np.asarray(f_mega.L)
    np.testing.assert_allclose(Lm, Lc, rtol=1e-12, atol=1e-12)


def test_mega_lu_matches_calls():
    A = _unsym(300)
    f_calls = LU(A, Config(dtype="float64", engine="calls")).factorize(A)
    f_mega = LU(A, Config(dtype="float64", engine="mega")).factorize(A)
    np.testing.assert_allclose(np.asarray(f_mega.Lx), np.asarray(f_calls.Lx),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f_mega.Ux), np.asarray(f_calls.Ux),
                               rtol=1e-12, atol=1e-12)


def test_mega_device_solve():
    A = _spd(400, seed=3)
    b = synth_rhs(A)
    cfg = Config(dtype="float64", engine="mega", solve_backend="device")
    f = Cholesky(A, cfg).factorize(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12


def test_mega_device_solve_lu():
    A = _unsym(400, seed=4)
    b = synth_rhs(A)
    cfg = Config(dtype="float64", engine="mega", solve_backend="device")
    f = LU(A, cfg).factorize(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12


def test_mega_complex():
    n = 200
    rng = np.random.default_rng(5)
    B = sp.random(n, n, density=0.03, random_state=5).tocsc()
    B = B + 1j * sp.random(n, n, density=0.03, random_state=6).tocsc()
    A = sp.csc_matrix(B @ B.conj().T + sp.diags(np.full(n, n * 0.1)))
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    cfg = Config(dtype="complex128", engine="mega", solve_backend="device")
    f = Cholesky(A, cfg).factorize(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12


def test_tiled_updates_match_legacy():
    """The round-5 M-tiled update classes (config.update_tile) must produce
    the same factorization as the round-4 pow4-M classes on both engines,
    and the tiled plan must not have MORE (class, chunk) steps."""
    A = generate.laplacian_3d(9)
    b = synth_rhs(A)
    base = dict(dtype="float64", ordering="nd", solve_backend="device")
    legacy = Cholesky(A, Config(**base, update_tile=0, engine="mega"))
    tiled = Cholesky(A, Config(**base, update_tile=128, engine="mega"))
    nsteps = lambda c: sum(len(l.panels) + len(l.updates)
                           for l in c.plan.levels)
    assert nsteps(tiled) <= nsteps(legacy)
    # tiles preserve the true flop count exactly (tiling splits tasks, it
    # does not pad them)
    assert tiled.plan.flops == pytest.approx(legacy.plan.flops)
    xl = legacy.factorize(A).solve(b, refine=0)
    xt = tiled.factorize(A).solve(b, refine=0)
    assert scaled_residual(A, xt, b) < 1e-12
    np.testing.assert_allclose(xt, xl, rtol=1e-9, atol=1e-9)


def test_tiled_updates_match_legacy_lu():
    A = _unsym(500, seed=7)
    b = synth_rhs(A)
    base = dict(dtype="float64", ordering="nd", solve_backend="device")
    xl = LU(A, Config(**base, update_tile=0)).factorize(A).solve(b, refine=0)
    xt = LU(A, Config(**base, update_tile=128)).factorize(A) \
        .solve(b, refine=0)
    assert scaled_residual(A, xt, b) < 1e-12
    np.testing.assert_allclose(xt, xl, rtol=1e-9, atol=1e-9)


def test_tiled_tall_task_tiles():
    """A task with M > update_tile must split into multiple tiles that
    reproduce the untiled update exactly (exercises head_start gathers)."""
    A = generate.laplacian_3d(8)
    base = dict(dtype="float64", ordering="nd", solve_backend="device")
    tiny = Cholesky(A, Config(**base, update_tile=16, update_small=8))
    ref = Cholesky(A, Config(**base, update_tile=0))
    has_multi = any(
        ub.head_start is not None and len(np.unique(
            ub.head_start[ub.head_start >= 0])) < (ub.head_start >= 0).sum()
        for lp in tiny.plan.levels for ub in lp.updates)
    assert has_multi, "no task split across tiles at update_tile=16"
    b = synth_rhs(A)
    xt = tiny.factorize(A).solve(b, refine=0)
    xr = ref.factorize(A).solve(b, refine=0)
    np.testing.assert_allclose(xt, xr, rtol=1e-9, atol=1e-9)


def test_incore_slack_covers_dma_superwindows():
    """In-core plans: every aligned-down gather superwindow must end inside
    plan.storage (the DMA clips at the buffer end; a clipped window shifts
    its row base and silently reads garbage — see the stream engine's
    stage-slack fix)."""
    from spfx.plan.schedule import ALIGN, build_plan, UpdateBucketC
    from spfx.symbolic.analyze import analyze
    from spfx.utils.config import Config
    A = generate.laplacian_3d(9)
    cfg = Config(dtype="float32", ordering="nd")
    sym = analyze(A, cfg)
    plan = build_plan(sym, A, cfg)
    for lp in plan.levels:
        for ub in lp.updates:
            if not isinstance(ub, UpdateBucketC) or ub.head_start is None:
                continue
            ext = ALIGN // ub.kp
            for starts, rows in ((ub.src_start, ub.mp + ext),
                                 (ub.head_start, ub.tgt_cpos.shape[1])):
                s = np.asarray(starts, np.int64)
                s = s[s >= 0]
                if not len(s):
                    continue
                al = (s // ALIGN) * ALIGN
                assert (al + rows * ub.kp <= plan.storage).all()
