"""Stage-streamed out-of-core factorization (spfx/stream): tiny stage caps
force multiple host<->device stages; the result must match the in-core
engine exactly and pass the residual gate.

The 2^31 int32 ceiling itself cannot be exercised in CI (it would need
>8GB); what is tested is the mechanism that lifts it: int64 global plans,
per-stage rebasing to local int32 tables, and host-resident factors.
"""

import numpy as np
import pytest

from spfx.io import generate
from spfx.chol.factorize import Cholesky
from spfx.stream import StreamingCholesky
from spfx.utils.config import Config
from spfx.validate import synth_rhs, scaled_residual

CFG = Config(dtype="float64", ordering="nd", solve_backend="device")


@pytest.mark.parametrize("stage_elems", [1 << 12, 1 << 14])
def test_streaming_matches_incore(stage_elems):
    A = generate.laplacian_3d(6)
    st = StreamingCholesky(A, CFG, stage_elems=stage_elems)
    assert len(st.stages) > 1, "cap too big: nothing streamed"
    f = st.factorize(A)
    ref = Cholesky(A, CFG).factorize(A)
    np.testing.assert_allclose(np.asarray(f.L), np.asarray(ref.L),
                               rtol=1e-12, atol=1e-12)


def test_streaming_residual():
    A = generate.laplacian_3d(7)
    st = StreamingCholesky(A, CFG, stage_elems=1 << 14)
    assert len(st.stages) > 2
    f = st.factorize(A)
    b = synth_rhs(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12


def test_streaming_single_stage_degenerates():
    A = generate.laplacian_2d(12)
    st = StreamingCholesky(A, CFG, stage_elems=1 << 28)
    assert len(st.stages) == 1
    f = st.factorize(A)
    b = synth_rhs(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12


def test_int64_plan_tables():
    from spfx.plan.schedule import build_plan
    from spfx.symbolic.analyze import analyze
    A = generate.laplacian_2d(10)
    sym = analyze(A, CFG)
    plan = build_plan(sym, A, CFG, idx_dtype=np.int64)
    for lp in plan.levels:
        for pb in lp.panels:
            assert pb.diag_start.dtype == np.int64
        for ub in lp.updates:
            assert ub.src_start.dtype == np.int64
            assert ub.sds is not None


def test_streaming_lu_matches_incore():
    """StreamingLU must match the in-core LU bit-for-bit across a
    multi-stage split (ref LU stage partition,
    LU/Source/SparseFrame.c:1647-2231)."""
    from spfx.lu.factorize import LU
    from spfx.stream import StreamingLU
    rng = np.random.default_rng(11)
    import scipy.sparse as sp
    n = 500
    B = sp.random(n, n, density=0.02, random_state=11).tocsc()
    A = sp.csc_matrix(B + sp.diags(np.abs(B).sum(axis=1).A1 + 1.0))
    st = StreamingLU(A, CFG, stage_elems=1 << 14)
    assert len(st.stages) > 1, "cap too big: nothing streamed"
    f = st.factorize(A)
    ref = LU(A, CFG).factorize(A)
    np.testing.assert_allclose(np.asarray(f.Lx), np.asarray(ref.Lx),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f.Ux), np.asarray(ref.Ux),
                               rtol=1e-12, atol=1e-12)
    b = synth_rhs(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12


def test_streaming_lu_poisson_residual():
    from spfx.stream import StreamingLU
    A = generate.laplacian_3d(6)
    st = StreamingLU(A, CFG, stage_elems=1 << 15)
    assert len(st.stages) > 1
    f = st.factorize(A)
    b = synth_rhs(A)
    x = f.solve(b)
    assert scaled_residual(A, x, b) < 1e-12


def test_stage_buffers_cover_dma_superwindows():
    """Every rebased gather superwindow (aligned DOWN to the DMA tile,
    extended by ext rows) must fit inside its stage buffer: an overrun
    makes the TPU DMA clip-shift the window and read garbage as real rows
    (caught as NaN factors on hardware; the stage storage must use the
    plan's computed slack, not the module SLACK floor)."""
    from spfx.stream import StreamingCholesky
    from spfx.plan.schedule import ALIGN
    A = generate.laplacian_3d(7)
    st = StreamingCholesky(A, CFG, stage_elems=1 << 13)
    assert len(st.stages) > 2
    for stage in st.stages:
        for lvl in stage.levels:
            for ub in lvl.updates:
                if ub.head_start is None:
                    continue
                ext = ALIGN // ub.kp
                for starts, rows in ((ub.src_start, ub.mp + ext),
                                     (ub.head_start,
                                      ub.tgt_cpos.shape[1])):
                    s = np.asarray(starts, np.int64)
                    s = s[s >= 0]
                    if not len(s):
                        continue
                    al = (s // ALIGN) * ALIGN
                    assert (al + rows * ub.kp <= stage.storage).all(), \
                        (int((al + rows * ub.kp).max()), stage.storage)
