"""Plan-coverage test of the scoped-VMEM footprint model (spfx.kernels.vmem).

Round-3 postmortem: the benchmark compile-crashed on real TPU because the
(cp=128, rbp=512, B=16) lanes panel class at 48^3 exceeded the 64MB scoped
VMEM limit (Mosaic measured 66.46M); no CPU test could catch it because
interpret mode has no VMEM. This test builds the exact benchmark plans on
CPU, enumerates every switch class the mega engine would compile, and
asserts the routed kernel's modeled footprint fits — so any future class
that would OOM on hardware fails HERE first.
"""

import pytest

from spfx.kernels import vmem

F32 = 4


def test_model_reproduces_round3_oom():
    # The one hardware-measured data point: Mosaic reported a 66.46M scoped
    # stack for the (cp=128, rbp=512, B=16) lanes class. The model must
    # both reject the class and reproduce the number (within 10%).
    got = vmem.lanes_panel_bytes(128, 512, 16, F32)
    assert got > vmem.CAP_ROUTE
    assert abs(got - 66.46 * 2**20) / (66.46 * 2**20) < 0.10, got / 2**20


def test_round3_classes_route_safely():
    # default is the blocked-MXU path (footprint independent of shape);
    # the class that crashed round 3 must never reach the lanes kernel
    assert vmem.route_panel(128, 512, 16, F32) == "blocked"
    assert vmem.route_panel(128, 256, 32, F32) == "blocked"
    assert vmem.route_panel(16, 1024, 64, F32) == "blocked"


def test_forced_kernels_stay_model_guarded(monkeypatch):
    # SPFX_PANEL_KERNEL=lanes must still refuse classes whose modeled
    # stack exceeds the cap (the round-3 OOM class falls back to xla)
    monkeypatch.setenv("SPFX_PANEL_KERNEL", "lanes")
    assert vmem.route_panel(128, 512, 16, F32) == "xla"
    assert vmem.route_panel(16, 64, 512, F32) == "lanes"
    monkeypatch.setenv("SPFX_PANEL_KERNEL", "wide")
    assert vmem.route_panel(128, 512, 16, F32) == "wide"


def _plan_classes(grid: int):
    from spfx.io import generate
    from spfx.utils.config import Config
    from spfx.symbolic.analyze import analyze
    from spfx.plan.schedule import build_plan, PanelBucketC, UpdateBucketC

    A = generate.laplacian_3d(grid)
    config = Config(dtype="float32", ordering="nd", engine="mega",
                    matmul_precision="highest", class_min=8)
    sym = analyze(A, config)
    plan = build_plan(sym, A, config)
    panels, updates = {}, {}
    for lp in plan.levels:
        for pb in lp.panels:
            assert isinstance(pb, PanelBucketC)
            k = (pb.cp, pb.rbp, len(pb.widths))
            panels[k] = panels.get(k, 0) + 1
        for ub in lp.updates:
            assert isinstance(ub, UpdateBucketC)
            k = (ub.mp, ub.kp, ub.csp, ub.slab_rows, len(ub.kw))
            updates[k] = updates.get(k, 0) + 1
    return panels, updates


@pytest.mark.parametrize("grid", [16, 32, 48])
def test_bench_plan_classes_fit(grid):
    panels, updates = _plan_classes(grid)
    assert panels and updates

    for (cp, rbp, B) in panels:
        for lu in (False, True):
            route = vmem.route_panel(cp, rbp, B, F32, lu=lu)
            if route == "lanes":
                nb = vmem.lanes_panel_bytes(cp, rbp, B, F32, lu=lu)
            elif route == "wide":
                nb = vmem.wide_panel_bytes(cp, rbp, B, F32, lu=lu)
            else:
                continue                       # XLA expanders: no VMEM cap
            assert nb <= vmem.CAP_ROUTE, (grid, cp, rbp, B, lu, nb / 2**20)

    # extend-add: the windowed one-hot path (round 4) is plain XLA matmul
    # + contiguous window updates with no scoped-VMEM constraint; assert
    # the invariant it relies on instead — every group window fits the
    # slab (ea_window(srows) <= srows)
    from spfx.plan.schedule import ea_window
    for (mp, kp, csp, srows, B) in updates:
        assert ea_window(srows) <= srows


def test_48cube_wide_classes_avoid_lanes():
    # the near-root cp>=128 classes exist at the bench size and must not
    # route to the lanes kernel (the round-3 crash site)
    panels, _ = _plan_classes(48)
    wide = [(cp, rbp, B) for (cp, rbp, B) in panels if cp >= 128]
    assert wide, "expected cp>=128 panel classes at 48^3"
    for cp, rbp, B in wide:
        assert vmem.route_panel(cp, rbp, B, F32) != "lanes", (cp, rbp, B)
