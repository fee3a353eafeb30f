"""Per-phase instrumentation + post-factorize validation.

Wires the two runtime knobs the reference exposes as compile-time flags:

- ``Config.profile`` — per-phase wall timers (ref matrix_info timers,
  Cholesky/Include/info.h:146-149, reported at SparseFrame.c:3427-3434) plus
  an optional ``jax.profiler`` trace bracketing the numeric factorization
  (the TPU analogue of ``cudaProfilerStart/Stop``, :3411-3415). Set
  ``SPFX_PROFILE_DIR`` to capture a TensorBoard-loadable device trace.
- ``Config.validate`` — run the reference-style scaled-residual check
  ``|Ax-b| / (|A| |x| + |b|)`` (:3141-3266) right after factorization and
  store it on the factor as ``factor.residual``.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

import numpy as np


@contextlib.contextmanager
def profile_scope(config, phase: str):
    """jax.profiler trace around a phase when SPFX_PROFILE_DIR is set."""
    trace_dir = os.environ.get("SPFX_PROFILE_DIR")
    if not (config.profile and trace_dir):
        yield
        return
    import jax
    with jax.profiler.trace(os.path.join(trace_dir, phase)):
        yield


def finish_factorize(ctx, factor, t0: float, arr):
    """Record factorize wall time, print the phase report (profile) and run
    the residual gate (validate). ``arr`` is any device output of the
    factorization (used to force completion for honest timing)."""
    config = ctx.config
    if config.profile or config.validate:
        _ = np.asarray(arr[:1])        # force device completion
    ctx.factorize_time = time.perf_counter() - t0
    if config.profile:
        print(f"[spfx profile] analyze {ctx.analyze_time:.3f}s  "
              f"plan {ctx.plan_time:.3f}s  "
              f"factorize {ctx.factorize_time:.3f}s  "
              f"({ctx.plan.flops / max(ctx.factorize_time, 1e-12) / 1e9:.1f}"
              " GFLOP/s)", file=sys.stderr, flush=True)
        # schedule-shape counters (once per plan): the numbers that steer
        # the padding vs dispatch trade-off — ref PRINT_DEBUG analogue
        # (Cholesky/Source/SparseFrame.c:3012-3013)
        if not getattr(ctx, "_stats_printed", False):
            ctx._stats_printed = True
            from spfx.plan.schedule import plan_stats
            st = plan_stats(ctx.plan)
            census = st.pop("class_census")
            print("[spfx profile] " + "  ".join(
                f"{k}={v}" for k, v in st.items()),
                file=sys.stderr, flush=True)
            print("[spfx profile] top classes (key x chunks): " + "  ".join(
                f"{k}x{c}" for k, c in census),
                file=sys.stderr, flush=True)
    if config.validate:
        from spfx.validate import scaled_residual, synth_rhs
        b = synth_rhs(factor.A)
        t1 = time.perf_counter()
        x = factor.solve(b)
        solve_t = time.perf_counter() - t1
        factor.residual = scaled_residual(factor.A, x, b)
        if config.profile:
            print(f"[spfx profile] solve {solve_t:.3f}s  "
                  f"residual {factor.residual:.3e}",
                  file=sys.stderr, flush=True)
        if not factor.residual < 1e-8:
            print(f"[spfx] WARNING: scaled residual {factor.residual:.3e} "
                  "exceeds 1e-8 validation gate", file=sys.stderr, flush=True)
    return factor
