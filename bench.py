#!/usr/bin/env python
"""spfx headline benchmark: supernodal sparse Cholesky numeric factorization
throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "GFLOP/s", "vs_baseline": ...}

vs_baseline is the fraction of the chip's *measured* dense-matmul f32
speed-of-light (same matmul precision as the solver), i.e. the
fraction-of-roofline number BASELINE.md tracks. The reference publishes no
numbers of its own (SURVEY.md §6), so roofline fraction is the baseline axis.

Knobs (env):
  SPFX_BENCH_GRID   3D grid edge (default 48 -> n=110592)
  SPFX_BENCH_KIND   chol | lu (default chol)
  SPFX_BENCH_REPS   timed repetitions (default 3)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(arr) -> float:
    """Force completion with a dependent host fetch of one element.

    block_until_ready() has been observed to return before compute completes
    on tunneled backends (axon), which silently turns wall-clock timing into
    enqueue timing; fetching a data-dependent element cannot lie."""
    return float(np.asarray(arr[tuple(0 for _ in arr.shape)]).real)


def measure_roofline(dtype, precision) -> float:
    """Measured dense-matmul speed of light at the solver's precision."""
    m = 4096
    a = jnp.ones((m, m), dtype=dtype)
    b = jnp.ones((m, m), dtype=dtype)

    @jax.jit
    def mm(a, b):
        return jnp.dot(a, b, precision=precision)

    sync(mm(a, b))
    reps = 8
    t0 = time.perf_counter()
    out = a
    for _ in range(reps):
        out = mm(out, b)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    return 2.0 * m**3 / dt / 1e9


def main():
    grid = int(os.environ.get("SPFX_BENCH_GRID", "48"))
    kind = os.environ.get("SPFX_BENCH_KIND", "chol")
    reps = int(os.environ.get("SPFX_BENCH_REPS", "3"))

    from spfx.io import generate
    from spfx.utils.config import Config
    from spfx.validate import synth_rhs, scaled_residual

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    config = Config(
        dtype="float32", ordering="nd", matmul_precision="highest",
        class_min=int(os.environ.get("SPFX_CLASS_MIN", "8")),
        update_precision=os.environ.get("SPFX_UPDATE_PRECISION") or None)

    A = generate.laplacian_3d(grid)
    n = A.shape[0]
    log(f"matrix: 3D Poisson {grid}^3, n={n}, nnz={A.nnz}")

    t0 = time.perf_counter()
    if kind == "lu":
        from spfx.lu.factorize import LU as Ctx
    else:
        from spfx.chol.factorize import Cholesky as Ctx
    ctx = Ctx(A, config)
    log(f"analyze {ctx.analyze_time:.2f}s plan {ctx.plan_time:.2f}s  "
        f"nsuper={ctx.sym.nsuper} levels={len(ctx.plan.levels)} "
        f"nnzL={ctx.sym.nnzL} flops={ctx.plan.flops:.3e} "
        f"storage={ctx.plan.storage * 4 / 1e6:.1f}MB")

    # warmup (includes all jit compiles)
    t0 = time.perf_counter()
    f = ctx.factorize(A)
    arr = f.L if kind == "chol" else f.Lx
    sync(arr)
    log(f"first factorize (compile+run): {time.perf_counter() - t0:.2f}s")

    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        f = ctx.factorize(A)
        arr = f.L if kind == "chol" else f.Lx
        sync(arr)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"rep {i}: {dt:.3f}s  {ctx.plan.flops / dt / 1e9:.1f} GFLOP/s")

    gflops = ctx.plan.flops / best / 1e9

    # correctness gate (reference-style residual, :3262) + solve timing
    b = synth_rhs(A)
    x = f.solve(b)          # refined solve (host C++ backend by default)
    t0 = time.perf_counter()
    f.solve(b)
    log(f"refined solve: {time.perf_counter() - t0:.3f}s")
    res = scaled_residual(A, x, b)
    log(f"scaled residual: {res:.3e}")
    if not res < 1e-10:
        log("RESIDUAL GATE FAILED")

    roofline = measure_roofline(jnp.float32, config.matmul_precision)
    log(f"measured f32(highest) matmul roofline: {roofline:.0f} GFLOP/s")

    print(json.dumps({
        "metric": f"sparse_{kind}_factorize_gflops_3dpoisson{grid}",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / roofline, 4),
    }))


if __name__ == "__main__":
    main()
